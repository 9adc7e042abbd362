package graft.queries

import graft.SparkSpec

/** Algebraic pins for the round-10 statistics — the RankSumSpec /
  * RougeLSpec pattern: where a gate rests on a mathematical identity, a
  * spec proves the identity itself on a hand-enumerable case (or as an
  * in-data invariant), so the oracle match can never silently become
  * "both engines share the same wrong formula".
  */
class Round10PropertySpec extends SparkSpec {

  // q306 rests on: for a coverage game, Shapley(s) = Σ_{e ∈ s} 1/k(e).
  // Prove it against the DEFINITIONAL Shapley (average marginal
  // contribution over every coalition order) on a hand case:
  //   e1 owned by {A}, e2 by {A,B}, e3 by {A,B,C}.
  // Exact rationals: work in units of 1/6 (3! orders) and 1/6 (lcm of
  // 1,2,3) — both sides ×6 must match integer-exactly.
  test("q306: coverage-game Shapley closed form equals the permutation definition") {
    val owners = Map("e1" -> Set("A"), "e2" -> Set("A", "B"),
      "e3" -> Set("A", "B", "C"))
    val players = Seq("A", "B", "C")
    // definitional: sum over all 6 orders of marginal coverage, ×1 each
    val perms = players.permutations.toSeq
    def marginalSum(p: String): Long = perms.map { order =>
      val before = order.takeWhile(_ != p).toSet
      owners.values.count(o => o.contains(p) && o.intersect(before).isEmpty)
        .toLong
    }.sum // Shapley(p) ×6
    // closed form ×6: Σ 6/k(e) over elements containing p
    def closed(p: String): Long =
      owners.values.filter(_.contains(p)).map(o => 6L / o.size).sum
    players.foreach { p =>
      assert(marginalSum(p) == closed(p),
        s"closed-form Shapley diverges from the definition for $p")
    }
    // efficiency: Σ_p Shapley(p) = |covered elements|
    assert(players.map(closed).sum == 6L * owners.size)
  }

  // q308's step-up can only ever REMOVE rejections relative to the
  // uncorrected battery: every per-rank threshold ln(40m/i) ≥ ln(40)
  // for i ≤ m, so bh_reject = 1 must imply reject_naive = 1. Checked
  // in-data on the gate's own output.
  test("q308: BH rejections are a subset of the naive rejections") {
    val rows = graft.SparkEntry.queries("q308_bh_fdr_battery")(spark, sf)
      .select("reject_naive", "bh_reject").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!(r.getLong(1) == 1L && r.getLong(0) == 0L),
        "BH rejected a test the uncorrected battery kept — impossible " +
          "under thresholds ln(40m/i) >= ln(40)")
    }
  }

  // q303's DP output must satisfy the segmentation bounds whatever the
  // vocabulary: 1 <= n_tokens <= word_len (single chars are always in
  // vocab), n_tokens >= ceil(len/4) (no unit longer than 4), cost >= 0,
  // and corpus-wide chars-per-token >= 1.
  test("q303: Viterbi segmentations respect the unit-length bounds") {
    val rows = graft.SparkEntry.queries("q303_unigram_viterbi")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val len = r.getAs[Long]("word_len")
      val nt = r.getAs[Long]("n_tokens")
      assert(nt >= 1L && nt <= len, s"token count $nt outside [1, $len]")
      assert(nt >= (len + 3) / 4, s"$nt tokens cannot cover $len chars " +
        "with units of length <= 4")
      assert(r.getAs[Long]("cost_micro") >= 0L)
      assert(r.getAs[Long]("chars_per_token_ppm") >= 1000000L)
    }
  }
}
