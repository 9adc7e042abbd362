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

  // q289's densification: Cohen's pₑ and the weighted-κ denominator sum
  // rᵢ·c_j terms over BAND PAIRS, not observed cells. Hand case with
  // EMPTY diagonal cells (0,0) and (1,1): labels (0,1)×2, (1,0), (2,2)×2
  // → n=5, a=2, margins r=(2,1,2), c=(1,2,2); dense b = 2·1+1·2+2·2 = 8
  // → κ = (2·5−8)/(25−8) = 2/17 → 117647 ppm. The sparse form drops the
  // two empty diagonal b terms (b=4 → 6/21 = 285714 ppm — overstated).
  // Weighted: dnum = 3, dense dden = Σrᵢc_j|i−j| = 12+3+8 = 23 →
  // κw = 1 − 3·5/23 → 347827 ppm (sparse dden=5 → κw < 0: wildly off).
  test("q289: kappa densifies empty cells against the 3x3 grid (hand case)") {
    import spark.implicits._
    val labels = Seq((0L, 1L), (0L, 1L), (1L, 0L), (2L, 2L), (2L, 2L))
      .toDF("ra", "rb")
    val out = Classifier.kappaTable(spark, labels).collect()
    assert(out.length == 9, "densified confusion table must emit all 9 cells")
    assert(out.count(_.getAs[Long]("n_cell") == 0L) == 6,
      "hand case has exactly 6 empty cells")
    val k = out.head.getAs[Long]("kappa_ppm")
    val kw = out.head.getAs[Long]("kappa_w_ppm")
    assert(k == 117647L,
      s"kappa_ppm $k != 2/17 ppm — empty diagonal rᵢ·cᵢ terms dropped?")
    assert(kw == 347827L,
      s"kappa_w_ppm $kw != (1 − 15/23) ppm — dden not densified?")
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
