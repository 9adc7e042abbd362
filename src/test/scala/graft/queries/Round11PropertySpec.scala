package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Algebraic pins for the round-11 statistics (the Round10PropertySpec
  * pattern): where a gate rests on a mathematical identity, a spec proves
  * the identity on a hand-enumerable case or as an in-data invariant, so
  * an oracle match can never silently become "both engines share the same
  * wrong formula".
  */
class Round11PropertySpec extends SparkSpec {

  // AdaBoost's defining invariant: after round t's reweight, the chosen
  // stump's weighted error is EXACTLY 1/2 (the update is constructed so
  // h_t carries no information about the reweighted distribution). The
  // integer floor-divs can shift it by O(1) per doc, so assert within
  // [0.49, 0.51] on a 60-doc hand corpus — the sparse form of any
  // reweight bug (wrong multiplier pair, polarity flip) lands far
  // outside that band.
  test("q316: reweighted error of the chosen stump is 1/2 (AdaBoost invariant)") {
    import spark.implicits._
    val hand = (1 to 60).map { i =>
      val nTok = 20L + (i % 7) * 11L
      val the = (i % 5).toLong
      val a = (i % 3).toLong
      (i.toLong, nTok, the, a, the + a, (the + a) * 1000 / nTok >= 66L)
    }.toDF("doc_id", "n_tok", "the_cnt", "a_cnt", "stop_cnt", "ypos")
    val (picks, cur, _) = Boosting.trainStumps(hand, 1)
    val (_, fj, pol, wrong0, tot0, _) = picks.head
    assert(wrong0 > 0 && wrong0 < tot0,
      "degenerate hand corpus: the chosen stump must be imperfect")
    val f = Boosting.Feats(fj.toInt)
    val cond = if (pol == 1L) expr(f) =!= col("ypos")
               else expr(f) === col("ypos")
    val r = cur.agg(
      sum(when(cond, col("w")).otherwise(0L)).as("wrong"),
      sum(col("w")).as("tot")).head
    val ratioPpm = r.getAs[Long]("wrong") * 1000000L / r.getAs[Long]("tot")
    assert(ratioPpm >= 490000L && ratioPpm <= 510000L,
      s"post-reweight error of the round-1 stump is $ratioPpm ppm, not ~1/2" +
        " — the multiplier pair or polarity handling is wrong")
  }

  // q319's no-libm power: the staged isqrt(isqrt(c³)) must equal
  // floor(c^{3/4}) EXACTLY — i.e. satisfy the defining inequality
  // w⁴ ≤ c³ < (w+1)⁴ — for every count, including where the double
  // sqrt rounds across an integer boundary (the ±1 corrections exist
  // for exactly those). Checked exhaustively for c up to 200k (beyond
  // any vocab count in the gate's domain, and past the 2⁵³ concern
  // since c³ ≤ 8·10¹⁵ < 2⁵³).
  test("q319: staged integer 4th root is exact over the full count domain") {
    val bad = spark.range(1L, 200001L).toDF("cnt")
      .selectExpr("cnt", "cnt * cnt * cnt AS x3")
      .selectExpr("cnt", "x3",
        "CAST(FLOOR(SQRT(CAST(x3 AS DOUBLE))) AS BIGINT) AS r0")
      .selectExpr("cnt", "x3",
        "r0 + (CASE WHEN (r0 + 1) * (r0 + 1) <= x3 THEN 1 ELSE 0 END)" +
          " - (CASE WHEN r0 * r0 > x3 THEN 1 ELSE 0 END) AS r1")
      .selectExpr("cnt", "x3", "r1",
        "CAST(FLOOR(SQRT(CAST(r1 AS DOUBLE))) AS BIGINT) AS y0")
      .selectExpr("cnt", "x3",
        "y0 + (CASE WHEN (y0 + 1) * (y0 + 1) <= r1 THEN 1 ELSE 0 END)" +
          " - (CASE WHEN y0 * y0 > r1 THEN 1 ELSE 0 END) AS w")
      .filter("NOT (w*w*w*w <= x3 AND x3 < (w+1)*(w+1)*(w+1)*(w+1))")
      .count()
    assert(bad == 0L,
      s"$bad counts where isqrt(isqrt(c^3)) violates w^4 <= c^3 < (w+1)^4")
  }

  // q322's CMH on a hand case with a RATIONAL closed form: strata
  // (6,2,2,6) and (3,1,3,9), both n=16, give OR_MH =
  // (36/16 + 27/16)/(4/16 + 3/16) = 63/7 = 9 exactly — and every ppm
  // floor-div lands on an integer, so the pin is exact, not banded.
  test("q322: CMH pooled odds ratio matches the closed form on a hand case") {
    import spark.implicits._
    val cells = Seq(("s1", 6L, 2L, 2L, 6L), ("s2", 3L, 1L, 3L, 9L))
      .toDF("stratum", "a", "b", "c", "d").localCheckpoint(false)
    val rows = Insights.simpsonReport(cells).collect()
    val byStratum = rows.map(r => r.getString(0) -> r).toMap
    assert(rows.forall(_.getAs[Long]("or_mh_ppm") == 9000000L),
      "OR_MH != 9.000000 on the closed-form hand case")
    assert(byStratum("s1").getAs[Long]("dir") == 1L &&
      byStratum("s2").getAs[Long]("dir") == 1L &&
      byStratum("zz_all").getAs[Long]("dir") == 1L,
      "direction signs wrong on the hand case")
    assert(byStratum("zz_all").getAs[Long]("simpson_reversal") == 0L,
      "reversal flagged where marginal and strata agree")
  }

  // q327's U and z² on hand cases with known values. Disjoint samples
  // {1,2,3} vs {4,5,6}: U = 0, z² = 81·90/(9·210) = 27/7 = 3.857…, so
  // z2_milli = 3857 — one milli above the 3841 decision literal (the
  // pin exercises the boundary). Tied samples {1,1,2} vs {1,2,2}:
  // 2U = 6, T = 48, z² = 810/1458 → 555 milli, not significant.
  test("q327: Mann-Whitney U and tie-corrected z² match closed forms") {
    import spark.implicits._
    val disjoint = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("source", "n_chars")
    val r1 = Insights.mannWhitneyReport(disjoint).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(r1("a").getAs[Long]("u2") == 0L, "2U != 0 on disjoint samples")
    assert(r1("a").getAs[Long]("z2_milli") == 3857L &&
      r1("a").getAs[Long]("significant") == 1L,
      "z² milli != 3857 (or not significant) on the boundary hand case")
    val tied = Seq(("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 1L), ("b", 2L), ("b", 2L)).toDF("source", "n_chars")
    val r2 = Insights.mannWhitneyReport(tied).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(r2("a").getAs[Long]("u2") == 6L,
      "midrank 2U != 6 on the tied hand case")
    assert(r2("a").getAs[Long]("z2_milli") == 555L &&
      r2("a").getAs[Long]("significant") == 0L,
      "tie-corrected z² milli != 555 on the tied hand case")
  }

  // q328's product-limit fold on the textbook hand case: 10 at risk,
  // 2 events at t=1 (S = 8/10), a censor at t=2 (S unchanged — the
  // defining difference from naive survival), 1 event at t=3 among 7
  // at risk (S = 0.8·6/7 = 685714 ppm floored), trailing censors only.
  test("q328: Kaplan-Meier fold matches the textbook rational curve") {
    val out = Analytics.kmFold(
      Seq((1L, 2L, 0L), (2L, 0L, 1L), (3L, 1L, 0L), (5L, 0L, 6L)))
    assert(out.map(_._2) == Seq(10L, 8L, 7L, 6L), "risk sets wrong")
    assert(out.map(_._5) == Seq(800000L, 800000L, 685714L, 685714L),
      "survival curve diverges from the textbook rational values " +
        "(a censor must not move S; an event must multiply by (n-d)/n)")
  }

  // q320's chrF² scorer vs an independent Scala multiset
  // implementation on hand pairs — clipping (multiset min), the n
  // average, and the β=2 combination all re-derived without SQL.
  test("q320: chrF scorer matches an independent multiset implementation") {
    import spark.implicits._
    def chrfRef(ref: String, hyp: String): Long = {
      def grams(s: String, n: Int) =
        s.sliding(n).toSeq.groupBy(identity).map { case (g, xs) =>
          g -> xs.size.toLong }
      val (ps, rs) = Seq(2, 3).map { n =>
        val gr = grams(ref, n); val gh = grams(hyp, n)
        val ov = gh.map { case (g, ch) =>
          math.min(ch, gr.getOrElse(g, 0L)) }.sum
        (ov * 1000000L / (hyp.length - n + 1),
          ov * 1000000L / (ref.length - n + 1))
      }.unzip
      val pa = ps.sum / 2; val ra = rs.sum / 2
      5 * pa * ra / math.max(4 * pa + ra, 1L)
    }
    val pairs = Seq(
      ("x", 1L, "hello world", "hello world"),
      ("x", 2L, "abab", "aba"),
      ("x", 3L, "abcdefgh", "abcxefgh"),
      ("x", 4L, "aaaa", "aabaa"))
      .toDF("ptype", "doc_id", "ref", "hyp")
    val got = Dedup.chrfScores(pairs).collect()
      .map(r => r.getLong(1) -> r.getAs[Long]("chrf_ppm")).toMap
    assert(got(1L) == 1000000L, "identical strings must score exactly 1")
    Seq(("abab", "aba", 2L), ("abcdefgh", "abcxefgh", 3L),
      ("aaaa", "aabaa", 4L)).foreach { case (r, h, id) =>
      assert(got(id) == chrfRef(r, h),
        s"chrF($r, $h) = ${got(id)} diverges from the independent " +
          s"multiset value ${chrfRef(r, h)}")
    }
  }
}
