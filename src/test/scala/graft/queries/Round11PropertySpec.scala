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
}
