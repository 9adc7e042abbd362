package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Algebraic pins for the round-12 statistics (the Round10/11 pattern):
  * where a gate rests on a mathematical identity, a spec proves it on a
  * hand-enumerable case with an independent closed form, so an oracle
  * match can never silently become "both engines share the same wrong
  * formula".
  */
class Round12PropertySpec extends SparkSpec {

  // Kruskal–Wallis on 20 singleton groups with values 1..20: all ranks
  // distinct (tie_t = 0), R_g = g, so the textbook form collapses to
  //   H = 12/(n(n+1)) · Σ g² − 3(n+1) = 12·2870/420 − 63 = 19 exactly
  // (Σ g² for 1..20 = 2870). Any slip in the midrank table, the 10⁹
  // rational carry, or the (n³−n)/(n(n+1)) = n−1 cancellation moves
  // h_milli off 19000.
  test("q339: H on 20 singleton groups equals the closed form 19.000") {
    import spark.implicits._
    val hand = (1 to 20)
      .map(g => (f"s$g%02d", g.toLong))
      .toDF("source", "n_chars")
    val r = Insights.kruskalWallisReport(hand).collect()
    assert(r.length == 20)
    val first = r.head
    assert(first.getAs[Long]("h_milli") == 19000L,
      s"H=${first.getAs[Long]("h_milli")} != 19000")
    assert(first.getAs[Long]("tie_t") == 0L)
    assert(first.getAs[Long]("n") == 20L)
    assert(first.getAs[Long]("significant") == 0L) // 19.000 < 30.144
    // mean rank of singleton group g is g exactly (milli = 1000·g)
    r.foreach { row =>
      val g = row.getAs[String]("source").drop(1).toLong
      assert(row.getAs[Long]("meanrank_milli") == g * 1000L)
    }
  }

  // The same hand corpus with every value TIED (all 20 docs length 7):
  // every group's midrank is (n+1)/2 = 10.5, Σ R_g²/n_g = 20·10.5² =
  // 2205, H = 12·2205/420 − 63 = 0, and the tie denominator
  // n³−n−T = 0 … which the formula must survive via its own guard:
  // with all values tied the corrected H is 0/0 — the report's div is
  // floor-div by the exact tie-degenerate denominator, so assert the
  // whole-corpus-tied case raises (it is statistically undefined, and
  // a silent 0 would be a lie). Spark surfaces decimal div-by-zero as
  // an ANSI error.
  test("q339: fully-tied corpus is rejected, not silently zero") {
    import spark.implicits._
    val hand = (1 to 20).map(g => (f"s$g%02d", 7L))
      .toDF("source", "n_chars")
    intercept[Exception] {
      Insights.kruskalWallisReport(hand).collect()
    }
  }

  // q338's cap certificate as an in-data invariant at gate scale: on
  // the sf0.001 fixture, every kept block at levels 0/1 reports
  // occupancy ≤ the cap, candidate totals reconcile (total = Σ level
  // counts), and recall can never exceed 10⁶ ppm.
  test("q338: caps hold and the card reconciles on the smoke fixture") {
    val row = graft.SparkEntry.queries("q338_dynamic_blocking")(
      spark, sf).collect().head
    def l(c: String) = row.getAs[Long](c)
    assert(l("max_occ_kept0") <= 12L)
    assert(l("max_occ_kept1") <= 12L)
    assert(l("cand_total") == l("cand_l0") + l("cand_l1") + l("cand_l2"))
    assert(l("true_total") <= l("true_full"))
    assert(l("recall_ppm") <= 1000000L)
    assert(l("cand_total") <= l("cand_full"))
  }
}
