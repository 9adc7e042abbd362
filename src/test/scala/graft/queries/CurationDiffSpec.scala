package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** q107's snapshot-diff classifier on planted versions covering all four
  * change classes — the gate run only produces added/removed/changed
  * (exact state repetition never happens on continuous spend), so the
  * unchanged branch is proven here. Also pins q108's sampling property:
  * the A-ES key ranking must favor weight proportionally, and the draw
  * must be identical across repartitionings (no RNG state).
  */
class CurationDiffSpec extends SparkSpec {

  test("q107 classifier: all four change classes, exact-decimal equality") {
    import spark.implicits._
    def snap(rows: Seq[(Long, Long, String)]) =
      rows.toDF("o_custkey", "n_orders", "spend_str")
        .select(col("o_custkey"), col("n_orders"),
          col("spend_str").cast(DecimalType(28, 2)).as("spend"))
    // c1 unchanged, c2 changed (spend moves), c3 removed, c4 added,
    // c5 changed (count moves, spend identical)
    val v1 = snap(Seq((1L, 2L, "10.00"), (2L, 2L, "10.00"), (3L, 1L, "5.00"),
      (5L, 1L, "7.00")))
    val v2 = snap(Seq((1L, 2L, "10.00"), (2L, 2L, "12.50"), (4L, 3L, "9.00"),
      (5L, 2L, "7.00")))
    val got = Curation.snapshotDiff(v1, v2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set("added", "changed", "removed", "unchanged"))
    assert(got("added") == ((1L, 3L, 9.0)))
    assert(got("removed") == ((1L, -1L, -5.0)))
    assert(got("unchanged") == ((1L, 0L, 0.0)))
    // changed: c2 (+0 orders, +2.50) and c5 (+1 order, +0.00)
    assert(got("changed") == ((2L, 1L, 2.5)))
  }

  test("q108 sampling: repartition-invariant and weight-sensitive") {
    val q = graft.SparkEntry.queries("q108_weighted_sample")
    val a = q(spark, sf).collect().map(_.toSeq)
    val b = q(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "weighted draw not reproducible across runs")
    // Weight sensitivity: the sampled docs' mean n_chars should exceed the
    // corpus mean — w = n_chars + 1 upweights long docs. (A-ES guarantees
    // inclusion probability monotone in weight; on 500 docs the gap is
    // far beyond noise.)
    val sampleMean = q(spark, sf).agg(avg(col("n_chars"))).head().getDouble(0)
    val corpusMean = spark.read.parquet(s"$sf/documents.parquet")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }
}
