package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank's two-pass (rank, prefix-sum) vs the naive global-sort
  * window — row-for-row equality, including tie groups and shard
  * boundaries. */
class GlobalRankSpec extends SparkSpec {

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(col("v").desc, col("id"))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  test("matches the global-sort window exactly, ties and shard edges included") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // values clustered to force ties AND straddle the shardDiv=100
    // boundaries (0, 99, 100, 101 all present)
    val rows = (1L to 500L).map { id =>
      val v = rnd.nextInt(12) match {
        case 0 => 0L
        case 1 => 99L
        case 2 => 100L
        case 3 => 101L
        case _ => rnd.nextInt(1000).toLong
      }
      (id, v)
    }
    val df = rows.toDF("id", "v")
    val got = GlobalRank.withRankAndPrefix(df, "v", "id", shardDiv = 100L)
      .select(col("id"), col("v"), col("rn"), col("cum"))
      .orderBy(col("rn")).collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = naive(df).select(col("id"), col("v"), col("rn"), col("cum"))
      .orderBy(col("rn")).collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == want)
    // ranks are a permutation of 1..n and cum ends at the total
    assert(got.map(_._3) == (1L to 500L))
    assert(got.last._4 == rows.map(_._2).sum)
  }

  test("all-ties and single-value corners") {
    import spark.implicits._
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("id", "v")
    val got = GlobalRank.withRankAndPrefix(df, "v", "id")
      .orderBy(col("rn")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rn"), r.getAs[Long]("cum")))
    assert(got.toSeq == Seq((1L, 1L, 7L), (2L, 2L, 14L), (3L, 3L, 21L)))
  }
}
