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

  test("router: both routes emit identical rows; route picked at the crossover") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (1L to 400L).map(id => (id, rnd.nextInt(50).toLong)).toDF("id", "v")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("v"), col("rn"), col("cum"))
        .orderBy(col("rn")).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // force each route via the caller-supplied count
    val (rSmall, small) = GlobalRank.withRankAndPrefixAuto(
      df, "v", "id", rowCount = Some(400L))
    val (rBig, big) = GlobalRank.withRankAndPrefixAuto(
      df, "v", "id", rowCount = Some(GlobalRank.CrossoverRows + 1))
    assert(rSmall == "naive" && rBig == "twopass")
    assert(rows(small) == rows(big), "routes disagree on (rn, cum)")
    // no forced count: the statistic is the actual row count -> naive here
    assert(GlobalRank.withRankAndPrefixAuto(df, "v", "id")._1 == "naive")
  }

  test("router: the large-input route keeps population rows off single partitions") {
    import spark.implicits._
    val df = (1L to 300L).map(id => (id, id % 37)).toDF("id", "v")
    val p = GlobalRank.withRankAndPrefixAuto(
      df, "v", "id", rowCount = Some(GlobalRank.CrossoverRows + 1))._2
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the two-pass plan: value-keyed tie window, and any SinglePartition
    // exchange carries only the bounded shard-offset table (no id column)
    assert(p.contains("hashpartitioning(v"),
      "tie-break window not keyed by value")
    ("\\(\\d+\\) Exchange\\s*\\nInput \\[\\d+\\]: \\[([^\\]]*)\\]\\s*" +
      "\\nArguments: SinglePartition").r.findAllMatchIn(p)
      .map(_.group(1)).foreach(in =>
        assert(!in.contains("id#"),
          s"population rows serialized through one partition: [$in]"))
  }

  test("loud preconditions: negative and NULL values raise on either route") {
    import spark.implicits._
    val neg = Seq((1L, 5L), (2L, -1L)).toDF("id", "v")
    intercept[Exception] {
      GlobalRank.withRankAndPrefix(neg, "v", "id").collect()
    }
    intercept[Exception] {
      GlobalRank.naiveRankAndPrefix(neg, "v", "id").collect()
    }
    val withNull = Seq((1L, java.lang.Long.valueOf(5L)),
      (2L, null.asInstanceOf[java.lang.Long])).toDF("id", "v")
    intercept[Exception] {
      GlobalRank.withRankAndPrefix(withNull, "v", "id").collect()
    }
  }
}
