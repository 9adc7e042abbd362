package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private val quotes = Seq(
    ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
    ("B", 3L, 20.0)).toDF("sym", "q_ts", "px")

  private val trades = Seq(
    ("A", 0L, 100), // before any quote -> null
    ("A", 5L, 200), // exactly at a quote -> inclusive match (px 11)
    ("A", 7L, 300), // between quotes -> px 11
    ("A", 99L, 400), // after all -> px 12
    ("B", 2L, 500), // before B's quote -> null
    ("C", 4L, 600)) // key with no quotes -> null
    .toDF("sym", "t_ts", "qty")

  test("picks the most recent right row at or before each left timestamp") {
    val out = AsOfJoin.asOfJoin(trades, quotes, "sym", "t_ts", "q_ts")
      .orderBy("sym", "t_ts")
      .select("sym", "t_ts", "qty", "q_ts", "px")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSeq
    assert(out == Seq(
      ("A", 0L, None), ("A", 5L, Some(11.0)), ("A", 7L, Some(11.0)),
      ("A", 99L, Some(12.0)), ("B", 2L, None), ("C", 4L, None)))
  }

  test("single shuffle: exactly one Exchange in the physical plan") {
    val out = AsOfJoin.asOfJoin(trades, quotes, "sym", "t_ts", "q_ts")
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges")
  }

  test("rejects colliding payload column names") {
    val bad = quotes.withColumnRenamed("px", "qty")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(trades, bad, "sym", "t_ts", "q_ts")
    }
  }
}
