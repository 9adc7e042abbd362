package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("band join equals the naive key-join + range filter") {
    val l = (0L until 500L).map(i => (i % 7, i, ts(i * 13))).toDF("k", "lid", "lts")
    val r = (0L until 500L).map(i => (i % 7, i + 1000, ts(i * 17 + 5))).toDF("k", "rid", "rts")
    val delta = 60_000_000L // 60 s

    val banded = RangeJoin.bandJoin(l, r, "k", "lts", "rts", delta)
    val naive = l.join(r, "k")
      .filter(abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= delta)
    assert(banded.count() == naive.count())
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }

  test("boundary: pairs exactly delta apart are included, delta+1us excluded") {
    val l = Seq((1L, "x", new java.sql.Timestamp(10_000L))).toDF("k", "lv", "lts")
    val r = Seq(
      (1L, "at-delta", new java.sql.Timestamp(10_000L + 5_000L)),
      (1L, "past-delta", new java.sql.Timestamp(10_000L + 5_001L)))
      .toDF("k", "rv", "rts")
    val out = RangeJoin.bandJoin(l, r, "k", "lts", "rts", 5_000_000L)
      .select("rv").as[String].collect().toSeq
    assert(out == Seq("at-delta"))
  }
}
