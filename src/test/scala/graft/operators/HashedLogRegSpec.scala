package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HashedLogReg: the distributed fixed-point gradient descent must equal
  * a scalar driver-side replay bit-for-bit (the determinism claim q233's
  * oracle rests on), and the model must actually learn the label rule. */
class HashedLogRegSpec extends SparkSpec {

  private def featureTable() = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    HashedLogReg.withLabelAndBias(
      HashedLogReg.tokenFeatures(docs, "text", Seq("the", "a")), 66L)
      .cache()
  }

  test("hash buckets cover [0, 256) and the bias row is present per doc") {
    val x = featureTable()
    val range = x.agg(min(col("j")), max(col("j"))).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) == HashedLogReg.Buckets)
    val docs = x.select(col("doc_id")).distinct().count()
    val bias = x.filter(col("j") === HashedLogReg.Buckets).count()
    assert(bias == docs, "exactly one bias row per doc")
  }

  test("distributed training equals a scalar driver-side replay exactly") {
    val x = featureTable()
    val n = x.select(col("doc_id")).distinct().count()
    val got = HashedLogReg.train(x, n, rounds = 4, invLr = 16L)

    // scalar replay over the collected feature rows
    val rows = x.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("y"), r.getAs[Int]("j"), r.getAs[Long]("x")))
    val byDoc = rows.groupBy(_._1)
    val w = new Array[Long](HashedLogReg.Buckets + 1)
    (1 to 4).foreach { _ =>
      val grad = new Array[Long](HashedLogReg.Buckets + 1)
      byDoc.foreach { case (_, rs) =>
        val y = rs.head._2
        val z = rs.map { case (_, _, j, xv) => xv * w(j) }.sum
        val sig = math.max(0L, math.min(1000000L, 500000L + z / 4))
        val err = y * 1000000L - sig
        rs.foreach { case (_, _, j, xv) => grad(j) += err * xv }
      }
      (0 to HashedLogReg.Buckets).foreach { j =>
        w(j) += (grad(j) / n) / 16L
      }
    }
    assert(got.toSeq == w.toSeq,
      "distributed gradient rounds diverge from the scalar replay")
  }

  test("warm start is exact: 2+2 rounds from a seed equals 4 rounds from scratch") {
    // full-batch GD is Markovian in the weights, so splitting a run and
    // warm-starting must be bit-identical — the q246 refresh contract
    val x = featureTable()
    val n = x.select(col("doc_id")).distinct().count()
    val scratch = HashedLogReg.train(x, n, rounds = 4)
    val half = HashedLogReg.train(x, n, rounds = 2)
    val resumed = HashedLogReg.train(x, n, rounds = 2, init = Some(half))
    assert(resumed.toSeq == scratch.toSeq,
      "warm-started rounds diverge from the uninterrupted run")
  }

  test("the model learns the stop-ratio rule: scores separate the classes") {
    val x = featureTable()
    val n = x.select(col("doc_id")).distinct().count()
    val w = HashedLogReg.train(x, n)
    val scored = HashedLogReg.score(x, w).cache()
    val agree = scored.filter(
      (col("y") === 1L) === (col("z") >= 0L)).count()
    assert(agree * 10 >= n * 7,
      s"model/rule agreement $agree/$n below 70% — training failed to fit")
    // positives score higher than negatives on average
    val m = scored.groupBy(col("y")).agg(avg(col("z")).as("mean"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) > m(0L),
      "positive-class mean margin not above negative-class mean")
  }
}
