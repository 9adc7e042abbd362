package graft.queries

import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions.{cosine, vec64}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 statistic pins (the standing rule: every new statistic gets
  * an independent closed-form or cross-paradigm check).
  */
class Round15PropertySpec extends SparkSpec {

  test("q357 margin: quantized rank-5/rank-6 cosine boundary is not a near-tie") {
    // Round-14 ADVICE: q357 ranks by cosine over dequantized DOUBLES, so
    // cross-engine hash agreement rests on Spark and DuckDB computing
    // the same double at the top-5 boundary. This pin measures the
    // boundary margin — min over queries of (cos@rank5 − cos@rank6) in
    // the quantized ranking, ties broken by vec_id exactly as the gate
    // breaks them — and asserts it sits orders of magnitude above
    // double-rounding noise (~1e-15 on a 64-dim dot), so an engine
    // disagreement would need a corpus with a genuine geometric tie,
    // not an ulp. Bound chosen from measurement: sf0.001 ≈ 2.3e-3,
    // sf0.01 ≈ 7.9e-4 (denser corpora pack the top-k closer; 1e-5
    // leaves two decades of slack above rounding at both SFs).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), vec64(col("embedding")).as("e"))
        .localCheckpoint(false)
      val quant = Vectors.int8Dequant(emb)
      val qs = quant.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("qid"), col("r").as("rq"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("qcos").desc, col("vec_id"))
      val minMargin = quant
        .join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          cosine(col("rq"), col("r")).as("qcos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 5 || col("rn") === 6)
        .groupBy(col("qid"))
        .agg((max(when(col("rn") === 5, col("qcos")))
          - max(when(col("rn") === 6, col("qcos")))).as("m"))
        .agg(min(col("m")).as("mm"))
        .head().getDouble(0)
      info(s"$dir: min rank5-rank6 quantized-cosine margin = $minMargin")
      assert(minMargin > 1e-5,
        s"$dir: quantized top-5 boundary margin $minMargin is within " +
          "double-rounding distance — the q357 hash is tie-fragile here")
    }
  }
}
