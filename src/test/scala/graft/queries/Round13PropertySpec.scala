package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 statistic pins (the q289/q320 lesson: every new statistic
  * gets an independent closed-form or cross-paradigm check).
  */
class Round13PropertySpec extends SparkSpec {

  test("autoLshBits: the log-N law and its clamps, pinned") {
    import graft.functions.VectorKernels.autoLshBits
    assert(autoLshBits(520L) == 5)    // q351 sf0.01 corpus (500 + 20)
    assert(autoLshBits(2080L) == 7)   // q351 sf0.1 corpus
    assert(autoLshBits(20800L) == 10) // q351 sf1 rehearsal corpus
    assert(autoLshBits(1L) == 4 && autoLshBits(0L) == 4)  // floor clamp
    assert(autoLshBits(Long.MaxValue / 2) == 24)          // ceiling clamp
    // monotone non-decreasing over decades
    val seq = Seq(10L, 100L, 1000L, 10000L, 100000L, 1000000L)
      .map(autoLshBits(_))
    assert(seq == seq.sorted, s"not monotone: $seq")
  }

  test("q351 oracle's SQL bits formula == VectorKernels.autoLshBits") {
    // The oracle re-derives the bits value with
    // LEAST(24, GREATEST(4, CEIL(LOG2(n / 30.0)))) — drift between that
    // text and the Scala law would silently decouple the gate from its
    // replay. Spark evaluates the same SQL here (same IEEE log2/ceil).
    import graft.functions.VectorKernels.autoLshBits
    val ns = Seq(1L, 29L, 30L, 31L, 500L, 520L, 2000L, 2080L, 20800L,
      100000L, 123456L, 1000000L)
    val df = spark.range(1).selectExpr(
      ns.map(n => s"LEAST(24, GREATEST(4, CAST(CEIL(LOG2($n / 30.0))" +
        s" AS BIGINT))) AS b$n"): _*)
    val row = df.head()
    ns.zipWithIndex.foreach { case (n, i) =>
      assert(row.getLong(i) == autoLshBits(n).toLong,
        s"n=$n sql=${row.getLong(i)} scala=${autoLshBits(n)}")
    }
  }

  test("q351 planted jitter lands in the production near-dup zone") {
    // every planted copy must sit FAR above the 0.80 threshold and far
    // below 1.0 (a no-op jitter would make the gate vacuous); the
    // noise-vector background tops out ~0.6, so the zones are disjoint.
    import graft.functions.VectorFunctions.{cosine, vec64}
    val base = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), vec64(col("embedding")).as("e"))
    val corpus = Vectors.plantedNearDupCorpus(spark, sf)
    val planted = corpus.filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("vec_id"),
        vec64(col("embedding")).as("p"))
    val cos = planted.join(base, "vec_id")
      .select(cosine(col("p"), col("e")).as("c"))
      .agg(min(col("c")).as("lo"), max(col("c")).as("hi")).head()
    assert(cos.getDouble(0) > 0.95, s"planted cosine floor ${cos.getDouble(0)}")
    assert(cos.getDouble(1) < 0.9999, s"jitter was a no-op: ${cos.getDouble(1)}")
  }
}
