package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("sample is reproducible and partition-independent") {
    val s1 = Sampling.deterministicSample(docs, Seq("doc_id"), 0.3, seed = 7)
    val s2 = Sampling.deterministicSample(docs.repartition(13), Seq("doc_id"), 0.3, seed = 7)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val n = s1.count().toDouble / docs.count()
    assert(n > 0.25 && n < 0.35, s"fraction $n")
    // different seed → different subset
    val s3 = Sampling.deterministicSample(docs, Seq("doc_id"), 0.3, seed = 8)
    assert(!s3.exceptAll(s1).isEmpty)
  }

  test("stratified fractions hold per stratum; absent strata dropped") {
    val out = Sampling.stratifiedSample(docs, "lang", Seq("doc_id"),
      Map("en" -> 0.5, "de" -> 0.1), seed = 7)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("en", "de"))
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("en").toDouble / base("en") - 0.5) < 0.12)
    assert(counts("de").toDouble / base("de") < 0.25)
  }

  test("q57 gate output certifies itself: resample_diff 0, fractions in bounds") {
    // Mirrors the evidence columns the driver sees in the rows-only gate:
    // the second independent sample must match row-for-row (resample_diff
    // = 0) and every stratum's achieved rate must sit within 3σ binomial
    // of its target.
    val rows = graft.SparkEntry.queries("q57_stratified_sample")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("resample_diff") == 0L,
        s"stratum ${r.getAs[String]("lang")} not reproducible")
      assert(r.getAs[Boolean]("frac_in_bounds"),
        s"stratum ${r.getAs[String]("lang")}: achieved ${r.getAs[Double]("achieved_frac")} " +
          s"vs target ${r.getAs[Double]("target_frac")}")
    }
  }

  test("train/test split is disjoint and exhaustive") {
    val (train, test) = Sampling.trainTestSplit(docs, Seq("doc_id"), 0.2, seed = 7)
    assert(train.count() + test.count() == docs.count())
    assert(train.join(test, "doc_id").count() == 0)
    val frac = test.count().toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.25, s"test fraction $frac")
  }

  test("reproducible shuffle yields a stable permutation") {
    val ids1 = Sampling.reproducibleShuffle(docs, Seq("doc_id"), 7)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val ids2 = Sampling.reproducibleShuffle(docs.repartition(9), Seq("doc_id"), 7)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids1 == ids2)
    assert(ids1 != ids1.sorted) // actually permuted
  }
}
