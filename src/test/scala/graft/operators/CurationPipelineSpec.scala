package graft.operators

import graft.SparkSpec
import graft.operators.CurationPipeline.{Stage, DropCol}
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, text, lang, n_chars)
  private def docs(rows: (Long, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "n_chars")

  private val stages = Seq(
    Stage("a_too_short", _ => col("n_chars") >= 10),
    Stage("b_lang", _ => col("lang") === "en"),
    CurationPipeline.dedupKeepOne("c_exact_dup",
      md5(col("text").cast("binary")), col("doc_id")))

  test("first rejecting stage wins; accounting partitions the input exactly") {
    val d = docs(
      (1L, "short", "zh", 5L),        // fails a AND b -> attributed to a
      (2L, "long enough text", "zh", 16L), // fails b only
      (3L, "keep me", "en", 12L),
      (4L, "keep me", "en", 12L))     // dup of 3 -> c
    val acc = CurationPipeline.accounting(d, stages, col("n_chars"))
      .as[(String, Long, Long)].collect().map { case (s, n, _) => s -> n }.toMap
    assert(acc == Map("a_too_short" -> 1L, "b_lang" -> 1L,
      "c_exact_dup" -> 1L, "kept" -> 1L))
    assert(CurationPipeline.survivors(d, stages).as[(Long, String, String, Long)]
      .collect().map(_._1).toSeq == Seq(3L))
  }

  test("dedup representative is always a SURVIVOR of earlier stages") {
    // doc 1 (smallest id) is language-rejected; naive keep-lowest-id
    // would crown it representative and drop the only surviving copy.
    val d = docs(
      (1L, "same text here", "zh", 14L),
      (2L, "same text here", "en", 14L))
    val marked = CurationPipeline.mark(d, stages)
      .select(col("doc_id"), col(DropCol)).as[(Long, Option[String])]
      .collect().toMap
    assert(marked(1L).contains("b_lang"))
    assert(marked(2L).isEmpty, "surviving copy must be kept, not deduped away")
  }

  test("a duplicate group with every copy already dropped marks nothing new") {
    val d = docs(
      (1L, "twin", "zh", 20L),
      (2L, "twin", "fr", 20L))
    val marked = CurationPipeline.mark(d, stages)
      .select(col(DropCol)).as[String].collect().toSeq
    assert(marked.forall(_ == "b_lang"))
  }

  test("accounting is one aggregation over one scan (single-pass lineage)") {
    val d = docs((1L, "keep me", "en", 12L))
    val plan = CurationPipeline.accounting(d, stages, col("n_chars"))
      .queryExecution.executedPlan.toString
    // no per-stage re-count: exactly one aggregate pair over the funnel
    assert(!plan.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(plan).size <= 4,
      s"expected one partial+final agg chain, got:\n$plan")
  }

  test("input already carrying drop_stage is rejected loudly") {
    val d = docs((1L, "x", "en", 1L)).withColumn(DropCol, lit("boom"))
    intercept[IllegalArgumentException] {
      CurationPipeline.mark(d, stages)
    }
  }
}
