package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalLshSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // near-dup trio: 1~2 (one word differs), 3 unrelated, 4~1 (identical)
  private val corpus = docs(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy cat again and again"),
    (3L, "completely different content with no shared shingles at all here"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("per-batch emissions union to the one-shot batch pair set, any split") {
    val oneShot = pairsOf(MinHashLSH.nearDupPairs(corpus, "doc_id", "text"))
    assert(oneShot.nonEmpty)
    for (splitAt <- 1L to 3L) {
      val first = corpus.filter(col("doc_id") <= splitAt)
      val second = corpus.filter(col("doc_id") > splitAt)
      val b0 = IncrementalLsh.bucketRows(first, "doc_id", "text")
      val b1 = IncrementalLsh.bucketRows(second, "doc_id", "text")
      val cands = IncrementalLsh.appendCandidates(b0.limit(0), b0)
        .unionAll(IncrementalLsh.appendCandidates(b0, b1))
      val got = pairsOf(MinHashLSH.verifyCandidates(
        cands, MinHashLSH.shingled(corpus, "doc_id", "text"), 0.4))
      assert(got == oneShot, s"split at $splitAt")
    }
  }

  test("each pair is emitted by exactly one append (the second member's batch)") {
    val first = corpus.filter(col("doc_id") <= 2)
    val second = corpus.filter(col("doc_id") > 2)
    val b0 = IncrementalLsh.bucketRows(first, "doc_id", "text")
    val b1 = IncrementalLsh.bucketRows(second, "doc_id", "text")
    val fromFirst = pairsOf(IncrementalLsh.appendCandidates(b0.limit(0), b0))
    val fromSecond = pairsOf(IncrementalLsh.appendCandidates(b0, b1))
    assert((fromFirst & fromSecond).isEmpty, "a pair emitted twice")
    assert(fromFirst.forall { case (_, b) => b <= 2 })
    assert(fromSecond.forall { case (_, b) => b > 2 })
  }

  test("appending to an empty index is the plain self-join candidate set") {
    val b = IncrementalLsh.bucketRows(corpus, "doc_id", "text")
    val viaAppend = pairsOf(IncrementalLsh.appendCandidates(b.limit(0), b))
    val oneShot = pairsOf(MinHashLSH.nearDupPairs(corpus, "doc_id", "text"))
    assert(oneShot.subsetOf(viaAppend),
      "verified pairs must come from append candidates")
  }
}
