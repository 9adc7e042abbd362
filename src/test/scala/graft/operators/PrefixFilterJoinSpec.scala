package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix filtering must be lossless (same pairs as the brute-force
  * co-element join) while actually pruning (fewer candidate pairs than
  * the exact join's co-shingled pair count — otherwise it's overhead).
  */
class PrefixFilterJoinSpec extends SparkSpec {

  test("q113 equals q44's exact all-pairs result, pair for pair") {
    val exact = graft.SparkEntry.queries("q44_ngram_jaccard")(spark, sf)
      .collect().map(_.toSeq)
    val prefix = graft.SparkEntry.queries("q113_prefix_filter_join")(spark, sf)
      .collect().map(_.toSeq)
    assert(exact.nonEmpty, "degenerate fixture: exact join found no pairs")
    assert(prefix.toSeq == exact.toSeq,
      "prefix-filtered join diverged from the brute-force pair set")
  }

  test("the prefix actually prunes: candidate pairs << co-shingled pairs") {
    import graft.functions.TextFunctions.{shingles, tokens}
    val ex = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("s")).as("shash"))
    def pairCount(rows: org.apache.spark.sql.DataFrame): Long = rows
      .select(col("doc_id").as("a"), col("shash"))
      .join(rows.select(col("doc_id").as("b"), col("shash")), Seq("shash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct().count()
    val allPairs = pairCount(ex)
    val df = ex.groupBy(col("shash")).agg(count(lit(1)).as("dfreq"))
    val prefixRows = ex.join(df, "shash")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("dfreq"), col("shash"))))
      .filter(col("rn") <= col("n_sh") - ceil(col("n_sh") * lit(0.19)) + lit(1))
    val candPairs = pairCount(prefixRows)
    assert(candPairs < allPairs / 2,
      s"prefix candidates $candPairs not < half of co-shingled pairs $allPairs")
  }

  test("containment catches a planted subset-dup that Jaccard misses") {
    import spark.implicits._
    // doc 1 = 10 elements, all contained in doc 2's 100: C(1→2) = 1.0
    // but Jaccard = 10/100 = 0.1 — below any sane near-dup threshold.
    val rows = ((1L to 10L).map(e => (1L, 10L, e)) ++
      (1L to 100L).map(e => (2L, 100L, e))).toDF("id", "n", "e")
    val contained = PrefixFilterJoin
      .containmentPairs(rows, "id", "n", "e", 0.8, 0.79).collect()
    assert(contained.map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3))).toSeq == Seq((1L, 2L, 10L, 1.0)),
      "subset dup not caught, or phantom/reverse-direction pair emitted")
    val jaccard = PrefixFilterJoin
      .similarPairs(rows, "id", "n", "e", 0.8, 0.79).collect()
    assert(jaccard.isEmpty, "Jaccard unexpectedly caught the subset pair " +
      "— the planted asymmetry is broken")
  }

  test("q117's probe-side prefix is lossless vs the brute-force containment join") {
    import graft.functions.TextFunctions.{shingles, tokens}
    val ex = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("s")).as("shash"))
    val brute = ex.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"),
        col("shash"))
      .join(ex.select(col("doc_id").as("doc_b"), col("shash")), Seq("shash"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("containment",
        round(col("n_common").cast("double") / col("n_a"), 6))
      .filter(col("containment") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
      .collect().map(_.toSeq)
    val pruned = graft.SparkEntry.queries("q117_containment_join")(spark, sf)
      .collect().map(_.toSeq)
    assert(brute.nonEmpty, "degenerate fixture: no containment pairs")
    assert(pruned.toSeq == brute.toSeq,
      "prefix-filtered containment diverged from brute force")
  }
}
