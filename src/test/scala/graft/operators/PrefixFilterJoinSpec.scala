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
}
