package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pin for the round-15 winnowing kernel (VectorKernels.winnowPacked):
  * the compiled selection must be VALUE-IDENTICAL to the HOF formulation
  * it replaced (transform/md5/conv packing, array_min over window
  * slices, array_distinct) — the q202/q354/q358 oracles replay that math
  * in DuckDB, so any divergence is a gate hash-mismatch. The reference
  * chain is kept verbatim here (including its load-bearing LET-binding)
  * and both forms run over (a) real sf0.001 documents and (b) adversarial
  * synthetic docs: duplicate tokens, empty tokens from double spaces,
  * unicode, minimum-length docs, and all-equal-gram docs where the dedup
  * path does maximal work. */
class WinnowKernelSpec extends SparkSpec {
  import org.apache.spark.sql.{Column, DataFrame}

  private val PosBits = 1048576L
  private def hofSels(toks: Column, k: Int, w: Int): Column = {
    val vs = transform(sequence(lit(0), size(toks) - k),
      i => conv(substring(md5(concat_ws(" ",
        slice(toks, i + 1, lit(k)))), 1, 10), 16, 10).cast("long")
        * PosBits + i)
    array_distinct(flatten(transform(array(vs), arr =>
      transform(sequence(lit(0), size(arr) - w),
        i => array_min(slice(arr, i + 1, lit(w)))))))
  }

  private def assertEqualSelection(docs: DataFrame, k: Int, w: Int): Unit = {
    val toks = split(trim(col("text")), " ")
    val both = docs
      .filter(size(toks) >= k + w - 1)
      .select(col("doc_id"),
        hofSels(toks, k, w).as("hof"),
        CodegenExpressions.winnowPack(toks, k, w).as("ker"))
    val bad = both.filter(not(col("hof") === col("ker")))
    assert(bad.count() === 0, {
      val r = bad.select(col("doc_id")).limit(5).collect().mkString(",")
      s"kernel != HOF selection for docs: $r"
    })
    // guard against the vacuous pass: the corpus must select something
    assert(both.filter(size(col("ker")) > 0).count() > 0)
  }

  test("kernel selection == HOF selection on sf0.001 documents (k=3,w=4)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    assertEqualSelection(docs, k = 3, w = 4)
  }

  test("kernel selection == HOF selection on adversarial docs, several (k,w)") {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "ab", "ba", "β", "日本", "x1", "", "zz")
    val synth = (1L to 60L).map { id =>
      val n = 1 + rnd.nextInt(40)
      val toks = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (id, toks.mkString(" "))
    } ++ Seq(
      (101L, "t t t t t t t t t t"), // all grams identical → heavy dedup
      (102L, "a b c d e f"),         // exactly one window at k=3,w=4
      (103L, "a  b   c d e f g"))    // empty tokens from double spaces
    val docs = spark.createDataFrame(
      synth.map(t => org.apache.spark.sql.Row(t._1, t._2)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    assertEqualSelection(docs, k = 3, w = 4)
    assertEqualSelection(docs, k = 1, w = 2)
    assertEqualSelection(docs, k = 2, w = 7)
  }
}
