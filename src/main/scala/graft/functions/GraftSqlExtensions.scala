package graft.functions

import graft.functions.CodegenExpressions._
import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}
import org.apache.spark.sql.functions.col

/** SQL surface for the engine's custom expressions.
  *
  * The reference drives everything through `spark.sql` strings
  * (spark_job.py:37), so the library's operators must be reachable from
  * pure SQL too. Installed either at session build
  * (`spark.sql.extensions=graft.functions.GraftSqlExtensions`, the
  * SparkSessionExtensions path) or onto a live session with
  * `GraftSqlExtensions.register(spark)`.
  *
  *   dot_product(array<double>, array<double>)           → double
  *   minhash_sig(array<string>, k)                       → array<long>
  *   shingles_of(array<string>, n)                       → array<string>
  *   simhash64(array<string>)                            → long
  *   doc_fingerprint(string)                             → long
  *   lsh_buckets(array<double>, tables, bits)            → array<long>
  *   lang_id(string)                                     → string
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftSqlExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftSqlExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, fn: String): Int = e match {
    case IntegerLiteral(v) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  /** (identifier, info, builder) triples for injectFunction. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - codegen'd dot product of two double arrays"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-slot MinHash signature"),
      (args: Seq[Expression]) =>
        MinHashSigExpr(args(0), intArg(args(1), "minhash_sig"))),
    (FunctionIdentifier("shingles_of"),
      info("shingles_of", "shingles_of(tokens, n) - distinct word n-grams"),
      (args: Seq[Expression]) =>
        ShinglesExpr(args(0), intArg(args(1), "shingles_of"))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash fingerprint"),
      (args: Seq[Expression]) => SimHashExpr(args(0))),
    (FunctionIdentifier("doc_fingerprint"),
      info("doc_fingerprint", "doc_fingerprint(text) - rolling-hash fingerprint"),
      (args: Seq[Expression]) => FingerprintExpr(args(0))),
    (FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets", "lsh_buckets(emb, tables, bits) - multi-table sign-LSH bucket ids"),
      (args: Seq[Expression]) => LshBucketsExpr(args(0),
        intArg(args(1), "lsh_buckets"), intArg(args(2), "lsh_buckets"))),
    (FunctionIdentifier("lang_id"),
      info("lang_id", "lang_id(text) - char-trigram language classification"),
      (args: Seq[Expression]) => LangIdExpr(args(0))))

  /** Install onto an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (ident, inf, builder) =>
      GraftColumnBridge.registerFunction(spark, ident, inf, builder)
    }
}
