package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline, written as
  * pure Column expressions (codegen'd higher-order functions — no Scala
  * UDFs, so everything stays inside whole-stage codegen and scales with the
  * executors).
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word-level n-gram shingles (distinct, first-occurrence order), e.g.
    * n=3 for dedup. Empty array when the document has fewer than n tokens.
    * Compiled one-pass kernel (see [[CodegenExpressions.ShinglesExpr]]);
    * semantically identical to
    * `array_distinct(transform(sequence(...), concat_ws(" ", ...)))`. */
  def shingles(toks: Column, n: Int): Column =
    CodegenExpressions.shingleArr(toks, n)

  /** Deterministic polynomial rolling hash over characters (Karp-Rabin
    * style, base 31 mod 1e9+7) — document fingerprint reproducible in any
    * engine, unlike Spark-internal hash functions. Compiled kernel (see
    * [[CodegenExpressions.FingerprintExpr]]). */
  def fingerprint(text: Column): Column =
    CodegenExpressions.fingerprintCol(text)

  /** Count of tokens present in `words`. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Deterministic `numHashes`-slot MinHash signature of a shingle array,
    * as one array<long> column: slot i = min over shingles of the i-th
    * member of a splitmix64-derived hash family over xxhash64(shingle).
    * Position-seeded, so signatures are stable across runs and cluster
    * layouts. One-pass codegen'd kernel (see
    * [[CodegenExpressions.MinHashSigExpr]]). */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    CodegenExpressions.minhashSig(shingleArr, numHashes)
}
