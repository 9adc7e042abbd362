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

  /** Word-level n-gram shingles (distinct), e.g. n=3 for dedup.
    * Empty array when the document has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    // sequence(1, k) with k < 1 would count DOWN in Spark — guard short docs.
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)), i => concat_ws(" ",
          (0 until n).map(o => element_at(toks, i + o)): _*))))

  /** Deterministic polynomial rolling hash over characters (Karp-Rabin
    * style, base 31 mod 1e9+7) — document fingerprint reproducible in any
    * engine, unlike Spark-internal hash functions. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c)),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Count of tokens present in `words`. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** 64 deterministic min-hash values of a shingle array: h_i = min over
    * shingles of xxhash64(i, shingle). Seeded by position, so signatures
    * are stable across runs and cluster layouts. */
  def minhashSignature(shingleArr: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      array_min(transform(shingleArr, s => xxhash64(lit(i), s)))
    }
}
