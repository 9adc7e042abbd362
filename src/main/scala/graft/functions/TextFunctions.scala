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

  /** Character-n-gram language ID: each language is profiled by a small set
    * of high-frequency character trigrams; a document scores one point per
    * profile trigram it contains and classifies to the argmax (ties break
    * to the lexicographically greatest code — deterministic). The profile
    * sets are the classic top character-trigram lists per language; this is
    * the cheap shift-invariant heuristic used to bucket web-scale corpora
    * before a real classifier runs. Pure codegen'd builtins (instr over a
    * lowercased copy). */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", " th", "he ", "ing", "and", " an", "ion", " of"),
    "de" -> Seq("der", "ein", "sch", "ich", "nde", "die", "und", "cht"),
    "fr" -> Seq("les", "ent", "que", " de", "des", "ait", "ion", " le"),
    "es" -> Seq(" de", "los", "ado", "que", "nte", " la", "ión", "ent"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  def charNgramLangId(text: Column): Column =
    CodegenExpressions.langIdCol(text)

  /** Deterministic `numHashes`-slot MinHash signature of a shingle array,
    * as one array<long> column: slot i = min over shingles of the i-th
    * member of a splitmix64-derived hash family over xxhash64(shingle).
    * Position-seeded, so signatures are stable across runs and cluster
    * layouts. One-pass codegen'd kernel (see
    * [[CodegenExpressions.MinHashSigExpr]]). */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    CodegenExpressions.minhashSig(shingleArr, numHashes)
}
