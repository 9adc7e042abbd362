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

  /** Content-defined chunk boundary positions (FastCDC/rsync family):
    * 1-based positions i ∈ [w, len] where the w-char window ending at i
    * hashes into the cut class (md5 hex leading '0' → P = 1/16, mean
    * chunk ≈ 16 + w/2 chars), plus the end-of-text sentinel. Boundaries
    * depend only on the local w chars, never on the offset — so an edit
    * re-chunks O(1) chunks and every chunk after the edit window is
    * byte-identical (shift-resistant dedup, unlike fixed-size chunking
    * where one inserted byte shifts every later chunk). Whole computation
    * is one per-row expression tree (filter over a position sequence) —
    * no char-level row explosion. Empty text → [ ] (caller treats the
    * doc as chunkless); len < w → just the sentinel (one whole-doc chunk).
    */
  def cdcBoundaries(text: Column, w: Int): Column = {
    val len = length(text)
    val hashCuts = filter(
      when(len >= w, sequence(lit(w), len)).otherwise(array().cast("array<int>")),
      i => substring(md5(text.substr(i - lit(w - 1), lit(w))), 1, 1) === "0")
    // last cut == len ⇔ array_max == len (cuts ascend); array_max is
    // null-safe on the empty array, unlike ANSI element_at(-1)
    when(len === 0, array().cast("array<int>"))
      .otherwise(
        when(array_max(hashCuts) === len, hashCuts)
          .otherwise(concat(hashCuts, array(len))))
  }

  /** Content-defined chunks as array<struct<idx int, ch string>> — the
    * text split at [[cdcBoundaries]]. */
  def cdcChunks(text: Column, w: Int): Column = {
    val bs = cdcBoundaries(text, w)
    // sequence(1, 0) would DESCEND, not come back empty — guard size 0
    when(size(bs) === 0, array().cast("array<struct<idx:int,ch:string>>"))
      .otherwise(transform(sequence(lit(1), size(bs)), j =>
        struct(j.as("idx"),
          text.substr(
            when(j === 1, lit(0)).otherwise(element_at(bs, j - 1)) + 1,
            element_at(bs, j) -
              when(j === 1, lit(0)).otherwise(element_at(bs, j - 1))).as("ch"))))
  }

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
