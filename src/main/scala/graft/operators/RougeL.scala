package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ROUGE-L scoring over candidate document pairs — the sequence-aware
  * near-dup screen instruction-tuning pipelines run (the Self-Instruct /
  * Alpaca dedup step keeps a new instruction only if its ROUGE-L
  * similarity to every kept one stays under a threshold). Set-based
  * Jaccard (q44/q46) can't see ORDER: "the cat ate the dog" vs "the dog
  * ate the cat" share every token yet differ as sequences; ROUGE-L's
  * longest-common-subsequence does, which is why the instruction-data
  * stacks standardized on it.
  *
  * LCS runs as a partition-local two-row dynamic program (O(n·m) time,
  * O(min) space) over whitespace tokens capped at [[TokenCap]] — the cap
  * bounds per-pair cost at cap² independent of document length, the same
  * discipline as q127's window cap. Precision = lcs/|b|, recall =
  * lcs/|a|, F1 = 2·lcs/(|a|+|b|) — all exact integer ppm.
  *
  * Determinism: LCS LENGTH is a pure function of the two token arrays
  * (every maximal common subsequence has the same length, so no
  * tie-break ambiguity exists — unlike extracting a witness sequence).
  * The kernel has no SQL equivalent, so the oracle re-aggregates staged
  * per-pair rows (`_q284_input`, the q277 pattern) while deriving the
  * candidate PAIR SET independently by brute force; the kernel itself is
  * spec-pinned on golden values and invariants (RougeLSpec).
  *
  * 100 TB posture: pair generation is the banded-LSH equijoin
  * ([[MinHashLSH.nearDupPairs]] — never all-pairs); each side's tokens
  * arrive by id equijoin; the DP is partition-local with bounded cost.
  */
object RougeL {

  /** Token cap per side — bounds the DP at cap² steps per pair. */
  val TokenCap = 256

  /** Whitespace tokens of `text`, first `cap` only. */
  def tokenize(text: String, cap: Int = TokenCap): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty
    else {
      val all = t.split("\\s+")
      if (all.length <= cap) all else all.take(cap)
    }
  }

  /** Length of the longest common subsequence of `a` and `b` —
    * two-row rolling DP, O(|a|·|b|) time, O(min(|a|,|b|)) space. */
  def lcsLen(a: Array[String], b: Array[String]): Int = {
    // roll over the shorter side so the scratch rows stay small
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    if (n == 0) return 0
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i < l.length) {
      val li = l(i)
      var j = 0
      while (j < n) {
        cur(j + 1) =
          if (li == s(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }

  /** Per-pair LCS measurement rows: join each (doc_a, doc_b) id pair to
    * its texts by id equijoin, then run the DP partition-locally.
    * Output: (doc_a, doc_b, n_a_tok, n_b_tok, lcs_len). */
  def lcsRows(pairs: DataFrame, docs: DataFrame,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import pairs.sparkSession.implicits._
    val txt = docs.select(col(idCol), col(textCol))
    val joined = pairs.select(col("doc_a"), col("doc_b"))
      .join(txt.select(col(idCol).as("doc_a"), col(textCol).as("text_a")),
        Seq("doc_a"))
      .join(txt.select(col(idCol).as("doc_b"), col(textCol).as("text_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("text_a"), col("text_b"))
      .as[(Long, Long, String, String)]
    joined.mapPartitions(_.map { case (a, b, ta, tb) =>
      val toks_a = tokenize(ta)
      val toks_b = tokenize(tb)
      (a, b, toks_a.length.toLong, toks_b.length.toLong,
        lcsLen(toks_a, toks_b).toLong)
    }).toDF("doc_a", "doc_b", "n_a_tok", "n_b_tok", "lcs_len")
  }
}
