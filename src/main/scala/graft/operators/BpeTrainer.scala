package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the missing
  * piece between the corpus-statistics queries (q69 vocab, q95 merges) and
  * an actual trainable tokenizer a 100 TB pipeline would fit before
  * pre-tokenizing its corpus.
  *
  * Algorithm (Sennrich et al. 2016, the public BPE formulation): start from
  * per-word character sequences weighted by corpus frequency; repeatedly
  * (1) count adjacent symbol pairs, (2) merge the globally most frequent
  * pair (ties broken lexically for determinism) everywhere it occurs,
  * greedy left-to-right within each word.
  *
  * 100 TB posture: the corpus is touched EXACTLY ONCE (word-frequency
  * aggregation — one hash-partitioned shuffle of (word, 1) pairs with
  * map-side combine). Every training iteration thereafter operates on the
  * VOCABULARY table (distinct words), which is ~10^5–10^7 rows regardless
  * of corpus size — Heaps' law, not corpus-linear. Per round the driver
  * receives exactly one (l, r, cnt) row (the argmax — scalar coordination,
  * not data movement), and the vocabulary is localCheckpoint'd so the
  * iterative plan's lineage stays O(1) instead of O(rounds). The greedy
  * in-word merge is a JVM kernel over the vocab table only — it never runs
  * over corpus rows, so it is deliberately NOT on any per-document hot path
  * (corpus-side encoding below amortizes all merges into one pass).
  */
object BpeTrainer {

  /** Greedy left-to-right single-pair merge — the public BPE inner step. */
  private[graft] def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` BPE merges from whitespace-tokenized `textCol`.
    * Words shorter than `minWordLen` chars carry no pairs and are dropped
    * up front. Returns the ordered merge table:
    * (rank, left_sym, right_sym, merged, cnt) — `cnt` is the corpus-wide
    * occurrence count of the pair at the moment it was chosen.
    */
  def train(corpus: DataFrame, textCol: String, nMerges: Int,
      minWordLen: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val mergeKernel = udf((syms: Seq[String], l: String, r: String) =>
      mergeOnce(syms, l, r))

    // The single corpus-sized job: word frequencies.
    var vocab = corpus
      .select(explode(split(trim(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) >= minWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(split(col("word"), "").as("syms"), col("freq"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (rank <- 1 to nMerges) {
      // Adjacent-pair counts over the vocab, weighted by word frequency.
      val best = vocab.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect() // one scalar row per round, by design
      if (best.isEmpty) {
        return merges.result()
          .toDF("rank", "left_sym", "right_sym", "merged", "cnt")
      }
      val Row(l: String, r: String, cnt: Long) = best(0)
      merges += ((rank.toLong, l, r, l + r, cnt))
      vocab = vocab
        .withColumn("syms", mergeKernel(col("syms"), lit(l), lit(r)))
        .localCheckpoint() // truncate iterative lineage; vocab-sized
    }
    merges.result().toDF("rank", "left_sym", "right_sym", "merged", "cnt")
  }

  /** Encode a corpus with a learned merge table: one corpus pass, all
    * merges applied in rank order per word (the standard BPE encode).
    * Adds `tokens: array<string>` — concat(tokens per word) == the word.
    */
  def encode(corpus: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val ranked: Seq[(String, String)] = merges
      .orderBy(col("rank"))
      .select(col("left_sym"), col("right_sym"))
      .collect().toSeq // merge table: nMerges rows, driver-sized by nature
      .map(r => (r.getString(0), r.getString(1)))
    val sc = corpus.sparkSession.sparkContext
    val bcast = sc.broadcast(ranked)
    val encodeKernel = udf((text: String) =>
      text.trim.split(" ").toSeq.flatMap { w =>
        bcast.value.foldLeft(w.split("").toSeq) { case (syms, (l, r)) =>
          mergeOnce(syms, l, r)
        }
      })
    corpus.withColumn("tokens", encodeKernel(col(textCol)))
  }
}
