package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BpeTrainer vs an in-memory reference implementation of public BPE
  * (Sennrich et al. 2016): same word-frequency weighting, same
  * (count desc, left asc, right asc) tie-break, same greedy left-to-right
  * in-word merge. */
class BpeTrainerSpec extends SparkSpec {
  import scala.collection.mutable

  /** Reference model: exact, single-threaded. */
  private def refMerges(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Seq[String], Long] =
      words.filter(_._1.length >= 2)
        .groupMapReduce { case (w, _) =>
          w.map(_.toString).toList: Seq[String] }(_._2)(_ + _)
    val out = mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        counts((a, b)) += f
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          BpeTrainer.mergeOnce(syms, l, r)
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def trainOn(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    import spark.implicits._
    // expand word frequencies into documents (one word per doc suffices)
    val docs = words.toSeq.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .toDF("text")
    BpeTrainer.train(docs, "text", n)
      .orderBy(col("rank"))
      .collect().toSeq
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
  }

  test("matches the reference BPE on a hand corpus incl. l==r and chained merges") {
    // 'aaab' exercises the overlapping-pair greedy rule; high 'er' mass
    // forces a multi-char symbol ('er') into later merges.
    val words = Map("merger" -> 12L, "term" -> 9L, "error" -> 7L,
      "aaab" -> 20L, "aaa" -> 15L, "banana" -> 6L, "ban" -> 4L)
    assert(trainOn(words, 8) == refMerges(words, 8))
  }

  test("matches the reference BPE on pseudo-random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val words = (1 to 30).map { _ =>
        val len = 2 + rnd.nextInt(6)
        (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString ->
          (1L + rnd.nextInt(9))
      }.toMap
      assert(trainOn(words, 6) == refMerges(words, 6), s"trial $trial")
    }
  }

  test("merge counts are non-increasing across rounds") {
    // merging the argmax pair can only create pairs no more frequent
    // than the one just consumed
    val words = Map("abab" -> 10L, "abc" -> 8L, "cab" -> 5L, "bbbb" -> 3L)
    val counts = trainOn(words, 5).map(_._3)
    assert(counts == counts.sortBy(-_))
  }

  test("encode round-trips: concat(tokens) per word == the original words") {
    import spark.implicits._
    val docs = Seq("merger term error", "banana ban term").toDF("text")
    val merges = BpeTrainer.train(docs, "text", 4)
    val enc = BpeTrainer.encode(docs, "text", merges)
      .select(col("text"), concat_ws("", col("tokens")).as("glued"))
      .collect()
    enc.foreach { r =>
      assert(r.getString(1) == r.getString(0).trim.replace(" ", ""))
    }
    // and at least one learned merge actually fires in encoding
    val toks = BpeTrainer.encode(docs, "text", merges)
      .select(explode(col("tokens")).as("t")).collect().map(_.getString(0))
    assert(toks.exists(_.length >= 2))
  }
}
