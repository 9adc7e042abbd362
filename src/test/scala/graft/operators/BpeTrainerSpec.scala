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

  /** Reference model of the BATCHED algorithm: per round, rank ALL pairs
    * by (count desc, l, r), accept up to `m` symbol-disjoint candidates
    * via the trainer's own selection rule, apply them in rank order. */
  private def refBatched(words: Map[String, Long], n: Int, m: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Seq[String], Long] =
      words.filter(_._1.length >= 2)
        .groupMapReduce { case (w, _) =>
          w.map(_.toString).toList: Seq[String] }(_._2)(_ + _)
    val out = mutable.ArrayBuffer.empty[(String, String, Long)]
    while (out.length < n) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        counts((a, b)) += f
      if (counts.isEmpty) return out.toSeq
      val ranked = counts.toSeq
        .map { case ((l, r), c) => (l, r, c) }
        .sortBy { case (l, r, c) => (-c, l, r) }
      val batch = BpeTrainer.selectCompatible(ranked, math.min(m, n - out.length))
      out ++= batch
      vocab = vocab.groupMapReduce { case (syms, _) =>
        BpeTrainer.mergeRun(syms, batch.map { case (l, r, _) => (l, r) })
      }(_._2)(_ + _)
    }
    out.toSeq
  }

  private def trainOn(words: Map[String, Long], n: Int,
      batchSize: Int = 1): Seq[(String, String, Long)] = {
    import spark.implicits._
    // expand word frequencies into documents (one word per doc suffices)
    val docs = words.toSeq.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .toDF("text")
    BpeTrainer.train(docs, "text", n, batchSize = batchSize)
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

  test("batched path matches the batched reference model on hand + random corpora") {
    val hand = Map("merger" -> 12L, "term" -> 9L, "error" -> 7L,
      "aaab" -> 20L, "aaa" -> 15L, "banana" -> 6L, "ban" -> 4L)
    for (m <- Seq(2, 4, 8))
      assert(trainOn(hand, 8, batchSize = m) == refBatched(hand, 8, m), s"m=$m")
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val words = (1 to 30).map { _ =>
        val len = 2 + rnd.nextInt(6)
        (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString ->
          (1L + rnd.nextInt(9))
      }.toMap
      assert(trainOn(words, 6, batchSize = 3) == refBatched(words, 6, 3),
        s"trial $trial")
    }
  }

  test("batchSize=1 batched path degenerates to exact sequential greedy") {
    val words = Map("abab" -> 10L, "abc" -> 8L, "cab" -> 5L, "bbbb" -> 3L)
    assert(trainOn(words, 5, batchSize = 1) == refMerges(words, 5))
  }

  test("selectCompatible accepts only pairwise symbol-disjoint candidates, in rank order") {
    val ranked = Seq(("e", "r", 100L), ("r", "s", 90L), // conflicts on 'r'
      ("t", "h", 80L), ("th", "e", 70L), // conflicts: 'th' used, 'e' used
      ("a", "b", 60L), ("c", "ab", 50L), // conflicts: merged 'ab' used
      ("x", "y", 40L))
    val got = BpeTrainer.selectCompatible(ranked, 10)
    assert(got == Seq(("e", "r", 100L), ("t", "h", 80L), ("a", "b", 60L),
      ("x", "y", 40L)))
    // merged-output collision: a candidate whose MERGED string equals an
    // accepted symbol is rejected ('s'+'t' == accepted left 'st')
    val got2 = BpeTrainer.selectCompatible(
      Seq(("st", "u", 10L), ("s", "t", 9L), ("p", "q", 8L)), 10)
    assert(got2 == Seq(("st", "u", 10L), ("p", "q", 8L)))
    // cap respected
    assert(BpeTrainer.selectCompatible(ranked, 2).length == 2)
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
