package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Properties of the round-5 retrieval/warehouse queries beyond the DuckDB
  * hash gate: BM25 ranking sanity (q94), hard-negative label contract
  * (q97), and SCD-2 interval-chain integrity (q96). */
class RetrievalSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("q94: BM25 scores are positive and bounded by the query size") {
    val rows = run("q94_bm25_topk").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_terms_hit") >= 1L &&
        r.getAs[Long]("n_terms_hit") <= 4L)
      assert(r.getAs[Double]("score") > 0d)
    }
    // results arrive ranked: scores non-increasing
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sortBy(-_))
  }

  test("q97: every mined negative has a label different from its query's") {
    val qLabel = graft.core.Tables.embeddings(spark, sf)
      .filter("vec_id < 10").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = run("q97_hard_negatives").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("neg_label") != qLabel(r.getAs[Long]("qid")))
    }
  }

  test("q96: SCD-2 intervals chain per user and cover every event") {
    val rows = run("q96_scd2_intervals").collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      // versions are 1..n dense
      assert(sorted.map(_.getAs[Long]("version")).toSeq ==
        (1L to sorted.length).toSeq)
      // each version's valid_to == next version's valid_from; last is open
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"))
          // consecutive versions always change type (runs are maximal)
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"))
        case _ =>
      }
      assert(sorted.last.get(sorted.last.fieldIndex("valid_to")) == null)
    }
    // n_events rolls up to the slice's event count
    val total = rows.map(_.getAs[Long]("n_events")).sum
    val expected = graft.core.Tables.events(spark, sf)
      .filter("user_id < 20").count()
    assert(total == expected)
  }

  test("q114: RRF scores replay from the arm ranks; fusion mixes arms") {
    val rows = run("q114_hybrid_rrf").collect()
    assert(rows.length == 20)
    def rank(r: Row, c: String): Option[Long] =
      Option(r.getAs[java.lang.Long](c)).map(_.longValue)
    // the fused score is exactly sum of 9-dp-rounded 1/(60+rank) terms
    rows.foreach { r =>
      val expected = Seq(rank(r, "lex_rank"), rank(r, "dense_rank")).flatten
        .map(k => BigDecimal(1.0 / (60 + k))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(r.getAs[Double]("rrf_score") == expected,
        s"RRF replay diverged on doc ${r.getAs[Long]("doc_id")}")
    }
    // arrives ranked
    val scores = rows.map(_.getAs[Double]("rrf_score")).toSeq
    assert(scores == scores.sortBy(-_))
    // fusion genuinely mixes: both-arm docs present AND each arm
    // contributes at least one exclusive doc to the top 20
    assert(rows.exists(r => rank(r, "lex_rank").isDefined &&
      rank(r, "dense_rank").isDefined))
    assert(rows.exists(r => rank(r, "lex_rank").isEmpty))
    assert(rows.exists(r => rank(r, "dense_rank").isEmpty))
    // every rank is a valid top-50 position
    rows.foreach { r =>
      Seq(rank(r, "lex_rank"), rank(r, "dense_rank")).flatten
        .foreach(k => assert(k >= 1 && k <= 50))
    }
  }

  test("q115: the greedy MMR trace replays exactly in memory") {
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // same sequential-fold arithmetic as VectorFunctions.dot/cosine
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val vecs = graft.core.Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    val q = vecs(0L)
    val cand = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, round9(cos(q, v)), v) }
      .sortBy { case (id, rel, _) => (-rel, id) }.take(20)
    var selected = Vector(cand.minBy { case (id, rel, _) => (-rel, id) })
    var mmrs = Vector(selected.head._2) // rank-1 mmr = rel
    while (selected.length < 5) {
      val picked = selected.map(_._1).toSet
      val next = cand.filterNot(c => picked(c._1)).map { case (id, rel, v) =>
        val maxS = selected.map(s => round9(cos(v, s._3))).max
        (id, rel, v, round9(0.7 * rel - 0.3 * maxS))
      }.minBy { case (id, _, _, mmr) => (-mmr, id) }
      selected :+= ((next._1, next._2, next._3))
      mmrs :+= next._4
    }
    val rows = run("q115_mmr_rerank").collect()
    assert(rows.map(_.getAs[Long]("sel_rank")).toSeq == (1L to 5L))
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq ==
      selected.map(_._1), "greedy pick sequence diverged")
    assert(rows.map(_.getAs[Double]("mmr")).toSeq == mmrs,
      "MMR objective values diverged")
    // diversification is real on this corpus: the picks are not simply
    // the top-5 by relevance
    assert(rows.map(_.getAs[Long]("vec_id")).toSet !=
      cand.take(5).map(_._1).toSet,
      "MMR never traded relevance for diversity — degenerate test corpus")
  }
}
