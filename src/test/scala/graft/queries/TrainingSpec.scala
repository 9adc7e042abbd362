package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Semantic checks for the training-data assembly queries (q83–q87) —
  * the oracle gate proves engine-parity at sf0.01; these prove the
  * *semantics* are the intended ones by recomputing tiny cases in plain
  * Scala on the driver.
  */
class TrainingSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf).collect()

  private lazy val docs = spark.read
    .parquet(s"$sf/documents.parquet")
    .select("doc_id", "text", "lang", "n_chars")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("q83: repetition stats match a driver-side recount on every doc") {
    val rows = run("q83_repetition_stats")
    val byDoc = docs.map { case (id, text, _, _) => id -> text.trim.split(" ").toSeq }.toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = byDoc(r.getLong(0))
      assert(r.getLong(1) == toks.size, "n_tokens")
      assert(r.getLong(2) == toks.distinct.size, "n_distinct")
      val grams = toks.zip(toks.tail).map { case (a, b) => s"$a $b" }
      val top = grams.groupBy(identity).view.mapValues(_.size)
        .toSeq.sortBy { case (g, n) => (-n, g) }.head
      assert(r.getString(4) == top._1, s"top_bigram for doc ${r.getLong(0)}")
      assert(r.getLong(5) == top._2, "top_bigram_n")
      val frac = BigDecimal(top._2.toDouble / (toks.size - 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(6) - frac) < 1e-9, "top_bigram_frac")
    }
  }

  test("q84: attrition counts are consistent and match a driver-side dedup") {
    val rows = run("q84_incremental_dedup")
    val incoming = docs.filter { case (id, _, _, _) => id % 10 < 3 }
    val corpusSigs = docs.filter { case (id, _, _, _) => id % 10 >= 3 }
      .map(_._2).toSet // exact text equality ≡ md5 equality here
    val batchUnique = incoming.groupBy(_._2).values.map(_.minBy(_._1)).toSeq
    val kept = batchUnique.filterNot(d => corpusSigs.contains(d._2))
    assert(rows.map(_.getLong(1)).sum == incoming.size, "Σ n_incoming")
    assert(rows.map(_.getLong(2)).sum == batchUnique.size, "Σ n_batch_unique")
    assert(rows.map(_.getLong(3)).sum == kept.size, "Σ n_kept")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1),
        s"kept ≤ batch_unique ≤ incoming violated for ${r.getString(0)}")
    }
  }

  test("bloom-fronted anti-join ≡ plain left_anti on planted collisions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 400 batch keys, half colliding with the corpus, plus a null key
    // (left_anti keeps nulls; the front must route them to the keep
    // branch, not probe the filter). High fpp + tiny filter makes false
    // positives near-certain, exercising the join-resolves-maybes path.
    val batch = ((0 until 400).map(i => (i.toLong, s"k$i")) :+ (999L, null))
      .toDF("id", "sig")
    val corpus = (0 until 200).map(i => s"k${i * 2}").toDF("sig")
    val plain = batch.join(corpus, Seq("sig"), "left_anti")
    for (fpp <- Seq(0.5, 0.01)) {
      val fronted = graft.operators.BloomFront.antiJoin(batch, corpus, "sig", fpp = fpp)
      assert(fronted.columns.toSeq == plain.columns.toSeq)
      val a = fronted.collect().map(r => (Option(r.getString(0)), r.getLong(1))).sortBy(_._2)
      val b = plain.collect().map(r => (Option(r.getString(0)), r.getLong(1))).sortBy(_._2)
      assert(a.sameElements(b), s"bloom path diverged at fpp=$fpp")
    }
    // No false negatives: every corpus key must probe true.
    val bf = corpus.stat.bloomFilter("sig", 200, 0.01)
    val bytes = { val o = new java.io.ByteArrayOutputStream(); bf.writeTo(o); o.toByteArray }
    val probed = corpus.withColumn("hit",
      graft.functions.CodegenExpressions.bloomMightContain(col("sig"), bytes))
    assert(probed.filter(!col("hit")).count() == 0L)
    // Empty corpus degenerates to the batch unchanged.
    val empty = corpus.filter(col("sig") === "nope")
    assert(graft.operators.BloomFront.antiJoin(batch, empty, "sig").count() == batch.count())
    // A caller ESTIMATE of 0 (stale stats) must not skip the join: the
    // contract is that a bad estimate only moves the fpp. Duplicates must
    // still be removed.
    val estimatedZero = graft.operators.BloomFront
      .antiJoin(batch, corpus, "sig", expectedItems = Some(0L))
    val p = plain.collect().map(r => (Option(r.getString(0)), r.getLong(1))).sortBy(_._2)
    val z = estimatedZero.collect().map(r => (Option(r.getString(0)), r.getLong(1))).sortBy(_._2)
    assert(z.sameElements(p), "estimated-zero corpus skipped the anti-join")
  }

  test("q85: every stratum picks exactly min(target, available)") {
    val rows = run("q85_mixture_resample")
    val targets = Map("en" -> 100L, "de" -> 40L, "es" -> 30L, "fr" -> 20L, "zh" -> 10L)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, tgt, avail, picked) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tgt == targets(lang), s"n_target for $lang")
      assert(picked == math.min(tgt, avail), s"n_picked for $lang")
    }
  }

  test("q87: packing recomputes exactly driver-side; overflow stays bounded") {
    val rows = run("q87_sequence_packing")
    val C = 2048L
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val items = docs.map { case (id, text, _, _) =>
      val pick = md5hex(id.toString + text)
      ((pick.head.toInt % 4).toLong, pick, id, text.trim.split(" ").length.toLong)
    }
    // Greedy contiguous packing per shard in (pick, doc_id) order: a doc
    // lands in the pack its EXCLUSIVE running token sum falls in.
    val expected = items.groupBy(_._1).toSeq.flatMap { case (shard, its) =>
      var cum = 0L
      its.sortBy(t => (t._2, t._3)).map { case (_, _, id, n) =>
        val pack = cum / C
        cum += n
        (shard, pack, id, n)
      }
    }
    val expStats = expected.groupBy(t => (t._1, t._2)).map { case ((sh, p), g) =>
      (sh, p) -> ((g.size.toLong, g.map(_._4).sum, g.map(_._3).min, g.map(_._3).max))
    }
    assert(rows.nonEmpty && rows.length == expStats.size)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (nDocs, tot, mn, mx) = expStats(key)
      assert(r.getLong(2) == nDocs && r.getLong(3) == tot &&
        r.getLong(5) == mn && r.getLong(6) == mx, s"pack $key")
    }
    // Bounded overflow: a pack never exceeds capacity by more than the
    // largest single document (the straddling doc stays in its pack).
    val maxDocTokens = items.map(_._4).max
    rows.foreach(r => assert(r.getLong(3) < C + maxDocTokens, "overflow bound"))
  }

  test("q88: unigram nll recomputes driver-side on every doc") {
    val rows = run("q88_unigram_logprob")
    val toks = docs.map { case (id, text, lang, _) =>
      (id, lang, text.trim.split(" ").toSeq)
    }
    val counts = toks.flatMap(_._3).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val nTotal = toks.map(_._3.size.toLong).sum.toDouble
    assert(rows.length == docs.length)
    val byId = toks.map(t => t._1 -> t).toMap
    rows.foreach { r =>
      val (id, lang, n, nll, flagged) = (r.getLong(0), r.getString(1),
        r.getLong(2), r.getDouble(3), r.getBoolean(4))
      val (_, wantLang, ts) = byId(id)
      assert(lang == wantLang && n == ts.size, s"doc $id lang/n_tokens")
      val per = ts.map(t => BigDecimal(math.log(nTotal / counts(t)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP))
      val want = BigDecimal(per.sum.toDouble / ts.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(nll - want) < 1e-9, s"avg_nll for doc $id")
      assert(flagged == (nll > 3.5), s"flagged for doc $id")
    }
  }

  test("q86: scores recompute and rank correctly per doc") {
    val rows = run("q86_tfidf_topk")
    val n = docs.size.toDouble
    val tf = docs.flatMap { case (id, text, _, _) =>
      text.trim.split(" ").map(t => (id, t))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(rows.nonEmpty && rows.length <= 30)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(scores.sameElements(scores.sortBy(-(_: Double))), "rn follows score desc")
    }
    rows.foreach { r =>
      val (id, term) = (r.getLong(0), r.getString(2))
      assert(r.getLong(3) == tf((id, term)), "tf")
      assert(r.getLong(4) == df(term), "df")
      val want = BigDecimal(tf((id, term)) * math.log(n / df(term)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - want) < 1e-9, s"tfidf for ($id,$term)")
    }
  }
}
