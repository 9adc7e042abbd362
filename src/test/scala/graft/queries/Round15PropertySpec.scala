package graft.queries

import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions.{cosine, vec64}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 statistic pins (the standing rule: every new statistic gets
  * an independent closed-form or cross-paradigm check).
  */
class Round15PropertySpec extends SparkSpec {

  test("q357 margin: quantized rank-5/rank-6 cosine boundary is not a near-tie") {
    // Round-14 ADVICE: q357 ranks by cosine over dequantized DOUBLES, so
    // cross-engine hash agreement rests on Spark and DuckDB computing
    // the same double at the top-5 boundary. This pin measures the
    // boundary margin — min over queries of (cos@rank5 − cos@rank6) in
    // the quantized ranking, ties broken by vec_id exactly as the gate
    // breaks them — and asserts it sits orders of magnitude above
    // double-rounding noise (~1e-15 on a 64-dim dot), so an engine
    // disagreement would need a corpus with a genuine geometric tie,
    // not an ulp. Bound chosen from measurement: sf0.001 ≈ 2.3e-3,
    // sf0.01 ≈ 7.9e-4 (denser corpora pack the top-k closer; 1e-5
    // leaves two decades of slack above rounding at both SFs).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), vec64(col("embedding")).as("e"))
        .localCheckpoint(false)
      val quant = Vectors.int8Dequant(emb)
      val qs = quant.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("qid"), col("r").as("rq"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("qcos").desc, col("vec_id"))
      val minMargin = quant
        .join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          cosine(col("rq"), col("r")).as("qcos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 5 || col("rn") === 6)
        .groupBy(col("qid"))
        .agg((max(when(col("rn") === 5, col("qcos")))
          - max(when(col("rn") === 6, col("qcos")))).as("m"))
        .agg(min(col("m")).as("mm"))
        .head().getDouble(0)
      info(s"$dir: min rank5-rank6 quantized-cosine margin = $minMargin")
      assert(minMargin > 1e-5,
        s"$dir: quantized top-5 boundary margin $minMargin is within " +
          "double-rounding distance — the q357 hash is tie-fragile here")
    }
  }

  test("q358 interval merge: removed tokens equal an independent Scala merge") {
    // Cross-paradigm check of the window-based interval sweep: rebuild
    // the cut intervals from the shared runs operator, merge them with
    // plain Scala interval arithmetic, and compare per-doc removed
    // counts against the gate's output.
    import graft.operators.Winnowing
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, dir)
    val runs = Winnowing.sharedRuns(
      Winnowing.fingerprints(docs, "doc_id", "text", k = 3, w = 4),
      maxDocsPerFp = 50, gap = 4, k = 3)
    val cuts = runs.filter(col("run_tokens") >= 8L)
      .select(col("doc_b").as("doc_id"),
        (col("p0") + col("diag")).as("s"),
        (col("p0") + col("diag") + col("run_tokens")).as("e"))
      .distinct().collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).sorted)
      .toMap
    val lens = docs
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def merge(iv: Seq[(Long, Long)], cap: Long): Long = {
      var removed = 0L; var s = -1L; var e = -1L
      iv.foreach { case (a, b) =>
        if (a > e) { if (e >= 0) removed += math.min(e, cap) - s; s = a; e = b }
        else e = math.max(e, b)
      }
      if (e >= 0) removed += math.min(e, cap) - s
      removed
    }
    val want = cuts.map { case (d, iv) => d -> merge(iv, lens(d)) }
    val got = Dedup.defs.toMap.apply("q358_exactsubstr_dedup")
      .build(spark, dir)
      .select(col("doc_id"), col("removed_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (d, r) =>
      assert(got(d) == r, s"doc $d: gate removed ${got(d)}, Scala merge $r")
    }
    assert(want.nonEmpty, "no cut docs at sf0.01 — the gate tests nothing")
  }

  test("q359 selection law: the target language dominates at the sweep density") {
    // The gate's whole point: en (the target distribution) must carry
    // both the highest mean importance score and the highest selection
    // rate. Pinned at sf0.01 where the sweeps run (measured: en mean
    // 957,930 ppm / rate 293,577 vs next-best 955,267 / 260,273).
    val out = Training.defs.toMap.apply("q359_importance_resample")
      .build(spark, "/root/testdata/sf0.01")
      .select(col("lang"), col("mean_score_ppm"), col("sel_rate_ppm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val en = out.find(_._1 == "en").get
    out.filter(_._1 != "en").foreach { case (l, m, s) =>
      assert(en._2 > m, s"en mean score ${en._2} not above $l's $m")
      assert(en._3 > s, s"en selection rate ${en._3} not above $l's $s")
    }
  }

  test("q360 TVD: drift statistic equals an independent Scala recount") {
    // Cross-paradigm check: recompute the temporal split, both censuses
    // and the floor-div TVD from raw collected events (sf0.001, 600
    // rows) with plain Scala arithmetic.
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"), col("event_type"),
        expr("CAST(FLOOR(value / 10) AS BIGINT)").as("vband"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    def tvd[K](key: ((Long, String, Long)) => K): Long = {
      val ref = ev.filter(_._1 <= mid).groupBy(key).view.mapValues(_.size.toLong)
      val cur = ev.filter(_._1 > mid).groupBy(key).view.mapValues(_.size.toLong)
      val (rt, ct) = (ref.values.sum, cur.values.sum)
      val ks = (ref.keySet ++ cur.keySet).toSeq
      ks.map { k =>
        math.abs(ref.getOrElse(k, 0L) * 1000000L / rt -
          cur.getOrElse(k, 0L) * 1000000L / ct)
      }.sum / 2
    }
    val got = Insights.defs.toMap.apply("q360_drift_certificate")
      .build(spark, dir)
      .select(col("dim"), col("tvd_ppm")).distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("event_type") == tvd(_._2))
    assert(got("value_band") == tvd(_._3))
  }

  test("q362 margin law: scorer and mining rule match a Scala recount " +
      "on hand-built candidate lists") {
    // Cross-paradigm pin of the ratio-margin law on a candidate table
    // small enough to verify by hand, including the closed-form corner:
    // an ISOLATED mutual pair (each side's only candidate) has margin
    // exactly c·(1+1)·10⁶ div (c+c) = 10⁶ — ratio 1.0, below any real
    // threshold — so isolated coincidences can never be mined, whatever
    // their raw cosine. Margins recomputed in plain Scala BigInt
    // arithmetic; the mining rule checked against the hand-derived
    // mutual-argmax set.
    import spark.implicits._
    val k = 4
    val pairs = Seq(
      (1L, 101L, 900L), (1L, 102L, 400L), (1L, 103L, 380L),
      (2L, 101L, 410L), (2L, 102L, 420L), (2L, 103L, 950L),
      (3L, 104L, 999L)).toDF("id_a", "id_b", "c")
    val raw = Seq(
      (1L, 101L, 900L), (1L, 102L, 400L), (1L, 103L, 380L),
      (2L, 101L, 410L), (2L, 102L, 420L), (2L, 103L, 950L),
      (3L, 104L, 999L))
    def topSum(xs: Seq[Long]): (Long, Long) = {
      val t = xs.sorted(Ordering[Long].reverse).take(k)
      (t.size.toLong, t.sum)
    }
    val expected = raw.map { case (a, b, c) =>
      val (ka, suma) = topSum(raw.filter(_._1 == a).map(_._3))
      val (kb, sumb) = topSum(raw.filter(_._2 == b).map(_._3))
      (a, b) -> (BigInt(c) * (ka + kb) * 1000000 / (suma + sumb)).toLong
    }.toMap
    val got = Vectors.ratioMarginScore(pairs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got((3L, 104L)) == 1000000L,
      "isolated-pair margin must be exactly 1.0 (10^6 ppm)")
    val mined = Vectors.mineMutualArgmax(
        Vectors.ratioMarginScore(pairs, k), 1200000L)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Hand-derived: (1,101) and (2,103) are each other's margin argmax
    // and above threshold; (3,104) is mutual but sits at exactly 10^6.
    assert(mined == Set((1L, 101L), (2L, 103L)))
  }

  test("q364 allocation: epochs and effective tokens equal an " +
      "independent Scala recount") {
    // Cross-paradigm check: recompute the whole data-constrained
    // allocation from raw collected documents (sf0.001) with plain
    // Scala BigInt rationals — per-source token counts, the level fill,
    // the (n DESC, source) greedy partial, and each source's effective
    // tokens as the EXACT geometric sum n·10⁶·Σ(3/4)^i floored once
    // (the same rational the gate's closed form floors) — and compare
    // per-source epochs and eff_micro against the gate's output.
    val dir = "/root/testdata/sf0.001"
    val n = Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) ->
        r.getString(1).trim.split(" ", -1).length.toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val t = n.values.sum
    val b = 5 * t / 2
    val f = math.min(6L, b / t)
    val p = b - f * t
    // greedy partial picks: (n desc, source) while whole sources fit
    var cum = 0L
    val picked = n.toSeq.sortBy { case (s, v) => (-v, s) }.map {
      case (s, v) => cum += v; s -> (cum <= p)
    }.toMap
    def effMicro(tok: Long, k: Long): Long = {
      if (k == 0) 0L
      else {
        val p4 = BigInt(4).pow(k.toInt); val p3 = BigInt(3).pow(k.toInt)
        (BigInt(tok) * 1000000 * (p4 - p3) / (p4 / 4)).toLong
      }
    }
    val expected = n.map { case (s, v) =>
      val k = f + (if (picked(s)) 1 else 0)
      val full = effMicro(v, f)
      val part = if (picked(s))
        (BigInt(v) * BigInt(3).pow(f.toInt) * 1000000
          / BigInt(4).pow(f.toInt)).toLong else 0L
      s -> (k, full + part)
    }
    val got = Mixing.defs.toMap.apply("q364_epoch_allocation")
      .build(spark, dir)
      .select(col("source"), col("epochs"), col("eff_micro")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("q365 stride schedule: on a balanced corpus every source runs " +
      "at length 1 with gaps exactly |sources|") {
    // Closed form: with equal per-source counts n and any per-source
    // phase offsets, each unit stride [(i)/n, (i+1)/n) contains exactly
    // ONE doc of every source, so no source can appear twice in a row
    // (max run = 1) and consecutive occurrences of a source are exactly
    // |sources| positions apart — whatever the md5 offsets draw, ties
    // included. The testdata corpus is balanced at every SF, so the law
    // must hold exactly; an unbalanced corpus would shift gaps, never
    // runs past ceil(n_max/n_min).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val rows = Mixing.defs.toMap.apply("q365_interleave_order")
        .build(spark, dir).collect()
      val counts = rows.map(_.getAs[Long]("n_docs")).distinct
      assert(counts.length == 1, s"$dir: fixture no longer balanced")
      val nSources = rows.length.toLong
      rows.foreach { r =>
        assert(r.getAs[Long]("max_run_spread") == 1L, s"$dir clump")
        assert(r.getAs[Long]("max_gap_spread") == nSources &&
          r.getAs[Long]("min_gap_spread") == nSources,
          s"$dir: gap != |sources| for ${r.getAs[String]("source")}")
      }
    }
  }
}
