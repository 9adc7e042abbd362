package graft.queries

import graft.SparkSpec

/** Semantic checks for the corpus mining & selection queries (q124–q128).
  * The oracle gate proves engine-parity at sf0.01; these prove the
  * semantics are the intended ones by recomputing small cases in plain
  * Scala on the driver — including a full fixed-point k-means replay and
  * a brute-force skyline model against the grid-pruned operator.
  */
class MiningSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf).collect()

  private lazy val docs = spark.read
    .parquet(s"$sf/documents.parquet")
    .select("doc_id", "text", "source")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- skyline operator vs brute-force model ----

  test("skyline ≡ brute-force dominance on seeded data with ties and dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // clustered values force populated NE cells; duplicates + axis ties
    // exercise the "equal is not dominated" rule.
    val pts = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)
    } ++ Seq((401L, 49L, 49L), (402L, 49L, 49L), (403L, 0L, 0L))
    val df = pts.toDF("id", "x0", "y0")
    val got = Mining.skyline(df, "x0", "y0")
      .collect().map(r => r.getLong(0)).toSet
    val model = pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py)
      }
    }.map(_._1).toSet
    assert(got == model)
    assert(got.contains(401L) && got.contains(402L),
      "duplicate maximal points must BOTH be in the skyline")
  }

  test("skyline handles a degenerate axis (all y equal)") {
    import spark.implicits._
    val pts = Seq((1L, 3L, 5L), (2L, 9L, 5L), (3L, 9L, 5L), (4L, 1L, 5L))
    val got = Mining.skyline(pts.toDF("id", "x0", "y0"), "x0", "y0")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  // ---- q124: fixed-point k-means vs a driver-side replay ----

  test("q124: full fixed-point replay matches on the sf0.001 embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000000L).toLong).toArray))
      .sortBy(_._1)
    val k = 8
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assignAll(cents: Seq[(Long, Array[Long])]) =
      emb.map { case (id, v) =>
        val (cid, d) = cents.map { case (c, cv) => (c, dist(v, cv)) }
          .minBy { case (c, d) => (d, c) }
        (id, cid, d)
      }
    var cents = emb.take(k).map { case (id, v) => (id, v) }.toSeq
    var assigned = assignAll(cents)
    // one centroid update (iters = 2 → update once, assign twice)
    cents = assigned.groupBy(_._2).toSeq.map { case (cid, rows) =>
      val vs = rows.map(r => emb(r._1.toInt)._2)
      val d = vs.head.length
      (cid, Array.tabulate(d) { i =>
        math.floor(vs.map(_(i)).sum.toDouble / vs.size).toLong
      })
    }.sortBy(_._1)
    assigned = assignAll(cents)
    val model = assigned.groupBy(_._2).toSeq.map { case (cid, rows) =>
      (cid, rows.size.toLong, rows.map(_._3).sum,
        rows.map(_._1).min, rows.map(_._1).max)
    }.sortBy(_._1)
    val got = run("q124_kmeans_fixedpoint")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == model)
  }

  // ---- q125: grouped split ----

  test("q125: split is group-atomic, exhaustive, and md5-reproducible") {
    val rows = run("q125_grouped_split")
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    assert(rows.map(_.getLong(5)).forall(_ == 0L), "leaked_sources must be 0")
    assert(rows.map(_.getLong(2)).sum == docs.length, "splits partition the corpus")
    // driver-side replay of the bucket rule
    def split(source: String): String = {
      val b = java.lang.Long.parseLong(md5hex(source).take(8), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val model = docs.groupBy { case (_, _, s) => split(s) }
      .view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(model(r.getString(0)) == r.getLong(2),
        s"doc count for split ${r.getString(0)}")
    }
  }

  // ---- q126: gate skyline vs brute force over the corpus ----

  test("q126: corpus skyline equals the brute-force dominance model") {
    val crit = docs.map { case (id, text, _) =>
      val tk = text.trim.split(" ").toSeq
      (id, tk.size.toLong, tk.distinct.size.toLong * 1000000L / tk.size)
    }.filter(_._2 > 0)
    val model = crit.filter { case (_, px, py) =>
      !crit.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py)
      }
    }.map(_._1).toSet
    val got = run("q126_skyline_docs").map(_.getLong(0)).toSet
    assert(got == model)
  }

  // ---- q127: sliding windows vs a driver-side recount ----

  test("q127: repeated-window stats match a driver-side recount") {
    val W = 15
    val wins = docs.flatMap { case (id, text, _) =>
      val tk = text.trim.split(" ")
      if (tk.length >= W)
        (0 to tk.length - W).map(i => (id, tk.length.toLong,
          tk.slice(i, i + W).mkString(" ")))
      else Seq.empty
    }
    val occ = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val model = wins.groupBy(w => (w._1, w._2)).toSeq.flatMap {
      case ((id, n), ws) =>
        val rep = ws.count(w => occ(w._3) > 1).toLong
        if (rep > 0) Some((id, n, ws.size.toLong, rep)) else None
    }.sortBy(_._1)
    val got = run("q127_repeated_windows")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == model)
    got.foreach { case (_, _, nw, nr) => assert(nr <= nw) }
  }

  // ---- q128: phrase search vs a driver-side scan ----

  test("q128: positional-index matches equal a direct sliding scan") {
    val phrases = docs.filter(_._1 < 3).map { case (id, text, _) =>
      (id, text.trim.split(" ").take(5).toSeq)
    }
    val model = (for {
      (pid, terms) <- phrases
      (did, text, _) <- docs
      tk = text.trim.split(" ").toSeq
      start <- 0 to tk.size - terms.size
      if tk.slice(start, start + terms.size) == terms
    } yield (pid, did, start.toLong)).sortBy(t => (t._1, t._2, t._3)).toSeq
    val got = run("q128_phrase_search")
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == model)
    // every phrase must at least match its own source at offset 0
    phrases.foreach { case (pid, _) =>
      assert(got.contains((pid, pid, 0L)), s"self-match for phrase $pid")
    }
  }
}
