package graft.queries

import graft.SparkSpec
import graft.sources.GpsGenerator

/** Semantic checks for the telemetry/event analytics queries
  * (q129–q133). The oracle gate proves engine parity; these prove the
  * semantics are the intended ones by recomputing each answer in plain
  * Scala on the driver — a brute-force all-pairs proximity model (no
  * grid, no bands: certifies BOTH the Spark grid and the oracle's band
  * join against a third algorithm), a full trip-segmentation replay,
  * a regex replay, and a median/MAD replay.
  */
class TelemetrySpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf).collect()

  private lazy val fixes = GpsGenerator.batch(spark, Gps.inputRows(sf))
    .select("timestamp", "vehicle_id", "latitude", "longitude", "speed_kmh")
    .collect()
    .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4)))

  private def havKm(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val (r1, r2) = (math.toRadians(lat1), math.toRadians(lat2))
    val sLat = math.sin((r2 - r1) / 2)
    val sLon = math.sin((math.toRadians(lon2) - math.toRadians(lon1)) / 2)
    2 * 6371.0088 * math.asin(math.sqrt(
      sLat * sLat + math.cos(r1) * math.cos(r2) * sLon * sLon))
  }

  // ---- q129: grid join vs brute-force all-pairs (third algorithm) ----

  test("q129: grid proximity pairs equal the brute-force all-pairs model") {
    val pts = fixes.map { case (ts, vid, lat, lon, _) =>
      (ts, vid, math.round(lat * 1000000), math.round(lon * 1000000)) }
    val r = 100000L
    val model = (for {
      a <- pts; b <- pts
      if a._1 < b._1
      d2 = (a._3 - b._3) * (a._3 - b._3) + (a._4 - b._4) * (a._4 - b._4)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).sortBy(t => (t._1, t._2)).toSeq
    val got = run("q129_spatial_proximity_join")
      .map(x => (x.getString(0), x.getString(1), x.getLong(4))).toSeq
    assert(got == model)
    assert(got.nonEmpty, "sf0.001 must contain at least one near pair")
  }

  test("q129: grid is lossless across cell boundaries and negative coords") {
    // points straddling cell edges, the origin (trunc-vs-floor div zone),
    // and exactly-at-radius pairs (boundary must be INclusive)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = 100000L
    val pts = Seq(
      ("t01", -0.049999, 0.0), ("t02", 0.05, 0.0),      // ~0.1° apart, cells -1|0 or 0|0
      ("t03", -0.000001, -0.000001), ("t04", 0.000001, 0.000001),
      ("t05", 10.0, 20.0), ("t06", 10.1, 20.0),         // exactly r apart in lat
      ("t07", -89.95, -179.95), ("t08", -89.87, -179.88),
      ("t09", 45.0, 45.0), ("t10", 45.2000001, 45.0))   // just OUTSIDE r
    val df = pts.toDF("timestamp", "latitude", "longitude")
      .withColumn("vehicle_id", col("timestamp"))
      .withColumn("speed_kmh", lit(0.0))
    val got = Telemetry.proximityPairs(df, r)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    val scaled = pts.map { case (id, la, lo) =>
      (id, math.round(la * 1e6), math.round(lo * 1e6)) }
    val model = (for {
      a <- scaled; b <- scaled
      if a._1 < b._1
      if (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= r * r
    } yield (a._1, b._1)).toSet
    assert(got == model)
    assert(got.contains(("t05", "t06")), "exact-radius pair is included")
    assert(!got.contains(("t09", "t10")), "just-outside pair is excluded")
    assert(got.contains(("t03", "t04")), "origin-straddling pair found")
  }

  // ---- q130: trip segmentation replay ----

  test("q130: trips match a driver-side segmentation replay") {
    val base = 1750000000L
    def sec(ts: String): Long = { // yyyy-MM-dd HH:mm:ss, UTC, = base + id
      val f = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
      java.time.LocalDateTime.parse(ts, f).toEpochSecond(java.time.ZoneOffset.UTC)
    }
    val model = fixes.groupBy(_._2).toSeq.flatMap { case (vid, rows) =>
      val sorted = rows.sortBy(r => sec(r._1))
      // split on >60 s gaps
      val trips = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
        (acc, r) =>
          if (sec(r._1) - sec(acc.last.last._1) > 60) acc :+ Vector(r)
          else acc.init :+ (acc.last :+ r)
      }
      trips.zipWithIndex.map { case (t, i) =>
        val path = BigDecimal(t.sliding(2).collect { case Seq(p, c) =>
          BigDecimal(havKm(p._3, p._4, c._3, c._4))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toString).toDouble
        // integer micro-km/h, the exact form the query emits
        val avg = (t.map(r => math.round(r._5 * 100)).sum * 10000L) / t.size
        (vid, (i + 1).toLong, t.head._1, t.last._1, t.size.toLong, path, avg)
      }
    }.sortBy(t => (t._1, t._2))
    val got = run("q130_trip_segmentation").map(x => (x.getString(0),
      x.getLong(1), x.getString(2), x.getString(3), x.getLong(4),
      x.getDouble(5), x.getLong(6))).toSeq
    assert(got.size == model.size)
    got.zip(model).foreach { case (g, m) =>
      assert(g._1 == m._1 && g._2 == m._2 && g._3 == m._3 && g._4 == m._4
        && g._5 == m._5, s"trip identity: $g vs $m")
      assert(math.abs(g._6 - m._6) < 1e-9, s"path_km: $g vs $m")
      assert(g._7 == m._7, s"avg_speed_ukmh: $g vs $m")
    }
    // segmentation sanity: no intra-trip gap exceeds 60 s, every
    // inter-trip gap does
    got.groupBy(_._1).foreach { case (_, trips) =>
      trips.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(sec(b._3) - sec(a._4) > 60,
          "consecutive trips must be separated by >60 s")
        case _ =>
      }
    }
  }

  // ---- q132: regex pattern replay ----

  test("q132: conversions/error-bursts match a driver-side regex replay") {
    val events = graft.core.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) tsn", "event_id",
        "substring(event_type,1,1) ch")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val model = events.groupBy(_._1).view.mapValues { rows =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._4).mkString
      (s.length.toLong,
        "v[^pe]*p".r.findAllIn(s).size.toLong,
        "ee+".r.findAllIn(s).size.toLong)
    }.toMap
    val got = run("q132_event_pattern_match")
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == model)
    assert(got.values.map(_._2).sum > 0, "corpus must contain conversions")
  }

  // ---- q133: median/MAD replay ----

  test("q133: median, MAD, and outlier census match a driver replay") {
    val events = graft.core.Tables.events(spark, sf)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val model = events.groupBy(_._1).view.mapValues { rows =>
      val vs = rows.map(_._2).toSeq
      val med = median(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = median(devs)
      val out = vs.filter(v => math.abs(v - med) > 3 * mad)
      (vs.size.toLong, med, mad, out.size.toLong,
        if (out.isEmpty) None else Some(out.max))
    }.toMap
    val got = run("q133_mad_outliers").map { r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    }.toMap
    assert(got.keySet == model.keySet)
    got.foreach { case (k, g) =>
      val m = model(k)
      assert(g._1 == m._1 && g._4 == m._4 && g._5 == m._5, s"$k: $g vs $m")
      assert(math.abs(g._2 - m._2) < 1e-12 && math.abs(g._3 - m._3) < 1e-12)
    }
    assert(got.values.map(_._4).sum > 0, "right-skewed values ⇒ outliers exist")
  }

  // ---- q131: the merge is certified in-row; assert the certificate ----

  test("q131: every drift column is zero and groups span both sides") {
    val rows = run("q131_incremental_state_merge")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(6) == 0L, "n_drift")
      assert(r.getDouble(7) == 0.0, "sum_drift")
      assert(r.getLong(8) == 0L, "minmax_drift")
    }
    // 5 priorities × 12 months, all present (the pivot cuts across months)
    assert(rows.length == 60)
  }
}
