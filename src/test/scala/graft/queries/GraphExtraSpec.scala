package graft.queries

import graft.SparkSpec

/** Model replays for q142 (bag set ops) and q143 (k-core peeling). */
class GraphExtraSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf).collect()

  test("q142: multiplicities follow ANSI bag semantics") {
    val o = graft.core.Tables.orders(spark, sf)
      .select("o_custkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fCnt = o.filter(_._2 == "F").groupBy(_._1).view.mapValues(_.size).toMap
    val oCnt = o.filter(_._2 == "O").groupBy(_._1).view.mapValues(_.size).toMap
    val keys = fCnt.keySet ++ oCnt.keySet
    def bagStats(mult: Long => Int): (Long, Long) = {
      val ms = keys.toSeq.map(k => (k, mult(k))).filter(_._2 > 0)
      (ms.map(_._2.toLong).sum, ms.map { case (k, m) => k * m }.sum)
    }
    val (exN, exSum) = bagStats(k =>
      math.max(fCnt.getOrElse(k, 0) - oCnt.getOrElse(k, 0), 0))
    val (inN, inSum) = bagStats(k =>
      math.min(fCnt.getOrElse(k, 0), oCnt.getOrElse(k, 0)))
    val got = run("q142_bag_set_ops")
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("except_all") == ((exN, exSum)))
    assert(got("intersect_all") == ((inN, inSum)))
    // bag ≠ set here: multiplicities must exceed distinct cardinality
    assert(inN > keys.count(k => fCnt.contains(k) && oCnt.contains(k)) ||
      inN == 0)
  }

  test("q143: peeling cascade matches an in-memory k-core replay") {
    val li = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.toSet
    val k = 100
    val model = (1 to 3).map { r =>
      val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val surv = deg.filter(_._2 >= k).keySet
      edges = edges.filter(e => surv(e._1) && surv(e._2))
      (r.toLong, surv.size.toLong, edges.size.toLong)
    }
    val got = run("q143_kcore_peeling")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == model)
    // peeling must be monotone
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 <= a._2 && b._3 <= a._3, "cascade grows — impossible")
      case _ =>
    }
  }

  test("q150: point-in-time lookup matches a driver-side as-of replay") {
    val o: Seq[(Long, Long, String, Long)] = graft.core.Tables
      .orders(spark, sf)
      .filter("o_custkey < 50")
      .selectExpr("o_orderkey", "o_custkey", "o_orderpriority",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) dt").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val dayUs = 86400L * 1000000
    // regimes: runs of priority per customer ordered (date, orderkey)
    val model = o.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._1))
      val runs = sorted.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, r) =>
          if (acc.nonEmpty && acc.last._1 == r._3) acc
          else acc :+ ((r._3, r._4, r._1)) // (priority, valid_from, first_key)
      }.sortBy(v => (v._2, v._3))
      val versions = runs.zipWithIndex.map { case ((p, from, _), i) =>
        val to = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
        (i + 1L, p, from, to)
      }
      rows.map { r =>
        val ts = r._4 - dayUs
        val hit = versions.filter(v => v._3 <= ts && v._4.forall(ts < _))
        assert(hit.size <= 1, "intervals must partition the timeline")
        val ver = hit.headOption.map(_._1)
        val reg = hit.headOption.map(_._2)
        (r._1, ver, reg, reg.map(g => if (g == r._3) 0L else 1L))
      }
    }.sortBy(_._1)
    val got = run("q150_point_in_time_join").map { r =>
      (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }.toSeq
    assert(got == model)
    assert(got.exists(_._2.isEmpty), "each customer's first order pre-dates history")
    assert(got.exists(_._4.contains(1L)), "some lookups cross a regime change")
  }
}
