package graft.queries

import graft.SparkSpec

/** Semantic checks for the analytics-depth queries (q134–q138): each
  * answer recomputed in plain Scala on the driver. q136's model is the
  * brute-force all-pairs edit-distance scan — certifying the pigeonhole
  * half-block join lossless by a third algorithm (the oracle already
  * brute-forces in SQL; this one shares no engine).
  */
class InsightsSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf).collect()

  // ---- q134: rolling 7-day distinct actives ----

  test("q134: DAU/WAU match a driver-side rolling-distinct replay") {
    val ud = graft.core.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) d").distinct()
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val dau = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet.size.toLong).toMap
    val wau = ud.flatMap { case (u, d) => (0 to 6).map(i => (d.plusDays(i), u)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet.size.toLong).toMap
    val got = run("q134_rolling_active_users").map(r =>
      (java.time.LocalDate.parse(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet == wau.keySet)
    got.foreach { case (d, gd, gw) =>
      assert(gw == wau(d), s"wau $d")
      assert(gd == dau.getOrElse(d, 0L), s"dau $d")
    }
    // trailing coverage: a window day past the last active day has dau 0
    val lastActive = dau.keySet.max
    assert(got.filter(_._1.isAfter(lastActive)).forall(_._2 == 0L))
  }

  // ---- q135: OLS from sums vs a direct least-squares replay ----

  test("q135: slope/intercept/r2 match a direct OLS computation") {
    val rows = graft.core.Tables.orders(spark, sf)
      .selectExpr("o_orderpriority",
        "CAST(datediff(o_orderdate, '1995-01-01') AS LONG) x", "o_totalprice")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = run("q135_grouped_ols_trend").map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val n = rs.size.toDouble
      val xs = rs.map(_._2.toDouble); val ys = rs.map(_._3)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val sxy = rs.map(r => r._2 * r._3).sum
      val syy = ys.map(y => y * y).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val (gn, gs, gi, gr) = got(p)
      assert(gn == rs.size)
      assert(math.abs(gs - num / den) < 1e-4, s"$p slope")
      assert(math.abs(gi - (sy - num / den * sx) / n) < 1e-2, s"$p intercept")
      assert(math.abs(gr - num * num / (den * (n * syy - sy * sy))) < 1e-4,
        s"$p r2")
      assert(gr >= 0 && gr <= 1, s"$p r2 range")
    }
  }

  // ---- q136: pigeonhole block join vs brute-force all-pairs ----

  test("q136: blocked fuzzy match equals brute-force edit distance") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    val names = graft.core.Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val model = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka != kb && na.length == nb.length && lev(na, nb) <= 1
    } yield (ka, (nb: String))).groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).min)).toMap
    val got = run("q136_pigeonhole_fuzzy_match").map(r =>
      r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got == model)
    assert(got.nonEmpty, "digit-structured names must produce matches")
  }

  // ---- q137: NTILE replay ----

  test("q137: decile sizes and bounds match the ANSI NTILE definition") {
    val rows = graft.core.Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = run("q137_decile_binning").map(r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val n = sorted.size; val q = n / 10; val rem = n % 10
      var idx = 0
      (1 to 10).foreach { b =>
        val sz = q + (if (b <= rem) 1 else 0)
        val bucket = sorted.slice(idx, idx + sz); idx += sz
        val (gn, glo, ghi) = got((p, b.toLong))
        assert(gn == sz, s"$p decile $b size")
        assert(glo == bucket.map(_._2).min && ghi == bucket.map(_._2).max,
          s"$p decile $b bounds")
      }
    }
  }

  // ---- q138: Benford replay ----

  test("q138: digit frequencies and chi2 terms match a driver replay") {
    val cents = graft.core.Tables.orders(spark, sf)
      .selectExpr("CAST(round(o_totalprice * 100) AS LONG) c").collect()
      .map(_.getLong(0))
    val freq = cents.groupBy(_.toString.head.asDigit.toLong).view
      .mapValues(_.size.toLong).toMap
    val n = cents.length.toDouble
    val got = run("q138_benford_audit").map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == freq.keySet)
    got.foreach { case (d, (obs, exp, chi)) =>
      assert(obs == freq(d))
      val e = n * math.log10(1.0 + 1.0 / d)
      assert(math.abs(exp - e) < 1e-3, s"digit $d expected")
      assert(math.abs(chi - (obs - e) * (obs - e) / e) < 1e-4, s"digit $d chi2")
    }
    assert(got.values.map(_._1).sum == cents.length, "digits partition orders")
  }

  // ---- q144: chi-square independence replay ----

  test("q144: contingency cells and chi2 terms match a driver replay") {
    val ev = graft.core.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(weekday(ts) AS LONG) dow").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val cells = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = ev.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = ev.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = ev.length.toDouble
    val got = run("q144_chi2_independence").map(r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == cells.keySet)
    got.foreach { case ((t, d), (obs, exp, chi)) =>
      assert(obs == cells((t, d)))
      val e = rt(t).toDouble * ct(d) / n
      assert(math.abs(exp - e) < 1e-3, s"($t,$d) expected")
      assert(math.abs(chi - (obs - e) * (obs - e) / e) < 1e-4, s"($t,$d) chi2")
    }
    assert(got.values.map(_._1).sum == ev.length, "cells partition events")
  }

  // ---- q145: exact-integer KS replay ----

  test("q145: the KS statistic matches a direct two-sample computation") {
    val ev = graft.core.Tables.events(spark, sf)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = ev.filter(_._1 == "click").map(_._2).sorted
    val b = ev.filter(_._1 == "purchase").map(_._2).sorted
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val points = (a ++ b).distinct.sorted
    val gaps = points.map { v =>
      val cA = a.count(_ <= v).toLong; val cB = b.count(_ <= v).toLong
      (math.abs(cA * nb - cB * na), v)
    }
    val (maxGap, atV) = gaps.maxBy(g => (g._1, -g._2.compareTo(Double.NaN)))
    val bestV = gaps.filter(_._1 == maxGap).map(_._2).min
    val r = run("q145_ks_two_sample").head
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getLong(2) == maxGap, "integer sup gap")
    assert(r.getDouble(4) == bestV, "argmax value (min tie-break)")
    assert(math.abs(r.getDouble(3) - maxGap.toDouble / (na * nb)) < 1e-9)
    assert(maxGap > 0, "distinct samples must show a nonzero gap")
  }

  // ---- q146: weighted median replay ----

  test("q146: weighted median satisfies the half-weight definition") {
    val li = graft.core.Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag", "l_extendedprice",
        "CAST(round(l_quantity) AS LONG) w").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = run("q146_weighted_median")
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val wtot = rows.map(_._3).sum
      val sorted = rows.sortBy(_._2)
      var cum = 0L
      val wm = sorted.find { r => cum += r._3; 2 * cum >= wtot }.get._2
      val (gm, gw) = got(flag)
      assert(gw == wtot, s"$flag total weight")
      assert(gm == wm, s"$flag weighted median")
      // definitional check: weight below < half, weight up to wm >= half
      val below = rows.filter(_._2 < wm).map(_._3).sum
      val upto = rows.filter(_._2 <= wm).map(_._3).sum
      assert(2 * below < wtot && 2 * upto >= wtot, s"$flag half-weight")
    }
  }

  // ---- q147: Gini replay ----

  test("q147: Gini matches the mean-absolute-difference definition") {
    val o = graft.core.Tables.orders(spark, sf)
      .selectExpr("o_orderpriority", "CAST(round(o_totalprice*100) AS LONG) c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = run("q147_gini_concentration")
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    o.groupBy(_._1).foreach { case (p, rows) =>
      val xs = rows.map(_._2).sorted
      val n = xs.length
      // independent definition: G = sum|xi - xj| / (2 n^2 mu)
      val sx = xs.map(BigInt(_)).sum
      val mad = (for (a <- xs; b <- xs) yield (BigInt(a) - BigInt(b)).abs).sum
      // Σᵢⱼ|xᵢ−xⱼ| = 2·Σᵢ(2i−n−1)x₍ᵢ₎ for sorted x, so the rank form
      // equals MAD/(2·n·Σx) EXACTLY — the two definitions must agree
      // to double precision.
      val gDef = mad.toDouble / (2.0 * n.toDouble * sx.toDouble)
      val (gn, gsx, gg) = got(p)
      assert(gn == n && BigInt(gsx) == sx)
      assert(math.abs(gg - gDef) < 1e-6, s"$p gini $gg vs $gDef")
      assert(gg >= 0 && gg < 1, s"$p gini range")
    }
  }
}
