package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph kernels vs in-memory models.
  *
  * q105's triangle query is oracle-backed; here the degree-oriented
  * kernel is checked against a brute-force O(V³)-ish set model on the
  * tiny-SF graph — a bug in the orientation (double counts, missed
  * triangles at orientation ties) would slip past an oracle that shares
  * the same SQL shape.
  *
  * q106's fixed-point PageRank is replayed exactly in driver-side Long
  * arithmetic: same scaled-integer truncating divisions, same iteration
  * count, so every rank must match bit-for-bit — the whole point of
  * fixed-point rank determinism.
  */
class GraphSpec extends SparkSpec {

  /** (undirected canonical edges, per-node degree) of the sf0.001
    * co-purchase graph at the given support threshold. */
  private def edgeModel(minSupport: Long): (Set[(Long, Long)], Map[Long, Int]) = {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val support = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, parts) <- byOrder; i <- parts.indices; j <- (i + 1) until parts.length)
      support((parts(i), parts(j))) = support.getOrElse((parts(i), parts(j)), 0L) + 1
    // iterator first: .collect on a Map whose transform returns a pair
    // would rebuild a Map keyed on the edge's first node, silently
    // collapsing parallel entries
    val edges = support.iterator.collect { case (e, s) if s >= minSupport => e }.toSet
    val deg = edges.toSeq.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).view.mapValues(_.size).toMap
    (edges, deg)
  }

  test("q105: kernel matches the brute-force triangle model on the tiny graph") {
    val (edges, deg) = edgeModel(1)
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]].withDefaultValue(Set.empty[Long])) {
      case (m, (u, v)) => m.updated(u, m(u) + v).updated(v, m(v) + u)
    }
    // brute force: for each edge, count common neighbors; each triangle
    // counted once per edge => node participation = triangles through it
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long]
    var total = 0L
    for ((u, v) <- edges; w <- adj(u) intersect adj(v) if u < v && v < w) {
      total += 1
      Seq(u, v, w).foreach(n => triPerNode(n) = triPerNode.getOrElse(n, 0L) + 1)
    }
    val got = graft.SparkEntry.queries("q105_triangle_count")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && total > 0, s"degenerate fixture: $total model triangles")
    got.foreach { case (node, triCount, d) =>
      assert(triCount == triPerNode.getOrElse(node, 0L),
        s"node $node: query says $triCount triangles, model says ${triPerNode.get(node)}")
      assert(d == deg(node).toLong, s"node $node degree mismatch")
    }
    // top-20 really is the top of the model ranking
    val modelTop = triPerNode.toSeq.map { case (n, t) => (-t, n) }.sorted
      .take(got.length).map { case (negT, n) => (n, -negT) }
    assert(got.map(r => (r._1, r._2)).toSeq == modelTop,
      "query top-k diverges from the model ranking")
  }

  test("q106: distributed ranks match the driver-side fixed-point replay bit-for-bit") {
    val SCALE = 1000000000000L
    val (edges, deg) = edgeModel(2)
    val nodes = deg.keySet
    val n = nodes.size.toLong
    assert(n > 10, s"degenerate fixture: $n nodes")
    val base = (15L * (SCALE / n)) / 100L
    val out = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank: Map[Long, Long] = nodes.map(_ -> SCALE / n).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
      for (u <- nodes; v <- out(u))
        contrib(v) = contrib.getOrElse(v, 0L) + rank(u) / deg(u)
      rank = nodes.map(v => v -> (base + (85L * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    val got = graft.SparkEntry.queries("q106_pagerank_fixedpoint")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (node, rankFp, d) =>
      assert(rankFp == rank(node),
        s"node $node: engine rank $rankFp != model ${rank(node)} — fixed-point drift")
      assert(d == deg(node).toLong)
    }
  }
}
