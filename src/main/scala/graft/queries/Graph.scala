package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Graph analytics over relation-derived graphs.
  *
  * The engine's graph surface so far is connected components (q56's
  * distributed min-label propagation in `operators.MinHashLSH`). This
  * module adds the other classic scale-bound graph kernel: triangle
  * counting, the building block of clustering-coefficient / community
  * metrics and the canonical "will your join strategy survive a
  * power-law graph" test.
  *
  * Scale design — degree-oriented wedge join (the standard MPC/MapReduce
  * triangle algorithm, cf. Suri & Vassilvitskii "Counting Triangles and
  * the Curse of the Last Reducer", WWW'11):
  *
  *  - Each undirected edge is directed from its (degree, id)-smaller
  *    endpoint to the larger. Every triangle then has exactly one vertex
  *    with out-edges to the other two, so wedges (a→b, a→c) + the
  *    closing edge {b,c} count each triangle exactly once — no /3, no /6
  *    double-count corrections.
  *  - Orientation bounds every out-degree by O(√E): a hub's edges all
  *    point INTO it, so the hub generates no wedges. Total wedge work is
  *    Σ out-deg² = O(E^1.5) regardless of skew — the power-law hub that
  *    would explode a naive neighbor self-join ("the curse of the last
  *    reducer") contributes nothing.
  *  - Every step is a keyed equijoin or aggregation: pair generation
  *    fans out C(k,2) per order with k = lines-per-order (bounded ~7),
  *    the wedge join shuffles on the wedge center, the closing-edge
  *    check is a semi-join on the canonical (min,max) pair. No
  *    cartesian, no driver collection, nothing O(V²).
  */
object Graph {

  /** Per-node triangle participation over a hyperedge incidence list.
    *
    * @param li two columns `o` (hyperedge/container id) and `p` (node id):
    *           nodes sharing a container get an undirected edge.
    * @return one row per node in ≥1 triangle: (node, tri_count, d).
    */
  def triangleParticipation(li: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // distinct co-occurrence edges, canonical u < v
    val pairs = li.as("a")
      .join(li.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
    val deg = pairs.select(col("u").as("node"))
      .unionAll(pairs.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient each edge from the (degree, id)-smaller endpoint
    val oriented = pairs
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("v")).otherwise(col("u")).as("t"))
    val wedge = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    val tri = wedge.join(pairs,
      pairs("u") === least(col("b"), col("c")) &&
        pairs("v") === greatest(col("b"), col("c")), "left_semi")
    val partTri = tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri_count"))
    partTri.join(deg, "node")
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- q105: triangle participation in the co-purchase graph ----
    // Nodes = parts; undirected edge {u,v} iff some order contains both.
    // Output: the 20 parts in the most triangles (mutually co-purchased
    // triples), with their graph degree. All-integer => exact oracle
    // parity; tri_count DESC, partkey ASC is a total order.
    "q105_triangle_count" -> QueryDef(
      build = (spark, dir) => {
        val li = Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        triangleParticipation(li)
          .select(col("node").as("partkey"), col("tri_count"),
            col("d").as("degree"))
          .orderBy(col("tri_count").desc, col("partkey").asc)
          .limit(20)
      },
      oracle = Some("""
        WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        pairs AS (
          SELECT a.p AS u, b.p AS v
          FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
          GROUP BY a.p, b.p),
        deg AS (
          SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
          GROUP BY node),
        oriented AS (
          SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS s,
                 CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS t
          FROM pairs p JOIN deg du ON du.node = p.u JOIN deg dv ON dv.node = p.v),
        wedge AS (
          SELECT e1.s AS a, e1.t AS b, e2.t AS c
          FROM oriented e1 JOIN oriented e2 ON e1.s = e2.s AND e1.t < e2.t),
        tri AS (
          SELECT a, b, c FROM wedge w
          WHERE EXISTS (SELECT 1 FROM pairs p
                        WHERE p.u = LEAST(w.b, w.c) AND p.v = GREATEST(w.b, w.c))),
        part_tri AS (
          SELECT node, COUNT(*) AS tri_count FROM (
            SELECT a AS node FROM tri UNION ALL
            SELECT b AS node FROM tri UNION ALL
            SELECT c AS node FROM tri) GROUP BY node)
        SELECT pt.node AS partkey, pt.tri_count, d.d AS degree
        FROM part_tri pt JOIN deg d ON d.node = pt.node
        ORDER BY pt.tri_count DESC, partkey ASC LIMIT 20"""))
  )
}
