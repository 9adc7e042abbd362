package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — THE billion-vector ANN
  * compression path: split each d-dim vector into `m` subspaces, learn a
  * tiny k-means codebook per subspace, and represent every vector by its
  * m nearest-centroid ids (m·log2(k) bits instead of d floats). Queries
  * then rank candidates by asymmetric distance (ADC): a per-query lookup
  * table of query-subvector→centroid distances, summed over subspaces.
  *
  * Scale shape — the part that matters at 100 TB:
  *   - TRAINING runs on a deterministic sample (standard practice: a
  *     codebook needs ~1e5–1e6 vectors regardless of corpus size). The
  *     Lloyd rounds are the [[graft.queries.Mining.kmeansStats]] grouped
  *     form: centroids broadcast, assignment partial-aggregates map-side,
  *     the update shuffles k·m·subDim (s, cid, dim, sum, count) tuples —
  *     never a vector.
  *   - ENCODING — the full-corpus scan — is IN-ROW: the finished codebook
  *     is kilobytes (m·k·subDim longs), so it is collected once and
  *     compiled into a literal argmin expression; each vector's m codes
  *     and its quantization error are computed inside the projection with
  *     ZERO shuffle and nothing but the (vec_id, code, qerr) triple ever
  *     leaving the scan. This is exactly how FAISS-style encoders ship
  *     codebooks to workers.
  *
  * Determinism (the q124/q106 fixed-point recipe): components are
  * floor-quantized to 1e-6, distances are exact integer Σdiff², centroid
  * updates are floor-mean (double division exact: |sum| < 2^53), every
  * argmin tie-breaks on lowest cid — so DuckDB replays training, encoding
  * and the ADC audit bit-for-bit.
  *
  * Reference scope: the reference engine has no vector search at all
  * (spark_job.py is a single enrichment query); this operator is part of
  * the LLM-data-pipeline extension surface the brief asks for.
  */
object ProductQuantizer {

  /** Fixed-point scale, shared with the q124 oracle convention. */
  val Scale = 1000000L

  /** floor-quantized integer copy of a double vector (floor, not round:
    * IEEE floor is engine-identical; round-half ties are not). */
  def quant(v: Column): Column =
    transform(v, x => floor(x * Scale).cast("long"))

  /** Integer squared-L2 between two equal-length long arrays. Exact:
    * |component| ≤ ~1e6 ⇒ Σdiff² ≤ 64·4e12 ≪ 2^63. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** (vec_id, s, sv) subvector table: subspace `s` of `m`, each a
    * `subDim`-slice of the quantized vector `v`. */
  def subvectors(e: DataFrame, m: Int, subDim: Int): DataFrame =
    e.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("s"), col("v"))
      .select(col("vec_id"), col("s"),
        slice(col("v"), col("s") * subDim + 1, lit(subDim)).as("sv"))

  /** One grouped Lloyd assignment: every (vec_id, s) row to its nearest
    * (s, cid) centroid, ties → lowest cid. Centroids broadcast; the
    * min_by partial-aggregates map-side. */
  private def assign(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents), "s")
      .select(col("vec_id"), col("s"), col("cid"),
        sqDist(col("sv"), col("cv")).as("d"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("cid"),
        min(struct(col("d"), col("cid"))).getField("d").as("dist"))

  /** Grouped Lloyd update: component-wise floor-mean per (s, cid). */
  private def updateCentroids(sub: DataFrame, assigned: DataFrame): DataFrame =
    assigned.join(sub, Seq("vec_id", "s"))
      .select(col("s"), col("cid"), posexplode(col("sv")).as(Seq("i", "x")))
      .groupBy(col("s"), col("cid"), col("i"))
      .agg(floor(sum(col("x")).cast("double") / count(lit(1)))
        .cast("long").as("comp"))
      .groupBy(col("s"), col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("comp")))),
        p => p.getField("comp")).as("cv"))

  /** Train per-subspace codebooks on `trainSub` (a subvector table,
    * normally of a SAMPLE): init = the k lowest-vec_id training vectors'
    * subvectors (cid = vec_id, the q124 convention), then `iters` Lloyd
    * rounds. Returns (s, cid, cv). */
  def trainCodebooks(trainSub: DataFrame, k: Int, iters: Int): DataFrame = {
    val sub = trainSub.localCheckpoint(false)
    val ids = sub.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(k)
    var cents = sub.join(broadcast(ids), "vec_id")
      .select(col("s"), col("vec_id").as("cid"), col("sv").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = assign(sub, cents)
      cents = updateCentroids(sub, assigned).localCheckpoint(false)
    }
    cents
  }

  /** A collected codebook: per subspace s, the (cid, centroid) list,
    * sorted by cid. Kilobytes by construction (m·k·subDim longs) — the
    * bounded-collect class (BPE merge-table precedent). */
  final case class Codebook(m: Int, subDim: Int,
      cents: Map[Int, Seq[(Long, Array[Long])]])

  def collectCodebook(cents: DataFrame, m: Int, subDim: Int): Codebook =
    Codebook(m, subDim,
      cents.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toArray))
        .groupBy(_._1)
        .map { case (s, rows) =>
          s -> rows.sortBy(_._2).map(r => (r._2, r._3)).toSeq })

  /** IN-ROW encoder: given the quantized vector column `v`, emit
    * (code, qerr) — the m nearest-centroid ids (array<long>, subspace
    * order) and the total integer quantization error — as pure
    * expressions over the literal codebook. Ties → lowest cid via the
    * lexicographic (d, cid) struct min. Nothing shuffles. */
  def encodeColumns(cb: Codebook, v: Column): (Column, Column) = {
    val perSub = (0 until cb.m).map { s =>
      val sv = slice(v, s * cb.subDim + 1, cb.subDim)
      val best = cb.cents(s).map { case (cid, cv) =>
        struct(sqDist(sv, typedLit(cv.toSeq)).as("d"), lit(cid).as("cid"))
      }.reduce((a, b) => least(a, b))
      best
    }
    (array(perSub.map(_.getField("cid")): _*),
      perSub.map(_.getField("d")).reduce(_ + _))
  }
}
