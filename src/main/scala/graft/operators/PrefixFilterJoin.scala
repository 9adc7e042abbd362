package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join with prefix filtering (the PPJoin family:
  * Chaudhuri et al. "A Primitive Operator for Similarity Joins", ICDE'06;
  * Xiao et al. "Efficient Similarity Joins for Near Duplicate Detection",
  * WWW'08) — the scalable EXACT alternative to both the all-pairs
  * co-element join (q44's shape: every shared element becomes a join row)
  * and approximate LSH (q46: recall < 1 in general).
  *
  * The filter: order every element by corpus rarity (document frequency,
  * then element — a total order), and keep only each set's first
  * p = n − ceil(t'·n) + 1 elements as its "prefix". For any pair with
  * Jaccard ≥ t', the globally-smallest COMMON element must lie in BOTH
  * prefixes (if it didn't, the ≥⌈t'·n⌉ common elements would all have to
  * hide in a suffix of size ⌈t'·n⌉−1 — pigeonhole contradiction), so
  * joining prefix rows finds every qualifying pair: pruning is LOSSLESS.
  * Rare-first ordering makes prefixes collide rarely — frequent elements
  * (stopword shingles) never generate candidates.
  *
  * 100 TB posture: document frequency is one partial→final agg; per-set
  * prefix ranking is a window partitioned BY SET (never a global rank);
  * the candidate join ships only prefix rows (a t'-dependent fraction of
  * the exact join's full element stream); verification is two keyed
  * equijoins per candidate pair. Every stage shuffles on an element or
  * set key — no global structure, no driver state.
  *
  * @param elements exploded set rows: (id, n, element-hash)
  * @param threshold final (rounded) Jaccard threshold for output pairs
  * @param prefixThreshold t' ≤ threshold used for prefix sizing; set
  *        slightly BELOW threshold when the output filter applies to a
  *        ROUNDED jaccard (a true j of threshold−ε can round up into the
  *        output; t' < threshold keeps such pairs inside the lossless
  *        guarantee).
  */
object PrefixFilterJoin {

  def similarPairs(elements: DataFrame, idCol: String, nCol: String,
      elemCol: String, threshold: Double, prefixThreshold: Double): DataFrame = {
    val ex = elements.select(col(idCol).as("id"), col(nCol).as("n"),
      col(elemCol).as("e"))
    val df = ex.groupBy(col("e")).agg(count(lit(1)).as("dfreq"))
    val ranked = ex.join(df, "e")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("dfreq"), col("e"))))
    val prefix = ranked.filter(
      col("rn") <= col("n") - ceil(col("n") * lit(prefixThreshold)) + lit(1))
    val cand = prefix.select(col("id").as("doc_a"), col("e"))
      .join(prefix.select(col("id").as("doc_b"), col("e")), Seq("e"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    // exact verification: intersection count over the FULL element sets
    // of candidate pairs only — two keyed joins, grouped per pair
    val ea = ex.select(col("id").as("doc_a"), col("n").as("n_a"), col("e"))
    val eb = ex.select(col("id").as("doc_b"), col("n").as("n_b"), col("e"))
    cand.join(ea, "doc_a")
      .join(eb, Seq("doc_b", "e"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
  }

  /** Directional containment join: all ordered pairs (a, b), a ≠ b, with
    * C(a→b) = |A ∩ B| / |A| ≥ threshold — the asymmetric dual of
    * [[similarPairs]]. Jaccard misses subset duplicates (a short doc
    * embedded verbatim in a much longer one scores |A|/|B| ≈ 0); for
    * training-data dedup the contained side is still a duplicate and
    * containment is the measure that catches it (PPJoin's containment
    * variant; same pigeonhole argument on the PROBE side only).
    *
    * Prefix filter: if C(a→b) ≥ t then |A∩B| ≥ ⌈t·n_a⌉, so A's rare-first
    * prefix of size n_a − ⌈t'·n_a⌉ + 1 must intersect B — otherwise all
    * common elements would hide in A's suffix of ⌈t'·n_a⌉ − 1 slots.
    * Only the probe side is prefix-pruned; the index side streams its
    * FULL element rows (a containment witness can sit anywhere in B), so
    * the candidate join is prefix(A) ⋈ elements(B). Rare-first ordering
    * keeps boilerplate elements (max-df shingles) out of every prefix.
    *
    * 100 TB posture: identical to [[similarPairs]] — df is one
    * partial→final agg, prefix ranking a per-set window, candidates and
    * verification keyed equijoins. The index side being unpruned costs
    * candidate fan-out proportional to the df of PREFIX elements only —
    * which rare-first ordering minimizes by construction.
    */
  def containmentPairs(elements: DataFrame, idCol: String, nCol: String,
      elemCol: String, threshold: Double, prefixThreshold: Double): DataFrame = {
    val ex = elements.select(col(idCol).as("id"), col(nCol).as("n"),
      col(elemCol).as("e"))
    val df = ex.groupBy(col("e")).agg(count(lit(1)).as("dfreq"))
    val ranked = ex.join(df, "e")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("dfreq"), col("e"))))
    val prefix = ranked.filter(
      col("rn") <= col("n") - ceil(col("n") * lit(prefixThreshold)) + lit(1))
    val cand = prefix.select(col("id").as("doc_a"), col("e"))
      .join(ex.select(col("id").as("doc_b"), col("e")), Seq("e"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val ea = ex.select(col("id").as("doc_a"), col("n").as("n_a"), col("e"))
    val eb = ex.select(col("id").as("doc_b"), col("e"))
    cand.join(ea, "doc_a")
      .join(eb, Seq("doc_b", "e"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("containment",
        round(col("n_common").cast("double") / col("n_a"), 6))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("containment"))
  }
}
