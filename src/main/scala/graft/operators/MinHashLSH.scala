package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection — the 100 TB dedup path.
  *
  * Pipeline: tokens → distinct word n-gram shingles → 64-slot MinHash
  * signature (per-doc column expressions, no explode) → `bands` band
  * hashes → explode only the band hashes (|docs|·bands rows, tiny) →
  * self-equijoin on (band, hash) → exact Jaccard verification of the
  * candidates via array_intersect on the two shingle sets.
  *
  * Contrast with the exact shingle inverted-index join (queries.Text q44):
  * that shuffles |docs|·|shingles| rows and compares every co-shingled
  * pair; this shuffles |docs|·bands rows and compares only probable pairs.
  * Probability a pair with Jaccard j becomes a candidate:
  * 1 - (1 - j^rowsPerBand)^bands — with 32 bands × 2 rows, j=0.4 → 99.6%.
  *
  * Everything derives from xxhash64, so results are deterministic across
  * runs and cluster layouts (but engine-specific: rows-only oracle).
  */
object MinHashLSH {

  /** (doc_id, sh) distinct-shingle projection — the tokenize→shingle
    * kernel shared by the batch paths and the streaming candidate
    * pipeline (StreamingGate q176), so they cannot drift. */
  def shingled(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame =
    graft.core.Tables.spread(docs)
      .select(col(idCol).as("doc_id"),
        shingles(tokens(col(textCol)), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Array of (band, h) structs over a minhash signature column:
    * h = xxhash64(band, sig[band·r], …, sig[band·r + r−1]). */
  def bandStructs(sig: Column, numHashes: Int, bands: Int): Column = {
    val rowsPerBand = numHashes / bands
    array((0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(lit(b) +: slots: _*).as("h"))
    }: _*)
  }

  /** Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    * against the shingle projection — the verify stage shared by the
    * batch self-join and the streaming candidate state. Returns the
    * final fully-ordered pair schema. */
  def verifyCandidates(candidates: DataFrame, withSh: DataFrame,
      threshold: Double): DataFrame = {
    val shA = withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val shB = withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    candidates
      .join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(
        col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        col("n_common").cast("long").as("n_common"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Near-dup pairs with exact-verified Jaccard >= `threshold`.
    * Input must have an id column and a text column. */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.4): DataFrame = {

    // Shingling is the compute-heavy stage and its output feeds THREE
    // consumers (signature, both verification sides), each of which
    // re-evaluates the kernel. `shingled` spreads the input across cores
    // when it arrives under-parallelized (a small parquet = one split
    // that would serialize all three evaluations on one core); the
    // repartition exchange itself is computed once and reused by all
    // branches (ReuseExchange). At real scale the file splits already
    // provide parallelism and the guard makes this a no-op.
    val withSh = shingled(docs, idCol, textCol, shingleN)

    val sig = withSh.withColumn("sig", minhashSignature(col("sh"), numHashes))

    // band hash b = xxhash64(b, sig[b*r], ..., sig[b*r + r-1]).
    // Bucket rows carry ONLY (doc_id, band, h): the shingle sets are
    // re-joined after pair dedup, so the band-join shuffle moves
    // |docs|·bands 24-byte rows, not full shingle arrays.
    val buckets = sig
      .select(col("doc_id"), explode(bandStructs(col("sig"), numHashes, bands)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.h").as("h"))

    val a = buckets.select(col("band"), col("h"), col("doc_id").as("doc_a"))
    val b = buckets.select(col("band"), col("h"), col("doc_id").as("doc_b"))

    val candidates = a.join(b, Seq("band", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")

    // Exact verification: fetch each side's shingle set by id equijoin.
    verifyCandidates(candidates, withSh, threshold)
  }

  /** Near-dup pairs BETWEEN two corpora (directed: one row per
    * (leftId, rightId) pair with exact-verified Jaccard >= threshold) —
    * the fuzzy-decontamination shape: left = eval/benchmark set, right =
    * training corpus. Identical banding/verification as [[nearDupPairs]],
    * but the band equijoin crosses the two bucket sets instead of
    * self-joining one, so the shuffle is |left|·bands + |right|·bands
    * tiny rows and the left side (an eval set, usually minuscule) could
    * equally be broadcast at scale. */
  def nearDupPairsBetween(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.4): DataFrame = {

    def shingledAs(df: DataFrame, id: String, out: String): DataFrame =
      shingled(df, id, textCol, shingleN).withColumnRenamed("doc_id", out)
    def bucketize(withSh: DataFrame, idOut: String): DataFrame =
      withSh.withColumn("sig", minhashSignature(col("sh"), numHashes))
        .select(col(idOut), explode(bandStructs(col("sig"), numHashes, bands)).as("bk"))
        .select(col(idOut), col("bk.band").as("band"), col("bk.h").as("h"))

    val shL = shingledAs(left, leftId, "left_id")
    val shR = shingledAs(right, rightId, "right_id")
    val candidates = bucketize(shL, "left_id")
      .join(bucketize(shR, "right_id"), Seq("band", "h"))
      .select("left_id", "right_id")
      .dropDuplicates("left_id", "right_id")

    candidates
      .join(shL.select(col("left_id"), col("sh").as("sh_l")), "left_id")
      .join(shR.select(col("right_id"), col("sh").as("sh_r")), "right_id")
      .withColumn("n_common", size(array_intersect(col("sh_l"), col("sh_r"))))
      .withColumn("jaccard", round(
        col("n_common").cast("double") /
          (size(col("sh_l")) + size(col("sh_r")) - col("n_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"),
        col("n_common").cast("long").as("n_common"), col("jaccard"))
      .orderBy(col("left_id"), col("right_id"))
  }

  /** Resolve near-dup pairs into clusters: connected components by
    * iterative min-label propagation, labels(v) ← min(labels(v),
    * min_{u~v} labels(u)) until fixpoint. Each iteration is one
    * distributed join+aggregate pass; the driver only orchestrates (no
    * collect). Converges in O(component diameter) passes — dup clusters
    * are shallow (near-cliques from LSH), so a handful. Returns
    * (doc_id, cluster_id = min doc id of the component); downstream
    * keep-one dedup filters `doc_id = cluster_id`. Only docs appearing in
    * a pair are returned (singletons are their own cluster implicitly). */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val fwd = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val fromNbr = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("id2")).agg(min(col("label")).as("nbr"))
      val next = labels.join(fromNbr, labels("id") === col("id2"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .cache()
      converged = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).isEmpty
      labels = next.localCheckpoint() // truncate lineage between iterations
      i += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy(col("doc_id"))
  }
}
