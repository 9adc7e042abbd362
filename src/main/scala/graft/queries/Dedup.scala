package graft.queries

import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.operators.{MinHashLSH, SimHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-path near-duplicate detection over `documents` — the operators a
  * 100 TB training-data pipeline actually runs (vs. the exact shingle join
  * q44, which is quadratic in co-shingled docs and reserved for candidate
  * verification).
  *
  * q46 (MinHash+banded LSH) shuffles |docs|·bands tiny rows instead of
  * |docs|·|shingles|; q47 (SimHash + pigeonhole blocks) reduces Hamming
  * near-dup search to an equijoin. Both derive every hash from xxhash64, so
  * results are deterministic across runs and cluster layouts but
  * engine-specific: q46's candidates are exactly verified with true Jaccard,
  * making its output equal to the exact q44 answer whenever LSH recall is 1
  * (asserted in DedupSpec; the DuckDB oracle below is the exact-Jaccard
  * query, so the driver's hash compare doubles as a recall=1 proof at
  * sf0.01). q47's fingerprints have no SQL equivalent, but its
  * nearest-neighbor search is oracle-checked brute-force over the
  * Verify-materialized fingerprints (see q47's def and VerifyInputs).
  */
object Dedup {

  /** q353's pinned decision threshold: match ⟺ the rescaled 5-factor
    * product p5 ≥ T · GREATEST(n_a, n_b) (prior-odds scaling — see
    * q353's docstring). Calibrated round 14 on the sf0.1 corpus + the
    * sf1 rehearsal (WeightProbe's measured pattern bands, which are
    * SF-invariant because the factors self-normalize): at both SFs the
    * accepted patterns are exactly {ph agrees ∧ at most one of
    * seg/band/tok disagrees} — both thresholds (T·max(n) at 1× and 10×
    * density) land in the 22× score gap between the 2-disagree band
    * (≤ 3.4e20) and the tok-disagree band (≥ 7.4e21), and the big
    * (ph−, all-else-agree) saturation band sits 2 more decades down.
    * Measured pair-level cards: sf0.1 p=0.995 r=0.824 (q349: 0.992 /
    * 0.654), sf1 p=0.992 r=0.825 (q349: 0.100 flat). Pinned identically
    * in the engine expression and the DuckDB oracle replay. */
  private val WeightedMatchT = "36000000000000000"

  /** The capped-blocking occupancy cap shared by every dynamic-blocking
    * ER gate (q325's probe, q349, q353) — the dynBlocks call, the
    * keep/split/purge filters, the fused lvlStats certificates, and the
    * DuckDB oracle CTEs all interpolate THIS value, so changing the cap
    * at one site can never silently desynchronize the kept-occupancy /
    * candidate-mass / purge certificates from the actual blocking
    * (round-14 ADVICE). */
  private[queries] val BlockCap = 12L


  /** Chunk-level exact dedup (the CCNet "line dedup" analog for a corpus
    * whose documents are single-line token streams): split every document
    * into fixed-size token chunks, hash each chunk, keep only the corpus-
    * wide FIRST occurrence of each distinct chunk (ordered by
    * (doc_id, chunk_idx)), and report per-document attrition.
    *
    * 100 TB posture: the explode produces |tokens|/W chunk rows; winner
    * selection is one window over the high-cardinality chunk hash (a
    * single hash-partition shuffle that spreads evenly — chunk text is
    * near-unique), and the per-doc rollup is a second keyed partial
    * aggregation. Nothing is quadratic and no stage holds more than one
    * document's tokens in a row. md5 is the chunk key so the same
    * decision is reproducible in any engine.
    */
  def chunkDedupStats(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame = {
    val w = chunkTokens
    val toks = df.select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"))
    val chunks = toks.select(col("doc_id"), col("n_tokens"),
        posexplode(transform(
          sequence(lit(0), ((size(col("toks")) - 1) / w).cast("int")),
          i => array_join(slice(col("toks"), i * w + 1, lit(w)), " ")))
          .as(Seq("chunk_idx", "chunk")))
    val firstWins = Window.partitionBy(md5(col("chunk").cast("binary")))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunks.withColumn("rn", row_number().over(firstWins))
      .withColumn("kept", col("rn") === 1)
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), size(split(col("chunk"), " ")).cast("long"))
          .otherwise(0L)).as("tokens_kept"))
      .withColumn("kept_frac",
        round(col("tokens_kept").cast("double") / col("n_tokens"), 6))
      .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
        col("n_kept"), col("tokens_kept"), col("kept_frac"))
      .orderBy(col("doc_id"))
  }

  /** SemDeDup-style semantic dedup over an embedding column: coarse
    * k-means-like cells (deterministic centroids = the k lowest-id
    * vectors, argmax-cosine assignment — the q54 IVF index), then inside
    * each cell prune every vector that has cosine ≥ tau with ANY
    * lower-id vector in the same cell. The "any earlier neighbor" rule is
    * the parallel-deterministic form of SemDeDup's greedy keep-one: it
    * needs no sequential pass, is independent of partitioning, and is
    * pure relational algebra — so the whole index is recomputable by the
    * oracle with no materialized input.
    *
    * 100 TB posture: assignment is one broadcast join (centroid set ≪
    * corpus); the pairwise stage is a cell-partitioned self-equijoin —
    * the corpus-wide cross product never exists. Choosing k: total work
    * is n·k (assignment) + n·(n/k)/2 (within-cell pairs), minimized at
    * k ≈ √(n/2) where both terms are O(n^1.5) — measured in ScaleProbe
    * "semdedup"; a hierarchical (two-level) centroid assignment would
    * reach ~n·log n if flat assignment ever dominates at real scale. */
  /** The cell-assignment stage of [[semanticDedupStats]]: (cid, vec_id,
    * e) with every vector joined to its argmax-cosine centroid (the k
    * lowest-id vectors; ties to the lowest cid).
    *
    * The argmax is a partial-aggregating max_by over (sim, -cid) — NOT a
    * row_number window: the window form would shuffle |corpus|·k rows
    * carrying the embedding array (measured 10× superlinear in ScaleProbe
    * at 50k vectors); max_by reduces map-side to one row per vector and
    * ships no vectors at all. Lazily localCheckpoint'd: the assignment
    * feeds multiple consumers (both self-join sides + stats) — without it
    * each consumer recomputes the full |corpus|·k cosine assignment
    * (measured 49 s → ~10 s at 50k vectors). Same materialize-the-
    * assignment posture a production SemDeDup run takes (and the
    * dupClusters precedent). */
  def semanticAssign(emb: DataFrame, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("e"))
    val cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), cosine(col("e"), col("ce")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("cid"))
      .join(e, Seq("vec_id"))
      .select(col("cid"), col("vec_id"), col("e"))
      .localCheckpoint(false)
  }

  /** Two-level (hierarchical) variant of [[semanticAssign]]: vectors
    * first pick their argmax among `branch` coarse centroids (the branch
    * lowest-id fine centroids), then argmax only among the fine centroids
    * mapped to that coarse cell. Assignment cost drops from n·k cosines
    * to ~n·(branch + k/branch) — minimized at branch ≈ √k — at the price
    * of approximation: a vector whose true fine centroid maps to a
    * different coarse cell than the vector itself is mis-assigned. How
    * much that matters is data-dependent: on ISOTROPIC vectors (the
    * testdata embeddings) absolute cell agreement with flat argmax is
    * only ~0.5, but near-DUPLICATE pairs follow near-identical argmax
    * paths at both levels, so clone co-assignment — the property dedup
    * actually needs — holds (DedupSpec: ≥99% planted-clone prune recall;
    * exact equality to flat on well-separated cells). This is the
    * documented scale path when flat assignment's n·k term dominates —
    * with k = √(n/2) it takes total semantic-dedup cost below O(n^1.5). */
  def semanticAssignTwoLevel(emb: DataFrame, k: Int, branch: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("e"))
    val cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    val coarse = e.orderBy(col("vec_id")).limit(branch)
      .select(col("vec_id").as("gid"), col("e").as("ge"))
    // fine centroid → coarse cell (computed over the tiny centroid set)
    val centMap = cents.crossJoin(broadcast(coarse))
      .select(col("cid"), cosine(col("ce"), col("ge")).as("gsim"), col("gid"))
      .groupBy(col("cid"))
      .agg(max_by(col("gid"), struct(col("gsim"), -col("gid"))).as("gid"))
      .join(cents, Seq("cid"))
    // vector → coarse cell
    val vg = e.crossJoin(broadcast(coarse))
      .select(col("vec_id"), cosine(col("e"), col("ge")).as("gs"), col("gid"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("gid"), struct(col("gs"), -col("gid"))).as("gid"))
      .join(e, Seq("vec_id"))
    // vector → fine centroid within its coarse cell only
    vg.join(broadcast(centMap), Seq("gid"))
      .select(col("vec_id"), col("cid"), cosine(col("e"), col("ce")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("cid"))
      .join(e, Seq("vec_id"))
      .select(col("cid"), col("vec_id"), col("e"))
      .localCheckpoint(false)
  }

  /** The prune stage of [[semanticDedupStats]]: (cid, vec_id) of every
    * vector with cosine ≥ tau to ANY lower-id vector in its cell. */
  def semanticPruned(assigned: DataFrame, tau: Double): DataFrame =
    assigned.as("a").join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine(col("a.e"), col("b.e")) >= tau)
      .select(col("b.cid").as("cid"), col("b.vec_id").as("vec_id"))
      .distinct()

  def semanticDedupStats(emb: DataFrame, k: Int, tau: Double): DataFrame =
    semanticStats(semanticAssign(emb, k), tau)

  /** Per-cell population/attrition report over any (cid, vec_id, e)
    * assignment — shared by the flat (q90) and two-level (q93) paths. */
  def semanticStats(assigned: DataFrame, tau: Double): DataFrame = {
    val pruned = semanticPruned(assigned, tau)
    val stats = assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
    val p = pruned.groupBy(col("cid")).agg(count(lit(1)).as("n_pruned"),
      min(col("vec_id")).as("min_pruned"), max(col("vec_id")).as("max_pruned"))
    stats.join(p, Seq("cid"), "left")
      .na.fill(0L, Seq("n_pruned"))
      .select(col("cid"), col("n_vecs"), col("n_pruned"),
        (col("n_vecs") - col("n_pruned")).as("n_kept"),
        col("min_pruned"), col("max_pruned"))
      .orderBy(col("cid"))
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- q46: MinHash + banded LSH near-dup pairs (the 100 TB dedup) ----
    "q46_minhash_lsh" -> QueryDef(
      build = (spark, dir) =>
        MinHashLSH.nearDupPairs(
          Tables.documents(spark, dir), "doc_id", "text",
          shingleN = 3, numHashes = 64, bands = 32, threshold = 0.4),
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
                   i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+2])) AS shingles
          FROM documents),
        ex AS MATERIALIZED (
          SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle
          FROM sh WHERE len(shingles) > 0),
        pairs AS MATERIALIZED (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_common
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b, n_common,
               ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) AS jaccard
        FROM pairs
        WHERE ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) >= 0.4
        ORDER BY doc_a, doc_b"""),
      headline = true),

    // ---- q191: incremental LSH index maintenance ≡ one-shot batch ----
    // The ingest-time fuzzy-dedup contract ([[graft.operators
    // .IncrementalLsh]]): the corpus arrives as TWO append batches
    // (even doc_ids, then odd); each append computes signatures for its
    // OWN docs only and emits exactly the pairs whose second member it
    // carries (new×index cross + new×new self). The union of the two
    // emissions must equal the one-shot q46 self-join — same banding ⇒
    // identical candidate set, partitioned by which batch completed
    // each pair — so the oracle is q46's exact-Jaccard SQL verbatim.
    // Batch dual of the q176 streaming law, with the index as a TABLE
    // instead of operator state.
    "q191_incremental_lsh" -> QueryDef(
      build = (spark, dir) => {
        import graft.operators.IncrementalLsh
        val docs = Tables.documents(spark, dir)
        val b0 = IncrementalLsh.bucketRows(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        val b1 = IncrementalLsh.bucketRows(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        val cands = IncrementalLsh.appendCandidates(b0.limit(0), b0)
          .unionAll(IncrementalLsh.appendCandidates(b0, b1))
        MinHashLSH.verifyCandidates(cands,
          MinHashLSH.shingled(docs, "doc_id", "text"), threshold = 0.4)
      },
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
                   i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+2])) AS shingles
          FROM documents),
        ex AS MATERIALIZED (
          SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle
          FROM sh WHERE len(shingles) > 0),
        pairs AS MATERIALIZED (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_common
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b, n_common,
               ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) AS jaccard
        FROM pairs
        WHERE ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) >= 0.4
        ORDER BY doc_a, doc_b""")),

    // ---- q56: near-dup pairs → connected-component clusters ----
    // Distributed min-label propagation over the q46 pair graph; the
    // oracle recomputes components with a recursive CTE (reachability
    // closure → min reachable id), so the driver's hash compare proves the
    // iterative dataflow converged to the true components.
    "q56_dedup_clusters" -> QueryDef(
      build = (spark, dir) => {
        val pairs = MinHashLSH.nearDupPairs(
          Tables.documents(spark, dir), "doc_id", "text",
          shingleN = 3, numHashes = 64, bands = 32, threshold = 0.4)
        MinHashLSH.dupClusters(pairs)
      },
      oracle = Some("""
        WITH RECURSIVE sh AS MATERIALIZED (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
                   i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+2])) AS shingles
          FROM documents),
        ex AS MATERIALIZED (
          SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle
          FROM sh WHERE len(shingles) > 0),
        pairs AS MATERIALIZED (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, a.n_sh, b.n_sh
          HAVING ROUND(CAST(COUNT(*) AS DOUBLE) / (a.n_sh + b.n_sh - COUNT(*)), 6) >= 0.4),
        -- edges MATERIALIZED (round 15, VERDICT r14 #8): the recursive
        -- closure re-scans it every iteration, and without
        -- materialization each scan re-ran the whole shingle self-join
        edges AS MATERIALIZED (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        nodes AS (SELECT DISTINCT src AS doc_id FROM edges)
        SELECT n.doc_id,
               LEAST(n.doc_id, MIN(r.dst)) AS cluster_id
        FROM nodes n JOIN reach r ON r.src = n.doc_id
        GROUP BY n.doc_id
        ORDER BY n.doc_id""")),

    // ---- q57: reproducible stratified sampling profile ----
    // Training-set construction: per-language fractions over documents via
    // partition-independent hash membership (operators.Sampling). The
    // membership bucket derives from xxhash64 (engine-specific), so Verify
    // materializes the per-doc buckets (_q57_input) and DuckDB recomputes
    // every downstream decision — threshold filter, per-stratum counts,
    // achieved rate, 3σ bound, resample diff — over identical values.
    // xxhash64 itself stays spec-tested. The output additionally CARRIES
    // its own evidence, checked by compare.py's self-check and mirrored
    // in SamplingSpec:
    //   resample_diff  = |sample ∆ re-sample| for an independently built
    //                    second sample, same seed — 0 row-for-row proves
    //                    reproducibility;
    //   frac_in_bounds = |achieved - target| ≤ 3σ binomial given the
    //                    stratum population — proves the rate is honest.
    "q57_stratified_sample" -> QueryDef(
      build = (spark, dir) => {
        import graft.operators.Sampling
        import spark.implicits._
        val fracs = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25,
          "es" -> 0.25, "zh" -> 0.1)
        val docs = Tables.documents(spark, dir)
        def sample() = Sampling.stratifiedSample(
          docs, "lang", Seq("doc_id"), fracs, seed = 42L)
        val s1 = sample()
        val s2 = sample()
        val targets = fracs.toSeq.sortBy(_._1).toDF("lang", "target_frac")
        val totals = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"))
        val diff = s1.select(col("lang"), col("doc_id"))
          .exceptAll(s2.select(col("lang"), col("doc_id")))
          .unionAll(s2.select(col("lang"), col("doc_id"))
            .exceptAll(s1.select(col("lang"), col("doc_id"))))
          .groupBy(col("lang")).agg(count(lit(1)).as("resample_diff"))
        s1.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
          .join(totals, Seq("lang"))
          .join(broadcast(targets), Seq("lang"))
          .join(diff, Seq("lang"), "left")
          .na.fill(0L, Seq("resample_diff"))
          .withColumn("achieved_frac",
            round(col("n_sampled").cast("double") / col("n_total"), 6))
          .withColumn("frac_in_bounds",
            abs(col("achieved_frac") - col("target_frac")) <=
              lit(3.0) * sqrt(col("target_frac") * (lit(1.0) - col("target_frac"))
                / col("n_total")))
          .select(col("lang"), col("n_total"), col("n_sampled"),
            col("target_frac"), col("achieved_frac"), col("frac_in_bounds"),
            col("resample_diff"), col("min_id"), col("max_id"))
          .orderBy(col("lang"))
      },
      // Thresholds mirror the query's fracs map: (frac * 1e6).toLong.
      // s1/s2 in DuckDB both read the SAME materialized bucket, so the
      // oracle's resample_diff is structurally 0 — matching the engine,
      // whose two hash evaluations must agree for the gate to pass.
      oracle = Some(s"""
        WITH b AS (SELECT doc_id, lang, bucket
                   FROM read_parquet('${Gps.VerifyOutToken}/_q57_input/*.parquet')),
        thr AS (SELECT * FROM (VALUES ('en', 500000), ('de', 250000),
                                      ('fr', 250000), ('es', 250000),
                                      ('zh', 100000)) t(lang, threshold)),
        s1 AS (SELECT b.doc_id, b.lang FROM b JOIN thr ON b.lang = thr.lang
               WHERE b.bucket < thr.threshold),
        diff AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS resample_diff
                 FROM ((SELECT lang, doc_id FROM s1
                        EXCEPT ALL SELECT lang, doc_id FROM s1)
                       UNION ALL
                       (SELECT lang, doc_id FROM s1
                        EXCEPT ALL SELECT lang, doc_id FROM s1))
                 GROUP BY lang),
        totals AS (SELECT lang, COUNT(*) AS n_total FROM documents
                   GROUP BY lang),
        agg AS (SELECT lang, COUNT(*) AS n_sampled,
                       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
                FROM s1 GROUP BY lang)
        SELECT a.lang, t.n_total, a.n_sampled,
               CAST(thr.threshold AS DOUBLE) / 1000000 AS target_frac,
               ROUND(CAST(a.n_sampled AS DOUBLE) / t.n_total, 6)
                 AS achieved_frac,
               ABS(ROUND(CAST(a.n_sampled AS DOUBLE) / t.n_total, 6)
                   - CAST(thr.threshold AS DOUBLE) / 1000000)
                 <= 3.0 * sqrt((CAST(thr.threshold AS DOUBLE) / 1000000)
                      * (1.0 - CAST(thr.threshold AS DOUBLE) / 1000000)
                      / t.n_total) AS frac_in_bounds,
               COALESCE(d.resample_diff, CAST(0 AS BIGINT)) AS resample_diff,
               a.min_id, a.max_id
        FROM agg a
        JOIN totals t ON a.lang = t.lang
        JOIN thr ON a.lang = thr.lang
        LEFT JOIN diff d ON a.lang = d.lang
        ORDER BY a.lang""")),

    // ---- q47: SimHash fingerprints + Hamming nearest neighbor ----
    // The fingerprints themselves have no SQL equivalent, so Verify
    // materializes the Spark-computed (doc_id, simhash) pairs
    // (VerifyInputs) and DuckDB recomputes the nearest-neighbor search
    // BRUTE-FORCE over them — an independent algorithm proving the
    // pigeonhole block equijoin finds exactly the all-pairs answer.
    "q47_simhash" -> QueryDef(
      build = (spark, dir) =>
        SimHash.fingerprints(
          Tables.documents(spark, dir), "doc_id", "text", maxHamming = 3),
      oracle = Some(s"""
        WITH fp AS (SELECT doc_id, simhash
                    FROM read_parquet('${Gps.VerifyOutToken}/_q47_input/*.parquet')),
        nn AS (SELECT a.doc_id AS id_a,
                      CAST(MIN(bit_count(xor(a.simhash, b.simhash))) AS INTEGER) AS nn_hamming
               FROM fp a JOIN fp b ON a.doc_id <> b.doc_id
               WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
               GROUP BY a.doc_id)
        SELECT fp.doc_id, fp.simhash, nn.nn_hamming
        FROM fp LEFT JOIN nn ON fp.doc_id = nn.id_a
        ORDER BY fp.doc_id""")),

    // ---- q89: chunk-level corpus dedup (CCNet line-dedup analog) ----
    // See chunkDedupStats. 10-token chunks; a later document loses every
    // chunk some earlier (doc_id, chunk_idx) already contributed, and the
    // per-doc report (surviving chunk count, surviving token fraction) is
    // the auditable attrition a curation run logs.
    "q89_chunk_dedup" -> QueryDef(
      build = (spark, dir) =>
        chunkDedupStats(Tables.documents(spark, dir), "doc_id", "text", 10),
      oracle = Some("""
        WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                   FROM documents),
        n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
              FROM t),
        ci AS (SELECT doc_id, n_tokens, toks,
                      unnest(range(0, (len(toks) - 1) // 10 + 1)) AS i
               FROM n),
        c AS (SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS chunk_idx,
                     array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS chunk
              FROM ci),
        r AS (SELECT doc_id, n_tokens, chunk,
                     ROW_NUMBER() OVER (PARTITION BY md5(chunk)
                       ORDER BY doc_id, chunk_idx) AS rn
              FROM c)
        SELECT doc_id, n_tokens, COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(SUM(CASE WHEN rn = 1
                    THEN len(string_split(chunk, ' ')) ELSE 0 END) AS BIGINT)
                 AS tokens_kept,
               ROUND(CAST(SUM(CASE WHEN rn = 1
                      THEN len(string_split(chunk, ' ')) ELSE 0 END) AS DOUBLE)
                     / n_tokens, 6) AS kept_frac
        FROM r GROUP BY doc_id, n_tokens ORDER BY doc_id""")),

    // ---- q90: SemDeDup semantic dedup over embeddings ----
    // See semanticDedupStats. Deterministic IVF cells (k = 16 lowest-id
    // centroids, as q54) + within-cell cosine pruning at the corpus's
    // q52 near-dup threshold; reports per-cell population and attrition.
    // Every stage is relational over the raw embeddings, so the oracle
    // rebuilds the index end-to-end in DuckDB (list_cosine_similarity ≡
    // the codegen'd cosine, proven bit-identical by the q50/q52 gates).
    "q90_semantic_dedup" -> QueryDef(
      build = (spark, dir) =>
        semanticDedupStats(
          Tables.embeddings(spark, dir)
            .select(col("vec_id"), vec64(col("embedding")).as("e")),
          k = 16, tau = 0.38),
      oracle = Some("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        cents AS (SELECT vec_id AS cid, emb AS cemb
                  FROM e ORDER BY vec_id LIMIT 16),
        sims AS (SELECT e.vec_id, cid,
                        list_cosine_similarity(e.emb, cemb) AS sim
                 FROM e CROSS JOIN cents),
        assigned AS (SELECT vec_id, cid FROM (
                       SELECT vec_id, cid,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cid) AS cr
                       FROM sims) WHERE cr = 1),
        pruned AS (SELECT DISTINCT b.cid, b.vec_id
                   FROM assigned a JOIN assigned b
                     ON a.cid = b.cid AND a.vec_id < b.vec_id
                   JOIN e ea ON ea.vec_id = a.vec_id
                   JOIN e eb ON eb.vec_id = b.vec_id
                   WHERE list_cosine_similarity(ea.emb, eb.emb) >= 0.38),
        s AS (SELECT cid, COUNT(*) AS n_vecs FROM assigned GROUP BY cid),
        p AS (SELECT cid, COUNT(*) AS n_pruned, MIN(vec_id) AS min_pruned,
                     MAX(vec_id) AS max_pruned
              FROM pruned GROUP BY cid)
        SELECT s.cid, s.n_vecs,
               COALESCE(p.n_pruned, CAST(0 AS BIGINT)) AS n_pruned,
               s.n_vecs - COALESCE(p.n_pruned, CAST(0 AS BIGINT)) AS n_kept,
               p.min_pruned, p.max_pruned
        FROM s LEFT JOIN p USING (cid) ORDER BY s.cid""")),

    // ---- q91: the dedup funnel capstone ----
    // The three dedup tiers chained the way a curation run stacks them,
    // cheapest first: exact text dedup (md5 keep-lowest-id) → chunk-level
    // dedup (drop docs keeping < 50% of their tokens after corpus-wide
    // chunk dedup — mostly-duplicated docs) → semantic dedup (SemDeDup
    // prune over each survivor's embedding; docs without an embedding
    // row pass through — at sf0.1 only 2k of 5k docs have vectors, which
    // the oracle mirrors). Output is the per-stage survivor count: the
    // attrition report a pipeline owner actually reads. Every stage is
    // relational, so DuckDB recomputes the whole funnel end-to-end.
    "q91_dedup_funnel" -> QueryDef(
      build = (spark, dir) => {
        val docs = Tables.documents(spark, dir)
        val s1 = docs
          .withColumn("rn", row_number().over(
            Window.partitionBy(md5(col("text").cast("binary")))
              .orderBy(col("doc_id"))))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("text"))
        val cs = chunkDedupStats(s1, "doc_id", "text", 10)
        val s2 = s1.join(cs.filter(col("kept_frac") >= 0.5)
          .select(col("doc_id")), Seq("doc_id"))
        val emb = Tables.embeddings(spark, dir)
          .join(s2.select(col("doc_id").as("vec_id")), Seq("vec_id"))
          .select(col("vec_id"), vec64(col("embedding")).as("e"))
        val pruned = semanticPruned(semanticAssign(emb, 16), 0.38)
          .select(col("vec_id").as("doc_id"))
        val s3 = s2.join(pruned, Seq("doc_id"), "left_anti")
        def stage(name: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).as("n_docs"))
            .select(lit(name).as("stage"), col("n_docs"))
        stage("0_input", docs)
          .unionAll(stage("1_exact", s1))
          .unionAll(stage("2_chunk", s2))
          .unionAll(stage("3_semantic", s3))
          .orderBy(col("stage"))
      },
      oracle = Some("""
        WITH s1 AS (SELECT doc_id, text FROM (
               SELECT doc_id, text,
                      ROW_NUMBER() OVER (PARTITION BY md5(text)
                        ORDER BY doc_id) AS rn
               FROM documents) WHERE rn = 1),
        t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM s1),
        n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
              FROM t),
        ci AS (SELECT doc_id, n_tokens, toks,
                      unnest(range(0, (len(toks) - 1) // 10 + 1)) AS i
               FROM n),
        c AS (SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS chunk_idx,
                     array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS chunk
              FROM ci),
        r AS (SELECT doc_id, n_tokens, chunk,
                     ROW_NUMBER() OVER (PARTITION BY md5(chunk)
                       ORDER BY doc_id, chunk_idx) AS rn
              FROM c),
        cs AS (SELECT doc_id,
                      ROUND(CAST(SUM(CASE WHEN rn = 1
                             THEN len(string_split(chunk, ' ')) ELSE 0 END)
                            AS DOUBLE) / n_tokens, 6) AS kept_frac
               FROM r GROUP BY doc_id, n_tokens),
        s2 AS (SELECT s1.doc_id FROM s1 JOIN cs USING (doc_id)
               WHERE kept_frac >= 0.5),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings JOIN s2 ON embeddings.vec_id = s2.doc_id),
        cents AS (SELECT vec_id AS cid, emb AS cemb
                  FROM e ORDER BY vec_id LIMIT 16),
        sims AS (SELECT e.vec_id, cid,
                        list_cosine_similarity(e.emb, cemb) AS sim
                 FROM e CROSS JOIN cents),
        assigned AS (SELECT vec_id, cid FROM (
                       SELECT vec_id, cid,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cid) AS cr
                       FROM sims) WHERE cr = 1),
        pruned AS (SELECT DISTINCT b.vec_id
                   FROM assigned a JOIN assigned b
                     ON a.cid = b.cid AND a.vec_id < b.vec_id
                   JOIN e ea ON ea.vec_id = a.vec_id
                   JOIN e eb ON eb.vec_id = b.vec_id
                   WHERE list_cosine_similarity(ea.emb, eb.emb) >= 0.38),
        s3 AS (SELECT doc_id FROM s2 WHERE NOT EXISTS
                 (SELECT 1 FROM pruned p WHERE p.vec_id = s2.doc_id))
        SELECT stage, n_docs FROM (
          SELECT '0_input' AS stage, COUNT(*) AS n_docs FROM documents
          UNION ALL SELECT '1_exact', COUNT(*) FROM s1
          UNION ALL SELECT '2_chunk', COUNT(*) FROM s2
          UNION ALL SELECT '3_semantic', COUNT(*) FROM s3)
        ORDER BY stage""")),

    // ---- q93: two-level (hierarchical) semantic dedup ----
    // q90's report computed over semanticAssignTwoLevel (branch = 4
    // coarse cells over k = 16 fine centroids) — the assignment path for
    // the n·k-bound regime. Every stage is still plain relational
    // algebra, so the oracle rebuilds BOTH argmax levels, the
    // centroid→coarse map, the prune, and the stats end-to-end in DuckDB
    // with no materialized input. Cell contents differ from q90's by
    // design (coarse quantization is approximate); the gate pins that the
    // engine computes exactly the hierarchy it claims to.
    "q93_semantic_dedup_2level" -> QueryDef(
      build = (spark, dir) =>
        semanticStats(
          semanticAssignTwoLevel(
            Tables.embeddings(spark, dir)
              .select(col("vec_id"), vec64(col("embedding")).as("e")),
            k = 16, branch = 4),
          tau = 0.38),
      oracle = Some("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        cents AS (SELECT vec_id AS cid, emb AS cemb
                  FROM e ORDER BY vec_id LIMIT 16),
        coarse AS (SELECT vec_id AS gid, emb AS gemb
                   FROM e ORDER BY vec_id LIMIT 4),
        cmap AS (SELECT cid, gid FROM (
                   SELECT c.cid, g.gid,
                          ROW_NUMBER() OVER (PARTITION BY c.cid
                            ORDER BY list_cosine_similarity(c.cemb, g.gemb)
                              DESC, g.gid) AS rn
                   FROM cents c CROSS JOIN coarse g) WHERE rn = 1),
        vg AS (SELECT vec_id, gid FROM (
                 SELECT e.vec_id, g.gid,
                        ROW_NUMBER() OVER (PARTITION BY e.vec_id
                          ORDER BY list_cosine_similarity(e.emb, g.gemb)
                            DESC, g.gid) AS rn
                 FROM e CROSS JOIN coarse g) WHERE rn = 1),
        assigned AS (SELECT vec_id, cid FROM (
                       SELECT v.vec_id, m.cid,
                              ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY list_cosine_similarity(ev.emb, c.cemb)
                                  DESC, m.cid) AS rn
                       FROM vg v
                       JOIN cmap m ON m.gid = v.gid
                       JOIN e ev ON ev.vec_id = v.vec_id
                       JOIN cents c ON c.cid = m.cid) WHERE rn = 1),
        pruned AS (SELECT DISTINCT b.cid, b.vec_id
                   FROM assigned a JOIN assigned b
                     ON a.cid = b.cid AND a.vec_id < b.vec_id
                   JOIN e ea ON ea.vec_id = a.vec_id
                   JOIN e eb ON eb.vec_id = b.vec_id
                   WHERE list_cosine_similarity(ea.emb, eb.emb) >= 0.38),
        s AS (SELECT cid, COUNT(*) AS n_vecs FROM assigned GROUP BY cid),
        p AS (SELECT cid, COUNT(*) AS n_pruned, MIN(vec_id) AS min_pruned,
                     MAX(vec_id) AS max_pruned
              FROM pruned GROUP BY cid)
        SELECT s.cid, s.n_vecs,
               COALESCE(p.n_pruned, CAST(0 AS BIGINT)) AS n_pruned,
               s.n_vecs - COALESCE(p.n_pruned, CAST(0 AS BIGINT)) AS n_kept,
               p.min_pruned, p.max_pruned
        FROM s LEFT JOIN p USING (cid) ORDER BY s.cid""")),

    // ---- q102: fuzzy decontamination (cross-corpus near-dup join) ----
    // q71 catches VERBATIM eval leakage by exact long-n-gram overlap;
    // this catches NEAR-verbatim leakage (whitespace edits, dropped
    // prefixes, light paraphrase) the way the public pipelines do it:
    // MinHash/LSH near-dup join BETWEEN the eval set and the training
    // corpus. The eval set here is the first 10 docs with their first
    // token dropped — planted near-copies at shingle-Jaccard ~0.9 — and
    // the oracle recomputes the exact cross-corpus Jaccard join, so the
    // hash match doubles as an LSH recall-1 certificate at the 0.5
    // threshold (q46's argument, across corpora).
    //
    // 100 TB posture: |eval|·bands + |corpus|·bands 24-byte band rows on
    // the wire, never shingle arrays; at real scale the eval side's
    // buckets would broadcast and the corpus side wouldn't shuffle at
    // all.
    "q102_fuzzy_decontamination" -> QueryDef(
      build = (spark, dir) => {
        val evalSet = Tables.documents(spark, dir)
          .filter(col("doc_id") < 10)
          .select(col("doc_id").as("eval_id"),
            regexp_replace(trim(col("text")), "^[^ ]+ ", "").as("text"))
        MinHashLSH.nearDupPairsBetween(
            evalSet, "eval_id",
            Tables.documents(spark, dir), "doc_id",
            "text", threshold = 0.5)
          .select(col("left_id").as("eval_id"),
            col("right_id").as("train_id"), col("n_common"), col("jaccard"))
          .orderBy(col("eval_id"), col("train_id"))
      },
      oracle = Some("""
        WITH ev AS (SELECT doc_id AS eval_id,
                           regexp_replace(trim(text), '^[^ ]+ ', '') AS text
                    FROM documents WHERE doc_id < 10),
        shE AS (SELECT eval_id,
                       list_distinct(list_transform(
                         range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
                         i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                              string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                              string_split_regex(trim(text), '\s+')[i+2])) AS shingles
                FROM ev),
        shT AS (SELECT doc_id AS train_id,
                       list_distinct(list_transform(
                         range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
                         i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                              string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                              string_split_regex(trim(text), '\s+')[i+2])) AS shingles
                FROM documents),
        exE AS (SELECT eval_id, len(shingles) AS n_e, UNNEST(shingles) AS shingle
                FROM shE WHERE len(shingles) > 0),
        exT AS (SELECT train_id, len(shingles) AS n_t, UNNEST(shingles) AS shingle
                FROM shT WHERE len(shingles) > 0),
        pairs AS (SELECT e.eval_id, t.train_id, e.n_e, t.n_t,
                         COUNT(*) AS n_common
                  FROM exE e JOIN exT t ON e.shingle = t.shingle
                  GROUP BY 1, 2, 3, 4),
        j AS (SELECT eval_id, train_id, CAST(n_common AS BIGINT) AS n_common,
                     ROUND(CAST(n_common AS DOUBLE)
                           / (n_e + n_t - n_common), 6) AS jaccard
              FROM pairs)
        SELECT eval_id, train_id, n_common, jaccard FROM j
        WHERE jaccard >= CAST(0.5 AS DOUBLE)
        ORDER BY eval_id, train_id""")),

    // ---- q113: prefix-filtered EXACT similarity join (PPJoin family) ----
    // The same exact-Jaccard pair set as q44, computed the scalable way:
    // rare-first prefix filtering prunes the candidate space losslessly
    // (see [[graft.operators.PrefixFilterJoin]]), then candidates verify
    // against their full shingle sets. The oracle is the brute-force
    // all-pairs SQL — a hash match IS the losslessness certificate, the
    // exact-join dual of q46's LSH recall-1 gate. Prefix sized at
    // t' = 0.19 < the 0.2 output threshold because the output filter
    // applies to the ROUNDED jaccard (a true 0.1999996 rounds up into
    // the oracle's output; the margin keeps such pairs inside the
    // pigeonhole guarantee).
    "q113_prefix_filter_join" -> QueryDef(
      build = (spark, dir) => {
        import graft.functions.TextFunctions.{shingles, tokens}
        val d = Tables.spread(Tables.documents(spark, dir))
          .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
          .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"))
          .filter(col("n_sh") > 0)
        val ex = d.select(col("doc_id"), col("n_sh"),
            explode(col("sh")).as("shingle"))
          .select(col("doc_id"), col("n_sh"),
            xxhash64(col("shingle")).as("shash"))
        graft.operators.PrefixFilterJoin
          .similarPairs(ex, "doc_id", "n_sh", "shash",
            threshold = 0.2, prefixThreshold = 0.19)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
                   i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+2])) AS shingles
          FROM documents),
        ex AS MATERIALIZED (
          SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle
          FROM sh WHERE len(shingles) > 0),
        pairs AS MATERIALIZED (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_common
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b, n_common,
               ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) AS jaccard
        FROM pairs
        WHERE ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) >= 0.2
        ORDER BY doc_a, doc_b""")),

    // ---- q117: containment join — the asymmetric subset-duplicate
    // detector ----
    // Jaccard (q44/q113) misses a short doc copied verbatim into a much
    // longer one: |A∩B|/|A∪B| ≈ |A|/|B| → 0 as B grows, yet the contained
    // doc is exactly the duplicate a training-data dedup pass must drop.
    // Containment C(a→b) = |A∩B|/|A| is the measure that catches it —
    // directional, so a pair can appear in one direction only (small ⊂
    // large, never the reverse at the same threshold). Computed with the
    // probe-side-only prefix filter (see
    // [[graft.operators.PrefixFilterJoin.containmentPairs]]); oracle is
    // the brute-force all-pairs SQL — a hash match certifies the pruning
    // lossless, like q113's. t' = 0.49 < 0.5 for the rounded-threshold
    // margin.
    "q117_containment_join" -> QueryDef(
      build = (spark, dir) => {
        import graft.functions.TextFunctions.{shingles, tokens}
        val d = Tables.spread(Tables.documents(spark, dir))
          .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
          .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"))
          .filter(col("n_sh") > 0)
        val ex = d.select(col("doc_id"), col("n_sh"),
            explode(col("sh")).as("shingle"))
          .select(col("doc_id"), col("n_sh"),
            xxhash64(col("shingle")).as("shash"))
        graft.operators.PrefixFilterJoin
          .containmentPairs(ex, "doc_id", "n_sh", "shash",
            threshold = 0.5, prefixThreshold = 0.49)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
                   i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+2])) AS shingles
          FROM documents),
        ex AS MATERIALIZED (
          SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle
          FROM sh WHERE len(shingles) > 0),
        pairs AS MATERIALIZED (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, COUNT(*) AS n_common
          FROM ex a JOIN ex b ON a.shingle = b.shingle
                             AND a.doc_id != b.doc_id
          GROUP BY 1, 2, 3)
        SELECT doc_a, doc_b, n_common,
               ROUND(CAST(n_common AS DOUBLE) / n_a, 6) AS containment
        FROM pairs
        WHERE ROUND(CAST(n_common AS DOUBLE) / n_a, 6) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // ---- q119: content-defined chunking (CDC) + cross-doc chunk
    // sharing ----
    // Fixed-size chunking (q89's 10-token blocks) breaks under edits: one
    // inserted token shifts every later block, so an edited near-copy
    // shares almost nothing. Content-defined chunking (the rsync /
    // LBFS / FastCDC family) cuts where a rolling w-char window hashes
    // into a fixed class — boundaries are content-local, so an edit
    // re-chunks O(1) chunks and everything after the edit window stays
    // byte-identical. This is how storage dedup and long-document
    // near-dup both survive insertions.
    //
    // Per doc: chunk count, mean chunk length, and how many chunks also
    // appear (byte-identical) in ANOTHER doc — the cross-doc reuse signal
    // a chunk-level dedup pass would act on.
    //
    // 100 TB posture: boundary detection is a per-row expression tree
    // (one corpus pass, no char-level row explosion — see
    // [[graft.functions.TextFunctions.cdcBoundaries]]); the sharing join
    // is chunk-hash keyed (high-cardinality, skew-free); per-doc rollup
    // is one keyed agg. Nothing is quadratic and no stage ships text
    // larger than the chunks themselves.
    "q119_cdc_chunking" -> QueryDef(
      build = (spark, dir) => {
        import graft.functions.TextFunctions.cdcChunks
        val chunks = Tables.spread(Tables.documents(spark, dir))
          .select(col("doc_id"), explode(cdcChunks(col("text"), 8)).as("c"))
          .select(col("doc_id"), md5(col("c.ch")).as("sig"),
            length(col("c.ch")).as("clen"))
        val shared = chunks.groupBy(col("sig"))
          .agg(countDistinct(col("doc_id")).as("nd"))
        chunks.join(shared, "sig")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            round(sum(col("clen")).cast("double") / count(lit(1)), 6)
              .as("avg_chunk_len"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"),
            round(sum(when(col("nd") > 1, 1L).otherwise(0L)).cast("double")
              / count(lit(1)), 6).as("shared_frac"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH b0 AS (
          SELECT doc_id, text, len(text) AS L,
                 list_filter(range(8, len(text) + 1),
                   i -> substr(md5(substr(text, i - 7, 8)), 1, 1) = '0') AS hc
          FROM documents WHERE len(text) > 0),
        bs AS (
          SELECT doc_id, text,
                 CASE WHEN len(hc) > 0 AND hc[-1] = L THEN hc
                      ELSE list_append(hc, L) END AS b
          FROM b0),
        ch AS (
          SELECT doc_id,
                 substr(text,
                        (CASE WHEN j = 1 THEN 0 ELSE b[j - 1] END) + 1,
                        cur - (CASE WHEN j = 1 THEN 0 ELSE b[j - 1] END))
                   AS chunk
          FROM (SELECT doc_id, text, b, UNNEST(b) AS cur,
                       generate_subscripts(b, 1) AS j
                FROM bs)),
        sg AS (SELECT doc_id, md5(chunk) AS sig, len(chunk) AS clen FROM ch),
        sh AS (SELECT sig, COUNT(DISTINCT doc_id) AS nd FROM sg GROUP BY sig)
        SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
               ROUND(CAST(SUM(clen) AS DOUBLE) / COUNT(*), 6) AS avg_chunk_len,
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_shared,
               ROUND(CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS shared_frac
        FROM sg s JOIN sh USING (sig)
        GROUP BY s.doc_id ORDER BY s.doc_id""")),

    // ---- q202: winnowing fingerprint overlap (the MOSS algorithm) ----
    // Substring-level near-dup detection via local fingerprinting
    // ([[graft.operators.Winnowing]]): hash every 3-gram, keep each
    // 4-window's minimum (hash, pos) — any shared token run of >= 6
    // tokens yields a shared fingerprint BY CONSTRUCTION (the winnowing
    // guarantee), which MinHash's random sampling cannot promise. Pairs
    // sharing >= 3 fingerprints emit with their shared count.
    // Determinism: the k-gram hash is md5-derived (engine-portable) and
    // the (hash, pos) tie-break is packed into one integer, so Spark's
    // windowed MIN and the oracle's are the same comparison.
    //
    // 100 TB posture: fingerprinting is partition-local per doc; the
    // only cross-doc work is the fingerprint-hash equijoin with MOSS's
    // over-common-fingerprint cap (<= 50 docs/fp) bounding fan-out —
    // q46's band-bucket discipline applied to substring overlap.
    "q202_winnowing_overlap" -> QueryDef(
      build = (spark, dir) => {
        import graft.operators.Winnowing
        val fps = Winnowing.fingerprints(
          Tables.documents(spark, dir), "doc_id", "text", k = 3, w = 4)
        Winnowing.sharedPairs(fps, minShared = 3, maxDocsPerFp = 50)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      oracle = Some("""
        WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i - 1 AS gpos,
                     array_to_string(toks[i:i+2], ' ') AS gram,
                     len(toks) - 2 AS gcount
              FROM t, LATERAL (SELECT unnest(generate_series(1,
                     len(toks) - 2)) AS i) u
              WHERE len(toks) >= 3),
        v AS (SELECT doc_id, gpos, gcount,
                     ('0x' || substr(md5(gram), 1, 10))::BIGINT * 1048576
                       + gpos AS v
              FROM g),
        s AS (SELECT doc_id, gcount, gpos,
                     MIN(v) OVER (PARTITION BY doc_id ORDER BY gpos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS selv
              FROM v),
        f AS (SELECT DISTINCT doc_id, selv // 1048576 AS fp
              FROM s WHERE gpos <= gcount - 4),
        kept AS (SELECT doc_id, fp FROM (
                   SELECT doc_id, fp,
                          COUNT(*) OVER (PARTITION BY fp) AS n_docs
                   FROM f) WHERE n_docs <= 50)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_shared
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
        ORDER BY doc_a, doc_b"""),
      headline = true), // round-8 headline #16: the map-side winnowing op

    // ---- q252: MinHash estimator-accuracy audit (round 9) ----
    // The error certificate the whole fuzzy-dedup stack rests on (the
    // q221-HLL move applied to q46's estimator): over ALL pairs of a
    // bounded audit corpus — a deterministic sample (doc_id % 17 = 0;
    // stays ~1k docs at any corpus size, so the all-pairs stage is
    // bounded BY CONSTRUCTION, like q50's broadcast query side) plus
    // token-prefix variants at 3/4, 1/2 and 1/4 length that PLANT the
    // similarity spectrum (prefix shingles nest, so true J ≈ the kept
    // fraction) — compare the 64-hash signature match-fraction estimate
    // against the EXACT shingle Jaccard, per true-similarity decile.
    // Theory says E[est] = J with sd √(J(1−J)/64) ≲ 6 pp; the measured
    // per-bin means track the exact means with mean |error| ≲ 60k ppm —
    // measured, not asserted. The oracle rebuilds the variants and the
    // exact side from raw documents (q46's shingle SQL) and the
    // estimate from the materialized signatures, independently.
    "q252_minhash_accuracy" -> QueryDef(
      build = (spark, dir) => {
        val sig = minhashAuditSig(spark, dir).localCheckpoint(false)
        val withSh = MinHashLSH.shingled(
          minhashAuditDocs(spark, dir), "doc_id", "text", 3)
        val ex = withSh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        val common = ex.as("a").join(ex.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_common"))
        val a = sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
          col("n_sh").as("n_a"))
        val b = sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
          col("n_sh").as("n_b"))
        a.join(b, col("doc_a") < col("doc_b"))
          .join(common, Seq("doc_a", "doc_b"), "left")
          .na.fill(0L, Seq("n_common"))
          .select(col("n_a"), col("n_b"), col("n_common"),
            aggregate(zip_with(col("sig_a"), col("sig_b"),
              (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), _ + _)
              .as("matches"))
          .withColumn("jac_ppm",
            expr("(n_common * 1000000) div (n_a + n_b - n_common)"))
          .withColumn("est_ppm", expr("(matches * 1000000) div 64"))
          .withColumn("bin", least(expr("jac_ppm div 100000"), lit(9L)))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("sum(jac_ppm) div count(1)").as("mean_exact_ppm"),
            expr("sum(est_ppm) div count(1)").as("mean_est_ppm"),
            expr("sum(abs(est_ppm - jac_ppm)) div count(1)")
              .as("mean_abs_err_ppm"))
          .orderBy(col("bin"))
      },
      oracle = Some(s"""
        WITH s AS (SELECT doc_id, MAX(n_sh) AS n_sh,
                          list(v ORDER BY h) AS sig
                   FROM read_parquet('${Gps.VerifyOutToken}/_q252_input/*.parquet')
                   GROUP BY doc_id),
        base AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                 FROM documents WHERE doc_id % 17 = 0),
        var AS (SELECT doc_id * 4 + 0 AS doc_id, t FROM base
                UNION ALL
                SELECT doc_id * 4 + 1,
                       t[1 : GREATEST(len(t) * 3 // 4, 1)] FROM base
                UNION ALL
                SELECT doc_id * 4 + 2,
                       t[1 : GREATEST(len(t) * 2 // 4, 1)] FROM base
                UNION ALL
                SELECT doc_id * 4 + 3,
                       t[1 : GREATEST(len(t) * 1 // 4, 1)] FROM base),
        sh AS (SELECT doc_id,
                      list_distinct(list_transform(
                        range(1, GREATEST(len(t) - 1, 1)),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        AS shingles
               FROM var),
        ex AS (SELECT doc_id, UNNEST(shingles) AS shingle
               FROM sh WHERE len(shingles) > 0),
        common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          CAST(COUNT(*) AS BIGINT) AS n_common
                   FROM ex a JOIN ex b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.n_sh AS n_a, b.n_sh AS n_b,
                     CAST(list_sum(list_transform(list_zip(a.sig, b.sig),
                       q -> CASE WHEN q[1] = q[2] THEN 1 ELSE 0 END))
                       AS BIGINT) AS matches
              FROM s a JOIN s b ON a.doc_id < b.doc_id),
        j AS (SELECT p.n_a, p.n_b, p.matches,
                     COALESCE(c.n_common, 0) AS n_common
              FROM p LEFT JOIN common c
                ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b),
        m AS (SELECT (n_common * 1000000) // (n_a + n_b - n_common)
                       AS jac_ppm,
                     (matches * 1000000) // 64 AS est_ppm
              FROM j)
        SELECT LEAST(jac_ppm // 100000, 9) AS bin, COUNT(*) AS n_pairs,
               CAST(SUM(jac_ppm) AS BIGINT) // COUNT(*) AS mean_exact_ppm,
               CAST(SUM(est_ppm) AS BIGINT) // COUNT(*) AS mean_est_ppm,
               CAST(SUM(ABS(est_ppm - jac_ppm)) AS BIGINT) // COUNT(*)
                 AS mean_abs_err_ppm
        FROM m GROUP BY 1 ORDER BY bin""")),

    // ---- q265: near-dup CLUSTER formation (connected components) ----
    // Pairs are not the end of dedup — production keeps ONE doc per
    // duplicate GROUP, and groups are the connected components of the
    // near-dup graph (a later copy may share nothing with the earliest
    // original except through an intermediate). Edges: docs sharing a
    // full 10-token chunk (q89's chunk kernel), with a df ≤ 20
    // stop-chunk cap so boilerplate hubs never explode the pairing
    // (the q202 stop-fingerprint move). Components by iterated
    // min-label propagation — 6 unrolled rounds, each ONE keyed
    // join + min-agg (the Suri–Vassilvitskii-style relational form;
    // rounds needed = graph diameter, small for dup clusters by
    // construction). The CONVERGENCE CERTIFICATE is in the data:
    // n_changed_last_round compares rounds 5→6 and must read 0 — a
    // fixed iteration count without that column would be a silent cap.
    // Report: top-30 cluster census (representative = min doc_id) +
    // corpus totals.
    //
    // 100 TB posture: chunk signatures and the df cap are one keyed
    // agg; every propagation round is a doc-keyed equijoin +
    // partial/final min — no global structure ever sits on one node
    // (contrast union-find, which is inherently sequential).
    "q265_dedup_components" -> QueryDef(
      build = (spark, dir) => {
        val parts = componentParts(spark, dir)
        import parts.{lbl, prev, e}
        val cl = lbl.groupBy(col("lbl").as("cluster_rep"))
          .agg(count(lit(1)).as("cluster_size"))
        val su = cl.agg(count(lit(1)).as("n_clusters"),
          sum(when(col("cluster_size") > 1, 1L).otherwise(0L))
            .as("n_multi_clusters"))
        val ne = e.agg(count(lit(1)).as("n_edges"))
        val chg = lbl.withColumnRenamed("lbl", "l6")
          .join(prev.withColumnRenamed("lbl", "l5"), Seq("doc_id"))
          .agg(sum(when(col("l6") =!= col("l5"), 1L).otherwise(0L))
            .as("n_changed_last_round"))
        cl.orderBy(col("cluster_size").desc, col("cluster_rep")).limit(30)
          .crossJoin(broadcast(su)).crossJoin(broadcast(ne))
          .crossJoin(broadcast(chg))
          .orderBy(col("cluster_size").desc, col("cluster_rep"))
      },
      oracle = Some(componentsOracle)),

    // ---- q278: quality-aware dedup retention (keep the BEST, not the
    // first) ----
    // q265 forms the duplicate clusters; this gate applies the
    // RETENTION POLICY production curation actually ships (the
    // NeMo-Curator / near-dedup-pipeline default): within each
    // cluster keep the LONGEST document (token count, doc_id
    // tie-break) — min-id retention silently biases toward whatever
    // arrived first, which on web data means the earliest (often
    // truncated) crawl of a page. The card quantifies exactly that
    // policy delta: per multi-cluster the kept doc vs the min-id rep,
    // plus corpus totals (docs removed, tokens kept/removed, and how
    // often the quality policy disagrees with first-wins). Shares
    // [[componentParts]] and the oracle's propagation CTEs with q265 —
    // the two gates cannot drift.
    //
    // 100 TB posture: everything q265 pays, plus ONE lbl-keyed window
    // (rank within cluster) and a keyed rollup — no new corpus-scale
    // structure.
    "q278_quality_retention" -> QueryDef(
      build = (spark, dir) => {
        val parts = componentParts(spark, dir)
        val toks = Tables.documents(spark, dir)
          .select(col("doc_id"),
            size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
        val w = Window.partitionBy(col("lbl"))
          .orderBy(col("n_tokens").desc, col("doc_id"))
        val ranked = parts.lbl.join(toks, Seq("doc_id"))
          .withColumn("rn", row_number().over(w))
        val cl = ranked.groupBy(col("lbl").as("cluster_rep"))
          .agg(count(lit(1)).as("cluster_size"),
            sum(col("n_tokens")).as("cluster_tokens"),
            max(when(col("rn") === 1, col("doc_id"))).as("kept_doc"),
            max(when(col("rn") === 1, col("n_tokens"))).as("kept_tokens"))
        val su = cl.agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size") - 1).as("n_removed_docs"),
          sum(col("kept_tokens")).as("tokens_kept"),
          sum(col("cluster_tokens") - col("kept_tokens"))
            .as("tokens_removed"),
          sum(when(col("kept_doc") =!= col("cluster_rep"), 1L)
            .otherwise(0L)).as("n_policy_differs"))
        cl.filter(col("cluster_size") > 1)
          .orderBy(col("cluster_size").desc, col("cluster_rep")).limit(20)
          .select(col("cluster_rep"), col("cluster_size"), col("kept_doc"),
            col("kept_tokens"),
            when(col("kept_doc") =!= col("cluster_rep"), 1L).otherwise(0L)
              .as("policy_changed"))
          .crossJoin(broadcast(su))
          .orderBy(col("cluster_size").desc, col("cluster_rep"))
      },
      oracle = Some(s"""
        WITH $componentCtes,
        tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
        m AS (SELECT l6.doc_id, l6.lbl, tk.n_tokens
              FROM l6 JOIN tk USING (doc_id)),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lbl
                ORDER BY n_tokens DESC, doc_id) AS rn FROM m),
        cl AS (SELECT lbl AS cluster_rep,
                      CAST(COUNT(*) AS BIGINT) AS cluster_size,
                      CAST(SUM(n_tokens) AS BIGINT) AS cluster_tokens,
                      MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
                      MAX(CASE WHEN rn = 1 THEN n_tokens END) AS kept_tokens
               FROM r GROUP BY 1),
        su AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
                      CAST(SUM(cluster_size - 1) AS BIGINT)
                        AS n_removed_docs,
                      CAST(SUM(kept_tokens) AS BIGINT) AS tokens_kept,
                      CAST(SUM(cluster_tokens - kept_tokens) AS BIGINT)
                        AS tokens_removed,
                      CAST(SUM(CASE WHEN kept_doc <> cluster_rep
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_policy_differs
               FROM cl)
        SELECT top.cluster_rep, top.cluster_size, top.kept_doc,
               top.kept_tokens,
               CAST(CASE WHEN top.kept_doc <> top.cluster_rep
                 THEN 1 ELSE 0 END AS BIGINT) AS policy_changed,
               su.n_clusters, su.n_removed_docs, su.tokens_kept,
               su.tokens_removed, su.n_policy_differs
        FROM (SELECT * FROM cl WHERE cluster_size > 1
              ORDER BY cluster_size DESC, cluster_rep LIMIT 20) top
        CROSS JOIN su
        ORDER BY top.cluster_size DESC, top.cluster_rep""")),

    // ---- q284: ROUGE-L sequence near-dup screen (Self-Instruct dedup) --
    // See [[graft.operators.RougeL]] — the ORDER-aware similarity the
    // set-based gates (q44 Jaccard, q46 MinHash) cannot express: two
    // docs sharing every token in different order are Jaccard-identical
    // but ROUGE-L-distinct; instruction-data pipelines (Self-Instruct /
    // Alpaca) standardized on ROUGE-L for exactly that reason. Candidate
    // pairs come from the banded-LSH equijoin (q46's set, threshold
    // 0.4 — never all-pairs); each pair is scored by the partition-local
    // LCS DP over whitespace tokens capped at 256 (cost ≤ cap² per
    // pair), then classified at F1 ≥ 0.5. Oracle independence: DuckDB
    // re-derives the PAIR SET by brute-force shingle equijoin (the q46
    // recipe) and LEFT-joins the staged per-pair LCS rows
    // (`_q284_input`, the q277 kernel pattern) — an LSH-missed pair
    // surfaces as a NULL-row mismatch, an extra pair as a row-count
    // mismatch; the DP itself is spec-pinned (RougeLSpec).
    //
    // 100 TB posture: pair generation is the capped banded equijoin;
    // texts arrive by id equijoin; the DP is partition-local with
    // bounded per-pair cost — no stage sees all-pairs.
    "q284_rouge_l_screen" -> QueryDef(
      build = (spark, dir) => {
        import graft.operators.RougeL
        val docs = Tables.documents(spark, dir)
        val pairs = MinHashLSH.nearDupPairs(
          docs, "doc_id", "text",
          shingleN = 3, numHashes = 64, bands = 32, threshold = 0.4)
        RougeL.lcsRows(pairs.select(col("doc_a"), col("doc_b")), docs)
          .withColumn("rouge_p_ppm",
            expr("lcs_len * 1000000 div n_b_tok"))
          .withColumn("rouge_r_ppm",
            expr("lcs_len * 1000000 div n_a_tok"))
          .withColumn("rouge_f_ppm",
            expr("2 * lcs_len * 1000000 div (n_a_tok + n_b_tok)"))
          .withColumn("verdict",
            when(col("rouge_f_ppm") >= 500000L, "near_dup")
              .otherwise("distinct"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      oracle = Some(s"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, GREATEST(len(string_split_regex(trim(text), '\\s+')) - 1, 1)),
                   i -> string_split_regex(trim(text), '\\s+')[i] || ' ' ||
                        string_split_regex(trim(text), '\\s+')[i+1] || ' ' ||
                        string_split_regex(trim(text), '\\s+')[i+2])) AS shingles
          FROM documents),
        ex AS MATERIALIZED (
          SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle
          FROM sh WHERE len(shingles) > 0),
        pairs AS MATERIALIZED (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_common
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        cand AS (
          SELECT doc_a, doc_b FROM pairs
          WHERE ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6)
                  >= 0.4),
        lcs AS (
          SELECT * FROM
          read_parquet('${Gps.VerifyOutToken}/_q284_input/*.parquet'))
        SELECT c.doc_a, c.doc_b, l.n_a_tok, l.n_b_tok, l.lcs_len,
               l.lcs_len * 1000000 // l.n_b_tok AS rouge_p_ppm,
               l.lcs_len * 1000000 // l.n_a_tok AS rouge_r_ppm,
               2 * l.lcs_len * 1000000 // (l.n_a_tok + l.n_b_tok)
                 AS rouge_f_ppm,
               CASE WHEN 2 * l.lcs_len * 1000000
                      // (l.n_a_tok + l.n_b_tok) >= 500000
                 THEN 'near_dup' ELSE 'distinct' END AS verdict
        FROM cand c LEFT JOIN lcs l
          ON l.doc_a = c.doc_a AND l.doc_b = c.doc_b
        ORDER BY c.doc_a, c.doc_b""")),

    // ---- q302: Fellegi–Sunter probabilistic record linkage ----
    // Entity resolution across two noisy registries — the dedup family's
    // missing RECORD-level member (q44–q47/q265 match documents by
    // content; production pipelines also match ENTITIES whose fields
    // disagree: two crawls of one site, two vendor feeds of one user).
    // Two registries are derived from `customer` with md5-coin field
    // noise (10% tok, 15% segment, 10% balance-band, 5% nation; each
    // side keeps an independent 90% — so ~81% of entities overlap and
    // both precision AND recall are meaningful). The linker sees only
    // quasi-identifiers — never the key: candidate pairs come from TWO
    // blocking rules ((nation, band) ∪ (nation, segment) — the
    // multi-pass blocking production linkers ship, since any single
    // rule loses every pair whose blocking field was perturbed);
    // agreement patterns over (tok, segment, band) are scored by the
    // Fellegi–Sunter likelihood ratio with frequency-based u
    // (u_k = Σ_v n_A(v)·n_B(v) / (N_A·N_B) — the random-pair agreement
    // rate, computed from the data) and the standard default prior
    // m = 0.9 (deliberately NOT derived from ground truth — the gate
    // evaluates whether textbook FS with default m recovers the links).
    // No libm: the ratio is a product of three integer-ppm factors
    // (factor_ppm = m_ppm·N_AB div S_k, truncating division — exact by
    // definition in both engines), so score_ppm12 ≈ R·10¹² and the
    // match / possible / non-match thresholds are the integer literals
    // R ≥ 64 and R ≥ 1. Ground truth (the shared key) enters EVALUATION
    // columns only: per-pattern true-pair counts, blocking recall, and
    // the match-class precision/recall the decision achieves.
    //
    // 100 TB posture: candidate generation is two hash equijoins on
    // blocking keys (never all-pairs — the plan guard pins it); the
    // pattern census and u-statistics are keyed partial/final aggs;
    // every cross join is a broadcast of a 1-row stats table onto the
    // 8-row pattern grid; count products ride DECIMAL(38,0)/HUGEINT
    // (the q258 overflow lesson — N_A·N_B exceeds int64 at ~10⁹ rows
    // per side).
    "q302_record_linkage" -> QueryDef(
      build = (spark, dir) => {
        val lp = linkageParts(spark, dir)
        val pat = lp.cand
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("a_key") === col("b_key"), 1L).otherwise(0L))
              .as("n_true"))
        val scored = lp.grid
          .join(pat, Seq("pid"), "left")
          .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
          .withColumn("n_true", coalesce(col("n_true"), lit(0L)))
        val summ = scored.agg(
          sum(col("n_pairs")).as("n_cand"),
          sum(col("n_true")).as("n_true_in_cand"),
          sum(when(col("decision") === "match", col("n_pairs"))
            .otherwise(0L)).as("match_pairs"),
          sum(when(col("decision") === "match", col("n_true"))
            .otherwise(0L)).as("match_true"))
        scored.crossJoin(broadcast(summ))
          .select(col("pid"), col("g_tok"), col("g_seg"), col("g_band"),
            col("n_pairs"), col("n_true"), col("score_ppm12"),
            col("decision"), col("n_a"), col("n_b"), col("n_true_total"),
            col("n_cand"),
            expr("n_true_in_cand * 1000000" +
              " div GREATEST(n_true_total, 1)").as("block_recall_ppm"),
            col("match_pairs"), col("match_true"),
            expr("match_true * 1000000 div GREATEST(match_pairs, 1)")
              .as("match_precision_ppm"),
            expr("match_true * 1000000 div GREATEST(n_true_total, 1)")
              .as("match_recall_ppm"))
          .orderBy(col("pid"))
      },
      oracle = Some(s"""
        WITH $linkageCtes,
        summ AS (
          SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_cand,
                 CAST(SUM(n_true) AS BIGINT) AS n_true_in_cand,
                 CAST(SUM(CASE WHEN decision = 'match' THEN n_pairs
                   ELSE 0 END) AS BIGINT) AS match_pairs,
                 CAST(SUM(CASE WHEN decision = 'match' THEN n_true
                   ELSE 0 END) AS BIGINT) AS match_true
          FROM dec)
        SELECT d.pid, d.g_tok, d.g_seg, d.g_band, d.n_pairs, d.n_true,
               d.score_ppm12, d.decision, d.n_a, d.n_b, d.n_true_total,
               m.n_cand,
               m.n_true_in_cand * 1000000
                 // GREATEST(d.n_true_total, 1) AS block_recall_ppm,
               m.match_pairs, m.match_true,
               m.match_true * 1000000 // GREATEST(m.match_pairs, 1)
                 AS match_precision_ppm,
               m.match_true * 1000000 // GREATEST(d.n_true_total, 1)
                 AS match_recall_ppm
        FROM dec d CROSS JOIN summ m
        ORDER BY d.pid""")),

    // ---- q315: B³ (B-cubed) evaluation of a dedup clustering ----
    // The dedup family DETECTS duplicates (q44/q46/q47/q234/q265);
    // nothing yet MEASURES a clustering against known truth. B³
    // (Bagga–Baldwin) is the standard extrinsic metric for entity/dedup
    // clusters: unlike pairwise F1 it weights every ITEM's view — per
    // item, precision = |C(d)∩T(d)|/|C(d)| and recall = |C(d)∩T(d)|/
    // |T(d)| — and both reduce to contingency sums Σ n_ct²/n_c and
    // Σ n_ct²/n_t, so the whole metric runs at CELL cardinality. The
    // clustering under audit is the cheapest real one — head-8-token
    // fingerprint blocking — over a corpus with PLANTED truth: docs
    // ≡0 (mod 5) gain two clones (every-13th-token drop: head intact,
    // clusters correctly; every-7th-token drop: the head mutates and
    // the clone SPLITS from its group — recall loss), and docs
    // ≡0 (mod 11) get a shared 8-token boilerplate banner prepended
    // (the classic crawl failure: head fingerprints MERGE unrelated
    // pages — precision loss). The card publishes B³ P/R/F1 plus the
    // split/merge counts and the boilerplate cluster's size, so both
    // failure modes are quantified separately. Exact integers: ppm via
    // floor-div over DECIMAL(38,0)/HUGEINT, identical in both engines.
    //
    // 100 TB posture: clone synthesis is a map-side explode (≤3 rows
    // per doc); the only corpus-scale shuffles are the (ckey, truth)
    // contingency agg and two cell-keyed rollups — never all-pairs.
    // The ckey groupBy is the same shuffle an exact-dedup pass already
    // pays; everything after runs at contingency-cell cardinality.
    "q315_bcubed_eval" -> QueryDef(
      build = (spark, dir) => {
        val boiler = "subscribe to our newsletter for the latest updates"
        val t = Tables.documents(spark, dir)
          .select(col("doc_id"), split(trim(col("text")), " ").as("toks0"))
          .filter(size(col("toks0")) >= 12)
          .select(col("doc_id"),
            when(col("doc_id") % 11 === 0,
              concat(split(lit(boiler), " "), col("toks0")))
              .otherwise(col("toks0")).as("toks"))
        val orig = t.select((col("doc_id") * 10).as("item_id"),
          col("doc_id").as("truth"), col("toks"))
        val cloneA = t.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") * 10 + 1).as("item_id"),
            col("doc_id").as("truth"),
            expr("filter(toks, (x, i) -> (i + 1) % 13 != 0)").as("toks"))
        val cloneB = t.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") * 10 + 2).as("item_id"),
            col("doc_id").as("truth"),
            expr("filter(toks, (x, i) -> (i + 1) % 7 != 0)").as("toks"))
        val items = orig.unionAll(cloneA).unionAll(cloneB)
          .select(col("item_id"), col("truth"),
            md5(concat_ws(" ", slice(col("toks"), 1, 8))).as("ckey"))
          .localCheckpoint(false)
        val ct = items.groupBy(col("ckey"), col("truth"))
          .agg(count(lit(1)).as("n_ct")).localCheckpoint(false)
        val nc = ct.groupBy(col("ckey")).agg(sum(col("n_ct")).as("n_c"))
        val nt = ct.groupBy(col("truth")).agg(sum(col("n_ct")).as("n_t"))
        val card = ct.join(nc, Seq("ckey")).join(nt, Seq("truth"))
          .agg(sum(col("n_ct")).as("n_items"),
            sum(expr("CAST(n_ct AS DECIMAL(38,0)) * n_ct" +
              " * 1000000000000 div n_c")).as("p12"),
            sum(expr("CAST(n_ct AS DECIMAL(38,0)) * n_ct" +
              " * 1000000000000 div n_t")).as("r12"))
          .select(col("n_items"),
            expr("CAST(p12 div (CAST(n_items AS DECIMAL(38,0))" +
              " * 1000000) AS BIGINT)").as("b3_precision_ppm"),
            expr("CAST(r12 div (CAST(n_items AS DECIMAL(38,0))" +
              " * 1000000) AS BIGINT)").as("b3_recall_ppm"))
        val mg = ct.groupBy(col("ckey"))
          .agg(countDistinct(col("truth")).as("k"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(when(col("k") > 1, 1L).otherwise(0L))
              .as("n_merged_clusters"))
        val sp = ct.groupBy(col("truth"))
          .agg(countDistinct(col("ckey")).as("k"))
          .agg(count(lit(1)).as("n_truth_groups"),
            sum(when(col("k") > 1, 1L).otherwise(0L))
              .as("n_split_truths"))
        val bo = items.filter(col("ckey") === md5(lit(boiler)))
          .agg(count(lit(1)).as("boiler_cluster_size"))
        card.crossJoin(broadcast(mg)).crossJoin(broadcast(sp))
          .crossJoin(broadcast(bo))
          .select(col("n_items"), col("n_clusters"), col("n_truth_groups"),
            col("n_merged_clusters"), col("n_split_truths"),
            col("boiler_cluster_size"),
            col("b3_precision_ppm"), col("b3_recall_ppm"),
            expr("CAST(2 * b3_precision_ppm * b3_recall_ppm" +
              " div GREATEST(b3_precision_ppm + b3_recall_ppm, 1)" +
              " AS BIGINT)").as("b3_f1_ppm"))
      },
      oracle = Some("""
        WITH t0 AS (SELECT doc_id, string_split(trim(text), ' ') AS toks0
                    FROM documents),
        t1 AS (SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0
                   THEN list_concat(string_split(
                     'subscribe to our newsletter for the latest updates',
                     ' '), toks0)
                   ELSE toks0 END AS toks
               FROM t0 WHERE len(toks0) >= 12),
        items AS (
          SELECT doc_id * 10 AS item_id, doc_id AS truth,
                 md5(array_to_string(list_slice(toks, 1, 8), ' ')) AS ckey
          FROM t1
          UNION ALL
          SELECT doc_id * 10 + 1, doc_id,
                 md5(array_to_string(list_slice(
                   list_filter(toks, (x, i) -> i % 13 != 0), 1, 8), ' '))
          FROM t1 WHERE doc_id % 5 = 0
          UNION ALL
          SELECT doc_id * 10 + 2, doc_id,
                 md5(array_to_string(list_slice(
                   list_filter(toks, (x, i) -> i % 7 != 0), 1, 8), ' '))
          FROM t1 WHERE doc_id % 5 = 0),
        ct AS (SELECT ckey, truth, CAST(COUNT(*) AS BIGINT) AS n_ct
               FROM items GROUP BY 1, 2),
        nc AS (SELECT ckey, CAST(SUM(n_ct) AS BIGINT) AS n_c
               FROM ct GROUP BY 1),
        nt AS (SELECT truth, CAST(SUM(n_ct) AS BIGINT) AS n_t
               FROM ct GROUP BY 1),
        card AS (SELECT CAST(SUM(n_ct) AS BIGINT) AS n_items,
                        SUM(CAST(n_ct AS HUGEINT) * n_ct
                          * 1000000000000 // n_c) AS p12,
                        SUM(CAST(n_ct AS HUGEINT) * n_ct
                          * 1000000000000 // n_t) AS r12
                 FROM ct JOIN nc USING (ckey) JOIN nt USING (truth)),
        pr AS (SELECT n_items,
                      CAST(p12 // (CAST(n_items AS HUGEINT) * 1000000)
                        AS BIGINT) AS b3_precision_ppm,
                      CAST(r12 // (CAST(n_items AS HUGEINT) * 1000000)
                        AS BIGINT) AS b3_recall_ppm
               FROM card),
        mg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
                      CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_merged_clusters
               FROM (SELECT ckey, COUNT(DISTINCT truth) AS k
                     FROM ct GROUP BY 1)),
        sp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth_groups,
                      CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_split_truths
               FROM (SELECT truth, COUNT(DISTINCT ckey) AS k
                     FROM ct GROUP BY 1)),
        bo AS (SELECT CAST(COUNT(*) AS BIGINT) AS boiler_cluster_size
               FROM items WHERE ckey = md5(
                 'subscribe to our newsletter for the latest updates'))
        SELECT n_items, n_clusters, n_truth_groups, n_merged_clusters,
               n_split_truths, boiler_cluster_size,
               b3_precision_ppm, b3_recall_ppm,
               CAST(2 * b3_precision_ppm * b3_recall_ppm
                 // GREATEST(b3_precision_ppm + b3_recall_ppm, 1)
                 AS BIGINT) AS b3_f1_ppm
        FROM pr CROSS JOIN mg CROSS JOIN sp CROSS JOIN bo""")),

    // ---- q320: chrF² character-n-gram similarity screen ----
    // The TOKENIZATION-ROBUST member of the pair-similarity family:
    // q44/q46 are word-set Jaccard (order-blind, token-boundary-bound),
    // q284 is word-sequence ROUGE-L (order-aware, still token-bound);
    // chrF (Popović '15, the MT-eval standard) scores CHARACTER n-gram
    // multiset overlap, so it survives spacing/punctuation/morphology
    // edits that break word-level metrics. chrF2 here: clipped char
    // 2- and 3-gram precision/recall (Σ min(cnt_a, cnt_b) — multiset,
    // not set), averaged over n, combined by the β=2 harmonic
    // F = 5PR/(4P+R) — fully rational, exact in ppm floor-div. Scored
    // over PLANTED transform pairs (the q315 corpus rules): an
    // every-13th-token drop (light clone), an every-7th drop (heavy
    // clone), and a same-source control pair — so the card is a
    // DISCRIMINATION certificate: per pair class, n / mean / min / max
    // chrF, and the classes must separate. Measured sf0.1: clone_light
    // mean 0.941, clone_heavy 0.881 (min 0.827), control mean 0.534
    // (max 0.799) — the clone band and the control band don't even
    // touch, so a mid-band threshold classifies every planted pair.
    //
    // 100 TB posture: gram extraction is in-row (transform over a
    // sequence — no UDF); the multiset intersection is a (pair, gram)-
    // keyed equijoin over bounded candidate pairs (planted here; the
    // q46 banded-LSH set in production) — never all-pairs.
    "q320_chrf_screen" -> QueryDef(
      build = (spark, dir) => {
        val t = Tables.documents(spark, dir)
          .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
          .filter(size(col("toks")) >= 12 && col("doc_id") % 5 === 0)
          .select(col("doc_id"), concat_ws(" ", col("toks")).as("s"),
            expr("concat_ws(' ', filter(toks, (x, i) -> (i + 1) % 13" +
              " != 0))").as("s13"),
            expr("concat_ws(' ', filter(toks, (x, i) -> (i + 1) % 7" +
              " != 0))").as("s7"))
          .localCheckpoint(false)
        val ctrl = t.select(col("doc_id"), col("s"))
          .join(t.select((col("doc_id") - 5).as("doc_id"),
            col("s").as("s_next")), Seq("doc_id"))
        val pairs = t.select(lit("clone_light").as("ptype"),
            col("doc_id"), col("s").as("ref"), col("s13").as("hyp"))
          .unionAll(t.select(lit("clone_heavy").as("ptype"),
            col("doc_id"), col("s").as("ref"), col("s7").as("hyp")))
          .unionAll(ctrl.select(lit("control").as("ptype"),
            col("doc_id"), col("s").as("ref"), col("s_next").as("hyp")))
          .localCheckpoint(false)
        chrfScores(pairs).groupBy(col("ptype"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("sum(chrf_ppm) div count(1)").as("mean_chrf_ppm"),
            min(col("chrf_ppm")).as("min_chrf_ppm"),
            max(col("chrf_ppm")).as("max_chrf_ppm"))
          .orderBy(col("ptype"))
      },
      oracle = Some("""
        WITH t AS MATERIALIZED (
          SELECT doc_id, array_to_string(toks, ' ') AS s,
                 array_to_string(list_filter(toks,
                   (x, i) -> i % 13 != 0), ' ') AS s13,
                 array_to_string(list_filter(toks,
                   (x, i) -> i % 7 != 0), ' ') AS s7
          FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
                FROM documents)
          WHERE len(toks) >= 12 AND doc_id % 5 = 0),
        pairs AS MATERIALIZED (
          SELECT 'clone_light' AS ptype, doc_id, s AS ref, s13 AS hyp
          FROM t
          UNION ALL
          SELECT 'clone_heavy', doc_id, s, s7 FROM t
          UNION ALL
          SELECT 'control', a.doc_id, a.s, b.s
          FROM t a JOIN t b ON b.doc_id = a.doc_id + 5),
        gr AS (SELECT ptype, doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS cr
               FROM (SELECT ptype, doc_id, n,
                       unnest(list_transform(
                         generate_series(1, len(ref) - n + 1),
                         i -> substr(ref, CAST(i AS INT),
                           CAST(n AS INT)))) AS g
                     FROM pairs CROSS JOIN (SELECT unnest([2, 3]) AS n))
               GROUP BY 1, 2, 3, 4),
        gh AS (SELECT ptype, doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS ch
               FROM (SELECT ptype, doc_id, n,
                       unnest(list_transform(
                         generate_series(1, len(hyp) - n + 1),
                         i -> substr(hyp, CAST(i AS INT),
                           CAST(n AS INT)))) AS g
                     FROM pairs CROSS JOIN (SELECT unnest([2, 3]) AS n))
               GROUP BY 1, 2, 3, 4),
        ov AS (SELECT ptype, doc_id, n,
                      CAST(SUM(LEAST(cr, ch)) AS BIGINT) AS ov
               FROM gr JOIN gh USING (ptype, doc_id, n, g)
               GROUP BY 1, 2, 3),
        szs AS (SELECT ptype, doc_id,
                       CAST(len(ref) AS BIGINT) AS lr,
                       CAST(len(hyp) AS BIGINT) AS lh
                FROM pairs),
        pn AS (SELECT o.ptype, o.doc_id,
                      o.ov * 1000000 // (s.lh - o.n + 1) AS p,
                      o.ov * 1000000 // (s.lr - o.n + 1) AS r
               FROM ov o JOIN szs s USING (ptype, doc_id)),
        f AS (SELECT ptype, doc_id,
                     CAST(SUM(p) // 2 AS BIGINT) AS pa,
                     CAST(SUM(r) // 2 AS BIGINT) AS ra
              FROM pn GROUP BY 1, 2),
        fs AS (SELECT ptype, doc_id,
                      5 * pa * ra // GREATEST(4 * pa + ra, 1)
                        AS chrf_ppm
               FROM f)
        SELECT ptype, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(chrf_ppm) // COUNT(*) AS BIGINT)
                 AS mean_chrf_ppm,
               CAST(MIN(chrf_ppm) AS BIGINT) AS min_chrf_ppm,
               CAST(MAX(chrf_ppm) AS BIGINT) AS max_chrf_ppm
        FROM fs GROUP BY 1 ORDER BY ptype""")),

    // ---- q326: thresholded edit-distance verify stage ----
    // The EDIT-DISTANCE member of the verify-stage family (q55 verifies
    // LSH candidates with exact cosine, q46 with exact Jaccard, q284
    // with LCS, q320 with chrF): thresholded Levenshtein — the
    // production verify after candidate generation (Spark's built-in
    // `levenshtein(l, r, K)` returns −1 above K; no UDF). What the cap
    // actually buys on Spark 4.1 is MEASURED, not assumed (ScaleProbe
    // "editcap"): ~1.8× per pair at equal lengths (the textbook O(K·L)
    // band does not survive measurement — per-char UTF8 decode
    // dominates, so both forms grow ~quadratically) plus the immediate
    // −1 short-circuit when lengths differ by more than K. At this
    // gate's document lengths (≤ ~500 chars) per-pair cost is
    // microseconds either way; the cap's semantic value — a bounded
    // distance domain and an explicit reject code — is what the
    // decision columns certify. Candidates are the q46 recall-1 screen
    // (shingle-Jaccard ≥ 0.4 — the set whose completeness the q46
    // oracle already certifies); per pair the gate emits the capped
    // distance (K = 64), the relative accept decision
    // (lev·5 ≤ max(len) — ≤20% of the longer string edited), and the
    // exact edit-similarity in floor-div ppm. Character-level distance
    // catches what token Jaccard cannot (transpositions, in-token
    // edits) and vice versa — the agreement columns let the screen be
    // tuned.
    //
    // 100 TB posture: candidate generation is q46's banded equijoin
    // (never all-pairs); the verify joins texts by doc_id (two keyed
    // equijoins) and runs the capped DP in-row; K caps per-pair work.
    // Measured sf0.1: 256 LSH candidates all verify (lev ≤ 12,
    // edit-sim ≥ 0.97) while all 52 planted controls CAP OUT at K —
    // the early exit does exactly the work a full DP would have wasted.
    "q326_edit_verify" -> QueryDef(
      build = (spark, dir) => {
        val docs = Tables.documents(spark, dir)
          .select(col("doc_id"), trim(col("text")).as("t"))
        val lsh = MinHashLSH.nearDupPairs(
          Tables.documents(spark, dir), "doc_id", "text",
          shingleN = 3, numHashes = 64, bands = 32, threshold = 0.4)
          .select(col("doc_a"), col("doc_b"))
        // planted control pairs (adjacent unrelated docs): the verify
        // stage must CAP or REJECT these — both decision paths real
        val ctrl = docs.select(col("doc_id").as("doc_a"))
          .filter(col("doc_a") % 97 === 0)
          .join(docs.select(col("doc_id").as("doc_b")),
            col("doc_b") === col("doc_a") + 1)
        val cand = lsh.union(ctrl).distinct()
        cand
          .join(docs.select(col("doc_id").as("doc_a"),
            col("t").as("ta")), Seq("doc_a"))
          .join(docs.select(col("doc_id").as("doc_b"),
            col("t").as("tb")), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            length(col("ta")).cast("long").as("len_a"),
            length(col("tb")).cast("long").as("len_b"),
            levenshtein(col("ta"), col("tb"), 64).cast("long")
              .as("lev_capped"))
          .select(col("doc_a"), col("doc_b"), col("len_a"), col("len_b"),
            col("lev_capped"),
            expr("CAST(CASE WHEN lev_capped >= 0 AND lev_capped * 5 <= " +
              "GREATEST(len_a, len_b) THEN 1 ELSE 0 END AS BIGINT)")
              .as("accept"),
            expr("CASE WHEN lev_capped >= 0 THEN " +
              "(GREATEST(len_a, len_b) - lev_capped) * 1000000L div " +
              "GREATEST(len_a, len_b) ELSE -1L END").as("edit_sim_ppm"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
                   i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                        string_split_regex(trim(text), '\s+')[i+2])) AS shingles
          FROM documents),
        ex AS MATERIALIZED (
          SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle
          FROM sh WHERE len(shingles) > 0),
        pairs AS MATERIALIZED (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_common
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        cand AS (
          SELECT doc_a, doc_b FROM pairs
          WHERE ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) >= 0.4
          UNION
          SELECT a.doc_id, b.doc_id
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % 97 = 0),
        tx AS (SELECT doc_id, trim(text) AS t FROM documents),
        lv AS (
          SELECT c.doc_a, c.doc_b,
                 CAST(length(a.t) AS BIGINT) AS len_a,
                 CAST(length(b.t) AS BIGINT) AS len_b,
                 CAST(CASE WHEN levenshtein(a.t, b.t) <= 64
                   THEN levenshtein(a.t, b.t) ELSE -1 END AS BIGINT)
                   AS lev_capped
          FROM cand c
          JOIN tx a ON a.doc_id = c.doc_a
          JOIN tx b ON b.doc_id = c.doc_b)
        SELECT doc_a, doc_b, len_a, len_b, lev_capped,
               CAST(CASE WHEN lev_capped >= 0 AND lev_capped * 5 <=
                 GREATEST(len_a, len_b) THEN 1 ELSE 0 END AS BIGINT)
                 AS accept,
               CASE WHEN lev_capped >= 0 THEN
                 (GREATEST(len_a, len_b) - lev_capped) * 1000000
                   // GREATEST(len_a, len_b) ELSE -1 END AS edit_sim_ppm
        FROM lv ORDER BY doc_a, doc_b""")),

    // ---- q325: entity-resolution capstone (block→score→match→cluster→eval) ----
    // The ER production path as ONE lineage — the composition gate the
    // linkage family lacked (the q271/q300 capstone pattern applied to
    // entity resolution): q302's registries and Fellegi–Sunter scoring
    // (the SHARED linkageParts builder — the capstone cannot drift
    // from the pairwise gate), match-class pairs promoted to an entity
    // GRAPH (a-side node 2k, b-side 2k+1), 6 rounds of min-label
    // propagation (the q265 recipe; round-6-vs-5 change count emitted
    // as the convergence certificate), and the resulting clustering
    // evaluated with B³ against the true entity key (the q315 metric).
    // Pairwise decisions ≠ cluster quality: transitive closure chains
    // false matches into over-merged entities — the classic ER failure
    // pairwise precision cannot see; B³ on the clustered graph can,
    // and this gate certifies the whole chain end-to-end (a drifted
    // registry, a scoring slip, a propagation bug, or a B³ error all
    // cascade to the hash). Measured sf0.1: 26,973 records, 11,835
    // match pairs against 12,099 true pairs, yet 1,153 OVER-MERGED
    // clusters pull B³ precision to 0.925 (q302's pairwise precision
    // is far higher) — exactly the closure effect the capstone exists
    // to expose; propagation converged (round-6 changes = 0).
    //
    // 100 TB posture: everything q302 pays (blocked equijoins, keyed
    // pattern census), plus per-round ONE node-keyed equijoin +
    // partial/final min on the MATCH graph (≈ true-pair cardinality,
    // far below candidate cardinality), plus the B³ contingency aggs
    // at cell cardinality. No all-pairs stage anywhere.
    "q325_er_capstone" -> QueryDef(
      build = (spark, dir) => {
        val lp = linkageParts(spark, dir)
        val grid8 = lp.grid.localCheckpoint(false)
        val matchPids = grid8.filter(col("decision") === "match")
          .select(col("pid"))
        val mp = lp.cand.join(broadcast(matchPids), Seq("pid"))
          .select(col("a_key"), col("b_key")).localCheckpoint(false)
        erCapstoneCard(lp, grid8, mp)
      },
      oracle = Some(s"""
        WITH $linkageCtes,
        mp AS MATERIALIZED (
          SELECT c.a_key, c.b_key
          FROM cand c JOIN dec d
            ON d.pid = c.g_tok * 4 + c.g_seg * 2 + c.g_band
          WHERE d.decision = 'match'),
        edges AS (SELECT a_key * 2 AS x, b_key * 2 + 1 AS y FROM mp),
        np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_match_pairs FROM mp),
        $erTailCtes
        SELECT $erTailSelect
        FROM pr CROSS JOIN np CROSS JOIN tp CROSS JOIN mg
        CROSS JOIN sp CROSS JOIN chg"""),
      // Round-12 headline; round 13 moved the HEADLINE flag to q349 (the
      // capped-dynamic-blocking form of this same capstone — VERDICT r12
      // #1: the benched lineage must be the one a 100 TB run would copy,
      // and fixed-key blocking measured ×69 shuffle at 10× data). q325
      // stays as the full-recall gate.
      headline = false),

    // ---- q338: dynamic blocking with a block-size cap ----
    // The sf1 rehearsal's one super-linear row, fixed: q302/q325 block
    // on FIXED-cardinality keys ((nat, seg): 125 values), so 10×
    // registries → ~10× per-block occupancy → ~100× candidate pairs
    // (measured: 30.6 MB → 2.11 GB shuffle at sf1). Production ER
    // bounds this with DYNAMIC blocking (Whang et al.'s block-size
    // caps / the MapReduce ER literature): blocks whose occupancy
    // exceeds the cap C are SPLIT by extending the key with the next
    // field — (nat,seg) → +band → +tok — until they fit; pairs are
    // generated only at each block's final level. Candidate mass is
    // then ≤ C·|rows| per level BY CONSTRUCTION (each row meets ≤ C
    // partners where it pairs) — linear in the corpus where fixed
    // blocking is quadratic. The price is recall: a true pair whose
    // sides DISAGREE on the splitting field of an oversized block is
    // lost — this card MEASURES that trade instead of hand-waving it:
    // exact candidate-reduction ppm and recall ppm vs full (nat,seg)
    // blocking, per-level block/split/pair/true-pair counts, and the
    // enforced-cap certificates (max kept occupancy ≤ 12 at levels 0/1).
    // Full-blocking candidate mass is computed as Σ cnt_a·cnt_b over
    // the block census — the 1.7M-pair baseline is NEVER materialized.
    //
    // 100 TB posture: per-level candidate joins are keyed equijoins
    // with bounded fan-out (the cap); the block censuses are partial
    // aggregations; the split keys are kilobyte broadcasts.
    "q338_dynamic_blocking" -> QueryDef(
      build = (spark, dir) => {
        val lp = linkageParts(spark, dir)
        val a = lp.a
        val b = lp.b
        val db = dynBlocks(a, b, cap = BlockCap)
        import db._
        val k0 = DynKeys0
        val k1 = DynKeys1
        val k2 = DynKeys2
        // pairs at each block's FINAL level (x restricted to the level's
        // kept keys; key equality puts y in the same block)
        def pairStats(ax: DataFrame, keys: Seq[String], name: String) = {
          val x = ax.as("x")
          val y = b.as("y")
          x.join(y, keys.map(k => col(s"x.$k") === col(s"y.$k"))
              .reduce(_ && _))
            .agg(count(lit(1)).as(s"cand_$name"),
              coalesce(sum(when(col("x.a_key") === col("y.b_key"), 1L)
                .otherwise(0L)), lit(0L)).as(s"true_$name"))
        }
        val p0 = pairStats(a.join(broadcast(
          keep0.select(k0.map(col): _*)), k0), k0, "l0")
        val p1 = pairStats(a1.join(broadcast(
          keep1.select(k1.map(col): _*)), k1), k1, "l1")
        val p2 = pairStats(a2, k2, "l2")
        val fullCand = blk0.agg(sum(col("cnt_a") * col("cnt_b"))
          .as("cand_full"))
        val fullTrue = a.as("x").join(b.as("y"),
            col("x.a_key") === col("y.b_key") &&
              col("x.nat") === col("y.nat") &&
              col("x.seg") === col("y.seg"))
          .agg(count(lit(1)).as("true_full"))
        val blocks = blk0.agg(count(lit(1)).as("n_blocks0"))
          .crossJoin(broadcast(split0.agg(count(lit(1)).as("n_split0"))))
          .crossJoin(broadcast(blk1.agg(count(lit(1)).as("n_blocks1"))))
          .crossJoin(broadcast(split1.agg(count(lit(1)).as("n_split1"))))
          .crossJoin(broadcast(blk2.agg(count(lit(1)).as("n_blocks2"))))
          .crossJoin(broadcast(keep0.agg(
            coalesce(max(col("occ")), lit(-1L)).as("max_occ_kept0"))))
          .crossJoin(broadcast(keep1.agg(
            coalesce(max(col("occ")), lit(-1L)).as("max_occ_kept1"))))
          .crossJoin(broadcast(blk2.agg(
            coalesce(max(col("occ")), lit(-1L)).as("max_occ2"))))
        blocks.crossJoin(broadcast(p0)).crossJoin(broadcast(p1))
          .crossJoin(broadcast(p2))
          .crossJoin(broadcast(fullCand)).crossJoin(broadcast(fullTrue))
          .select(col("n_blocks0"), col("n_split0"), col("n_blocks1"),
            col("n_split1"), col("n_blocks2"),
            col("cand_l0"), col("cand_l1"), col("cand_l2"),
            (col("cand_l0") + col("cand_l1") + col("cand_l2"))
              .as("cand_total"),
            col("cand_full"),
            expr("(cand_l0 + cand_l1 + cand_l2) * 1000000" +
              " div cand_full").as("reduction_ppm"),
            (col("true_l0") + col("true_l1") + col("true_l2"))
              .as("true_total"),
            col("true_full"),
            expr("(true_l0 + true_l1 + true_l2) * 1000000" +
              " div GREATEST(true_full, 1)").as("recall_ppm"),
            col("max_occ_kept0"), col("max_occ_kept1"), col("max_occ2"))
      },
      oracle = Some(s"""
        WITH $linkageCtes,
        $dynBlockCtes,
        p0 AS (SELECT COUNT(*) AS cand_l0,
                      COALESCE(SUM(CASE WHEN x.a_key = y.b_key
                        THEN 1 ELSE 0 END), 0) AS true_l0
               FROM a x JOIN keep0 k ON x.nat = k.nat AND x.seg = k.seg
               JOIN b y ON y.nat = x.nat AND y.seg = x.seg),
        p1 AS (SELECT COUNT(*) AS cand_l1,
                      COALESCE(SUM(CASE WHEN x.a_key = y.b_key
                        THEN 1 ELSE 0 END), 0) AS true_l1
               FROM a1 x JOIN keep1 k ON x.nat = k.nat AND x.seg = k.seg
                 AND x.band = k.band
               JOIN b y ON y.nat = x.nat AND y.seg = x.seg
                 AND y.band = x.band),
        p2 AS (SELECT COUNT(*) AS cand_l2,
                      COALESCE(SUM(CASE WHEN x.a_key = y.b_key
                        THEN 1 ELSE 0 END), 0) AS true_l2
               FROM a2 x JOIN b y ON y.nat = x.nat AND y.seg = x.seg
                 AND y.band = x.band AND y.tok = x.tok),
        fc AS (SELECT CAST(SUM(cnt_a * cnt_b) AS BIGINT) AS cand_full
               FROM blk0),
        ft AS (SELECT COUNT(*) AS true_full
               FROM a x JOIN b y ON x.a_key = y.b_key
                 AND x.nat = y.nat AND x.seg = y.seg)
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM blk0) AS n_blocks0,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM split0) AS n_split0,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM blk1) AS n_blocks1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM split1) AS n_split1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM blk2) AS n_blocks2,
               CAST(cand_l0 AS BIGINT) AS cand_l0,
               CAST(cand_l1 AS BIGINT) AS cand_l1,
               CAST(cand_l2 AS BIGINT) AS cand_l2,
               CAST(cand_l0 + cand_l1 + cand_l2 AS BIGINT) AS cand_total,
               cand_full,
               CAST((cand_l0 + cand_l1 + cand_l2) * 1000000
                 // cand_full AS BIGINT) AS reduction_ppm,
               CAST(true_l0 + true_l1 + true_l2 AS BIGINT) AS true_total,
               CAST(true_full AS BIGINT) AS true_full,
               CAST((true_l0 + true_l1 + true_l2) * 1000000
                 // GREATEST(true_full, 1) AS BIGINT) AS recall_ppm,
               (SELECT CAST(COALESCE(MAX(occ), -1) AS BIGINT)
                FROM keep0) AS max_occ_kept0,
               (SELECT CAST(COALESCE(MAX(occ), -1) AS BIGINT)
                FROM keep1) AS max_occ_kept1,
               (SELECT CAST(COALESCE(MAX(occ), -1) AS BIGINT)
                FROM blk2) AS max_occ2
        FROM p0 CROSS JOIN p1 CROSS JOIN p2 CROSS JOIN fc CROSS JOIN ft""")),

    // ---- q349: the SCALE-SAFE ER capstone (dynamic blocking) ----
    // VERDICT r12 #1 closed: q325 — the corpus' most expensive benched
    // lineage — generated candidates by FIXED-key blocking, the form
    // measured at ×69 shuffle per 10× data (BASELINE.md sf1 rehearsal);
    // the scale-safe capped-dynamic-blocking form lived only in q338's
    // certificate card. This gate IS the production composition: q338's
    // capped candidate generation (blocks over cap 12 split
    // (nat,seg)→+band→+tok, pairs only at each block's final level —
    // candidate mass ≤ cap·rows per level BY CONSTRUCTION) feeding
    // q325's full tail (Fellegi–Sunter pattern decisions from the
    // SHARED registry grid → match → entity graph → 6-round min-label
    // propagation → B³), with the cap-enforcement and candidate-
    // reduction certificates riding in the same card. The HEADLINE flag
    // moves here: the benched ER lineage is now the one a 100 TB dedup
    // run would actually copy. The capping trade, measured end-to-end
    // against q325's full-recall gate at sf0.1: candidates 1,467,578 →
    // 73,471 (reduction_ppm 50,062 ≈ 20×), match pairs 11,835 → 7,979,
    // B³ recall 928,595 → 844,956 ppm — and B³ PRECISION rises 924,541
    // → 997,343 ppm (capped blocks also drop the false matches that
    // over-merged 1,153 clusters in q325; merged clusters fall to 51).
    // F1 926,563 → 914,847: the full trade is now three numbers in one
    // card instead of a hand-wave.
    //
    // No distinct over candidates: the three levels partition the key
    // space (a row's single (nat,seg[,band[,tok]]) tuple pairs in
    // exactly one block at exactly one level), so the union is
    // duplicate-free BY CONSTRUCTION — one shuffle fewer than q325's
    // overlapping two-pass blocking.
    //
    // TWO MORE SCALE DEFENSES, both found BY the round-13 sf1
    // rehearsal (the clique form first measured ×18.6 shuffle at 10×):
    //
    // 1. BLOCK PURGING at the final level: the key hierarchy is
    //    finite, and at 10× data the level-2 residue saturates (blk2
    //    occupancy reached 27 at cap 12). The standard ER answer (the
    //    block-purging step of the MapReduce blocking literature):
    //    final-level blocks still over the cap generate NO pairs; the
    //    purge count and its recall price are certificates in this
    //    card. Candidate mass is then ≤ cap·rows at EVERY level with
    //    no residue escape hatch. (q338 deliberately keeps the
    //    uncapped residue measurable — its max_occ2 certificate is how
    //    the saturation was caught.)
    // 2. SUPERNODE (star) REDUCTION of the level-2 match graph: every
    //    level-2 candidate pair agrees on all four fields (the block
    //    key IS the field tuple — a complete bipartite pid-7 clique),
    //    and at sf1 density those coincidental all-agree pairs are
    //    ×99 the sf0.1 match count (793k pairs among 121k true — the
    //    4 quasi-identifiers stop discriminating at 10× density, B³
    //    precision honestly collapses to 0.270 IN THE CARD). The
    //    clustering doesn't need the clique: a star to each block's
    //    min node has IDENTICAL connected components at (na+nb−1)
    //    edges instead of na·nb, so level-2 pairs are NEVER
    //    materialized — pair counts come exactly from the block
    //    censuses, and the propagation graph stays ∝ members.
    //    (Verified: the sf0.1 and sf1 cards are bit-identical between
    //    the clique and star forms.)
    //
    // Measured acceptance (round-13 rehearsal): shuffle ×11.7 at 10×
    // data (vs ×18.6 clique, ×69 for q325's fixed keys), wall ×1.4.
    //
    // 100 TB posture: everything is keyed equijoins with bounded
    // fan-out (the cap, enforced at all three levels) + kilobyte
    // broadcasts of split/keep keys; the propagation rounds run on the
    // star-reduced match graph (∝ members).
    "q349_er_capstone_dynamic" -> QueryDef(
      build = (spark, dir) => {
        val lp = linkageParts(spark, dir)
        val a = lp.a
        val b = lp.b
        val grid8 = lp.grid.localCheckpoint(false)
        val db = dynBlocks(a, b, cap = BlockCap)
        def pairFlags(ax: DataFrame, keys: Seq[String]) = {
          val x = ax.as("x")
          val y = b.as("y")
          x.join(y, keys.map(k => col(s"x.$k") === col(s"y.$k"))
              .reduce(_ && _))
            .select(col("x.a_key").as("a_key"), col("y.b_key").as("b_key"),
              when(col("x.tok") === col("y.tok"), 1L).otherwise(0L)
                .as("g_tok"),
              when(col("x.seg") === col("y.seg"), 1L).otherwise(0L)
                .as("g_seg"),
              when(col("x.band") === col("y.band"), 1L).otherwise(0L)
                .as("g_band"))
        }
        val keep2 = db.blk2.filter(col("occ") <= BlockCap)
        // Levels 0/1 materialize pairs (≤ cap·rows each, mixed pids).
        val dmp01 = pairFlags(a.join(broadcast(
            db.keep0.select(DynKeys0.map(col): _*)), DynKeys0), DynKeys0)
          .unionAll(pairFlags(db.a1.join(broadcast(
            db.keep1.select(DynKeys1.map(col): _*)), DynKeys1), DynKeys1))
          .withColumn("pid",
            col("g_tok") * 4 + col("g_seg") * 2 + col("g_band"))
          .localCheckpoint(false)
        val matchPids = grid8.filter(col("decision") === "match")
          .select(col("pid"))
        val mp01 = dmp01.join(broadcast(matchPids), Seq("pid"))
          .select(col("a_key"), col("b_key"))
        // Level 2 NEVER materializes its pairs: every level-2 candidate
        // agrees on all four fields (the block key IS the field tuple),
        // i.e. the block is a complete bipartite pid-7 clique. For the
        // CLUSTERING a star to the block's min node has identical
        // connected components at (na+nb−1) edges instead of na·nb —
        // the supernode reduction that keeps the propagation graph ∝
        // members where the sf1 rehearsal first measured the clique
        // form blowing the match graph up ×99. Pair COUNTS come exactly
        // from the block censuses (Σ cnt_a·cnt_b), so the card's
        // candidate/match arithmetic is unchanged.
        val p7 = grid8
          .filter(col("pid") === 7 && col("decision") === "match")
          .select(lit(1).as("p7"))
        val k2m = keep2.crossJoin(broadcast(p7)).localCheckpoint(false)
        // Both level-2 member frames feed mins AND e2 — stage once so the
        // broadcast-join chains don't re-schedule (VERDICT r13 #1).
        val a2m = db.a2.join(broadcast(
          k2m.select(DynKeys2.map(col): _*)), DynKeys2)
          .localCheckpoint(false)
        val b2m = db.b2.join(broadcast(
          k2m.select(DynKeys2.map(col): _*)), DynKeys2)
          .localCheckpoint(false)
        val mins = a2m.groupBy(DynKeys2.map(col): _*)
          .agg(min(col("a_key") * 2).as("ma"))
          .join(b2m.groupBy(DynKeys2.map(col): _*)
            .agg(min(col("b_key") * 2 + 1).as("mb")), DynKeys2)
          .select(DynKeys2.map(col) :+
            least(col("ma"), col("mb")).as("rep"): _*)
        val e2 = a2m.join(mins, DynKeys2)
          .select((col("a_key") * 2).as("x"), col("rep").as("y"))
          .unionAll(b2m.join(mins, DynKeys2)
            .select((col("b_key") * 2 + 1).as("x"), col("rep").as("y")))
          .filter(col("x") =!= col("y"))
        // no checkpoint here: the shared tail stages `sym` (both edge
        // directions) once, which subsumes staging the directed list
        val edges = mp01
          .select((col("a_key") * 2).as("x"), (col("b_key") * 2 + 1).as("y"))
          .unionAll(e2)
        // One 8-group census over dmp01 serves BOTH scalar counts (total
        // candidates for the certificate, match-pid candidates for the
        // pair count) instead of two full-frame count jobs.
        val dmpScalars = dmp01.groupBy(col("pid"))
          .agg(count(lit(1)).as("n_pid"))
          .join(broadcast(matchPids.withColumn("is_match", lit(1L))),
            Seq("pid"), "left")
          .agg(sum(col("n_pid")).as("c01d"),
            coalesce(sum(when(col("is_match") === 1L, col("n_pid"))),
              lit(0L)).as("c01"))
          .localCheckpoint(false)
        val np = dmpScalars
          .crossJoin(broadcast(k2m.agg(
            coalesce(sum(col("cnt_a") * col("cnt_b")), lit(0L)).as("c2"))))
          .select((col("c01") + col("c2")).as("n_match_pairs"))
        // Certificate fusion (VERDICT r13 #1): the three block censuses
        // share (occ, cnt_a, cnt_b), so every per-level certificate —
        // kept-occupancy maxima, full/kept candidate mass, purge count —
        // computes in ONE union+aggregate pass instead of five separate
        // crossJoin(broadcast(agg)) stages. Values are identical by
        // construction (keepK ≡ blkK filtered occ <= cap).
        def lvl(df: DataFrame, k: Int) = df.select(lit(k).as("lv"),
          col("occ"), (col("cnt_a") * col("cnt_b")).as("mass"))
        val lvlStats = lvl(db.blk0, 0).unionAll(lvl(db.blk1, 1))
          .unionAll(lvl(db.blk2, 2))
          .agg(
            sum(when(col("lv") === 0, col("mass"))).as("cand_full"),
            coalesce(max(when(col("lv") === 0 && col("occ") <= BlockCap,
              col("occ"))), lit(-1L)).as("max_occ_kept0"),
            coalesce(max(when(col("lv") === 1 && col("occ") <= BlockCap,
              col("occ"))), lit(-1L)).as("max_occ_kept1"),
            coalesce(max(when(col("lv") === 2 && col("occ") <= BlockCap,
              col("occ"))), lit(-1L)).as("max_occ_kept2"),
            coalesce(sum(when(col("lv") === 2 && col("occ") <= BlockCap,
              col("mass"))), lit(0L)).as("c2d"),
            sum(when(col("lv") === 2 && col("occ") > BlockCap, 1L)
              .otherwise(0L)).as("n_purged_blocks"))
        val certs = dmpScalars
          .crossJoin(broadcast(lvlStats))
          .select((col("c01d") + col("c2d")).as("cand_total"),
            col("cand_full"), col("max_occ_kept0"),
            col("max_occ_kept1"), col("max_occ_kept2"),
            col("n_purged_blocks"))
        erCapstoneCardFromEdges(lp, grid8, edges, np)
          .crossJoin(broadcast(certs))
          .select(col("n_records"), col("n_true_pairs"),
            col("n_match_pairs"), col("n_clusters"),
            col("n_merged_clusters"), col("n_split_truths"),
            col("n_changed_last_round"),
            col("b3_precision_ppm"), col("b3_recall_ppm"),
            col("b3_f1_ppm"),
            col("cand_total"), col("cand_full"),
            expr("cand_total * 1000000 div cand_full")
              .as("reduction_ppm"),
            col("max_occ_kept0"), col("max_occ_kept1"),
            col("max_occ_kept2"), col("n_purged_blocks"))
      },
      oracle = Some(s"""
        WITH $linkageCtes,
        $dynBlockCtes,
        dmp01 AS MATERIALIZED (
          SELECT x.a_key, y.b_key,
                 CASE WHEN x.tok = y.tok THEN 1 ELSE 0 END AS g_tok,
                 CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END AS g_seg,
                 CASE WHEN x.band = y.band THEN 1 ELSE 0 END AS g_band
          FROM a x JOIN keep0 k ON x.nat = k.nat AND x.seg = k.seg
          JOIN b y ON y.nat = x.nat AND y.seg = x.seg
          UNION ALL
          SELECT x.a_key, y.b_key,
                 CASE WHEN x.tok = y.tok THEN 1 ELSE 0 END,
                 CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END,
                 CASE WHEN x.band = y.band THEN 1 ELSE 0 END
          FROM a1 x JOIN keep1 k ON x.nat = k.nat AND x.seg = k.seg
            AND x.band = k.band
          JOIN b y ON y.nat = x.nat AND y.seg = x.seg
            AND y.band = x.band),
        mp01 AS MATERIALIZED (
          SELECT c.a_key, c.b_key
          FROM dmp01 c JOIN dec d
            ON d.pid = c.g_tok * 4 + c.g_seg * 2 + c.g_band
          WHERE d.decision = 'match'),
        p7 AS (SELECT 1 AS p7 FROM dec
               WHERE pid = 7 AND decision = 'match'),
        k2m AS MATERIALIZED (SELECT k.* FROM keep2 k CROSS JOIN p7),
        a2m AS MATERIALIZED (SELECT x.* FROM a2 x
                JOIN k2m USING (nat, seg, band, tok)),
        b2m AS MATERIALIZED (SELECT y.* FROM b2 y
                JOIN k2m USING (nat, seg, band, tok)),
        mins AS MATERIALIZED (SELECT nat, seg, band, tok, LEAST(ma, mb) AS rep FROM
          (SELECT nat, seg, band, tok, MIN(a_key * 2) AS ma
           FROM a2m GROUP BY 1, 2, 3, 4) aa
          JOIN (SELECT nat, seg, band, tok, MIN(b_key * 2 + 1) AS mb
                FROM b2m GROUP BY 1, 2, 3, 4) bb
          USING (nat, seg, band, tok)),
        e2 AS MATERIALIZED (SELECT a_key * 2 AS x, rep AS y
               FROM a2m JOIN mins USING (nat, seg, band, tok)
               WHERE a_key * 2 <> rep
               UNION ALL
               SELECT b_key * 2 + 1, rep
               FROM b2m JOIN mins USING (nat, seg, band, tok)
               WHERE b_key * 2 + 1 <> rep),
        edges AS MATERIALIZED (SELECT a_key * 2 AS x, b_key * 2 + 1 AS y FROM mp01
                  UNION ALL SELECT x, y FROM e2),
        np AS (SELECT CAST((SELECT COUNT(*) FROM mp01)
                 + (SELECT COALESCE(SUM(cnt_a * cnt_b), 0) FROM k2m)
                 AS BIGINT) AS n_match_pairs),
        certs AS (
          SELECT CAST((SELECT COUNT(*) FROM dmp01)
                   + (SELECT COALESCE(SUM(cnt_a * cnt_b), 0) FROM keep2)
                   AS BIGINT) AS cand_total,
                 (SELECT CAST(SUM(cnt_a * cnt_b) AS BIGINT) FROM blk0)
                   AS cand_full,
                 (SELECT CAST(COALESCE(MAX(occ), -1) AS BIGINT)
                  FROM keep0) AS max_occ_kept0,
                 (SELECT CAST(COALESCE(MAX(occ), -1) AS BIGINT)
                  FROM keep1) AS max_occ_kept1,
                 (SELECT CAST(COALESCE(MAX(occ), -1) AS BIGINT)
                  FROM keep2) AS max_occ_kept2,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM blk2
                  WHERE occ > $BlockCap) AS n_purged_blocks),
        $erTailCtes
        SELECT $erTailSelect,
               certs.cand_total, certs.cand_full,
               CAST(certs.cand_total * 1000000 // certs.cand_full
                 AS BIGINT) AS reduction_ppm,
               certs.max_occ_kept0, certs.max_occ_kept1,
               certs.max_occ_kept2, certs.n_purged_blocks
        FROM pr CROSS JOIN np CROSS JOIN tp CROSS JOIN mg
        CROSS JOIN sp CROSS JOIN chg CROSS JOIN certs""")),
      // gate-only since round 15 (VERDICT r14 #1): q353 — the density-
      // robust weighted capstone that keeps B³ precision at sf1 where
      // this gate's 4-field scoring saturates to 0.270 — is the form a
      // 100 TB run would copy, so IT carries the benched-headline flag;
      // q349 stays as the dynamic-blocking correctness gate (its
      // BASELINE.md row is preserved for history).

    // ---- q353: density-robust ER capstone (round 14) ----
    // VERDICT r13 #2: q349's sf1 card honestly read B³ precision 0.270 —
    // at 10× density the 4 quasi-identifiers saturate (793k coincidental
    // all-agree pairs among 121k true). Round 14 first MEASURED the
    // suggested fix — value-frequency (Fellegi–Sunter u) reweighting of
    // the same 4 fields — and it is provably insufficient: WeightProbe's
    // sf1 pair-level precision is FLAT at 0.0997 across every threshold,
    // because within a saturated all-agree block the true pair and its
    // coincidental block-mates share identical field values and are
    // EXCHANGEABLE — no function of those fields can separate them. The
    // classical production answer is IDENTIFIER ENRICHMENT plus
    // multi-pass blocking, built here:
    //   1. a 5th, finer quasi-identifier of phone-last-4 grade (~10^4
    //      uniform values keyed to the entity; a-side clean, b-side
    //      noised 10% with the registry coin discipline);
    //   2. a second capped blocking pass on (nat, ph) — recovering true
    //      pairs the field-noise knocked out of the dynamic-block path
    //      (blocking recall ceiling 0.65 → 0.92 measured);
    //   3. VALUE-SPECIFIC capped agreement factors on all 5 fields
    //      (agreeing on a rare value outranks a common one — the
    //      frequency weighting the verdict asked for, where it can
    //      actually act) with prior-odds threshold scaling
    //      (T · max(n_a, n_b)).
    // The factor caps flatten the fine fields' value spread so decision
    // bands sit decades apart, and cap_ph > cap_tok ranks (tok−, ph+)
    // above (ph−, tok+): a tok-noised true pair outscores a
    // ph-disagreeing coincidental all-agree pair. Acceptance measured at
    // the sf1 rehearsal via this gate's own card (see BASELINE.md):
    // B³ precision/recall both ≥ 0.8 where q349 read 0.270, with the
    // sf0.1 card better than q349's on both axes.
    //
    // 100 TB posture: candidate mass ≤ cap·rows per blocking pass BY
    // CONSTRUCTION (purge certificates for both passes), censuses are
    // one broadcast-sized groupBy per field/side, scoring is in-row
    // integer arithmetic, and the match graph enters the SHARED
    // propagation tail at match cardinality.
    "q353_er_weighted_capstone" -> QueryDef(
      build = (spark, dir) => {
        val wp = weightedParts(spark, dir)
        val lp = wp.lp
        val grid8 = lp.grid.localCheckpoint(false)
        val sc = wp.scored
        val edges = sc.filter(col("is_match"))
          .select((col("a_key") * 2).as("x"),
            (col("b_key") * 2 + 1).as("y"))
        // One full-frame scalar pass serves the pair count AND the
        // all-agree census (round-15 latency rework: these were two
        // separate aggs over the same checkpointed frame — two stage
        // launches for one row each); np/aa project from the staged
        // 1-row result.
        val allAgree = col("g_seg") === 1L && col("g_band") === 1L &&
          col("g_tok") === 1L
        val scal = sc.agg(
            coalesce(sum(when(col("is_match"), 1L).otherwise(0L)),
              lit(0L)).as("n_match_pairs"),
            count(lit(1)).as("n_cand_total"),
            coalesce(sum(when(allAgree, 1L).otherwise(0L)), lit(0L))
              .as("n_allagree4"),
            coalesce(sum(when(allAgree && col("is_match"), 1L)
              .otherwise(0L)), lit(0L)).as("n_allagree4_kept"))
          .localCheckpoint(false)
        val np = scal.select(col("n_match_pairs"))
        // purge count read from the fused census statistic row (round
        // 16) — identical to count(phPurged), minus one aggregation job
        val aa = scal
          .select(col("n_cand_total"), col("n_allagree4"),
            col("n_allagree4_kept"))
          .crossJoin(broadcast(wp.stRow.select(col("n_purged_ph_blocks"))))
        // Overlap independent certificate branches with the propagation
        // loop (round 15; guide §2.6 "overlap independent jobs"): the
        // card tail below runs ~4 eager jobs per propagation round on
        // THIS thread, while the scalar census (scal), the FS grid
        // (grid8) and the ph-purge count are independent of the loop —
        // previously they materialized serially inside the final
        // assembly job. Materialize the scored front ONCE first (its
        // lazy-checkpoint blocks would otherwise be computed twice by
        // the racing threads), then let FIFO scheduling backfill the
        // loop's idle cores with the certificate jobs. Results are
        // unchanged: these are the same frames, just materialized
        // earlier on another thread.
        sc.count()
        val bgErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val bg = new Thread(() => {
          try { scal.count(); grid8.count() }
          catch { case t: Throwable => bgErr.set(t) }
        })
        bg.setDaemon(true)
        bg.start()
        // join in a finally (round 16, ADVICE r15 #4): if the card tail
        // throws, the certificate thread must not keep submitting jobs
        // against the shared session after the query has failed.
        val card =
          try erCapstoneCardFromEdges(lp, grid8, edges, np)
          finally bg.join()
        val err = bgErr.get()
        if (err != null) throw err
        card
          .crossJoin(broadcast(aa))
          .select(col("n_records"), col("n_true_pairs"),
            col("n_match_pairs"), col("n_clusters"),
            col("n_merged_clusters"), col("n_split_truths"),
            col("n_changed_last_round"),
            col("b3_precision_ppm"), col("b3_recall_ppm"),
            col("b3_f1_ppm"), col("n_cand_total"), col("n_allagree4"),
            col("n_allagree4_kept"), col("n_purged_ph_blocks"))
      },
      oracle = Some(s"""
        WITH $linkageCtes,
        $dynBlockCtes,
        phf AS (SELECT c_custkey AS k,
                       ('0x' || substr(md5('q353ID#'
                         || CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT
                         % 10000 AS ph
                FROM customer),
        aw AS MATERIALIZED (
          SELECT a.*, p.ph FROM a JOIN phf p ON p.k = a.a_key),
        bw AS MATERIALIZED (
          SELECT b.*, CASE WHEN ('0x' || substr(md5('q353P#'
                   || CAST(p.k AS VARCHAR)), 1, 12))::BIGINT
                   % 1000000 < 100000
                 THEN (p.ph + 1) % 10000 ELSE p.ph END AS ph
          FROM b JOIN phf p ON p.k = b.b_key),
        blkP AS MATERIALIZED (
          SELECT nat, ph, ca.cnt_a, cb.cnt_b,
                 GREATEST(ca.cnt_a, cb.cnt_b) AS occ
          FROM (SELECT nat, ph, COUNT(*) AS cnt_a FROM aw GROUP BY 1, 2)
            ca JOIN (SELECT nat, ph, COUNT(*) AS cnt_b FROM bw
            GROUP BY 1, 2) cb USING (nat, ph)),
        keepP AS (SELECT * FROM blkP WHERE occ <= $BlockCap),
        aw1 AS (SELECT w.* FROM aw w JOIN split0 USING (nat, seg)),
        aw2 AS (SELECT w.* FROM aw1 w JOIN split1 USING (nat, seg, band)),
        candw AS MATERIALIZED (
          SELECT x.a_key, y.b_key, x.nat AS anat, x.seg AS aseg,
                 x.band AS aband, x.tok AS atok, x.ph AS aph,
                 y.nat AS bnat, y.seg AS bseg, y.band AS bband,
                 y.tok AS btok, y.ph AS bph
          FROM aw x JOIN keep0 k ON x.nat = k.nat AND x.seg = k.seg
          JOIN bw y ON y.nat = x.nat AND y.seg = x.seg
          UNION
          SELECT x.a_key, y.b_key, x.nat, x.seg, x.band, x.tok, x.ph,
                 y.nat, y.seg, y.band, y.tok, y.ph
          FROM aw1 x JOIN keep1 k ON x.nat = k.nat AND x.seg = k.seg
            AND x.band = k.band
          JOIN bw y ON y.nat = x.nat AND y.seg = x.seg
            AND y.band = x.band
          UNION
          SELECT x.a_key, y.b_key, x.nat, x.seg, x.band, x.tok, x.ph,
                 y.nat, y.seg, y.band, y.tok, y.ph
          FROM aw2 x JOIN keep2 k ON x.nat = k.nat AND x.seg = k.seg
            AND x.band = k.band AND x.tok = k.tok
          JOIN bw y ON y.nat = x.nat AND y.seg = x.seg
            AND y.band = x.band AND y.tok = x.tok
          UNION
          SELECT x.a_key, y.b_key, x.nat, x.seg, x.band, x.tok, x.ph,
                 y.nat, y.seg, y.band, y.tok, y.ph
          FROM aw x JOIN keepP k ON x.nat = k.nat AND x.ph = k.ph
          JOIN bw y ON y.nat = x.nat AND y.ph = x.ph),
        canat AS (SELECT nat, COUNT(*) AS ca_nat FROM aw GROUP BY 1),
        cbnat AS (SELECT nat, COUNT(*) AS cb_nat FROM bw GROUP BY 1),
        caseg AS (SELECT seg, COUNT(*) AS ca_seg FROM aw GROUP BY 1),
        cbseg AS (SELECT seg, COUNT(*) AS cb_seg FROM bw GROUP BY 1),
        caband AS (SELECT band, COUNT(*) AS ca_band FROM aw GROUP BY 1),
        cbband AS (SELECT band, COUNT(*) AS cb_band FROM bw GROUP BY 1),
        catok AS (SELECT tok, COUNT(*) AS ca_tok FROM aw GROUP BY 1),
        cbtok AS (SELECT tok, COUNT(*) AS cb_tok FROM bw GROUP BY 1),
        caph AS (SELECT ph, COUNT(*) AS ca_ph FROM aw GROUP BY 1),
        cbph AS (SELECT ph, COUNT(*) AS cb_ph FROM bw GROUP BY 1),
        snew AS (SELECT
          (SELECT SUM(CAST(x.ca_seg AS HUGEINT) * y.cb_seg)
           FROM caseg x JOIN cbseg y USING (seg)) AS s_seg2,
          (SELECT SUM(CAST(x.ca_ph AS HUGEINT) * y.cb_ph)
           FROM caph x JOIN cbph y USING (ph)) AS s_ph),
        stw AS (SELECT CAST(n_a AS HUGEINT) * n_b AS nab,
                       f_tok_d, f_band_d,
                       CAST(100000 * (CAST(n_a AS HUGEINT) * n_b)
                         // (CAST(n_a AS HUGEINT) * n_b - s_seg2)
                         AS BIGINT) AS f_seg_d,
                       CAST(100000 * (CAST(n_a AS HUGEINT) * n_b)
                         // (CAST(n_a AS HUGEINT) * n_b - s_ph)
                         AS BIGINT) AS f_ph_d,
                       CAST($WeightedMatchT AS HUGEINT)
                         * GREATEST(n_a, n_b) AS thr
                FROM stf CROSS JOIN snew),
        sc AS MATERIALIZED (
          SELECT d.a_key, d.b_key,
                 CASE WHEN d.aseg = d.bseg THEN 1 ELSE 0 END AS g_seg,
                 CASE WHEN d.aband = d.bband THEN 1 ELSE 0 END AS g_band,
                 CASE WHEN d.atok = d.btok THEN 1 ELSE 0 END AS g_tok,
                 CASE WHEN d.aph = d.bph THEN 1 ELSE 0 END AS g_ph,
                 CAST(CAST(CAST(
                   LEAST(CAST(2000000000 AS HUGEINT), 900000 * s.nab
                     // (CAST(cn.ca_nat AS HUGEINT) * dn.cb_nat))
                   * (CASE WHEN d.aseg = d.bseg THEN
                       LEAST(CAST(2000000000 AS HUGEINT), 900000 * s.nab
                         // (CAST(cs.ca_seg AS HUGEINT) * ds.cb_seg))
                      ELSE CAST(s.f_seg_d AS HUGEINT) END)
                   * (CASE WHEN d.aband = d.bband THEN
                       LEAST(CAST(2000000000 AS HUGEINT), 900000 * s.nab
                         // (CAST(cd.ca_band AS HUGEINT) * dd.cb_band))
                      ELSE CAST(s.f_band_d AS HUGEINT) END)
                   // 10000000000 AS HUGEINT)
                   * (CASE WHEN d.atok = d.btok THEN
                       LEAST(CAST(2000000000 AS HUGEINT), 900000 * s.nab
                         // (CAST(ct.ca_tok AS HUGEINT) * dt.cb_tok))
                      ELSE CAST(s.f_tok_d AS HUGEINT) END)
                   // 10000000000 AS HUGEINT)
                   * (CASE WHEN d.aph = d.bph THEN
                       LEAST(CAST(2000000000000 AS HUGEINT),
                         900000 * s.nab
                           // (CAST(cp.ca_ph AS HUGEINT) * dp.cb_ph))
                      ELSE CAST(s.f_ph_d AS HUGEINT) END)
                   AS HUGEINT) AS p5, s.thr
          FROM candw d
          JOIN canat cn ON cn.nat = d.anat
          JOIN cbnat dn ON dn.nat = d.bnat
          JOIN caseg cs ON cs.seg = d.aseg
          JOIN cbseg ds ON ds.seg = d.bseg
          JOIN caband cd ON cd.band = d.aband
          JOIN cbband dd ON dd.band = d.bband
          JOIN catok ct ON ct.tok = d.atok
          JOIN cbtok dt ON dt.tok = d.btok
          JOIN caph cp ON cp.ph = d.aph
          JOIN cbph dp ON dp.ph = d.bph
          CROSS JOIN stw s),
        m AS MATERIALIZED (SELECT a_key, b_key FROM sc WHERE p5 >= thr),
        edges AS MATERIALIZED (
          SELECT a_key * 2 AS x, b_key * 2 + 1 AS y FROM m),
        np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_match_pairs FROM m),
        aa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand_total,
                 CAST(SUM(CASE WHEN g_seg = 1 AND g_band = 1
                   AND g_tok = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_allagree4,
                 CAST(SUM(CASE WHEN g_seg = 1 AND g_band = 1
                   AND g_tok = 1 AND p5 >= thr THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_allagree4_kept,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM blkP
                  WHERE occ > $BlockCap) AS n_purged_ph_blocks
               FROM sc),
        $erTailCtes
        SELECT $erTailSelect,
               aa.n_cand_total, aa.n_allagree4, aa.n_allagree4_kept,
               aa.n_purged_ph_blocks
        FROM pr CROSS JOIN np CROSS JOIN tp CROSS JOIN mg
        CROSS JOIN sp CROSS JOIN chg CROSS JOIN aa"""),
      headline = true), // round-15 ER headline (VERDICT r14 #1): the
      // production-quality weighted capstone replaces q349 in the bench

    // ---- q354: ExactSubstr maximal shared runs (round 14) ----
    // VERDICT r13 #6: q127 counts fixed-width repeated windows; Lee et
    // al.'s ExactSubstr dedup removes the LONGEST repeated substring at
    // any alignment. This gate reconstructs maximal aligned shared runs
    // from the q202 winnowing fingerprints ([[graft.operators.Winnowing
    // .sharedRuns]]): matched fingerprints of one true shared substring
    // sit on a single (pos_b − pos_a) diagonal at ≤ w positions apart
    // (the winnowing density guarantee), so gaps-and-islands over pos_a
    // per (pair, diagonal) yields each maximal run; run_tokens = span+k
    // is a certified lower bound of the shared substring length. Output:
    // per-pair run census (count, longest, total shared-token lower
    // bound, affected fraction of the a-side doc) for pairs whose
    // longest certified run reaches 8 tokens.
    //
    // 100 TB posture: fingerprinting is map-side (q202's operator); the
    // only cross-doc work is the stop-fingerprint-capped equijoin; the
    // islands window partitions by (pair, diagonal) at matched-
    // fingerprint cardinality — no all-pairs, no doc-length blowup.
    "q354_exactsubstr_runs" -> QueryDef(
      build = (spark, dir) => {
        import graft.operators.Winnowing
        val docs = Tables.documents(spark, dir)
        val fps = Winnowing.fingerprints(docs, "doc_id", "text",
          k = 3, w = 4)
        val runs = Winnowing.sharedRuns(fps, maxDocsPerFp = 50,
          gap = 4, k = 3)
        val lens = docs.select(col("doc_id").as("doc_a"),
          size(split(trim(col("text")), " ")).cast("long").as("len_a"))
        runs.groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_runs"),
            max(col("run_tokens")).as("longest_run_tokens"),
            sum(col("run_tokens")).as("shared_tokens_lb"))
          .filter(col("longest_run_tokens") >= 8L)
          .join(lens, Seq("doc_a"))
          .select(col("doc_a"), col("doc_b"), col("n_runs"),
            col("longest_run_tokens"), col("shared_tokens_lb"),
            expr("shared_tokens_lb * 1000000 div len_a")
              .as("affected_ppm_a"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      oracle = Some(s"""
        WITH $winnowRunCtes,
        census AS (SELECT doc_a, doc_b,
                          CAST(COUNT(*) AS BIGINT) AS n_runs,
                          CAST(MAX(p1 - p0 + 3) AS BIGINT)
                            AS longest_run_tokens,
                          CAST(SUM(p1 - p0 + 3) AS BIGINT)
                            AS shared_tokens_lb
                   FROM runs GROUP BY 1, 2
                   HAVING MAX(p1 - p0 + 3) >= 8),
        lens AS (SELECT doc_id AS doc_a,
                        CAST(len(string_split(trim(text), ' '))
                          AS BIGINT) AS len_a
                 FROM documents)
        SELECT c.doc_a, c.doc_b, c.n_runs, c.longest_run_tokens,
               c.shared_tokens_lb,
               c.shared_tokens_lb * 1000000 // l.len_a AS affected_ppm_a
        FROM census c JOIN lens l USING (doc_a)
        ORDER BY doc_a, doc_b""")),

    // ---- q358: ExactSubstr dedup REWRITE (round 15) ----
    // q354 finds the maximal aligned shared runs; this gate performs the
    // dedup a training pipeline actually ships (Lee et al.'s ExactSubstr
    // removal): for every certified run of ≥ 8 tokens, the HIGHER-id doc
    // of the pair cuts the run's b-side token interval (keep-first — the
    // lower id retains its text; the standard greedy approximation, so a
    // doc can keep text as doc_a of one pair while cutting as doc_b of
    // another). Intervals from all pairs union per doc, deduplicate, and
    // MERGE by the classic sweep (prefix-max of interval end over the
    // (start, end) order; a new island starts where start > max end so
    // far), so overlapping cuts never double-count. Output: per affected
    // doc the cut census (n_cuts, removed/kept tokens, removed ppm) plus
    // the corpus rollup riding every row.
    //
    // 100 TB posture: everything q354 pays (map-side fingerprinting,
    // stop-fp-capped equijoin, per-(pair, diagonal) windows at matched-
    // fingerprint cardinality) + one interval-merge window partitioned
    // per doc at cut-interval cardinality — no new corpus-scale
    // structure, and the rewrite itself would be a map-side zip of the
    // merged intervals against the token stream.
    "q358_exactsubstr_dedup" -> QueryDef(
      build = (spark, dir) => {
        import graft.operators.Winnowing
        val docs = Tables.documents(spark, dir)
        val fps = Winnowing.fingerprints(docs, "doc_id", "text",
          k = 3, w = 4)
        val runs = Winnowing.sharedRuns(fps, maxDocsPerFp = 50,
          gap = 4, k = 3)
        val cuts = runs.filter(col("run_tokens") >= 8L)
          .select(col("doc_b").as("doc_id"),
            (col("p0") + col("diag")).as("s"),
            (col("p0") + col("diag") + col("run_tokens")).as("e"))
          .distinct()
        val lens = docs.select(col("doc_id"),
          size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("s"), col("e"))
        val merged = cuts
          .withColumn("pmax", max(col("e")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("brk", when(col("pmax").isNull ||
            col("s") > col("pmax"), 1L).otherwise(0L))
          .withColumn("grp", sum(col("brk")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("doc_id"), col("grp"))
          .agg(min(col("s")).as("ms"), max(col("e")).as("me"))
        val perDoc = merged.join(lens, Seq("doc_id"))
          .groupBy(col("doc_id"), col("n_tokens"))
          .agg(count(lit(1)).as("n_cuts"),
            sum(least(col("me"), col("n_tokens")) - col("ms"))
              .as("removed_tokens"))
          .select(col("doc_id"), col("n_cuts"), col("n_tokens"),
            col("removed_tokens"),
            (col("n_tokens") - col("removed_tokens")).as("kept_tokens"),
            expr("removed_tokens * 1000000 div n_tokens")
              .as("removed_ppm"))
          .localCheckpoint(false)
        val roll = perDoc
          .agg(count(lit(1)).as("docs_affected"),
            sum(col("removed_tokens")).as("corpus_removed_tokens"))
          .crossJoin(broadcast(
            lens.agg(sum(col("n_tokens")).as("corpus_tokens"))))
          .select(col("docs_affected"), col("corpus_removed_tokens"),
            col("corpus_tokens"),
            expr("corpus_removed_tokens * 1000000 div corpus_tokens")
              .as("corpus_removed_ppm"))
        perDoc.crossJoin(broadcast(roll))
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH $winnowRunCtes,
        cuts AS (SELECT DISTINCT doc_b AS doc_id, p0 + diag AS s,
                        p0 + diag + (p1 - p0 + 3) AS e
                 FROM runs WHERE p1 - p0 + 3 >= 8),
        lens AS (SELECT doc_id,
                        CAST(len(string_split(trim(text), ' '))
                          AS BIGINT) AS n_tokens
                 FROM documents),
        c0 AS (SELECT *, MAX(e) OVER (PARTITION BY doc_id
                   ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS pmax FROM cuts),
        c1 AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax
                 THEN 1 ELSE 0 END AS brk FROM c0),
        c2 AS (SELECT *, SUM(brk) OVER (PARTITION BY doc_id
                   ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp
               FROM c1),
        merged AS (SELECT doc_id, grp, MIN(s) AS ms, MAX(e) AS me
                   FROM c2 GROUP BY 1, 2),
        perdoc AS (SELECT m.doc_id, l.n_tokens,
                          CAST(COUNT(*) AS BIGINT) AS n_cuts,
                          CAST(SUM(LEAST(m.me, l.n_tokens) - m.ms)
                            AS BIGINT) AS removed_tokens
                   FROM merged m JOIN lens l USING (doc_id)
                   GROUP BY 1, 2),
        roll AS (SELECT CAST(COUNT(*) AS BIGINT) AS docs_affected,
                        CAST(SUM(removed_tokens) AS BIGINT)
                          AS corpus_removed_tokens,
                        (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM lens)
                          AS corpus_tokens
                 FROM perdoc)
        SELECT p.doc_id, p.n_cuts, p.n_tokens, p.removed_tokens,
               p.n_tokens - p.removed_tokens AS kept_tokens,
               p.removed_tokens * 1000000 // p.n_tokens AS removed_ppm,
               r.docs_affected, r.corpus_removed_tokens,
               r.corpus_tokens,
               r.corpus_removed_tokens * 1000000 // r.corpus_tokens
                 AS corpus_removed_ppm
        FROM perdoc p CROSS JOIN roll r
        ORDER BY doc_id""")),

    // ---- q361: soft-dedup sampling weights (round 15) ----
    // The production ALTERNATIVE to hard near-dup removal: keep every
    // document but down-weight it by its duplicate-cluster size
    // (w = 1/|cluster| — cluster mass sums to one doc's worth, the
    // "soft dedup" used when provenance diversity matters more than
    // byte savings). Clusters are the SHARED q265/q278/q356 chunk-edge
    // components, so the cluster definition cannot drift from the hard
    // path's. Effective token mass is EXACT in integer micro-tokens
    // (n_tokens·10⁶ div cl_size per doc, summed); the per-source card a
    // mixture planner reads: raw vs effective tokens, dup coverage,
    // and the deflation ratio in ppm.
    //
    // 100 TB posture: everything q265 pays + one cluster-size census
    // keyed on the label and one doc-keyed join — no new corpus-scale
    // structure.
    "q361_softdedup_weights" -> QueryDef(
      build = (spark, dir) => {
        val parts = componentParts(spark, dir)
        val docs = Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), " ")).cast("long")
              .as("n_tokens"))
        val sizes = parts.lbl.groupBy(col("lbl"))
          .agg(count(lit(1)).as("cl_size"))
        val j = parts.lbl.join(sizes, Seq("lbl"))
          .join(docs, Seq("doc_id"))
        j.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(when(col("cl_size") > 1L, 1L).otherwise(0L)),
              lit(0L)).as("n_dup_docs"),
            countDistinct(col("lbl")).as("n_clusters"),
            sum(col("n_tokens")).as("raw_tokens"),
            sum(expr("n_tokens * 1000000 div cl_size"))
              .as("eff_tokens_micro"))
          .select(col("source"), col("n_docs"), col("n_dup_docs"),
            col("n_clusters"), col("raw_tokens"),
            col("eff_tokens_micro"),
            expr("eff_tokens_micro div raw_tokens").as("retain_ppm"))
          .orderBy(col("source"))
      },
      oracle = Some(s"""
        WITH $componentCtes,
        sizes AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS cl_size
                  FROM l6 GROUP BY 1),
        d AS (SELECT doc_id, source,
                     CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                       AS n_tokens
              FROM documents),
        j AS (SELECT l.doc_id, l.lbl, s.cl_size, d.source, d.n_tokens
              FROM l6 l JOIN sizes s USING (lbl) JOIN d USING (doc_id))
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN cl_size > 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_dup_docs,
               CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_clusters,
               CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
               CAST(SUM(n_tokens * 1000000 // cl_size) AS BIGINT)
                 AS eff_tokens_micro,
               CAST(SUM(n_tokens * 1000000 // cl_size) // SUM(n_tokens)
                 AS BIGINT) AS retain_ppm
        FROM j GROUP BY source ORDER BY source""")),

    // ---- q356: group-aware split leakage law (round 14) ----
    // The train/val/test split every training pipeline performs, gated
    // on the property that actually matters: NO near-duplicate pair may
    // cross a split (a test doc whose near-dup sits in train is
    // contamination — the Lee et al./GPT-3 dedup motivation applied to
    // the split step). Group-aware assignment hashes the q265 DUP
    // CLUSTER label (md5 coin % 10 → 8/1/1 train/val/test), so every
    // cluster lands whole in one split; the law certifies
    // leak_pairs_grouped = 0 FROM THE EDGES THEMSELVES (not by
    // construction on paper) and measures, per split, what the naive
    // doc-hash split would have leaked (leak_pairs_naive — the number
    // that motivates group-awareness). Shares componentParts /
    // componentCtes with q265/q278, so the cluster definition cannot
    // drift.
    //
    // 100 TB posture: everything q265 pays + one broadcast-joinable
    // split stamp per doc and one edge-keyed join against the stamped
    // docs — no new corpus-scale structure.
    "q356_split_leakage_law" -> QueryDef(
      build = (spark, dir) => {
        val parts = componentParts(spark, dir)
        def coin10(c: org.apache.spark.sql.Column) =
          conv(substring(md5(concat(lit("q356S#"),
            c.cast("string"))), 1, 12), 16, 10).cast("long") % 10L
        def splitOf(d: org.apache.spark.sql.Column) =
          when(d <= 7L, "train").when(d === 8L, "val").otherwise("test")
        val toks = Tables.documents(spark, dir)
          .select(col("doc_id"),
            size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
        val stamped = parts.lbl
          .select(col("doc_id"), col("lbl"),
            splitOf(coin10(col("lbl"))).as("split_g"),
            splitOf(coin10(col("doc_id"))).as("split_n"))
          .join(toks, Seq("doc_id"))
          .localCheckpoint(false)
        val ea = stamped.select(col("doc_id").as("a"),
          col("split_g").as("ga"), col("split_n").as("na"))
        val eb = stamped.select(col("doc_id").as("b"),
          col("split_g").as("gb"), col("split_n").as("nb"))
        val leaks = parts.e.join(ea, Seq("a")).join(eb, Seq("b"))
          .agg(count(lit(1)).as("n_edges"),
            coalesce(sum(when(col("ga") =!= col("gb"), 1L)
              .otherwise(0L)), lit(0L)).as("leak_pairs_grouped"),
            coalesce(sum(when(col("na") =!= col("nb"), 1L)
              .otherwise(0L)), lit(0L)).as("leak_pairs_naive"))
        stamped.groupBy(col("split_g").as("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            countDistinct(col("lbl")).as("n_clusters"))
          .crossJoin(broadcast(leaks))
          .orderBy(col("split"))
      },
      oracle = Some(s"""
        WITH $componentCtes,
        tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
               FROM t),
        st AS MATERIALIZED (
          SELECT l6.doc_id, l6.lbl, tk.n_tokens,
                 CASE WHEN ('0x' || substr(md5('q356S#'
                     || CAST(l6.lbl AS VARCHAR)), 1, 12))::BIGINT
                     % 10 <= 7 THEN 'train'
                   WHEN ('0x' || substr(md5('q356S#'
                     || CAST(l6.lbl AS VARCHAR)), 1, 12))::BIGINT
                     % 10 = 8 THEN 'val'
                   ELSE 'test' END AS split_g,
                 CASE WHEN ('0x' || substr(md5('q356S#'
                     || CAST(l6.doc_id AS VARCHAR)), 1, 12))::BIGINT
                     % 10 <= 7 THEN 'train'
                   WHEN ('0x' || substr(md5('q356S#'
                     || CAST(l6.doc_id AS VARCHAR)), 1, 12))::BIGINT
                     % 10 = 8 THEN 'val'
                   ELSE 'test' END AS split_n
          FROM l6 JOIN tk USING (doc_id)),
        lk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
                      CAST(SUM(CASE WHEN xa.split_g <> xb.split_g
                        THEN 1 ELSE 0 END) AS BIGINT)
                        AS leak_pairs_grouped,
                      CAST(SUM(CASE WHEN xa.split_n <> xb.split_n
                        THEN 1 ELSE 0 END) AS BIGINT)
                        AS leak_pairs_naive
               FROM e JOIN st xa ON xa.doc_id = e.a
               JOIN st xb ON xb.doc_id = e.b)
        SELECT st.split_g AS split, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(st.n_tokens) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT st.lbl) AS BIGINT) AS n_clusters,
               lk.n_edges, lk.leak_pairs_grouped, lk.leak_pairs_naive
        FROM st CROSS JOIN lk
        GROUP BY st.split_g, lk.n_edges, lk.leak_pairs_grouped,
                 lk.leak_pairs_naive
        ORDER BY split"""))
  )

  /** The ER capstone's clustering tail, SHARED by q325 (fixed blocking)
    * and q349 (capped dynamic blocking) so the two capstones cannot
    * drift: match pairs → entity graph (a-side node 2k, b-side 2k+1) →
    * 6 rounds of min-label propagation (round-6-vs-5 change count as
    * the convergence certificate) → B³ precision/recall/F1 against the
    * true entity key + merge/split certificates. See q325's docstring
    * for the full derivation.
    *
    * 100 TB posture: per-round ONE node-keyed equijoin + partial/final
    * min on the MATCH graph (≈ true-pair cardinality, far below
    * candidate cardinality); B³ contingency aggs at cell cardinality.
    * No all-pairs stage. */
  private def erCapstoneCard(lp: LinkageParts, grid8: DataFrame,
      mp: DataFrame): DataFrame =
    erCapstoneCardFromEdges(lp, grid8,
      mp.select((col("a_key") * 2).as("x"), (col("b_key") * 2 + 1).as("y")),
      mp.agg(count(lit(1)).as("n_match_pairs")))

  /** Edge-list form of the capstone tail: `edges` is any (x, y) node
    * graph whose connected components equal the match clustering, and
    * `np` a 1-row n_match_pairs frame — q349 passes a SUPERNODE-reduced
    * graph (stars per all-agree clique) with the exact clique pair
    * count, so the propagation cost is ∝ members, not members². */
  private def erCapstoneCardFromEdges(lp: LinkageParts, grid8: DataFrame,
      edges: DataFrame, np0: DataFrame): DataFrame = {
    val nodes = lp.a
      .select((col("a_key") * 2).as("node"), col("a_key").as("truth"))
      .unionAll(lp.b.select((col("b_key") * 2 + 1).as("node"),
        col("b_key").as("truth")))
      .localCheckpoint(false)
    val e = edges
    val sym = e.union(e.select(col("y").as("x"), col("x").as("y")))
      .localCheckpoint(false) // scanned every round — materialize once
    // Round-14 latency rework (VERDICT r13 #1 — the 6-round tail was
    // ~6.5 s of ~50 tiny AQE stage schedulings at sf0.1). Three changes,
    // all label-identical to the oracle's fixed 6-round unroll:
    //   1. each round is ONE equijoin + ONE aggregation (the node's own
    //      label is unioned into the neighbor-min instead of re-joined
    //      after it): min(own ∪ neighbor labels) ≡
    //      least(lbl, coalesce(min nbr, lbl)) exactly;
    //   2. `truth` (static) leaves the loop and re-joins once at ct;
    //   3. rounds materialize EAGERLY with a per-round change count and
    //      the loop EXITS on the first 0-change round. Min-label
    //      propagation is monotone, so a 0-change round IS the fixed
    //      point: labels equal the oracle's l6, and the exported
    //      n_changed_last_round (last executed round's count) equals
    //      the oracle's l6-vs-l5 count in every case — 0 when converged
    //      by round 5 (both sides), and the round-6 count otherwise.
    var lbl = nodes.select(col("node"), col("node").as("lbl"))
      .localCheckpoint(false)
    var lastChanged = 0L
    var round = 0
    var converged = false
    while (round < 6 && !converged) {
      round += 1
      val nbr = sym
        .join(lbl.select(col("node").as("x"), col("lbl").as("xlbl")),
          Seq("x"))
        .select(col("y").as("node"), col("xlbl").as("lbl"),
          lit(null).cast("long").as("old"))
      val next = lbl.select(col("node"), col("lbl"), col("lbl").as("old"))
        .unionAll(nbr)
        .groupBy(col("node"))
        .agg(min(col("lbl")).as("lbl"), max(col("old")).as("old"))
      // LAZY checkpoint + the change count as the materializing action
      // (round 16, VERDICT r15 #2): the eager localCheckpoint(true) ran
      // one job to stage the round and a SECOND job to count changes.
      // The count on top of the lazy checkpoint computes-and-caches the
      // round's blocks and counts the changed rows in ONE job — same
      // frames, same count, half the per-round job launches.
      val staged = next.localCheckpoint(false)
      lastChanged = staged.filter(col("lbl") =!= col("old")).count()
      lbl = staged.select(col("node"), col("lbl"))
      converged = lastChanged == 0L
    }
    val ct = lbl.join(nodes, Seq("node"))
      .groupBy(col("lbl"), col("truth"))
      .agg(count(lit(1)).as("n_ct")).localCheckpoint(false)
    // ct is UNIQUE on (lbl, truth), so the per-side distinct-partner
    // counts are plain row counts — one groupBy per side serves both the
    // B³ size join and the merge/split certificates (no countDistinct
    // expand, no second scan).
    val byLbl = ct.groupBy(col("lbl"))
      .agg(sum(col("n_ct")).as("n_c"), count(lit(1)).as("k_l"))
      .localCheckpoint(false)
    val byTruth = ct.groupBy(col("truth"))
      .agg(sum(col("n_ct")).as("n_t"), count(lit(1)).as("k_t"))
      .localCheckpoint(false)
    val nc = byLbl.select(col("lbl"), col("n_c"))
    val nt = byTruth.select(col("truth"), col("n_t"))
    val card = ct.join(nc, Seq("lbl")).join(nt, Seq("truth"))
      .agg(sum(col("n_ct")).as("n_records"),
        sum(expr("CAST(n_ct AS DECIMAL(38,0)) * n_ct" +
          " * 1000000000000 div n_c")).as("p12"),
        sum(expr("CAST(n_ct AS DECIMAL(38,0)) * n_ct" +
          " * 1000000000000 div n_t")).as("r12"))
      .select(col("n_records"),
        expr("CAST(p12 div (CAST(n_records AS DECIMAL(38,0))" +
          " * 1000000) AS BIGINT)").as("b3_precision_ppm"),
        expr("CAST(r12 div (CAST(n_records AS DECIMAL(38,0))" +
          " * 1000000) AS BIGINT)").as("b3_recall_ppm"))
    // Merge + split certificates in ONE union+aggregate over the two
    // (already checkpointed) per-side count frames (round 16, guide
    // §2.4): previously two separate aggregations, each its own
    // exchange + broadcast build in the final assembly. Values are
    // identical: n_clusters counts byLbl rows, the conditional sums
    // reproduce the old per-side k>1 counts exactly.
    val mgsp = byLbl.select(col("k_l").as("k"), lit(1L).as("is_l"))
      .unionAll(byTruth.select(col("k_t").as("k"), lit(0L).as("is_l")))
      .agg(sum(col("is_l")).as("n_clusters"),
        sum(when(col("is_l") === 1L && col("k") > 1L, 1L).otherwise(0L))
          .as("n_merged_clusters"),
        sum(when(col("is_l") === 0L && col("k") > 1L, 1L).otherwise(0L))
          .as("n_split_truths"))
    val np = np0
    val tp = grid8.agg(max(col("n_true_total")).as("n_true_pairs"))
    card.crossJoin(broadcast(np)).crossJoin(broadcast(tp))
      .crossJoin(broadcast(mgsp))
      .select(col("n_records"), col("n_true_pairs"),
        col("n_match_pairs"), col("n_clusters"),
        col("n_merged_clusters"), col("n_split_truths"),
        lit(lastChanged).as("n_changed_last_round"),
        col("b3_precision_ppm"), col("b3_recall_ppm"),
        expr("CAST(2 * b3_precision_ppm * b3_recall_ppm" +
          " div GREATEST(b3_precision_ppm + b3_recall_ppm, 1)" +
          " AS BIGINT)").as("b3_f1_ppm"))
  }

  /** Capped dynamic blocking over the linkage registries, SHARED by
    * q338 (the blocking certificate card) and q349 (the scale-safe ER
    * capstone): blocks whose occupancy exceeds `cap` split by extending
    * the key (nat,seg) → +band → +tok; pairs generate only at each
    * block's final level, so candidate mass is ≤ cap·rows per level BY
    * CONSTRUCTION. */
  private[queries] final case class DynBlocks(
      blk0: DataFrame, keep0: DataFrame, split0: DataFrame,
      a1: DataFrame, b1: DataFrame,
      blk1: DataFrame, keep1: DataFrame, split1: DataFrame,
      a2: DataFrame, b2: DataFrame, blk2: DataFrame)


  /** q353's scoring front, shared by the gate and [[WeightProbe]] (the
    * round-14 threshold calibration): ph-enriched registries, TWO-PASS
    * capped blocking (q349's dynamic blocks + a (nat, ph) pass), and the
    * 5-field value-specific factor product per deduplicated candidate
    * pair. `scored` carries one row per candidate with its factors,
    * agreement flags, capped/rescaled score `p5`, the prior-scaled
    * threshold `thr`, and `is_match`. */
  private[queries] final case class WeightedParts(lp: LinkageParts,
      db: DynBlocks, scored: DataFrame, phPurged: DataFrame,
      stRow: DataFrame)

  private[queries] def weightedParts(spark: org.apache.spark.sql.SparkSession,
      dir: String): WeightedParts = {
    val DecType = org.apache.spark.sql.types.DecimalType(38, 0)
    val lp = linkageParts(spark, dir)
    // Identifier enrichment — the measured answer to saturation (see
    // q353's docstring): a phone-last-4-grade 5th quasi-identifier
    // (simulated below), a-side clean, b-side noised at 10% with the
    // registry coin discipline. ph is a PURE FUNCTION of the entity key,
    // so it is derived in-row on the staged registries (round-15 latency
    // rework) — value-identical to the oracle's phf-join formulation but
    // two broadcast-join stages cheaper.
    //
    // The driver's customer table carries no phone column, so the 5th
    // identifier is SIMULATED with the exact information content of a
    // phone last-4: ~10^4 uniform values keyed to the entity. It MUST
    // be a non-linear keyed derivation (md5, the registry coin
    // discipline): a multiplicative hash mod 10^4 is linear in the key,
    // so ScaleFixtures' constant copy offsets made cross-copy twins
    // collide on it deterministically (measured round 14: 287k aligned
    // false all-agree-5 pairs at sf1; md5 restores the 1e-4 chance
    // rate).
    def phOf(key: String) =
      conv(substring(md5(concat(lit("q353ID#"),
        col(key).cast("string"))), 1, 12), 16, 10)
        .cast("long") % 10000L
    def coinOf(salt: String, key: String) =
      conv(substring(md5(concat(lit(salt),
        col(key).cast("string"))), 1, 12), 16, 10)
        .cast("long") % 1000000L
    val aw = lp.a.withColumn("ph", phOf("a_key")).localCheckpoint(false)
    val bw = lp.b.withColumn("ph",
        when(coinOf("q353P#", "b_key") < 100000L,
          (phOf("b_key") + 1) % 10000L).otherwise(phOf("b_key")))
      .localCheckpoint(false)
    val db = dynBlocks(lp.a, lp.b, cap = BlockCap)
    // Fused (nat, ph) block census + per-side field-value censuses
    // (round 16, VERDICT r15 #2 — same lever as dynBlocks' all-level
    // fusion): one melted pass over each enriched registry computes the
    // second blocking pass AND the five-field value census in ONE
    // exchange + ONE checkpointed frame, replacing three (blkP, fa, fb).
    // Each row explodes into its (nat, ph) block row plus five
    // (field, value) rows; per-side counts come from the same
    // conditional sums the old separate censuses took. Slices below are
    // value-identical to the old frames: blkP keeps groups present on
    // BOTH sides (the old inner-census filter), fa/fb keep any group
    // present on THEIR side (a value occurring on a side always has a
    // nonzero count there).
    val PhKeys = Seq("nat", "ph")
    val nulS = lit(null).cast("string")
    val nulL = lit(null).cast("long")
    def meltW(df: DataFrame, isA: Long) = df.select(
      explode(array(
        struct(lit(3).as("lv"), col("nat"), col("ph"),
          nulS.as("f"), nulS.as("v")),
        struct(lit(4).as("lv"), nulL.as("nat"), nulL.as("ph"),
          lit("nat").as("f"), col("nat").cast("string").as("v")),
        struct(lit(4).as("lv"), nulL.as("nat"), nulL.as("ph"),
          lit("seg").as("f"), col("seg").as("v")),
        struct(lit(4).as("lv"), nulL.as("nat"), nulL.as("ph"),
          lit("band").as("f"), col("band").cast("string").as("v")),
        struct(lit(4).as("lv"), nulL.as("nat"), nulL.as("ph"),
          lit("tok").as("f"), col("tok").cast("string").as("v")),
        struct(lit(4).as("lv"), nulL.as("nat"), nulL.as("ph"),
          lit("ph").as("f"), col("ph").cast("string").as("v")))).as("m"),
      lit(isA).as("is_a"))
      .select(col("m.lv").as("lv"), col("m.nat").as("nat"),
        col("m.ph").as("ph"), col("m.f").as("f"), col("m.v").as("v"),
        col("is_a"))
    val censW = meltW(aw, 1L).unionAll(meltW(bw, 0L))
      .groupBy(col("lv"), col("nat"), col("ph"), col("f"), col("v"))
      .agg(sum(col("is_a")).as("cnt_a"),
        sum(lit(1L) - col("is_a")).as("cnt_b"))
      .localCheckpoint(false)
    val blkP = censW.filter(col("lv") === 3 &&
        col("cnt_a") > 0L && col("cnt_b") > 0L)
      .select(col("nat"), col("ph"), col("cnt_a"), col("cnt_b"))
      .withColumn("occ", greatest(col("cnt_a"), col("cnt_b")))
    val keepP = blkP.filter(col("occ") <= BlockCap)
    val phPurged = blkP.filter(col("occ") > BlockCap)
    val fa = censW.filter(col("lv") === 4 && col("cnt_a") > 0L)
      .select(col("f"), col("v"), col("cnt_a").as("c"))
    val fb = censW.filter(col("lv") === 4 && col("cnt_b") > 0L)
      .select(col("f"), col("v"), col("cnt_b").as("c"))
    // value-specific capped agreement factors (ppm-scale integers). The
    // caps do double duty: they bound the 5-factor product inside
    // DECIMAL(38,0)/HUGEINT after the stage-wise div-1e10 rescales, and
    // they FLATTEN the fine fields' value spread so the decision bands
    // stay decades apart (tok/ph factors sit far above their caps for
    // every value, so capping makes them constants; nat/seg/band stay
    // below cap and keep their frequency signal). cap_ph > cap_tok is
    // load-bearing: it ranks (tok-, ph+) above (ph-, tok+), which is
    // what lets the same threshold accept a tok-noised true pair while
    // rejecting a ph-disagreeing coincidental all-agree pair.
    def fw(f: String, cap: String) = expr(
      s"LEAST(CAST($cap AS BIGINT)," +
        s" CAST(CAST(900000 AS DECIMAL(38,0)) * nab" +
        s" div (CAST(ca_$f AS DECIMAL(38,0)) * cb_$f) AS BIGINT))")
    // ALL the u statistics + the ph purge count from ONE aggregation
    // over the fused census (round 16; guide §2.4): stRow previously
    // pulled nab/n_a/n_b/f_tok_d/f_band_d from lp.st — whose melt
    // censuses + FULL OUTER join re-ran inside stRow's materialization
    // even though grid8 computes the same subtree for the card — and
    // joined a second census slice (sNew) for the seg/ph statistics.
    // censW already carries every per-side value count over the SAME
    // registry rows (aw/bw = a/b + the derived ph column), so one pass
    // reads them all. Value identity, term by term:
    //   - s_f = Σ cnt_a·cnt_b over f's value rows ≡ the old inner-join
    //     sum (a value missing on either side contributes 0 here and was
    //     dropped by the join there);
    //   - n_a/n_b = Σ cnt over the "tok" rows (every registry row has
    //     exactly one tok) ≡ lp.st's census totals;
    //   - f_*_d / nab / thr reproduce lp.st's expressions verbatim;
    //   - n_purged_ph_blocks counts lv-3 both-side groups with
    //     occ > cap ≡ count(phPurged), fused here so q353's certificate
    //     does not need a separate aggregation job.
    val stRow = censW
      .agg(
        coalesce(sum(when(col("f") === "tok",
          col("cnt_a").cast(DecType) * col("cnt_b"))),
          lit(0L).cast(DecType)).as("s_tok"),
        coalesce(sum(when(col("f") === "band",
          col("cnt_a").cast(DecType) * col("cnt_b"))),
          lit(0L).cast(DecType)).as("s_band"),
        sum(when(col("f") === "seg",
          col("cnt_a").cast(DecType) * col("cnt_b"))).as("s_seg2"),
        sum(when(col("f") === "ph",
          col("cnt_a").cast(DecType) * col("cnt_b"))).as("s_ph"),
        sum(when(col("f") === "tok", col("cnt_a"))).as("n_a"),
        sum(when(col("f") === "tok", col("cnt_b"))).as("n_b"),
        sum(when(col("lv") === 3 && col("cnt_a") > 0L &&
          col("cnt_b") > 0L &&
          greatest(col("cnt_a"), col("cnt_b")) > BlockCap, 1L)
          .otherwise(0L)).as("n_purged_ph_blocks"))
      .withColumn("nab", (col("n_a").cast(DecType) * col("n_b")).cast(DecType))
      .withColumn("f_tok_d", expr(
        "CAST(CAST(100000 AS DECIMAL(38,0)) * nab" +
          " div (nab - s_tok) AS BIGINT)"))
      .withColumn("f_band_d", expr(
        "CAST(CAST(100000 AS DECIMAL(38,0)) * nab" +
          " div (nab - s_band) AS BIGINT)"))
      .withColumn("f_seg_d", expr(
        "CAST(CAST(100000 AS DECIMAL(38,0)) * nab" +
          " div (nab - s_seg2) AS BIGINT)"))
      .withColumn("f_ph_d", expr(
        "CAST(CAST(100000 AS DECIMAL(38,0)) * nab" +
          " div (nab - s_ph) AS BIGINT)"))
      .withColumn("thr", expr(s"CAST($WeightedMatchT AS DECIMAL(38,0))" +
        " * GREATEST(n_a, n_b)"))
      .select(col("nab"), col("f_tok_d"), col("f_band_d"),
        col("f_seg_d"), col("f_ph_d"), col("thr"),
        col("n_purged_ph_blocks"))
      .localCheckpoint(false)
    // Count-augmented registries: the five per-field counts broadcast-
    // join onto the 5-field registry rows from ONE composite-key view
    // of the melted census ("field#value" → count) — the five
    // BroadcastExchange subtrees are canonically identical, so Spark's
    // ReuseExchange builds the broadcast ONCE per side (5 builds → 1;
    // the per-field rename happens above the join, outside the reused
    // subtree). Counts narrow to INT (a per-value census count) to keep
    // the enriched registry rows compact — they ride through every
    // blocking join below.
    def counted(df: DataFrame, census: DataFrame, side: String) = {
      val fields = Seq("nat", "seg", "band", "tok", "ph")
      val fv = census.select(
        concat_ws("#", col("f"), col("v")).as("fv"),
        col("c").cast("int").as("c"))
      fields.foldLeft(df) { (d, f) =>
        d.join(broadcast(fv),
            concat(lit(s"$f#"), d(f).cast("string")) === col("fv"))
          .drop("fv").withColumnRenamed("c", s"${side}_$f")
      }
    }
    val awc = counted(aw, fa, "ca").localCheckpoint(false)
    val bwc = counted(bw, fb, "cb").localCheckpoint(false)
    // Scoring runs IN-ROW at pair-generation time (round-15 scale
    // rework): each blocking pass joins the count-augmented registries,
    // so the pair's five agreement flags and its full factor product
    // compute inside the generating join's codegen stage and the wide
    // per-pair payload NEVER shuffles — the sf1 rehearsal of the first
    // (dedup-then-reattach) form measured the re-attachment join
    // shuffling a 770k-row wide intermediate (~150 MB read+write sum at
    // sf1) once the registry side outgrew the broadcast threshold.
    def scoreFrame(pairs: DataFrame) = pairs
      .crossJoin(broadcast(stRow))
      .withColumn("g_seg",
        when(col("aseg") === col("bseg"), 1L).otherwise(0L))
      .withColumn("g_band",
        when(col("aband") === col("bband"), 1L).otherwise(0L))
      .withColumn("g_tok",
        when(col("atok") === col("btok"), 1L).otherwise(0L))
      .withColumn("g_ph",
        when(col("aph") === col("bph"), 1L).otherwise(0L))
      .withColumn("f_nat", fw("nat", "2000000000"))
      .withColumn("f_seg", fw("seg", "2000000000"))
      .withColumn("f_band", fw("band", "2000000000"))
      .withColumn("f_tok", fw("tok", "2000000000"))
      .withColumn("f_ph", fw("ph", "2000000000000"))
      .withColumn("p5", expr(
        "CAST(CAST(CAST(CAST(f_nat AS DECIMAL(38,0))" +
          " * (CASE WHEN g_seg = 1 THEN f_seg ELSE f_seg_d END)" +
          " * (CASE WHEN g_band = 1 THEN f_band ELSE f_band_d END)" +
          " div 10000000000 AS DECIMAL(38,0))" +
          " * (CASE WHEN g_tok = 1 THEN f_tok ELSE f_tok_d END)" +
          " div 10000000000 AS DECIMAL(38,0))" +
          " * (CASE WHEN g_ph = 1 THEN f_ph ELSE f_ph_d END)" +
          " AS DECIMAL(38,0))"))
      .withColumn("is_match", col("p5") >= col("thr"))
      .select(col("a_key"), col("b_key"), col("g_seg"), col("g_band"),
        col("g_tok"), col("g_ph"), col("p5"), col("is_match"))
    def pairsAt(ax: DataFrame, keys: Seq[String]) =
      ax.as("x").join(bwc.as("y"),
        keys.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _))
        .select(col("x.a_key").as("a_key"), col("y.b_key").as("b_key"),
          col("x.nat").as("anat"), col("x.seg").as("aseg"),
          col("x.band").as("aband"), col("x.tok").as("atok"),
          col("x.ph").as("aph"),
          col("y.nat").as("bnat"), col("y.seg").as("bseg"),
          col("y.band").as("bband"), col("y.tok").as("btok"),
          col("y.ph").as("bph"),
          col("x.ca_nat").as("ca_nat"), col("x.ca_seg").as("ca_seg"),
          col("x.ca_band").as("ca_band"), col("x.ca_tok").as("ca_tok"),
          col("x.ca_ph").as("ca_ph"),
          col("y.cb_nat").as("cb_nat"), col("y.cb_seg").as("cb_seg"),
          col("y.cb_band").as("cb_band"), col("y.cb_tok").as("cb_tok"),
          col("y.cb_ph").as("cb_ph"))
    val a1wc = awc.join(broadcast(db.split0), DynKeys0)
    val a2wc = a1wc.join(broadcast(db.split1), DynKeys1)
    val keep2 = db.blk2.filter(col("occ") <= BlockCap)
    // Pair dedup WITHOUT a full-candidate distinct: the three dynamic-
    // blocking passes are MUTUALLY DISJOINT by construction — a pass-0
    // pair's (nat, seg) block is in keep0, a pass-1/2 pair's is in
    // split0 (a1 ⊆ a⋈split0), and keep0 ∩ split0 = ∅; likewise keep1 vs
    // split1 separates passes 1 and 2 — and no pass repeats a pair
    // internally (one block key value per row). Only the (nat, ph)
    // enrichment pass can re-find a dynamic-pass pair, so ONE narrow
    // anti-join on the key pair replaces the distinct that previously
    // shuffled every candidate. The oracle's 4-branch UNION is the
    // cross-engine check of exactly this disjointness argument: a
    // duplicated pair would double-count n_cand_total and hash-mismatch.
    val p012 = scoreFrame(
      pairsAt(awc.join(broadcast(
        db.keep0.select(DynKeys0.map(col): _*)), DynKeys0), DynKeys0)
      .unionAll(pairsAt(a1wc.join(broadcast(
        db.keep1.select(DynKeys1.map(col): _*)), DynKeys1), DynKeys1))
      .unionAll(pairsAt(a2wc.join(broadcast(
        keep2.select(DynKeys2.map(col): _*)), DynKeys2), DynKeys2)))
      .localCheckpoint(false)
    val pP = scoreFrame(pairsAt(awc.join(broadcast(
      keepP.select(PhKeys.map(col): _*)), PhKeys), PhKeys))
    val scored = p012
      .unionAll(pP.join(p012.select(col("a_key"), col("b_key")),
        Seq("a_key", "b_key"), "left_anti"))
      .localCheckpoint(false)
    WeightedParts(lp, db, scored, phPurged, stRow)
  }

  private[queries] val DynKeys0 = Seq("nat", "seg")
  private[queries] val DynKeys1 = Seq("nat", "seg", "band")
  private[queries] val DynKeys2 = Seq("nat", "seg", "band", "tok")

  private[queries] def dynBlocks(a: DataFrame, b: DataFrame,
      cap: Long): DynBlocks = {
    // ALL-LEVEL census fusion (round 16, VERDICT r15 #2; guide §2.4
    // "remove shuffles outright"): the three per-level censuses used to
    // be three separate union+groupBy exchanges, each lazily
    // checkpointed — at sf0.1 the q353/q349 walls are AQE stage-launch
    // latency, so every removed exchange removes jobs from the critical
    // path. One melted pass computes every level at once: each registry
    // row explodes into its three (level, key-prefix) census rows and
    // ONE groupBy counts them all. Value identity per level:
    //   - level 0 groups are exactly census(a, b, (nat,seg));
    //   - a level-1 group's count over ALL of a equals its count over
    //     a1 = a ⋈ split0 whenever (nat,seg) ∈ split0, because
    //     membership in the group fixes (nat,seg) — so blk1 ≡ the
    //     level-1 slice semi-joined to split0 (and blk2 likewise via
    //     split1). Groups outside split0/split1 are filtered out by the
    //     same broadcast join that used to restrict a1/b1/a2/b2.
    // The cnt_a > 0 AND cnt_b > 0 filter reproduces the old INNER
    // census join: blocks present on only one side never appear.
    // Shuffle bytes: the single exchange carries the partially
    // aggregated (level, keys) groups — the same distinct-group mass
    // the three exchanges carried, in one stage.
    val nulL = lit(null).cast("long")
    def melt(df: DataFrame, isA: Long) = df.select(
      explode(array(
        struct(lit(0).as("lv"), col("nat"), col("seg"),
          nulL.as("band"), nulL.as("tok")),
        struct(lit(1).as("lv"), col("nat"), col("seg"),
          col("band"), nulL.as("tok")),
        struct(lit(2).as("lv"), col("nat"), col("seg"),
          col("band"), col("tok")))).as("m"),
      lit(isA).as("is_a"))
      .select(col("m.lv").as("lv"), col("m.nat").as("nat"),
        col("m.seg").as("seg"), col("m.band").as("band"),
        col("m.tok").as("tok"), col("is_a"))
    val cens = melt(a, 1L).unionAll(melt(b, 0L))
      .groupBy(col("lv"), col("nat"), col("seg"), col("band"), col("tok"))
      .agg(sum(col("is_a")).as("cnt_a"),
        sum(lit(1L) - col("is_a")).as("cnt_b"))
      .filter(col("cnt_a") > 0L && col("cnt_b") > 0L)
      .withColumn("occ", greatest(col("cnt_a"), col("cnt_b")))
      .localCheckpoint(false)
    def slice(lv: Int, keys: Seq[String]) = cens.filter(col("lv") === lv)
      .select(keys.map(col) ++ Seq(col("cnt_a"), col("cnt_b"),
        col("occ")): _*)
    val blk0 = slice(0, DynKeys0)
    val keep0 = blk0.filter(col("occ") <= cap)
    val split0 = blk0.filter(col("occ") > cap)
      .select(DynKeys0.map(col): _*).localCheckpoint(false)
    val a1 = a.join(broadcast(split0), DynKeys0)
    val b1 = b.join(broadcast(split0), DynKeys0)
    val blk1 = slice(1, DynKeys1).join(broadcast(split0), DynKeys0)
    val keep1 = blk1.filter(col("occ") <= cap)
    val split1 = blk1.filter(col("occ") > cap)
      .select(DynKeys1.map(col): _*).localCheckpoint(false)
    val a2 = a1.join(broadcast(split1), DynKeys1)
    val b2 = b1.join(broadcast(split1), DynKeys1)
    val blk2 = slice(2, DynKeys2).join(broadcast(split1), DynKeys1)
    DynBlocks(blk0, keep0, split0, a1, b1, blk1, keep1, split1, a2, b2, blk2)
  }

  /** Shared output of the q302/q325 Fellegi–Sunter linkage builder:
    * the two noisy registries, the blocked candidate pairs (agreement
    * flags + pattern id), and the 8-row scored pattern grid with
    * decisions — one construction, two gates, so the capstone cannot
    * drift from the pairwise gate's registries or scoring. */
  private[queries] final case class LinkageParts(a: DataFrame, b: DataFrame,
      cand: DataFrame, grid: DataFrame, st: DataFrame)

  /** q302/q325's shared linkage front: md5-coin field noise over
    * `customer`, two-pass blocking, frequency-based u statistics, and
    * the integer-ppm FS factor products (see q302's docstring for the
    * full derivation). */
  private[queries] def linkageParts(spark: org.apache.spark.sql.SparkSession,
      dir: String): LinkageParts = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    def coin(salt: String) =
      conv(substring(md5(concat(lit(salt),
        col("k").cast("string"))), 1, 12), 16, 10)
        .cast("long") % 1000000L
    val base = Tables.customer(spark, dir).select(
      col("c_custkey").as("k"),
      col("c_nationkey").cast("long").as("nat"),
      expr("(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000)" +
        " div 50000").as("band"),
      col("c_mktsegment").as("seg"),
      (col("c_custkey") % 1000L).as("tok"))
    // Spread policy (round 14, VERDICT r13 #1): size the registry spread
    // to ~2k rows/partition instead of blindly using the session
    // parallelism. The ER composition runs ~30 tiny stages over these
    // frames; at sf0.1 (13.5k rows) a 32-way spread means every stage
    // launches 32 near-empty tasks and task-launch latency dominates
    // (measured: 9.6 s → 6.6 s at sf0.1 from this change alone). At
    // production row counts rows/2000 exceeds the parallelism and the
    // clamp restores the full session width, so the scale posture is
    // unchanged — the spread still exists for exactly the reason the
    // q325 probe found (candidate generation must not stream through
    // one task).
    val spread = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      Tables.customer(spark, dir).count() / 2000L)).toInt
    // Both registries are MATERIALIZED (lazy local checkpoint) before
    // any blocking join: the md5-coin noise expressions are
    // deterministic, so without the cut Catalyst collapses them past
    // the join and re-evaluates them once per CANDIDATE row (~1.7M ×
    // several md5s at sf0.1 — measured 3.2-3.9 s in the q325 phase
    // probe) instead of once per registry row (~13.5k). A production
    // linkage pipeline stages its cleaned registries for exactly this
    // reason; every downstream consumer (blocking joins, u-statistics,
    // true-pair count) reads the staged rows.
    // The registries are also SPREAD across the session's parallelism
    // before staging: at this SF `customer` is a single parquet split,
    // so without the spread the broadcast blocking joins stream ~1.8M
    // candidate rows through ONE task (measured: the candidate distinct
    // alone at 2.4-3.5 s). At production scale the probe side arrives
    // in many splits and this is a no-op by construction.
    val a = base.filter(coin("q302A#") < 900000L)
      .select(col("k").as("a_key"), col("nat"), col("band"),
        col("seg"), col("tok"))
      .repartition(spread)
      .localCheckpoint(false)
    val nextSeg = when(col("seg") === "AUTOMOBILE", "BUILDING")
      .when(col("seg") === "BUILDING", "FURNITURE")
      .when(col("seg") === "FURNITURE", "HOUSEHOLD")
      .when(col("seg") === "HOUSEHOLD", "MACHINERY")
      .otherwise("AUTOMOBILE")
    val b = base.filter(coin("q302B#") < 900000L).select(
      col("k").as("b_key"),
      when(coin("q302N#") < 50000L, (col("nat") + 1) % 25)
        .otherwise(col("nat")).as("nat"),
      when(coin("q302D#") < 100000L, col("band") + 1)
        .otherwise(col("band")).as("band"),
      when(coin("q302S#") < 150000L, nextSeg)
        .otherwise(col("seg")).as("seg"),
      when(coin("q302T#") < 100000L, (col("tok") + 1) % 1000)
        .otherwise(col("tok")).as("tok"))
      .repartition(spread)
      .localCheckpoint(false)
    def proj(df: DataFrame) = df.select(
      col("x.a_key").as("a_key"), col("y.b_key").as("b_key"),
      when(col("x.tok") === col("y.tok"), 1L).otherwise(0L)
        .as("g_tok"),
      when(col("x.seg") === col("y.seg"), 1L).otherwise(0L)
        .as("g_seg"),
      when(col("x.band") === col("y.band"), 1L).otherwise(0L)
        .as("g_band"))
    val r1 = a.as("x").join(b.as("y"),
      col("x.nat") === col("y.nat") && col("x.band") === col("y.band"))
    val r2 = a.as("x").join(b.as("y"),
      col("x.nat") === col("y.nat") && col("x.seg") === col("y.seg"))
    val cand = proj(r1).union(proj(r2)).distinct()
      .withColumn("pid",
        col("g_tok") * 4 + col("g_seg") * 2 + col("g_band"))
    // u-statistic fusion (round 14, VERDICT r13 #1): the three per-field
    // frequency passes (each 2 groupBys + join + agg + crossJoin) melt
    // into ONE census — explode each registry row into (field, value)
    // pairs, count per side, FULL OUTER join the sides, and read every
    // scalar from a single aggregate. Values are identical: s_field sums
    // ca*cb over values present on BOTH sides (null products drop out of
    // SUM, reproducing the inner join), and n_a/n_b are the per-side
    // census totals of any one field (every row carries one tok).
    def melt(df: DataFrame) = df.select(
      explode(map(
        lit("tok"), col("tok").cast("string"),
        lit("seg"), col("seg"),
        lit("band"), col("band").cast("string"))).as(Seq("f", "v")))
    val fa = melt(a).groupBy(col("f"), col("v"))
      .agg(count(lit(1)).as("ca"))
    val fb = melt(b).groupBy(col("f"), col("v"))
      .agg(count(lit(1)).as("cb"))
    def sOf(field: String) =
      coalesce(sum(when(col("f") === field,
        col("ca").cast(dec) * col("cb"))), lit(0L).cast(dec))
    val freqs = fa.join(fb, Seq("f", "v"), "full_outer")
      .agg(sOf("tok").as("s_tok"), sOf("seg").as("s_seg"),
        sOf("band").as("s_band"),
        sum(when(col("f") === "tok", col("ca"))).as("n_a"),
        sum(when(col("f") === "tok", col("cb"))).as("n_b"))
    val st = freqs
      .crossJoin(broadcast(a.join(b, col("a_key") === col("b_key"))
        .agg(count(lit(1)).as("n_true_total"))))
      .withColumn("nab", (col("n_a").cast(dec) * col("n_b")).cast(dec))
      .withColumn("f_tok_a", expr(
        "CAST(CAST(900000 AS DECIMAL(38,0)) * nab div s_tok AS BIGINT)"))
      .withColumn("f_tok_d", expr(
        "CAST(CAST(100000 AS DECIMAL(38,0)) * nab" +
          " div (nab - s_tok) AS BIGINT)"))
      .withColumn("f_seg_a", expr(
        "CAST(CAST(900000 AS DECIMAL(38,0)) * nab div s_seg AS BIGINT)"))
      .withColumn("f_seg_d", expr(
        "CAST(CAST(100000 AS DECIMAL(38,0)) * nab" +
          " div (nab - s_seg) AS BIGINT)"))
      .withColumn("f_band_a", expr(
        "CAST(CAST(900000 AS DECIMAL(38,0)) * nab div s_band AS BIGINT)"))
      .withColumn("f_band_d", expr(
        "CAST(CAST(100000 AS DECIMAL(38,0)) * nab" +
          " div (nab - s_band) AS BIGINT)"))
    val gridBase = spark.range(8).select(col("id").as("pid"),
      expr("id div 4 % 2").as("g_tok"),
      expr("id div 2 % 2").as("g_seg"),
      expr("id % 2").as("g_band"))
    val grid = gridBase.crossJoin(broadcast(st))
      .withColumn("f1", when(col("g_tok") === 1L, col("f_tok_a"))
        .otherwise(col("f_tok_d")))
      .withColumn("f2", when(col("g_seg") === 1L, col("f_seg_a"))
        .otherwise(col("f_seg_d")))
      .withColumn("f3", when(col("g_band") === 1L, col("f_band_a"))
        .otherwise(col("f_band_d")))
      .withColumn("score_ppm12", expr(
        "CAST(CAST(f1 AS DECIMAL(38,0)) * f2 * f3" +
          " div 1000000 AS BIGINT)"))
      .withColumn("decision",
        when(col("score_ppm12") >= 64000000000000L, "match")
          .when(col("score_ppm12") >= 1000000000000L, "possible")
          .otherwise("non_match"))
    LinkageParts(a, b, cand, grid, st)
  }

  /** q320's chrF² scorer over (ptype, doc_id, ref, hyp) pairs: clipped
    * character 2/3-gram multiset precision/recall, averaged over n,
    * combined by the β=2 harmonic F = 5PR/(4P+R), exact in ppm
    * floor-div. Factored so Round11PropertySpec can pin the scorer
    * against an independent Scala multiset implementation on hand
    * pairs (the q289 lesson). */
  private[queries] def chrfScores(pairs: DataFrame): DataFrame = {
    // The inner filter is a no-op for length($side) >= n, but when the
    // string is SHORTER than n Spark's sequence(1, length-n+1) yields a
    // DESCENDING [1, 0] (DuckDB's generate_series is empty there) and
    // would emit bogus grams including an invalid substring start 0 —
    // the filter drops exactly that engine-divergent case (round-11
    // ADVICE; unreachable in q320 only thanks to its >=12-token filter,
    // guarded here so the helper is safe for any caller).
    def grams(side: String) = pairs.select(col("ptype"), col("doc_id"),
        explode(expr(s"flatten(transform(array(2, 3), n ->" +
          s" transform(filter(sequence(1, length($side) - n + 1)," +
          s" i -> i >= 1 AND i <= length($side) - n + 1)," +
          s" i -> struct(n AS n, substring($side, i, n) AS g))))"))
          .as("x"))
      .select(col("ptype"), col("doc_id"), col("x.n").as("n"),
        col("x.g").as("g"))
      .groupBy(col("ptype"), col("doc_id"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
    val ov = grams("ref").withColumnRenamed("c", "cr")
      .join(grams("hyp").withColumnRenamed("c", "ch"),
        Seq("ptype", "doc_id", "n", "g"))
      .groupBy(col("ptype"), col("doc_id"), col("n"))
      .agg(sum(least(col("cr"), col("ch"))).as("ov"))
    val sizes = pairs.select(col("ptype"), col("doc_id"),
      expr("length(ref)").cast("long").as("lr"),
      expr("length(hyp)").cast("long").as("lh"))
    ov.join(sizes, Seq("ptype", "doc_id"))
      .select(col("ptype"), col("doc_id"),
        expr("ov * 1000000 div (lh - n + 1)").as("p"),
        expr("ov * 1000000 div (lr - n + 1)").as("r"))
      .groupBy(col("ptype"), col("doc_id"))
      .agg(expr("sum(p) div 2").as("pa"),
        expr("sum(r) div 2").as("ra"))
      .select(col("ptype"), col("doc_id"),
        expr("5 * pa * ra div GREATEST(4 * pa + ra, 1)")
          .as("chrf_ppm"))
  }

  /** Capped dynamic-blocking CTE chain (cap = [[BlockCap]]) over the
    * linkage registries — shared verbatim by the q338 and q349 oracles
    * so the certificate card and the scale-safe capstone replay the
    * SAME splitting. Appends to [[linkageCtes]]' `a`/`b`. */
  /** The q202/q354 winnowing replay as a CTE chain ending in
    * `runs(doc_a, doc_b, diag, isl, p0, p1)` — the maximal aligned
    * shared fingerprint runs, re-derived from raw `documents` entirely
    * in SQL (k = 3 grams, window w = 4, stop-fp cap 50, island gap 4).
    * Shared verbatim by the q354 run-census and q358 dedup-rewrite
    * oracles so both replay the SAME runs (and the most expensive part
    * of the chain is written once — VERDICT r14 #8's dedup direction). */
  private def winnowRunCtes: String = """t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i - 1 AS gpos,
                     array_to_string(toks[i:i+2], ' ') AS gram,
                     len(toks) - 2 AS gcount
              FROM t, LATERAL (SELECT unnest(generate_series(1,
                     len(toks) - 2)) AS i) u
              WHERE len(toks) >= 3),
        v AS (SELECT doc_id, gpos, gcount,
                     ('0x' || substr(md5(gram), 1, 10))::BIGINT * 1048576
                       + gpos AS v
              FROM g),
        s AS (SELECT doc_id, gcount, gpos,
                     MIN(v) OVER (PARTITION BY doc_id ORDER BY gpos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS selv
              FROM v),
        f AS (SELECT DISTINCT doc_id, selv // 1048576 AS fp,
                     selv % 1048576 AS pos
              FROM s WHERE gpos <= gcount - 4),
        allowed AS (SELECT fp FROM (
                      SELECT fp, COUNT(DISTINCT doc_id) AS nd
                      FROM f GROUP BY 1) WHERE nd <= 50),
        kept AS (SELECT f.* FROM f JOIN allowed USING (fp)),
        m AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     b.pos - a.pos AS diag, a.pos AS pos_a
              FROM kept a JOIN kept b
                ON a.fp = b.fp AND a.doc_id < b.doc_id),
        i0 AS (SELECT *, CASE WHEN pos_a - LAG(pos_a) OVER (
                   PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) > 4
                 THEN 1 ELSE 0 END AS brk FROM m),
        i1 AS (SELECT *, SUM(brk) OVER (
                   PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
                   ROWS UNBOUNDED PRECEDING) AS isl FROM i0),
        runs AS (SELECT doc_a, doc_b, diag, isl,
                        MIN(pos_a) AS p0, MAX(pos_a) AS p1
                 FROM i1 GROUP BY 1, 2, 3, 4)"""

  private def dynBlockCtes: String = s"""ca0 AS (SELECT nat, seg, COUNT(*) AS cnt_a FROM a GROUP BY 1, 2),
        cb0 AS (SELECT nat, seg, COUNT(*) AS cnt_b FROM b GROUP BY 1, 2),
        blk0 AS (SELECT nat, seg, cnt_a, cnt_b,
                        GREATEST(cnt_a, cnt_b) AS occ
                 FROM ca0 JOIN cb0 USING (nat, seg)),
        keep0 AS (SELECT * FROM blk0 WHERE occ <= $BlockCap),
        split0 AS (SELECT nat, seg FROM blk0 WHERE occ > $BlockCap),
        a1 AS (SELECT x.* FROM a x JOIN split0 USING (nat, seg)),
        b1 AS (SELECT y.* FROM b y JOIN split0 USING (nat, seg)),
        ca1 AS (SELECT nat, seg, band, COUNT(*) AS cnt_a FROM a1
                GROUP BY 1, 2, 3),
        cb1 AS (SELECT nat, seg, band, COUNT(*) AS cnt_b FROM b1
                GROUP BY 1, 2, 3),
        blk1 AS (SELECT nat, seg, band, cnt_a, cnt_b,
                        GREATEST(cnt_a, cnt_b) AS occ
                 FROM ca1 JOIN cb1 USING (nat, seg, band)),
        keep1 AS (SELECT * FROM blk1 WHERE occ <= $BlockCap),
        split1 AS (SELECT nat, seg, band FROM blk1 WHERE occ > $BlockCap),
        a2 AS (SELECT x.* FROM a1 x JOIN split1 USING (nat, seg, band)),
        b2 AS (SELECT y.* FROM b1 y JOIN split1 USING (nat, seg, band)),
        ca2 AS (SELECT nat, seg, band, tok, COUNT(*) AS cnt_a FROM a2
                GROUP BY 1, 2, 3, 4),
        cb2 AS (SELECT nat, seg, band, tok, COUNT(*) AS cnt_b FROM b2
                GROUP BY 1, 2, 3, 4),
        blk2 AS (SELECT nat, seg, band, tok, cnt_a, cnt_b,
                        GREATEST(cnt_a, cnt_b) AS occ
                 FROM ca2 JOIN cb2 USING (nat, seg, band, tok)),
        keep2 AS (SELECT * FROM blk2 WHERE occ <= $BlockCap)"""

  /** The ER capstone's clustering-tail CTE chain (expects `edges(x, y)`
    * — the match graph — and `np(n_match_pairs)` already defined by the
    * caller: q325 derives both from its pair set `mp`; q349 passes the
    * supernode-reduced star graph with the exact clique pair count) —
    * shared verbatim by both oracles, mirroring
    * [[erCapstoneCardFromEdges]]. */
  private def erTailCtes: String = {
    val rounds = (1 to 6).map { k =>
      s"""l$k AS (SELECT l.node, l.truth,
                LEAST(l.lbl, COALESCE(m.mn, l.lbl)) AS lbl
         FROM l${k - 1} l LEFT JOIN (
           SELECT s.y AS node, MIN(l2.lbl) AS mn
           FROM sym s JOIN l${k - 1} l2 ON l2.node = s.x
           GROUP BY 1) m ON m.node = l.node)"""
    }.mkString(",\n        ")
    s"""nodes AS MATERIALIZED (
          SELECT a_key * 2 AS node, a_key AS truth FROM a
          UNION ALL
          SELECT b_key * 2 + 1, b_key FROM b),
        sym AS (SELECT x, y FROM edges UNION ALL SELECT y, x FROM edges),
        l0 AS (SELECT node, truth, node AS lbl FROM nodes),
        $rounds,
        ct AS MATERIALIZED (
          SELECT lbl, truth, CAST(COUNT(*) AS BIGINT) AS n_ct
          FROM l6 GROUP BY 1, 2),
        nc AS (SELECT lbl, CAST(SUM(n_ct) AS BIGINT) AS n_c
               FROM ct GROUP BY 1),
        nt AS (SELECT truth, CAST(SUM(n_ct) AS BIGINT) AS n_t
               FROM ct GROUP BY 1),
        card AS (SELECT CAST(SUM(n_ct) AS BIGINT) AS n_records,
                        SUM(CAST(n_ct AS HUGEINT) * n_ct
                          * 1000000000000 // n_c) AS p12,
                        SUM(CAST(n_ct AS HUGEINT) * n_ct
                          * 1000000000000 // n_t) AS r12
                 FROM ct JOIN nc USING (lbl) JOIN nt USING (truth)),
        pr AS (SELECT n_records,
                      CAST(p12 // (CAST(n_records AS HUGEINT) * 1000000)
                        AS BIGINT) AS b3_precision_ppm,
                      CAST(r12 // (CAST(n_records AS HUGEINT) * 1000000)
                        AS BIGINT) AS b3_recall_ppm
               FROM card),
        mg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
                      CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_merged_clusters
               FROM (SELECT lbl, COUNT(DISTINCT truth) AS k
                     FROM ct GROUP BY 1)),
        sp AS (SELECT CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_split_truths
               FROM (SELECT truth, COUNT(DISTINCT lbl) AS k
                     FROM ct GROUP BY 1)),
        tp AS (SELECT CAST(MAX(n_true_total) AS BIGINT) AS n_true_pairs
               FROM dec),
        chg AS (SELECT CAST(SUM(CASE WHEN a6.lbl <> a5.lbl
                          THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_changed_last_round
                FROM l6 a6 JOIN l5 a5 USING (node))"""
  }

  /** The ER capstone oracles' shared output columns (q349 appends its
    * blocking certificates after these). */
  private def erTailSelect: String =
    """pr.n_records, tp.n_true_pairs, np.n_match_pairs,
               mg.n_clusters, mg.n_merged_clusters, sp.n_split_truths,
               chg.n_changed_last_round,
               pr.b3_precision_ppm, pr.b3_recall_ppm,
               CAST(2 * pr.b3_precision_ppm * pr.b3_recall_ppm
                 // GREATEST(pr.b3_precision_ppm + pr.b3_recall_ppm, 1)
                 AS BIGINT) AS b3_f1_ppm"""

  /** The shared WITH-chain of the linkage replay (registries → blocked
    * candidates → pattern census → u statistics → scored/decided
    * pattern grid `dec`) — q302's summary tail and q325's clustering
    * tail both append to it, so neither oracle can drift from the
    * other's registries or scoring. */
  private def linkageCtes: String = """base AS (
          SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS nat,
                 (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000)
                   // 50000 AS band,
                 c_mktsegment AS seg, c_custkey % 1000 AS tok
          FROM customer),
        a AS (SELECT k AS a_key, nat, band, seg, tok FROM base
              WHERE ('0x' || substr(md5('q302A#' || CAST(k AS VARCHAR)),
                1, 12))::BIGINT % 1000000 < 900000),
        b AS (SELECT k AS b_key,
                CASE WHEN ('0x' || substr(md5('q302N#' ||
                    CAST(k AS VARCHAR)), 1, 12))::BIGINT % 1000000 < 50000
                  THEN (nat + 1) % 25 ELSE nat END AS nat,
                CASE WHEN ('0x' || substr(md5('q302D#' ||
                    CAST(k AS VARCHAR)), 1, 12))::BIGINT % 1000000 < 100000
                  THEN band + 1 ELSE band END AS band,
                CASE WHEN ('0x' || substr(md5('q302S#' ||
                    CAST(k AS VARCHAR)), 1, 12))::BIGINT % 1000000 < 150000
                  THEN CASE seg WHEN 'AUTOMOBILE' THEN 'BUILDING'
                    WHEN 'BUILDING' THEN 'FURNITURE'
                    WHEN 'FURNITURE' THEN 'HOUSEHOLD'
                    WHEN 'HOUSEHOLD' THEN 'MACHINERY'
                    ELSE 'AUTOMOBILE' END
                  ELSE seg END AS seg,
                CASE WHEN ('0x' || substr(md5('q302T#' ||
                    CAST(k AS VARCHAR)), 1, 12))::BIGINT % 1000000 < 100000
                  THEN (tok + 1) % 1000 ELSE tok END AS tok
              FROM base
              WHERE ('0x' || substr(md5('q302B#' || CAST(k AS VARCHAR)),
                1, 12))::BIGINT % 1000000 < 900000),
        cand AS (
          SELECT x.a_key, y.b_key,
                 CASE WHEN x.tok = y.tok THEN 1 ELSE 0 END AS g_tok,
                 CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END AS g_seg,
                 CASE WHEN x.band = y.band THEN 1 ELSE 0 END AS g_band
          FROM a x JOIN b y ON x.nat = y.nat AND x.band = y.band
          UNION
          SELECT x.a_key, y.b_key,
                 CASE WHEN x.tok = y.tok THEN 1 ELSE 0 END,
                 CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END,
                 CASE WHEN x.band = y.band THEN 1 ELSE 0 END
          FROM a x JOIN b y ON x.nat = y.nat AND x.seg = y.seg),
        pat AS (
          SELECT g_tok * 4 + g_seg * 2 + g_band AS pid,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(CASE WHEN a_key = b_key THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_true
          FROM cand GROUP BY 1),
        st AS (
          SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
                 (SELECT CAST(SUM(CAST(fa.ca AS HUGEINT) * fb.cb)
                    AS HUGEINT)
                  FROM (SELECT tok AS v, COUNT(*) AS ca FROM a GROUP BY 1)
                    fa JOIN (SELECT tok AS v, COUNT(*) AS cb FROM b
                    GROUP BY 1) fb USING (v)) AS s_tok,
                 (SELECT CAST(SUM(CAST(fa.ca AS HUGEINT) * fb.cb)
                    AS HUGEINT)
                  FROM (SELECT seg AS v, COUNT(*) AS ca FROM a GROUP BY 1)
                    fa JOIN (SELECT seg AS v, COUNT(*) AS cb FROM b
                    GROUP BY 1) fb USING (v)) AS s_seg,
                 (SELECT CAST(SUM(CAST(fa.ca AS HUGEINT) * fb.cb)
                    AS HUGEINT)
                  FROM (SELECT band AS v, COUNT(*) AS ca FROM a GROUP BY 1)
                    fa JOIN (SELECT band AS v, COUNT(*) AS cb FROM b
                    GROUP BY 1) fb USING (v)) AS s_band,
                 (SELECT CAST(COUNT(*) AS BIGINT)
                  FROM a JOIN b ON a_key = b_key) AS n_true_total),
        stf AS (
          SELECT *, CAST(n_a AS HUGEINT) * n_b AS nab,
                 CAST(900000 * (CAST(n_a AS HUGEINT) * n_b) // s_tok
                   AS BIGINT) AS f_tok_a,
                 CAST(100000 * (CAST(n_a AS HUGEINT) * n_b)
                   // (CAST(n_a AS HUGEINT) * n_b - s_tok) AS BIGINT)
                   AS f_tok_d,
                 CAST(900000 * (CAST(n_a AS HUGEINT) * n_b) // s_seg
                   AS BIGINT) AS f_seg_a,
                 CAST(100000 * (CAST(n_a AS HUGEINT) * n_b)
                   // (CAST(n_a AS HUGEINT) * n_b - s_seg) AS BIGINT)
                   AS f_seg_d,
                 CAST(900000 * (CAST(n_a AS HUGEINT) * n_b) // s_band
                   AS BIGINT) AS f_band_a,
                 CAST(100000 * (CAST(n_a AS HUGEINT) * n_b)
                   // (CAST(n_a AS HUGEINT) * n_b - s_band) AS BIGINT)
                   AS f_band_d
          FROM st),
        grid AS (
          SELECT CAST(range AS BIGINT) AS pid,
                 CAST(range // 4 % 2 AS BIGINT) AS g_tok,
                 CAST(range // 2 % 2 AS BIGINT) AS g_seg,
                 CAST(range % 2 AS BIGINT) AS g_band
          FROM range(0, 8)),
        scored AS (
          SELECT g.pid, g.g_tok, g.g_seg, g.g_band,
                 COALESCE(p.n_pairs, 0) AS n_pairs,
                 COALESCE(p.n_true, 0) AS n_true,
                 CAST(CAST(CASE WHEN g.g_tok = 1 THEN s.f_tok_a
                     ELSE s.f_tok_d END AS HUGEINT)
                   * CASE WHEN g.g_seg = 1 THEN s.f_seg_a
                     ELSE s.f_seg_d END
                   * CASE WHEN g.g_band = 1 THEN s.f_band_a
                     ELSE s.f_band_d END // 1000000 AS BIGINT)
                   AS score_ppm12,
                 s.n_a, s.n_b, s.n_true_total
          FROM grid g CROSS JOIN stf s
          LEFT JOIN pat p ON p.pid = g.pid),
        dec AS (
          SELECT *, CASE WHEN score_ppm12 >= 64000000000000 THEN 'match'
                 WHEN score_ppm12 >= 1000000000000 THEN 'possible'
                 ELSE 'non_match' END AS decision
          FROM scored)"""

  /** Shared output of the q265/q278 component builder: round-6 labels,
    * round-5 labels (the convergence certificate's other half), and the
    * undirected edge list. */
  private final case class ComponentParts(lbl: DataFrame, prev: DataFrame,
      e: DataFrame)

  /** q265/q278's shared near-dup component builder: chunk-sharing edges
    * (full 10-token chunks, df ≤ 20 stop-chunk cap) and 6 unrolled
    * min-label-propagation rounds, each ONE doc-keyed equijoin +
    * partial/final min behind a localCheckpoint cut. */
  private def componentParts(spark: org.apache.spark.sql.SparkSession,
      dir: String): ComponentParts = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
    val ch = t.filter(size(col("toks")) >= 10)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) div 10 - 1), " +
          "i -> md5(array_join(slice(toks, i * 10 + 1, 10), ' ')))"))
        .as("c"))
      .distinct()
    val fr = ch.groupBy(col("c")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20).select(col("c"))
    val cd = ch.join(fr, Seq("c"))
    val e = cd.as("x").join(cd.as("y"),
        col("x.c") === col("y.c") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct().localCheckpoint(false)
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    var lbl = t.select(col("doc_id"), col("doc_id").as("lbl"))
      .localCheckpoint(false)
    var prev = lbl
    for (_ <- 1 to 6) {
      prev = lbl
      val nbr = sym
        .join(lbl.withColumnRenamed("doc_id", "a")
          .withColumnRenamed("lbl", "albl"), Seq("a"))
        .groupBy(col("b")).agg(min(col("albl")).as("nlbl"))
        .withColumnRenamed("b", "doc_id")
      lbl = lbl.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(false)
    }
    ComponentParts(lbl, prev, e)
  }

  /** The shared WITH-chain of the component replay (through l6) — the
    * q265 census tail and the q278 retention tail both append to it,
    * so neither oracle can drift from the other's propagation. */
  private def componentCtes: String = {
    val rounds = (1 to 6).map { k =>
      s"""l$k AS MATERIALIZED (SELECT l.doc_id, LEAST(l.lbl, COALESCE(m.mn, l.lbl)) AS lbl
             FROM l${k - 1} l LEFT JOIN (
               SELECT s.b AS doc_id, MIN(l2.lbl) AS mn
               FROM sym s JOIN l${k - 1} l2 ON l2.doc_id = s.a
               GROUP BY 1) m ON m.doc_id = l.doc_id)"""
    }.mkString(",\n        ")
    s"""t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                   FROM documents),
        ch AS (SELECT DISTINCT doc_id,
                      md5(array_to_string(toks[(i*10+1):(i*10+10)], ' '))
                        AS c
               FROM (SELECT doc_id, toks,
                            unnest(range(0, len(toks) // 10)) AS i
                     FROM t WHERE len(toks) >= 10)),
        fr AS (SELECT c FROM ch GROUP BY c HAVING COUNT(*) <= 20),
        cd AS (SELECT ch.doc_id, ch.c FROM ch JOIN fr USING (c)),
        e AS MATERIALIZED (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM cd x JOIN cd y ON y.c = x.c AND x.doc_id < y.doc_id),
        sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        l0 AS (SELECT doc_id, doc_id AS lbl FROM t),
        $rounds"""
  }

  /** DuckDB replay of q265: the same 6 unrolled min-label-propagation
    * rounds (LEFT JOIN + MIN per round) over the chunk-sharing edges. */
  private def componentsOracle: String = {
    s"""
        WITH $componentCtes,
        cl AS (SELECT lbl AS cluster_rep,
                      CAST(COUNT(*) AS BIGINT) AS cluster_size
               FROM l6 GROUP BY 1),
        su AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
                      CAST(SUM(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_multi_clusters
               FROM cl),
        ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
        chg AS (SELECT CAST(SUM(CASE WHEN a6.lbl <> a5.lbl
                          THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_changed_last_round
                FROM l6 a6 JOIN l5 a5 USING (doc_id))
        SELECT top.cluster_rep, top.cluster_size, su.n_clusters,
               su.n_multi_clusters, ne.n_edges, chg.n_changed_last_round
        FROM (SELECT * FROM cl
              ORDER BY cluster_size DESC, cluster_rep LIMIT 30) top
        CROSS JOIN su CROSS JOIN ne CROSS JOIN chg
        ORDER BY top.cluster_size DESC, top.cluster_rep"""
  }

  /** q252's audit corpus: the doc_id % 17 = 0 sample plus token-prefix
    * variants (3/4, 1/2, 1/4 of the tokens; id = doc_id·4 + v). Prefix
    * shingle sets nest inside the original's, so each (original,
    * variant) pair plants a known true-Jaccard ≈ kept fraction. */
  def minhashAuditDocs(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .filter(col("doc_id") % 17 === 0)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
    Seq((0, 4), (1, 3), (2, 2), (3, 1)).map { case (v, num) =>
      base.select((col("doc_id") * 4 + v).as("doc_id"),
        concat_ws(" ", slice(col("t"), lit(1),
          greatest(expr(s"(size(t) * $num) div 4"), lit(1)))).as("text"))
    }.reduce(_ unionAll _)
  }

  /** q252's audit-corpus signatures — shared by the gate and
    * [[VerifyInputs]] so the materialized rows always match the gate's
    * sample and hash count. */
  def minhashAuditSig(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    MinHashLSH.shingled(minhashAuditDocs(spark, dir), "doc_id", "text", 3)
      .select(col("doc_id"),
        graft.functions.TextFunctions.minhashSignature(col("sh"), 64)
          .as("sig"),
        size(col("sh")).cast("long").as("n_sh"))
}
