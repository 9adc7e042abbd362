package graft.queries

import graft.SparkSpec

/** Round-9 tail of the physical-plan regression guards (q247–q255) —
  * split from [[PlanGuardSpec]] to keep suite compile units bounded.
  * Same contract: the scale-critical plan property each query's 100 TB
  * posture depends on must break the build if a refactor regresses it.
  */
class PlanGuardSpec2 extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q247: PQ encoding is in-row (collected codebook literal) — corpus never joins") {
    val p = plan("q247_product_quantization")
    assert(!p.contains("CartesianProduct"),
      "PQ encode/ADC planned a shuffled cross product")
    // the ADC/recall pairing joins only on the vec/query key
    assert(p.contains("hashpartitioning(") || p.contains("BroadcastHashJoin"),
      "ADC recall pairing not a keyed join")
  }

  test("q248: VAD kernel is partition-local; accounting joins on the asset key") {
    val p = plan("q248_audio_vad")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      "decode/VAD kernel not partition-local")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "VAD accounting planned an all-pairs join")
  }

  test("q249: shot detection is one partition-local decode pass — run state stays in-row") {
    val p = plan("q249_shot_boundaries")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      "decode/shot kernel not partition-local")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "shot accounting planned an all-pairs join")
  }

  test("q251: both fold scorings are doc-keyed aggs over the cached feature table") {
    val p = plan("q251_cross_validation")
    assert(!p.contains("CartesianProduct"),
      "cross-validation scoring planned a cross product")
    assert(p.contains("InMemoryTableScan") ||
      p.contains("hashpartitioning(doc_id"),
      "fold scoring not over the cached feature table / doc-keyed")
  }

  test("q252: accuracy audit pairs only the bounded sample — corpus never self-joins") {
    val p = plan("q252_minhash_accuracy")
    assert(!p.contains("CartesianProduct"),
      "estimator audit planned an unbounded cross product")
  }

  test("q253: silhouette is broadcast-centroid passes — no vector-vector join") {
    val p = plan("q253_silhouette")
    // the only nested-loop is the k-row centroid broadcast (by design);
    // vectors must never shuffle against each other
    assert(!p.contains("CartesianProduct"),
      "silhouette planned a shuffled vector cross product")
    assert(p.contains("hashpartitioning(vec_id") ||
      p.contains("BroadcastHashJoin"),
      "own/other distance pairing not keyed by vec_id")
  }

  test("q254: all grid temperatures score in one broadcast-weight pass per branch") {
    val p = plan("q254_temperature_scaling")
    assert(!p.contains("CartesianProduct"),
      "temperature grid planned a cross product over docs")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "Brier reduction not split partial/final")
  }

  test("q255: all 16 AMS replicate sums ride ONE agg pass over the bigram table") {
    val p = plan("q255_ams_f2_audit")
    assert(!p.contains("CartesianProduct"),
      "AMS replicates planned a cross product")
    // one keyed bigram count, then replicate sums over the checkpointed
    // table — 16 sums must not mean 16 scans of the raw corpus
    assert("Scan parquet".r.findAllIn(p).size <= 1,
      "replicate sums re-scan the raw corpus instead of the counted table")
    assert(p.contains("partial_sum"), "replicate agg not split partial/final")
  }

  test("q257: decile table is a checkpointed bounded RDD; probe pass prunes to one column") {
    // the TakeOrdered sketch + GlobalRank exact side run eagerly behind
    // the localCheckpoint — the returned plan must show only the cut
    // (9-row ExistingRDD) and the single-column rank-certificate probe
    val p = plan("q257_quantile_sketch_audit")
    assert(p.contains("Scan ExistingRDD"),
      "decile table lost its checkpoint cut — population lineage re-runs")
    assert(p.contains("ReadSchema: struct<l_extendedprice:double>"),
      "rank-certificate probe scan not pruned to the price column")
    assert(!p.contains("CartesianProduct"),
      "quantile audit planned a shuffled cross product")
  }

  test("q258: bloom probe joins are keyed/broadcast — never all-pairs") {
    val p = plan("q258_bloom_fpr_certificate")
    assert(!p.contains("CartesianProduct"),
      "bloom FPR audit planned a shuffled cross product")
    assert(p.contains("BroadcastHashJoin") || p.contains("hashpartitioning(pos"),
      "probe-vs-bitset membership not a keyed/broadcast join")
  }

  test("q260: the returned PCA report is model-sized (driver matvec by design)") {
    val p = plan("q260_power_iteration_pca")
    // corpus work (outer-product explode + partial agg) runs during
    // build; the d-row report itself must be a local table, proving no
    // population-scale lineage hangs off the output
    assert(p.contains("LocalTableScan"),
      "PCA report not a bounded local table — population lineage leaked into the result")
  }

  test("q261: CUSUM windows partition by series — nothing crosses event types") {
    val p = plan("q261_cusum_changepoint")
    assert(p.contains("hashpartitioning(event_type"),
      "per-series windows not hash-partitioned by event_type")
    assert(!p.contains("CartesianProduct"),
      "CUSUM planned a cross product")
  }

  test("q262: skip-gram census is broadcast-freq + keyed pair agg + TakeOrdered top-50") {
    val p = plan("q262_skipgram_subsample")
    assert(p.contains("BroadcastHashJoin"),
      "frequency table not broadcast to the keep decision")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 pair census planned a global sort instead of TakeOrdered")
    assert(!p.contains("CartesianProduct"),
      "pair census planned a shuffled cross product")
  }

  test("q263: HLL overlap is register-keyed max-agg merge — no content pairing") {
    val p = plan("q263_hll_overlap_estimate")
    // the sketch path must merge by (pair, register) max — the whole
    // point is that pair unions cost pair·256 rows, not a content join
    assert(p.contains("partial_max"),
      "register merge not a partial/final max-agg")
    assert(!p.contains("CartesianProduct"),
      "overlap estimation planned a shuffled cross product")
    // the exact ground-truth side is a token-keyed equijoin, never all-pairs
    assert(p.contains("hashpartitioning("),
      "exact-intersection audit not a keyed equijoin")
  }

  test("q264: E-S weighted sample is a top-k heap — no global population sort") {
    val p = plan("q264_weighted_sample_noreplace")
    assert(p.contains("TakeOrderedAndProject"),
      "largest-k selection planned a global sort instead of the " +
        "per-partition heap that makes one-pass weighted sampling scale")
    assert(!p.contains("CartesianProduct"),
      "weighted sampling planned a cross product")
  }

  test("q265: component rounds are doc-keyed joins + min-aggs — never all-pairs") {
    // the only nested-loop crosses are the 1-row summary broadcasts
    // (edge count / cluster totals / convergence certificate) — the
    // doc-scale propagation itself must stay keyed
    val p = plan("q265_dedup_components")
    assert(!p.contains("CartesianProduct"),
      "label propagation planned a shuffled cross product")
    // the six propagation rounds run eagerly behind localCheckpoint
    // cuts (each round one keyed join + min-agg), so the returned plan
    // must read from the checkpointed label RDD — a lineage re-run of
    // six joined rounds in one plan would blow up at scale
    assert(p.contains("Scan ExistingRDD"),
      "label table lost its checkpoint cut — propagation lineage re-runs")
    assert(p.contains("partial_count"),
      "cluster census not split partial/final")
  }

  test("q266: LOF candidates come from the bucket equijoin; kNN is a group limit") {
    val p = plan("q266_lof_outliers")
    assert(!p.contains("CartesianProduct"),
      "LOF candidate generation planned an all-pairs cross product")
    // at test SF the bucket side can be small enough to broadcast; at
    // scale both sides shuffle on bucket — either way the pairing is an
    // equijoin keyed by bucket, never a vector-vector nested loop
    assert(p.contains("hashpartitioning(bucket") ||
      p.contains("BroadcastHashJoin"),
      "candidate pairing not a bucket-keyed equijoin")
    assert(p.contains("WindowGroupLimit"),
      "kNN cut not pushed as a window group limit")
  }

  test("q267: resample round-trip is a partition-local kernel; payloads never shuffle") {
    val p = plan("q267_audio_resample")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      "decode/resample/re-encode kernel not partition-local")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "resample accounting planned an all-pairs join")
  }

  test("q269: CDC merge runs entirely on entity-key windows — no event self-join") {
    val p = plan("q269_scd2_cdc_merge")
    assert(p.contains("hashpartitioning(user_id"),
      "run-build/merge windows not hash-partitioned by the entity key")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "CDC merge planned an all-pairs join")
    assert(!p.contains("SortMergeJoin"),
      "merge pass introduced an event-scale join — the run-table " +
        "concatenation needs windows only")
  }

  test("q270: two-digit Benford is one keyed count; the grid rides the totals table") {
    val p = plan("q270_benford_two_digit")
    assert(p.contains("partial_count"),
      "(segment, digit-pair) count not split partial/final")
    assert(!p.contains("CartesianProduct"),
      "Benford drill-down planned a cross product")
    // exactly one scan of orders per aggregation arm (formatted explain
    // mentions each physical scan twice: tree + details) — the 90-bin
    // grid must explode from the |segments|-row totals, not rescan the
    // corpus per bin
    assert("Scan parquet".r.findAllIn(p).size <= 4,
      "digit grid re-scans the raw corpus instead of the totals table")
  }

  test("q273: CMS counters are one keyed partial/final count; probes ride broadcast cells") {
    val p = plan("q273_cms_error_certificate")
    assert(p.contains("partial_count"),
      "counter build not split partial/final — the d·w cells are the " +
        "whole point of the sketch")
    assert(p.contains("BroadcastHashJoin"),
      "probe-vs-counter lookup not a broadcast join of the 1024-cell table")
    assert(!p.contains("CartesianProduct"),
      "CMS certificate planned a shuffled cross product")
    assert(!p.contains("Scan parquet"),
      "the constructed Zipf domain must come from Range, not a table scan")
  }

  test("q274: incremental assignment is broadcast-centroid passes over the checkpoint cut") {
    val p = plan("q274_incremental_ivf")
    // the quantized table is checkpointed once; Lloyd rounds and the
    // new-half assignment read it — a lost cut re-runs the fit lineage
    assert(p.contains("Scan ExistingRDD"),
      "quantized vector table lost its checkpoint cut")
    assert(!p.contains("CartesianProduct"),
      "assignment planned a shuffled cross product (the k-row centroid " +
        "broadcast is the only legal nested loop)")
    assert(p.contains("hashpartitioning(vec_id"),
      "per-vector argmin not keyed by vec_id")
  }

  test("q277: deflate is a partition-local kernel; rollup is source-keyed") {
    val p = plan("q277_compression_ratio")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      "deflate kernel not partition-local")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "per-source rollup not split partial/final")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "compression rollup planned an all-pairs join")
  }

  test("q278: retention rides q265's checkpoint cut; ranking is lbl-keyed") {
    val p = plan("q278_quality_retention")
    assert(p.contains("Scan ExistingRDD"),
      "component labels lost their checkpoint cut — propagation re-runs")
    assert(p.contains("hashpartitioning(lbl"),
      "within-cluster retention rank not keyed by the cluster label")
    assert(!p.contains("CartesianProduct"),
      "retention planned a shuffled cross product")
  }

  test("q279: query side broadcasts; ranking windows partition by query id") {
    val p = plan("q279_matryoshka_audit")
    // the bounded query sample against the corpus is the q50 shape —
    // a broadcast nested loop by design, never a shuffled cross
    assert(!p.contains("CartesianProduct"),
      "query-corpus pairing planned a SHUFFLED cross product")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      "query sample not broadcast against the corpus")
    assert(p.contains("hashpartitioning(qid"),
      "top-k ranking windows not partitioned by query id")
  }

  test("q281: allocation is one keyed moment agg; apportionment is model-sized") {
    val p = plan("q281_neyman_allocation")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "per-stratum moments not split partial/final")
    assert(!p.contains("CartesianProduct"),
      "allocation planned a shuffled cross product (the 1-row totals " +
        "broadcast is the only legal cross)")
    // the strata table is checkpointed after ONE moment pass — the
    // totals/remainder/apportionment passes must ride the cut, not
    // re-scan the corpus each
    assert(p.contains("Scan ExistingRDD"),
      "strata table lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "apportionment re-scans the corpus instead of the strata table")
  }

  test("q282: the DP release is one keyed count + in-row noise; panel is a Range") {
    val p = plan("q282_dp_laplace_release")
    assert(p.contains("partial_count"),
      "per-language counts not split partial/final")
    assert(!p.contains("CartesianProduct"),
      "DP release planned a shuffled cross product")
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      "calibration panel must come from Range, not a corpus re-scan")
  }

  test("q271: the capstone is ONE scan, keyed windows, no stage boundaries") {
    val p = plan("q271_pipeline_capstone")
    // the whole raw→curate→dedup→mix→pack→card chain must ride a single
    // corpus scan (formatted explain mentions each physical scan twice)
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      "a pipeline stage re-scans the corpus — the chain broke into jobs")
    assert(!p.contains("Scan ExistingRDD"),
      "a checkpoint cut crept into the capstone — it must stay one " +
        "declarative plan end-to-end")
    assert(p.contains("hashpartitioning(h"),
      "exact-dedup window not hash-partitioned by the content hash")
    assert(p.contains("hashpartitioning(source"),
      "mix/pack windows not hash-partitioned by source")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the capstone planned an all-pairs join")
  }

  test("q283: privacy audit is one QI×band count; EMD rides the checkpoint cut") {
    val p = plan("q283_privacy_closeness")
    assert(p.contains("partial_count"),
      "(QI, band) cell count not split partial/final")
    assert(p.contains("Scan ExistingRDD"),
      "cell table lost its checkpoint cut — group/marginal/grid passes " +
        "re-run the corpus count")
    assert(!p.contains("Scan parquet"),
      "a post-cell pass re-scans the corpus instead of the cell table")
    assert(!p.contains("CartesianProduct"),
      "privacy audit planned a SHUFFLED cross product (the broadcast " +
        "band-marginal/totals crosses are the only legal ones)")
  }

  test("q284: ROUGE-L scores LSH candidates only; the DP is partition-local") {
    val p = plan("q284_rouge_l_screen")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      "LCS dynamic program not a partition-local kernel")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "pair scoring planned an all-pairs join — candidates must come " +
        "from the banded-LSH equijoin")
    assert(p.contains("hashpartitioning(doc_a") ||
      p.contains("hashpartitioning(doc_b") ||
      p.contains("BroadcastHashJoin"),
      "text fetch not an id-keyed equijoin")
  }

  test("q286: KS cells are one keyed count; cum windows ride the cut") {
    val p = plan("q286_ks_drift_test")
    assert(p.contains("hashpartitioning(source"),
      "per-source cumulative window not hash-partitioned by source")
    assert(p.contains("Scan ExistingRDD"),
      "cell table lost its checkpoint cut — marginal/grid/cum passes " +
        "re-run the corpus count")
    assert(!p.contains("Scan parquet"),
      "a post-cell pass re-scans the corpus instead of the cell table")
    assert(!p.contains("CartesianProduct"),
      "KS test planned a SHUFFLED cross product (the broadcast " +
        "value-grid/totals crosses are the only legal ones)")
  }

  test("q287: both batching orders ride the routed rank; aggs are batch-keyed") {
    val p = plan("q287_length_batch_audit")
    // below the GlobalRank crossover the routed naive window already
    // single-partitioned the rows, so the batch agg needs no new
    // exchange; the partial/final split is the invariant either route
    // must show
    assert(p.contains("partial_count") && p.contains("partial_max"),
      "per-batch padding agg not split partial/final")
    assert(p.contains("Scan ExistingRDD"),
      "corpus projection lost its checkpoint cut — both rank passes " +
        "re-scan the parquet")
    assert(!p.contains("Scan parquet"),
      "a rank pass re-scans the corpus instead of the cut projection")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "batching audit planned an all-pairs join")
  }

  test("q288: unseen-mass card is two keyed aggs over one scan") {
    val p = plan("q288_unseen_vocab_mass")
    assert(p.contains("partial_count"),
      "(source, word) count not split partial/final")
    assert(p.contains("hashpartitioning(source"),
      "frequency-of-frequencies agg not keyed by source")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "vocabulary card planned an all-pairs join")
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      "the card re-scans the corpus — one scan feeds both aggs")
  }

  test("q289: kappa rides two routed ranks + one 9-cell confusion agg") {
    val p = plan("q289_cohens_kappa")
    assert(p.contains("Scan ExistingRDD"),
      "projection/confusion lost their checkpoint cuts")
    assert(!p.contains("Scan parquet"),
      "a rater pass re-scans the corpus instead of the cut projection")
    // below the GlobalRank crossover both rater sides arrive single-
    // partitioned from the routed naive window, so the doc_id equijoin
    // needs no new exchange; the invariant either route shows is an
    // equi-join operator (never a nested loop)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"),
      "rater pairing not an equijoin")
    assert(!p.contains("CartesianProduct"),
      "agreement card planned a SHUFFLED cross product (the 1-row " +
        "stats broadcast is the only legal cross)")
  }

  test("q291: frontier is in-row scoring + routed rank + decile cumsum") {
    val p = plan("q291_pruning_frontier")
    assert(p.contains("Scan ExistingRDD"),
      "scored projection lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "the rank or rollup pass re-scans the corpus")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "decile rollup not split partial/final")
    assert(!p.contains("CartesianProduct"),
      "frontier planned a SHUFFLED cross product (the 1-row totals " +
        "broadcast is the only legal cross)")
  }

  test("q292: prefix audit is one keyed count + TakeOrdered heap") {
    val p = plan("q292_prefix_cache_audit")
    // the TakeOrdered heap lives BEHIND the top-20 lazy-checkpoint cut
    // (orderBy+limit always plans as TakeOrderedAndProject — the q262
    // guard pins that shape); what THIS plan must show is the two cuts
    // and that nothing re-scans or cross-joins the corpus
    assert(p.contains("Scan ExistingRDD"),
      "prefix projection / top-20 lost their checkpoint cuts")
    assert(!p.contains("Scan parquet"),
      "a pass re-scans the corpus instead of the cut projection")
    assert(!p.contains("CartesianProduct"),
      "cache audit planned a SHUFFLED cross product (the 1-row " +
        "totals/coverage broadcasts are the only legal ones)")
  }

  test("q293: both margins score in ONE doc-keyed agg over the feature table") {
    val p = plan("q293_mcnemar_early_stop")
    assert(p.contains("hashpartitioning(doc_id") ||
      p.contains("partial_sum"),
      "paired z4/z8 scoring not a doc-keyed partial/final agg")
    assert(p.contains("Scan ExistingRDD"),
      "confusion cells lost their checkpoint cut")
    assert(!p.contains("CartesianProduct"),
      "McNemar card planned a SHUFFLED cross product (the 2×2 grid " +
        "and 1-row stats broadcasts are the only legal crosses)")
  }

  test("q294: bandit state is model-sized; corpus work is keyed ranking + rollup") {
    val p = plan("q294_ucb_crawl_allocation")
    // the returned pick sequence is a 16-row LocalTableScan by design
    // (the q260 bounded-report precedent) — the corpus-scale stages run
    // inside the collected reward-table job, not in this plan
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"),
      "pick sequence is not the bounded local report it should be")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"),
      "the 16-row pick report should not join or cross anything")
  }

  test("q295: burstiness is two keyed aggs + a TakeOrdered heap") {
    val p = plan("q295_term_burstiness")
    assert(p.contains("partial_count"),
      "(term, doc) count not split partial/final")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 terms not a per-partition heap — a global sort snuck in")
    assert(p.contains("hashpartitioning(term"),
      "per-term moment agg not keyed by term")
    assert(!p.contains("CartesianProduct"),
      "burstiness card planned a SHUFFLED cross product (the 1-row " +
        "doc-count broadcast is the only legal cross)")
  }

  test("q297: alignment is in-row against the collected mean-vector literal") {
    val p = plan("q297_embedding_isotropy")
    assert(p.contains("Scan ExistingRDD"),
      "quantized vectors lost their checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "the alignment pass re-scans the corpus")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("CartesianProduct"),
      "per-vector alignment must be in-row (mean vector is a plan " +
        "literal) — the corpus must not join anything")
    assert(p.contains("hashpartitioning(label") ||
      p.contains("partial_count"),
      "per-label card not a keyed partial/final agg")
  }

  test("q296: snapshot diff is keyed aggs + a word-keyed anti-join") {
    val p = plan("q296_snapshot_diff_card")
    assert(p.contains("LeftAnti"),
      "vocabulary novelty not an anti-join")
    assert(p.contains("hashpartitioning(w") ||
      p.contains("hashpartitioning(source"),
      "anti-join / card not hash-keyed")
    assert(p.contains("Scan ExistingRDD"),
      "scored projection lost its checkpoint cut")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "snapshot diff planned an all-pairs join")
  }

  test("q298: concentration card is ONE keyed mass agg + model-sized Lorenz") {
    val p = plan("q298_concentration_card")
    assert(p.contains("partial_sum"),
      "per-source mass agg not split partial/final")
    assert(p.contains("Scan ExistingRDD"),
      "mass table lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "Lorenz/Gini passes re-scan the corpus instead of the mass table")
    assert(!p.contains("CartesianProduct"),
      "concentration card planned a SHUFFLED cross product (the 1-row " +
        "totals/gini broadcasts are the only legal ones)")
  }

  test("q299: bootstrap is one in-row weighted pass onto 64 groups") {
    val p = plan("q299_bootstrap_ci")
    assert(p.contains("partial_sum"),
      "replicate partials not map-side combined before the 64-group " +
        "exchange")
    assert(p.contains("Scan ExistingRDD"),
      "scored projection / replicate table lost their checkpoint cuts")
    assert(!p.contains("Scan parquet"),
      "a pass re-scans the corpus instead of the cut projection")
    assert(!p.contains("CartesianProduct"),
      "bootstrap planned a SHUFFLED cross product (the 1-row point/ci " +
        "broadcasts are the only legal ones)")
  }

  test("q300: every card dimension reads the ONE cut projection") {
    val p = plan("q300_data_card")
    assert(p.contains("Scan ExistingRDD"),
      "card projection lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "a card dimension re-scans the corpus — the whole point is ONE " +
        "read feeding every column")
    assert(p.contains("hashpartitioning(source"),
      "per-source dimensions not keyed by source")
    // the gini/coverage 1-row broadcasts legitimately plan as
    // BroadcastNestedLoopJoin — only a SHUFFLED cross is a bug here
    assert(!p.contains("CartesianProduct"),
      "data card planned a SHUFFLED cross product")
  }

  test("q302: linkage candidates come from keyed blocking joins — never all-pairs") {
    val p = plan("q302_record_linkage")
    assert(!p.contains("CartesianProduct"),
      "record linkage planned a SHUFFLED cross product (the 1-row stats " +
        "broadcasts onto the 8-row pattern grid are the only legal " +
        "cross joins, and those plan as BroadcastNestedLoopJoin)")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"),
      "blocking-rule candidate generation not a hash equijoin")
    assert(p.contains("hashpartitioning(a_key") || p.contains("HashAggregate"),
      "candidate union-dedup / pattern census not keyed")
    assert(p.contains("Range"),
      "the 8-pattern panel should be a Range, not a corpus scan")
  }

  test("q303: Viterbi DP runs on the cut distinct-word table — corpus pays one agg") {
    val p = plan("q303_unigram_viterbi")
    assert(p.contains("Scan ExistingRDD"),
      "word table / DP rounds lost their localCheckpoint cuts")
    assert(!p.contains("Scan parquet"),
      "the final report re-scans the corpus instead of the cut DP tables")
    assert(!p.contains("CartesianProduct"),
      "segmentation assembly planned a SHUFFLED cross product (the " +
        "1-row summary broadcasts are the only legal cross joins)")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 words not a per-partition heap")
  }

  test("q304: copy verification joins manifests only — corpora never row-join") {
    val p = plan("q304_replication_checksum")
    assert(p.contains("Scan ExistingRDD"),
      "chunk manifest lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "summary/report re-scans the corpus instead of the cut manifest")
    assert(!p.contains("hashpartitioning(doc_id"),
      "plan shuffles on doc_id — the corpora must NEVER meet row-by-row")
    assert(!p.contains("CartesianProduct"),
      "manifest compare planned a SHUFFLED cross product")
  }

  test("q305: CUPED is two aggs over the cut per-user table — no corpus re-scan") {
    val p = plan("q305_cuped_readout")
    assert(p.contains("Scan ExistingRDD"),
      "per-user (x, y, arm) table lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "moments/arm rollup re-scan the events corpus instead of the cut")
    assert(!p.contains("CartesianProduct"),
      "readout planned a SHUFFLED cross product (the 1-row moments/" +
        "delta broadcasts are the only legal cross joins)")
  }

  test("q306: Shapley credit is one posting-shaped shingle equijoin") {
    val p = plan("q306_shapley_coverage")
    assert(p.contains("hashpartitioning(sh"),
      "ownership count / credit join not keyed on the shingle")
    assert(!p.contains("CartesianProduct"),
      "valuation planned a SHUFFLED cross product (the 1-row totals " +
        "broadcasts are the only legal cross joins)")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"),
      "credit assignment not a hash equijoin")
  }

  test("q307: IV screen is one cut corpus pass onto a ≤30-cell census") {
    val p = plan("q307_woe_iv_screen")
    assert(p.contains("Scan ExistingRDD"),
      "per-doc feature projection lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "census/IV passes re-scan the corpus instead of the cut projection")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "census not a map-side-combined keyed agg")
    assert(!p.contains("CartesianProduct"),
      "screen planned a SHUFFLED cross product (the 1-row totals " +
        "broadcast is the only legal cross join)")
  }

  test("q308: BH battery pays q286's cost — cell count + source-keyed windows") {
    val p = plan("q308_bh_fdr_battery")
    assert(p.contains("Scan ExistingRDD"),
      "cell table lost its checkpoint cut")
    assert(p.contains("hashpartitioning(source"),
      "per-source cumulative windows not source-partitioned")
    assert(!p.contains("CartesianProduct"),
      "battery planned a SHUFFLED cross product (the value-grid and " +
        "1-row m/k* broadcasts are the only legal cross joins)")
  }

  test("q309: runs test is two ordered passes — no join, no cross product") {
    val p = plan("q309_runs_test_order")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("SortMergeJoin"),
      "runs test planned a join — it is two lag-window passes + a union")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "run-count rollup not map-side combined")
  }

  test("q310: confident joint is a keyed count onto a 4-cell Range grid") {
    val p = plan("q310_confident_learning")
    assert(p.contains("Scan ExistingRDD"),
      "scored confidence table lost its checkpoint cut")
    assert(p.contains("Range"),
      "the dense 2x2 joint should ride a Range grid, not a scan")
    assert(!p.contains("CartesianProduct"),
      "audit planned a SHUFFLED cross product (the 1-row threshold/" +
        "totals broadcasts are the only legal cross joins)")
  }

  test("q311: halving report is a bounded local table — training ran engine-side") {
    val p = plan("q311_successive_halving")
    assert(p.contains("LocalTableScan"),
      "the 6-row schedule report should be a bounded LocalTableScan " +
        "(the q294 bandit precedent)")
    assert(!p.contains("Scan parquet"),
      "the report plan re-scans the corpus — all corpus work belongs " +
        "in the (already executed) training rounds")
  }

  test("q312: cohesion join is (doc, tok)-keyed adjacent blocks — never block×block") {
    val p = plan("q312_texttiling_chunks")
    assert(p.contains("Scan ExistingRDD"),
      "(doc, blk, tok) projection lost its checkpoint cut")
    assert(p.contains("hashpartitioning(doc_id"),
      "cohesion self-join / per-doc windows not doc-keyed")
    assert(!p.contains("CartesianProduct"),
      "chunking planned a SHUFFLED cross product (the 1-row totals " +
        "broadcast is the only legal cross join)")
  }

  test("q313: bitemporal latest-wins is a keyed window; only the 3-row K grid nests") {
    val p = plan("q313_bitemporal_asof")
    assert(p.contains("hashpartitioning(k_label"),
      "latest-wins not keyed on (snapshot, user, eday)")
    assert(!p.contains("CartesianProduct"),
      "snapshot expansion planned a SHUFFLED cross product (the 3-row " +
        "knowledge grid broadcast is the only legal nested loop)")
  }

  test("q314: TA certificate scores once, then runs on k rows + rank joins") {
    val p = plan("q314_threshold_algorithm")
    assert(p.contains("Scan ExistingRDD"),
      "scored/ranked table lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "certificate stages re-scan the corpus instead of the cut table")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k not a per-partition heap")
    assert(!p.contains("CartesianProduct"),
      "TA certificate planned a SHUFFLED cross product (the 1-row " +
        "stat broadcasts are the only legal cross joins)")
  }

  test("q315: B-cubed runs at contingency-cell cardinality — keyed aggs, never all-pairs") {
    val p = plan("q315_bcubed_eval")
    assert(p.contains("Scan ExistingRDD"),
      "(ckey, truth) contingency lost its checkpoint cut")
    assert(p.contains("hashpartitioning(ckey") ||
      p.contains("hashpartitioning(truth"),
      "contingency/marginal aggs not keyed on the cluster/truth keys")
    assert(!p.contains("CartesianProduct"),
      "B-cubed planned a SHUFFLED cross product (the 1-row card " +
        "broadcasts are the only legal cross joins)")
  }

  test("q316: boosting report is a bounded LocalTableScan + one checkpointed vote pass") {
    val p = plan("q316_adaboost_stumps")
    assert(p.contains("LocalTableScan"),
      "per-round picks not a bounded driver-side table")
    assert(p.contains("Scan ExistingRDD"),
      "final-vote pass lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "report plan re-scans the corpus (training rounds own the scans)")
    assert(!p.contains("CartesianProduct"),
      "vote/report planned a SHUFFLED cross product (the 1-row ensemble " +
        "broadcast is the only legal cross join)")
  }

  test("q317: permutation test is one source-keyed agg + a 1-row DP broadcast") {
    val p = plan("q317_permutation_test")
    assert(p.contains("Scan ExistingRDD"),
      "per-source paired diffs lost their checkpoint cut")
    assert(p.contains("LocalTableScan"),
      "DP stats not a bounded driver-side table")
    assert(!p.contains("Scan parquet"),
      "report plan re-scans the corpus (the diff agg owns the one scan)")
    assert(!p.contains("CartesianProduct"),
      "permutation report planned a SHUFFLED cross product (the 1-row " +
        "stats broadcast is the only legal cross join)")
  }

  test("q320: chrF gram intersection is a gram-keyed equijoin over planted pairs") {
    val p = plan("q320_chrf_screen")
    assert(p.contains("Scan ExistingRDD"),
      "planted pair corpus lost its checkpoint cut")
    assert(p.contains("hashpartitioning(ptype") ||
      p.contains("hashpartitioning(doc_id"),
      "gram multiset agg/join not keyed on (ptype, doc_id, n, g)")
    assert(!p.contains("CartesianProduct"),
      "chrF screen planned a cross product (the gram overlap must be a " +
        "keyed equijoin over bounded candidate pairs, never all-pairs)")
  }

  test("q321: fairness audit is one source-keyed agg + a 1-row max broadcast") {
    val p = plan("q321_fairness_audit")
    assert(p.contains("Scan ExistingRDD"),
      "per-source rate table lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "audit tail re-scans the corpus (training/scoring own the scans; " +
        "the tail reads only the bounded per-source rate table)")
    assert(!p.contains("CartesianProduct"),
      "audit planned a SHUFFLED cross product (the 1-row max-rates " +
        "broadcast is the only legal cross join)")
  }

  test("q322: Simpson audit tail runs on the bounded cell table only") {
    val p = plan("q322_simpson_cmh_audit")
    assert(p.contains("Scan ExistingRDD"),
      "per-stratum 2x2 cell table lost its checkpoint cut")
    assert(!p.contains("Scan parquet"),
      "audit tail re-scans the corpus (the stratum-keyed cell agg owns " +
        "the one scan)")
    assert(!p.contains("CartesianProduct"),
      "audit planned a SHUFFLED cross product (the 1-row CMH-stats " +
        "broadcast is the only legal cross join)")
  }

  test("q324: placement report is a bounded LocalTableScan (DP is driver arithmetic)") {
    val p = plan("q324_optimal_placement")
    assert(p.contains("LocalTableScan"),
      "assignment report not a bounded driver-side table")
    assert(!p.contains("Scan parquet"),
      "report plan re-scans the corpus (the source-size agg owns the " +
        "one scan, collected at k rows)")
    assert(!p.contains("CartesianProduct"),
      "placement report planned a cross product")
  }

  test("q325: ER capstone tail is keyed aggs over the checkpointed contingency") {
    val p = plan("q325_er_capstone")
    assert(p.contains("Scan ExistingRDD"),
      "match graph / contingency lost its checkpoint cut")
    assert(p.contains("hashpartitioning(lbl") ||
      p.contains("hashpartitioning(truth"),
      "B-cubed rollup not keyed on cluster/truth labels")
    assert(!p.contains("Scan parquet"),
      "capstone tail re-scans the corpus (the linkage front owns the " +
        "scans; the tail runs on checkpointed match/label tables)")
    assert(!p.contains("CartesianProduct"),
      "capstone planned a SHUFFLED cross product (the 1-row count " +
        "broadcasts are the only legal cross joins)")
  }

  test("q326: edit verify is keyed joins over LSH candidates, never all-pairs") {
    val p = plan("q326_edit_verify")
    assert(p.contains("hashpartitioning(doc_a") ||
      p.contains("hashpartitioning(doc_b") ||
      p.contains("hashpartitioning(doc_id"),
      "text-verify joins not keyed on doc ids")
    assert(!p.contains("CartesianProduct"),
      "edit verify planned a cross product (candidates must come from " +
        "the banded LSH equijoin + the keyed control join)")
  }

  test("q327: Mann-Whitney ranks come from the distinct-value table, not a row window") {
    val p = plan("q327_mann_whitney")
    assert(p.contains("Scan ExistingRDD"),
      "midrank value table lost its checkpoint cut")
    assert(p.contains("hashpartitioning(source") ||
      p.contains("hashpartitioning(n_chars"),
      "rank-sum rollup not keyed on source/value")
    assert(!p.contains("CartesianProduct"),
      "U battery planned a SHUFFLED cross product (the 1-row globals " +
        "broadcast is the only legal cross join)")
  }

  test("q328: KM report is a bounded LocalTableScan (fold is driver arithmetic)") {
    val p = plan("q328_kaplan_meier")
    assert(p.contains("LocalTableScan"),
      "survival curve not a bounded driver-side table")
    assert(!p.contains("Scan parquet"),
      "report plan re-scans the corpus (the order-keyed and " +
        "bucket-keyed aggs own the scans, collected at support size)")
    assert(!p.contains("CartesianProduct"),
      "KM report planned a cross product")
  }

  test("q330: forecast card is a bounded LocalTableScan (fold is driver arithmetic)") {
    val p = plan("q330_exp_smoothing")
    assert(p.contains("LocalTableScan"),
      "forecast card not a bounded driver-side table")
    assert(!p.contains("Scan parquet"),
      "report plan re-scans the corpus (the week-keyed revenue agg " +
        "owns the one scan, collected at calendar size)")
    assert(!p.contains("CartesianProduct"),
      "forecast card planned a cross product")
  }

  test("q331: Ljung-Box card is a bounded LocalTableScan") {
    val p = plan("q331_ljung_box")
    assert(p.contains("LocalTableScan"),
      "autocorrelation card not a bounded driver-side table")
    assert(!p.contains("Scan parquet"),
      "report plan re-scans the corpus (the week-keyed agg owns the " +
        "one scan, collected at calendar size)")
    assert(!p.contains("CartesianProduct"),
      "Ljung-Box card planned a cross product")
  }

  test("q332: rule mining is basket-keyed joins + a top-k heap, no global sort") {
    val p = plan("q332_association_rules")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 rules not a TakeOrdered heap")
    assert(p.contains("hashpartitioning(o") ||
      p.contains("hashpartitioning(u") || p.contains("hashpartitioning(p"),
      "pair/support aggs not keyed on order/part")
    assert(!p.contains("CartesianProduct"),
      "rule mining planned a cross product (pairs must come from the " +
        "order-keyed basket self-join)")
  }

  test("q333: capture-recapture is coin filters + a doc-keyed semi-join") {
    val p = plan("q333_capture_recapture")
    assert(p.contains("LeftSemi") || p.contains("left_semi") ||
      p.contains("hashpartitioning(doc_id"),
      "recapture overlap not a doc-keyed semi-join")
    assert(!p.contains("CartesianProduct"),
      "certificate planned a SHUFFLED cross product (the 1-row count " +
        "broadcasts are the only legal cross joins)")
  }

  test("q334: boilerplate removal is head-keyed df aggs over checkpoint cuts") {
    val p = plan("q334_boilerplate_removal")
    assert(p.contains("Scan ExistingRDD"),
      "planted/cleaned corpus lost its checkpoint cut")
    assert(p.contains("hashpartitioning(chead") ||
      p.contains("hashpartitioning(head"),
      "df aggs not keyed on the head fingerprint")
    assert(!p.contains("CartesianProduct"),
      "cleaning certificate planned a cross product (the 1-row " +
        "residual broadcast is the only legal cross join)")
  }

  test("q335: packing-optimality report is a bounded LocalTableScan") {
    val p = plan("q335_packing_optimality")
    assert(p.contains("LocalTableScan"),
      "optimality card not a bounded driver-side table")
    assert(!p.contains("Scan parquet"),
      "report plan re-scans the corpus (the filtered instance " +
        "projection owns the one scan, collected at instance size)")
    assert(!p.contains("CartesianProduct"),
      "optimality card planned a cross product")
  }

  test("q319: sampling-table build runs at vocab cardinality after one token agg") {
    val p = plan("q319_negative_sampling_table")
    assert(p.contains("Scan ExistingRDD"),
      "smoothed vocab table lost its checkpoint cut")
    assert(p.contains("hashpartitioning(token") ||
      p.contains("Scan ExistingRDD"),
      "token count agg not token-keyed")
    assert(!p.contains("CartesianProduct"),
      "allocation planned a SHUFFLED cross product (the 1-row totals " +
        "broadcasts are the only legal cross joins)")
  }

  test("q350: accounted media decode is one partition-local pass; rollup at group cardinality") {
    val p = plan("q350_media_quarantine")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      "screen/decode/verdict kernel not partition-local")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "quarantine profile planned a cross product")
    assert(p.contains("HashAggregate"),
      "kind×reason rollup lost its partial aggregation")
    // payloads must never shuffle: the only exchange is the |kind×reason|
    // group rollup + the final sort
    assert(!p.contains("Exchange hashpartitioning(asset_id"),
      "per-asset rows shuffled — the verdict pass must stay in place")
  }

  test("q338: dynamic blocking is capped keyed equijoins — never all-pairs") {
    val p = plan("q338_dynamic_blocking")
    assert(!p.contains("CartesianProduct"),
      "dynamic blocking planned a SHUFFLED cross product (the 1-row " +
        "stat broadcasts are the only legal cross joins)")
    assert(p.contains("BroadcastHashJoin"),
      "split/keep key restrictions should broadcast onto the registries")
    assert(p.contains("hashpartitioning(nat") || p.contains("HashAggregate"),
      "block censuses not keyed partial aggregations")
  }

  test("q351: production-threshold near-dup card is aggs over the checkpointed pair set") {
    // the LSH candidate join itself sits behind the pairs checkpoint;
    // its bucket-equijoin shape is pinned by q55's guard (same pipeline,
    // same lshBuckets kernel) — this frame must stay 1-row aggregations
    // with the pair-set cut, no cross product beyond the 1-row broadcast
    val p = plan("q351_neardup_production")
    assert(!p.contains("CartesianProduct"),
      "production near-dup card planned a SHUFFLED cross product")
    assert(p.contains("Scan ExistingRDD"),
      "verified pair set lost its checkpoint cut")
    assert(p.contains("HashAggregate"),
      "corpus/pair certificates lost their partial aggregations")
  }

  test("q349: the benched ER capstone's tail runs keyed joins over checkpoint cuts") {
    // The capped candidate generation itself sits behind the dmp/mp
    // localCheckpoint cuts in this frame's explain; its join shape
    // (broadcast split/keep restrictions, keyed block equijoins, no
    // all-pairs) is pinned by the q338 guard on the SHARED dynBlocks
    // builder — q349 cannot regress it without q338 regressing too.
    val p = plan("q349_er_capstone_dynamic")
    assert(!p.contains("CartesianProduct"),
      "dynamic ER capstone planned a SHUFFLED cross product (the 1-row " +
        "stat/cert broadcasts are the only legal cross joins)")
    assert(p.contains("Scan ExistingRDD"),
      "match graph / candidate set lost their checkpoint cuts")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "B³ contingency joins not keyed")
  }
}
