package graft.operators

import graft.functions.CodegenExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter front for anti-joins against a large key corpus — the
  * incremental-ingest shape (dedup a new batch against an existing
  * corpus's content-hash set, `spark_job.py`'s append loop generalized to
  * exact dedup; see SURVEY §2.5 and q84).
  *
  * A plain `left_anti` join shuffles BOTH sides on the key. At 100 TB the
  * corpus key set dwarfs every incoming batch, and most batch keys are
  * genuinely new — shuffling them against the corpus buys nothing. The
  * front builds a compact bloom filter over the corpus keys (one
  * aggregation job, a few bits/key — ~1.2 GB for 10^9 keys at 1% fpp,
  * broadcast once), probes it map-side with a codegen'd expression, and
  * sends ONLY possible members (true dups + the fpp share) through the
  * shuffle anti-join. The anti-join remains the exactness authority:
  * bloom filters have no false negatives, so the definitely-new branch is
  * exact, and every false positive is resolved by the join.
  *
  * Null keys never equi-match, so `left_anti` always keeps them; they are
  * routed to the keep branch without probing the filter (the probe's
  * null-safe result would otherwise drop them from both branches).
  */
object BloomFront {

  /** `batch.join(corpusKeys, Seq(key), "left_anti")`, bloom-fronted.
    *
    * @param expectedItems corpus key cardinality for sizing the filter;
    *   None runs a count job. At real scale pass the table-statistics
    *   count instead of scanning, or a fixed upper bound — oversizing
    *   only costs bits, undersizing only raises the fpp (correctness is
    *   unaffected either way: the join resolves every "maybe").
    * @param fpp target false-positive rate; the shuffled fraction of
    *   genuinely-new keys.
    */
  def antiJoin(batch: DataFrame, corpusKeys: DataFrame, key: String,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): DataFrame = {
    val counted = expectedItems.isEmpty
    val n = expectedItems.getOrElse(corpusKeys.count())
    // Empty-corpus degenerate case: only trust an ACTUAL count. A caller
    // estimate of 0 (stale table statistics) must not skip the join — the
    // contract is that a bad estimate only moves the fpp, never
    // correctness — so an estimated 0 just builds a minimal filter and
    // the anti-join stays the authority.
    if (counted && n == 0L) return batch
    val bloom = corpusKeys.stat.bloomFilter(key, math.max(n, 1L), fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    val might = CodegenExpressions.bloomMightContain(col(key), bytes)
    val definitelyNew = batch.filter(col(key).isNull || !might)
    val maybeDup = batch.filter(col(key).isNotNull && might)
    maybeDup.join(corpusKeys, Seq(key), "left_anti").unionByName(definitelyNew)
  }
}
