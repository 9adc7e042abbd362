package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global rank + running sum over (value DESC, id ASC) order
  * WITHOUT a corpus-scale global sort — the two-pass recipe q74/q116 use
  * for exact percentiles, generalized to (rank, prefix-sum) so gains
  * tables (q190) and Pareto curves (q198) never serialize the population
  * through one partition:
  *
  *  - pass 1a: rank WITHIN each distinct value by id — a value-keyed
  *    window (hash-partitioned, parallel, tiny partitions);
  *  - pass 1b: the distinct-value count table gets a descending
  *    cumulative (count, value·count) via a RANGE-CORRELATED shard
  *    (`value div shardDiv` — deterministic, no boundary sampling,
  *    order-preserving for non-negative values): cumsum within shard
  *    plus a shard-count-sized offset table (the ONLY unpartitioned
  *    window, bounded by value-range/shardDiv rows);
  *  - pass 2: rows join the distinct-value offset table on value (keyed
  *    equijoin) — `rn = cnt_offset + rank_within`, and because every row
  *    of a tie group carries the same value, `cum = sum_offset +
  *    rank_within · value` exactly.
  *
  * Requires `value >= 0` (integer) and non-null — ENFORCED at runtime
  * (raise_error), not just documented; ties break by ascending id. */
object GlobalRank {

  /** Adds `rn` (1-based global rank by value DESC, id ASC) and `cum`
    * (inclusive running sum of `valueCol` in that order) to `df`. */
  def withRankAndPrefix(df: DataFrame, valueCol: String, idCol: String,
      shardDiv: Long = 16384L): DataFrame = {
    require(shardDiv >= 1, s"shardDiv must be >= 1, got $shardDiv")
    val v = col(valueCol)
    // Fail loudly on misuse instead of silently mis-ranking: the
    // range-correlated shard (`value div shardDiv`) is order-preserving
    // only for non-negative values, and a NULL value would be silently
    // dropped by the offset equijoin below. Rewriting the column keeps
    // the check in the projection so Catalyst can't prune it.
    val df0 = df.withColumn(valueCol,
      when(v.isNotNull && v >= 0, v).otherwise(raise_error(concat(
        lit(s"GlobalRank: $valueCol must be non-null and >= 0, got "),
        coalesce(v.cast("string"), lit("NULL"))))))
    val wTie = Window.partitionBy(v).orderBy(col(idCol))
    val withinRank = df0.withColumn("_r_in",
      row_number().over(wTie).cast(LongType))
    val cnts = df0.groupBy(v).agg(count(lit(1)).as("_c"))
      .withColumn("_shard", expr(s"$valueCol div $shardDiv"))
    val wShard = Window.partitionBy(col("_shard")).orderBy(v.desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = cnts
      .withColumn("_cnt_in_shard",
        coalesce(sum(col("_c")).over(wShard), lit(0L)))
      .withColumn("_sum_in_shard",
        coalesce(sum(col("_c") * v).over(wShard), lit(0L)))
    val wTot = Window.orderBy(col("_shard").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cnts.groupBy(col("_shard"))
      .agg(sum(col("_c")).as("_ct"), sum(col("_c") * v).as("_st"))
      .withColumn("_cnt_before", coalesce(sum(col("_ct")).over(wTot), lit(0L)))
      .withColumn("_sum_before", coalesce(sum(col("_st")).over(wTot), lit(0L)))
      .select(col("_shard"), col("_cnt_before"), col("_sum_before"))
    val valOffsets = local.join(offsets, Seq("_shard"))
      .select(v.as("_v"),
        (col("_cnt_before") + col("_cnt_in_shard")).as("_cnt_off"),
        (col("_sum_before") + col("_sum_in_shard")).as("_sum_off"))
    withinRank.join(valOffsets, v === col("_v"))
      .withColumn("rn", col("_cnt_off") + col("_r_in"))
      .withColumn("cum", col("_sum_off") + col("_r_in") * v)
      .drop("_v", "_cnt_off", "_sum_off", "_r_in")
  }
}
