package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins.
  *
  * A shuffle join over two 100 TB fact tables moves both sides over the
  * network every query. Bucketing pays that shuffle ONCE at write time:
  * both tables are hash-partitioned into the same number of buckets on the
  * join key and sorted within buckets, so Spark's planner proves the
  * children satisfy the join's required distribution and elides both
  * exchanges (and with sorted buckets, both sorts) — the join becomes a
  * zip of co-numbered buckets. The BucketingSpec asserts the exchange-free
  * plan. Iceberg's equivalent is a `bucket(N, col)` partition transform.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed+sorted on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equijoin of two tables bucketed on the same key with the same bucket
    * count — plans with zero Exchange operators. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
