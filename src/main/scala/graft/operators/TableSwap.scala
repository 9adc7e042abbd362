package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Rewrite a managed table's content via tmp table + DROP/RENAME swap —
  * the shared mechanic under [[Compaction]] and [[Upsert]].
  *
  * The swap is NOT atomic (Spark's session catalog has no two-table atomic
  * rename): a crash between DROP and RENAME strands the data under
  * `<table><tmpSuffix>`; [[recover]] completes the rename on the next
  * invocation. Single-writer maintenance-window semantics — Iceberg's
  * snapshot commit is the transactional path in prod. */
object TableSwap {

  val TmpSuffix = "__swap_tmp"

  /** Complete a half-done swap: tmp present without the original ⇒ the
    * DROP committed but the RENAME didn't; tmp present WITH the original ⇒
    * stale leftover from a pre-DROP crash, discard it. */
  def recover(spark: SparkSession, table: String): Unit = {
    val tmp = table + TmpSuffix
    if (spark.catalog.tableExists(tmp)) {
      if (!spark.catalog.tableExists(table))
        spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
      else
        spark.sql(s"DROP TABLE $tmp")
      // the table under this name is (or may be) a different table now
      graft.streaming.IdempotentParquetSink.invalidate(spark, table)
    }
  }

  /** Replace `table`'s content with `df` (which may read from `table` —
    * the tmp materialization breaks the read-while-overwrite cycle). */
  def rewrite(spark: SparkSession, table: String, df: DataFrame): Unit = {
    recover(spark, table)
    val tmp = table + TmpSuffix
    df.write.format("parquet").mode("overwrite").saveAsTable(tmp)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.catalog.refreshTable(table)
    // a validated-by-IdempotentParquetSink table no longer exists under
    // this name; the rewritten one must re-earn the partition-spec guard
    graft.streaming.IdempotentParquetSink.invalidate(spark, table)
  }
}

/** SCD-1 merge ("MERGE INTO ... WHEN MATCHED UPDATE, WHEN NOT MATCHED
  * INSERT") for plain-parquet managed tables. Vanilla Spark only supports
  * MERGE through a transactional format (Iceberg/Delta); this is the
  * join+rewrite dual: updated keys replace current rows, new keys append —
  * one anti-join plus a union, then a table swap. At 100 TB you run this
  * per partition-predicate slice (or on Iceberg, where it's a real MERGE);
  * the plan shape — anti-join on the key, no full-table shuffle of the
  * updates side — is the same. */
object Upsert {

  def mergeInto(spark: SparkSession, table: String, updates: DataFrame,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "merge keys required")
    val cur = spark.table(table)
    require(keys.forall(cur.columns.contains), s"table lacks key columns $keys")
    // Current rows whose key does NOT appear in updates survive; every
    // update row lands. unionByName keeps schema alignment explicit.
    val kept = cur.join(
      updates.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct(),
      keys, "left_anti")
    TableSwap.rewrite(spark, table, kept.unionByName(updates))
  }
}
