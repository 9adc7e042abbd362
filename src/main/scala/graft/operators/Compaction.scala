package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction for managed parquet tables.
  *
  * A streaming sink appending every 10 s writes ~8640 files/day/partition;
  * at 100 TB the resulting file-listing and per-file open costs dominate
  * scan time long before data volume does. Compaction rewrites a table to
  * ~targetFileBytes-sized files: count = ceil(bytes / target), rewrite via
  * a temp table, then a DROP + RENAME swap. (The Iceberg-prod equivalent
  * is `rewrite_data_files`; this is the ParquetSink-side dual.)
  *
  * The swap is NOT atomic: Spark's session catalog has no two-table atomic
  * rename, so DROP and RENAME are separate catalog operations. A crash
  * between them leaves the data intact but stranded under
  * `<table>__compact_tmp`; [[compactTable]] detects that state on the next
  * invocation and completes the rename before doing anything else.
  * Concurrent readers can observe the table missing for the instant
  * between the two statements — single-writer maintenance-window semantics,
  * same caveat as Hive's INSERT OVERWRITE. (Iceberg's snapshot commit is
  * the true atomic path in prod.)
  */
object Compaction {

  final case class Result(filesBefore: Int, filesAfter: Int, bytes: Long)

  private def dataFiles(spark: SparkSession, table: String): Seq[java.io.File] = {
    val loc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
      .find(_.getString(0) == "Location").get.getString(1)
    val dir = new java.io.File(loc.stripPrefix("file:"))
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  /** Complete a swap a prior crashed run left half-done: tmp table present
    * without the original ⇒ the DROP committed but the RENAME didn't. */
  private def recoverStrandedSwap(spark: SparkSession, table: String,
      tmp: String): Unit =
    if (spark.catalog.tableExists(tmp)) {
      if (!spark.catalog.tableExists(table))
        spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
      else
        spark.sql(s"DROP TABLE $tmp") // stale leftover from a pre-DROP crash
    }

  def compactTable(spark: SparkSession, table: String,
      targetFileBytes: Long = 128L << 20): Result = {
    recoverStrandedSwap(spark, table, table + "__compact_tmp")
    val before = dataFiles(spark, table)
    val bytes = before.map(_.length).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = table + "__compact_tmp"
    spark.table(table).repartition(n)
      .write.format("parquet").mode("overwrite").saveAsTable(tmp)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.catalog.refreshTable(table)
    Result(before.size, dataFiles(spark, table).size, bytes)
  }
}
