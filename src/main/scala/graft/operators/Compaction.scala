package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction for managed parquet tables.
  *
  * A streaming sink appending every 10 s writes ~8640 files/day/partition;
  * at 100 TB the resulting file-listing and per-file open costs dominate
  * scan time long before data volume does. Compaction rewrites a table to
  * ~targetFileBytes-sized files: count = ceil(bytes / target), rewrite via
  * a temp table, then a DROP + RENAME swap via [[TableSwap]] (shared with
  * [[Upsert]]; see there for the non-atomicity + crash-recovery contract).
  * The Iceberg-prod equivalent is `rewrite_data_files`; this is the
  * ParquetSink-side dual.
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

  def compactTable(spark: SparkSession, table: String,
      targetFileBytes: Long = 128L << 20): Result = {
    TableSwap.recover(spark, table) // finish any swap a crash left half-done
    val before = dataFiles(spark, table)
    val bytes = before.map(_.length).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    TableSwap.rewrite(spark, table, spark.table(table).repartition(n))
    Result(before.size, dataFiles(spark, table).size, bytes)
  }
}
