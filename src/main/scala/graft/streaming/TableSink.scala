package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Create-or-append table sink (SURVEY §2.3 K1–K5).
  *
  * The reference writes every batch with
  * `df.write.format("iceberg").option(<CoW props>).partitionBy(cols?)` then
  * `tableExists ? mode("append") : mode("overwrite") .saveAsTable(fqn)`
  * (spark-data-pipeline/spark_job.py:47-64). The sink is a trait because
  * the offline build has no Iceberg runtime jar (SURVEY §7.4): local runs
  * and tests use [[ParquetSink]]; [[IcebergSink]] carries the identical
  * option set and activates when the Iceberg runtime + catalog are on the
  * classpath (prod profile, spark_job.py:126-139 wiring).
  */
trait TableSink {
  def write(df: DataFrame, fqn: String,
      partitionCols: Seq[String] = Nil,
      compression: String = "snappy"): Unit

  /** K3: append when the table exists, otherwise create-by-overwrite —
    * exactly the reference's branch (spark_job.py:59-64). */
  protected def createOrAppend(spark: SparkSession, fqn: String,
      writer: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]): Unit =
    if (spark.catalog.tableExists(fqn)) writer.mode("append").saveAsTable(fqn)
    else writer.mode("overwrite").saveAsTable(fqn)
}

/** Local/test sink: managed parquet table via `saveAsTable`, same
  * create-or-append semantics and compression option as the Iceberg path. */
object ParquetSink extends TableSink {
  def write(df: DataFrame, fqn: String, partitionCols: Seq[String],
      compression: String): Unit = {
    var w = df.write.format("parquet").option("compression", compression)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    createOrAppend(df.sparkSession, fqn, w)
  }
}

/** Prod sink: Iceberg copy-on-write table, option-for-option the
  * reference's writer chain (spark_job.py:47-57). Requires
  * `iceberg-spark-runtime` + a configured SparkCatalog at runtime —
  * compile-time dependency-free (format is resolved by name).
  *
  * The contract surface ([[format]], [[writerOptions]], the catalog wiring
  * in [[graft.core.SparkSessionFactory.icebergCatalogConf]]) is exposed as
  * data so `IcebergContractSpec` can assert it string-for-string against
  * the reference even though no Iceberg jar is available offline. */
object IcebergSink extends TableSink {

  /** spark_job.py:47 — `write.format("iceberg")`. */
  val format = "iceberg"

  /** spark_job.py:49-54, in the reference's chaining order: parquet file
    * format, copy-on-write for all three mutation modes, codec passthrough. */
  def writerOptions(compression: String): Seq[(String, String)] = Seq(
    "write.format.default" -> "parquet",
    "write.delete.mode" -> "copy-on-write",
    "write.update.mode" -> "copy-on-write",
    "write.merge.mode" -> "copy-on-write",
    "write.parquet.compression-codec" -> compression)

  def write(df: DataFrame, fqn: String, partitionCols: Seq[String],
      compression: String): Unit = {
    var w = df.write.format(format)
    writerOptions(compression).foreach { case (k, v) => w = w.option(k, v) }
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    createOrAppend(df.sparkSession, fqn, w)
  }
}
