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
  * compile-time dependency-free (format is resolved by name). */
object IcebergSink extends TableSink {
  def write(df: DataFrame, fqn: String, partitionCols: Seq[String],
      compression: String): Unit = {
    var w = df.write.format("iceberg")
      .option("write.format.default", "parquet")
      .option("write.delete.mode", "copy-on-write")
      .option("write.update.mode", "copy-on-write")
      .option("write.merge.mode", "copy-on-write")
      .option("write.parquet.compression-codec", compression)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    createOrAppend(df.sparkSession, fqn, w)
  }
}
