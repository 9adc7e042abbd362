package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Newline-delimited JSON batch scan (SURVEY §2.1 S7).
  *
  * The reference reads each batch with
  * `spark.read.option("multiline","false").json(batch_files)`
  * (spark-data-pipeline/spark_job.py:109) and no schema — forcing Spark to
  * scan every file TWICE (inference pass, then read pass). At 100 TB that
  * anti-optimization doubles ingest I/O, so the default here is an explicit
  * schema; `inferSchema = true` reproduces the reference's behavior for
  * compatibility tests.
  */
object JsonBatchReader {

  def read(spark: SparkSession, paths: Seq[String],
      schema: Option[StructType]): DataFrame = {
    val reader = spark.read.option("multiline", "false")
    schema.fold(reader)(reader.schema).json(paths: _*)
  }

  def readGps(spark: SparkSession, paths: Seq[String],
      inferSchema: Boolean = false): DataFrame =
    read(spark, paths,
      if (inferSchema) None else Some(graft.core.GpsSchema.schema))
}
