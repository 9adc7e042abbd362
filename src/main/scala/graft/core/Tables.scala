package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided analytical tables (TESTDATA.md /
  * FIXTURES.md §B): one parquet file per table under `$dir/`.
  *
  * Parquet carries its own schema, so no inference pass happens here
  * (unlike the reference's `spark.read.json` double-read,
  * spark-data-pipeline/spark_job.py:109). Filters/projections composed on
  * top of these scans push down to the parquet reader via Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as either parquet TIMESTAMP(NANOS) or
    * TIMESTAMP(MICROS) depending on the generator version. NANOS is
    * rejected by Spark's vectorized reader ([PARQUET_TYPE_ILLEGAL]), so it
    * is read as raw nanos (legacy.parquet.nanosAsLong) and truncated to
    * micros with integer division — the same ns→µs truncation DuckDB
    * applies, so event-time values agree across engines to the
    * microsecond. MICROS reads natively (as TIMESTAMP_NTZ when
    * isAdjustedToUTC=false) and only needs a cast to the session-UTC
    * TIMESTAMP type every downstream query expects; the legacy flag is a
    * no-op for it. `events()` dispatches on the post-read column type.
    *
    * The legacy conf has no per-read DataFrameReader option, so it is set
    * on the session only for the duration of this call and then restored —
    * leaving it set would silently change how every other nanos-timestamp
    * parquet in the session is read. Restoring after `spark.read.parquet`
    * is safe for the later (lazy) execution: the reader's hadoopConf is
    * captured at relation creation, inside this window. */
  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val prev = spark.conf.getOption(NanosKey)
    spark.conf.set(NanosKey, "true")
    try spark.read.parquet(s"$dir/events.parquet")
    finally prev match {
      case Some(v) => spark.conf.set(NanosKey, v)
      case None    => spark.conf.unset(NanosKey)
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = eventsRaw(s, d)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Spread a DataFrame across the session's cores when the source arrived
    * under-parallelized (a small parquet = one split, which serializes any
    * compute-heavy map stage on one core). No-op when the scan already has
    * enough splits — i.e., at real scale. Use ahead of expensive per-row
    * kernels (shingling, signatures), not cheap scans. */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** Register every table as a temp view (for spark.sql-path queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
