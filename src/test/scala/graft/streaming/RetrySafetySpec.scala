package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Task re-attempt safety (VERDICT r14 #4): the corpus claims
  * partition-independence everywhere, but nothing exercised a mid-query
  * task RE-ATTEMPT. These tests inject a first-attempt failure (a task
  * that throws iff `TaskContext.attemptNumber == 0`) under a
  * shuffle-heavy query and under the real ingest pipeline, and assert
  * the output is identical to a clean run — the speculation/retry
  * determinism a 1000-executor cluster relies on (Spark reruns whole
  * partitions; any per-attempt nondeterminism that ESCAPES the retried
  * stage becomes silent corruption — the q355 `input_file_name` class).
  *
  * Requires SparkSpec's `local[4, 2]` master (maxFailures = 2, one
  * re-attempt). Injection state lives in a JVM-global object — valid in
  * local mode, where executors share the driver JVM.
  */
object RetryInjector {
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
  val fired = new java.util.concurrent.atomic.AtomicInteger(0)
  def arm(): Unit = { armed.set(true) }
  def maybeFail(): Unit = {
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber == 0 && armed.compareAndSet(true, false)) {
      fired.incrementAndGet()
      throw new RuntimeException(
        "graft-retry-probe: injected first-attempt task failure")
    }
  }
}

class RetrySafetySpec extends SparkSpec {

  /** Wrap a frame so the first task attempt that scans it fails once. */
  private def injectOnce(df: DataFrame): DataFrame = {
    val schema = df.schema
    val rdd = df.rdd.mapPartitionsWithIndex { (_, it) =>
      RetryInjector.maybeFail()
      it
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  test("shuffle-heavy aggregate + join is identical under a task re-attempt") {
    def pipeline(inject: Boolean): Array[org.apache.spark.sql.Row] = {
      val li0 = Tables.lineitem(spark, sf)
      val li = if (inject) injectOnce(li0) else li0
      val ord = Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_orderpriority"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(38,2)")).as("qty"),
          sum((col("l_extendedprice") * 100).cast("long")).as("price_c"))
        .orderBy(col("l_returnflag"), col("o_orderpriority"))
        .collect()
    }
    val clean = pipeline(inject = false)
    RetryInjector.arm()
    val before = RetryInjector.fired.get()
    val retried = pipeline(inject = true)
    assert(RetryInjector.fired.get() == before + 1,
      "the injected failure never fired — the probe tested nothing")
    assert(retried.toSeq == clean.toSeq)
  }

  test("ingest pipeline output is identical under a task re-attempt") {
    // The real MicroBatchPipeline over generated JSON files, clean vs
    // injected. The injection rides the reference's arbitrary-SQL
    // enrichment path as a no-op predicate UDF, so the failure fires
    // inside the streaming batch's write stage. processed_time/_date are
    // wall-clock (the reference's semantics — Catalyst computes them
    // once per batch, re-attempt-safe by construction) and differ
    // BETWEEN runs, so the cross-run compare covers every other column;
    // within the injected run the clock columns must still be single-
    // valued per batch (re-attempt produced no second timestamp).
    spark.udf.register("graft_retry_probe", (v: String) => {
      RetryInjector.maybeFail(); v
    })
    val base = tmpDir("graft-retry-ingest")
    val rows = 3000L
    graft.sources.GpsGenerator.writeJsonFiles(spark, s"$base/in", rows, files = 12)
    val injectedSql = """
      SELECT
      *,
      input_file_name() as input_file,
      current_timestamp as processed_time,
      DATE_FORMAT(current_timestamp, 'yyyy-MM-dd') as processed_date
      FROM
      temp_view
      WHERE graft_retry_probe(vehicle_id) IS NOT NULL
    """
    def run(table: String, sql: String): DataFrame = {
      MicroBatchPipeline.runAvailable(spark, MicroBatchPipeline.Config(
        inputDir = s"$base/in", checkpointDir = s"$base/ckpt_$table",
        table = table, sqlQuery = Some(sql)))
      spark.table(table)
    }
    val clean = run("graft_retry_clean", Enrichment.defaultSql)
    RetryInjector.arm()
    val before = RetryInjector.fired.get()
    val retried = run("graft_retry_injected", injectedSql)
    assert(RetryInjector.fired.get() == before + 1,
      "the injected failure never fired — the probe tested nothing")
    // deterministic columns: everything except the batch wall clock;
    // input_file normalized to basename (same files, same dir here, but
    // the basename is the stable identity)
    def canon(df: DataFrame) = df
      .withColumn("input_file",
        regexp_extract(col("input_file"), "[^/]+$", 0))
      .drop("processed_time", "processed_date")
      .orderBy(col("vehicle_id"), col("timestamp"), col("latitude"),
        col("longitude"), col("speed_kmh"), col("battery_level"))
      .collect()
    assert(retried.count() == rows, "re-attempt duplicated or lost rows")
    assert(canon(retried).toSeq == canon(clean).toSeq)
    // re-attempt produced no second clock value and no empty attribution
    assert(retried.select(countDistinct(col("processed_time")))
      .head().getLong(0) <= 2, // AvailableNow may split into >1 batch
      "a re-attempt re-evaluated the batch clock")
    assert(retried.filter(col("input_file") === "" ||
      col("input_file").isNull).count() == 0,
      "a re-attempt lost scan-time file attribution (the q355 class)")
    spark.sql("DROP TABLE graft_retry_clean")
    spark.sql("DROP TABLE graft_retry_injected")
  }
}
