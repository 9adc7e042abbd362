package graft.streaming

import graft.SparkSpec
import graft.core.GpsSchema
import graft.sources.{GpsGenerator, JsonBatchReader}
import org.apache.spark.sql.functions._

/** SURVEY §7.2 minimum end-to-end slice + checkpoint exactly-once. */
class PipelineSpec extends SparkSpec {

  test("generator is deterministic and matches the producer's domains") {
    val df = GpsGenerator.batch(spark, 2000, seed = 42).cache()
    assert(df.count() == 2000)
    assert(df.columns.toSeq == GpsSchema.schema.fieldNames.toSeq)
    val stats = df.agg(
      countDistinct(col("vehicle_id")).as("fleet"),
      min(col("latitude")).as("minLat"), max(col("latitude")).as("maxLat"),
      min(col("speed_kmh")).as("minSp"), max(col("speed_kmh")).as("maxSp"),
      sum(when(col("fuel_level").isNull, 1).otherwise(0)).as("nullFuel"),
      countDistinct(col("direction")).as("dirs")).head()
    assert(stats.getAs[Long]("fleet") == 20)
    assert(stats.getAs[Double]("minLat") >= -90 && stats.getAs[Double]("maxLat") <= 90)
    assert(stats.getAs[Double]("minSp") >= 0 && stats.getAs[Double]("maxSp") <= 120)
    assert(stats.getAs[Long]("nullFuel") > 0) // EV subset emits null fuel
    assert(stats.getAs[Long]("dirs") == 8)
    // Determinism: same seed => identical content; different seed => different.
    assert(GpsGenerator.batch(spark, 2000, 42).exceptAll(df).isEmpty)
    assert(!GpsGenerator.batch(spark, 2000, 43).exceptAll(df).isEmpty)
  }

  test("end-to-end slice: JSON files -> stream -> enrich -> table -> query") {
    val in = tmpDir("gps-in")
    val table = "gps_e2e"
    GpsGenerator.writeJsonFiles(spark, in, n = 3000, files = 6)

    MicroBatchPipeline.runAvailable(spark, MicroBatchPipeline.Config(
      inputDir = in, checkpointDir = tmpDir("gps-ckpt"), table = table,
      clockEpochSec = Some(1750000000L)))

    val out = spark.table(table).cache()
    assert(out.count() == 3000)
    // Enrichment columns (T3-T5) present and correct.
    assert(out.columns.toSet ==
      GpsSchema.schema.fieldNames.toSet ++ Set("input_file", "processed_time", "processed_date"))
    assert(out.where(col("processed_date") === "2025-06-15").count() == 3000)
    assert(out.where(col("input_file").contains(in.split("/").last)).count() == 3000)
    // The §7.2 acceptance query.
    val agg = out.groupBy(col("direction"))
      .agg(count(lit(1)).as("n"), avg(col("speed_kmh")).as("avg_speed"))
    assert(agg.count() == 8)
    assert(agg.agg(sum(col("n"))).head().getLong(0) == 3000)
    spark.sql(s"DROP TABLE $table")
  }

  test("quarantine path: malformed lines reach the quarantine table, never the main table") {
    val in = tmpDir("gps-quar-in")
    val table = "gps_quarantine_main"
    val qt = "gps_quarantine_bad"
    GpsGenerator.writeJsonFiles(spark, s"$in/good", n = 200, files = 1)
    val badLines = Seq(
      """{"vehicle_id": "veh_7", "timestamp": BROKEN}""",
      "not json at all")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in).resolve("bad.json"),
      badLines.mkString("\n").getBytes("UTF-8"))
    try {
      MicroBatchPipeline.runAvailable(spark, MicroBatchPipeline.Config(
        inputDir = s"$in/{good/*,*.json}", checkpointDir = tmpDir("gps-quar-ckpt"),
        table = table, clockEpochSec = Some(1750000000L),
        quarantineTable = Some(qt)))
      spark.catalog.refreshTable(qt)
      assert(spark.table(table).count() == 200,
        "malformed lines leaked into the main table (or good rows lost)")
      val bad = spark.table(qt).select(col("raw_line"))
        .collect().map(_.getString(0)).toSet
      assert(bad == badLines.toSet, s"quarantine content: $bad")
      // without quarantine, the same input silently nulls the bad rows in
      val table2 = "gps_quarantine_off"
      MicroBatchPipeline.runAvailable(spark, MicroBatchPipeline.Config(
        inputDir = s"$in/{good/*,*.json}", checkpointDir = tmpDir("gps-quar-ckpt2"),
        table = table2, clockEpochSec = Some(1750000000L)))
      assert(spark.table(table2).where(col("vehicle_id").isNull).count() == 2,
        "expected the reference's silent-null behavior without a quarantine")
      spark.sql(s"DROP TABLE $table2")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS $qt")
    }
  }

  test("quarantine replay under idempotentCommit replaces, never double-appends") {
    val in = tmpDir("gps-quar-idem-in")
    val table = "gps_quar_idem_main"
    val qt = "gps_quar_idem_bad"
    GpsGenerator.writeJsonFiles(spark, s"$in/good", n = 50, files = 1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in).resolve("bad.json"),
      "not json at all".getBytes("UTF-8"))
    def run(ckpt: String): Unit =
      MicroBatchPipeline.runAvailable(spark, MicroBatchPipeline.Config(
        inputDir = s"$in/{good/*,*.json}", checkpointDir = ckpt,
        table = table, clockEpochSec = Some(1750000000L),
        idempotentCommit = true, quarantineTable = Some(qt)))
    try {
      run(tmpDir("gps-quar-idem-ckpt1"))
      // simulate the crash-after-write-before-commit replay: a FRESH
      // checkpoint re-delivers the same files as the same batch ids —
      // the batch_id partition overwrite must replace, not append, on
      // BOTH tables (this is the quarantine half of the contract)
      run(tmpDir("gps-quar-idem-ckpt2"))
      spark.catalog.refreshTable(qt)
      spark.catalog.refreshTable(table)
      assert(spark.table(table).count() == 50, "main table double-appended")
      assert(spark.table(qt).count() == 1, "quarantine table double-appended")
      assert(spark.table(qt).columns.contains("batch_id"),
        "quarantine rows lost their batch attribution")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS $qt")
    }
  }

  test("observed ingest metrics ride the streaming progress events") {
    val in = tmpDir("gps-obs-in")
    val table = "gps_obs_main"
    val qt = "gps_obs_bad"
    GpsGenerator.writeJsonFiles(spark, s"$in/good", n = 100, files = 1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in).resolve("bad.json"),
      "broken {".getBytes("UTF-8"))
    try {
      val q = MicroBatchPipeline.start(spark, MicroBatchPipeline.Config(
        inputDir = s"$in/{good/*,*.json}", checkpointDir = tmpDir("gps-obs-ckpt"),
        table = table, clockEpochSec = Some(1750000000L),
        processingInterval = None, quarantineTable = Some(qt)))
      q.awaitTermination()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ingest_metrics")))
      assert(metrics.nonEmpty, "no observed metrics in progress events")
      assert(metrics.map(_.getAs[Long]("rows_in")).sum == 101)
      assert(metrics.map(_.getAs[Long]("rows_bad")).sum == 1)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS $qt")
    }
  }

  test("checkpoint gives exactly-once across restarts; new files append once") {
    val in = tmpDir("gps-in2")
    val ckpt = tmpDir("gps-ckpt2")
    val table = "gps_eo"
    val config = MicroBatchPipeline.Config(
      inputDir = in, checkpointDir = ckpt, table = table,
      clockEpochSec = Some(1750000000L))

    GpsGenerator.writeJsonFiles(spark, s"$in/b1", 500, 2, seed = 1)
    // json writer emits _SUCCESS etc. at the top; stream reads the subdirs
    // via glob on the parent only if configured — write batches as sibling
    // dirs and point the stream at a glob.
    val globConfig = config.copy(inputDir = s"$in/*")
    MicroBatchPipeline.runAvailable(spark, globConfig)
    assert(spark.table(table).count() == 500)

    // Restart with no new data: checkpoint must prevent reprocessing.
    MicroBatchPipeline.runAvailable(spark, globConfig)
    assert(spark.table(table).count() == 500)

    // New files: appended exactly once, old files not re-read.
    GpsGenerator.writeJsonFiles(spark, s"$in/b2", 300, 2, seed = 2)
    MicroBatchPipeline.runAvailable(spark, globConfig)
    assert(spark.table(table).count() == 800)
    spark.sql(s"DROP TABLE $table")
  }

  test("q70 gate query: deterministic per-direction enrichment profile") {
    val q = graft.SparkEntry.queries("q70_gps_enrich_agg")
    val out = q(spark, "/root/testdata/sf0.001").cache()
    assert(out.count() == 8)
    assert(out.agg(sum(col("n_fixes"))).head().getLong(0) == 6000L)
    assert(out.select("processed_date").distinct().head().getString(0) == "2025-06-15")
    assert(q(spark, "/root/testdata/sf0.001").exceptAll(out).isEmpty)
  }

  test("default config (SQL path, wall clock) runs end-to-end in foreachBatch") {
    // Regression: foreachBatch hands the batch over on the stream's CLONED
    // session. enrichSql must run the query (and the caller must drop the
    // view) on the batch's own session, or the default Config throws
    // TABLE_OR_VIEW_NOT_FOUND on the first non-empty batch.
    val in = tmpDir("gps-in4")
    val table = "gps_sqlpath"
    GpsGenerator.writeJsonFiles(spark, in, n = 400, files = 2)
    MicroBatchPipeline.runAvailable(spark, MicroBatchPipeline.Config(
      inputDir = in, checkpointDir = tmpDir("gps-ckpt4"), table = table))
    val out = spark.table(table)
    assert(out.count() == 400)
    assert(out.columns.toSet ==
      GpsSchema.schema.fieldNames.toSet ++ Set("input_file", "processed_time", "processed_date"))
    // Wall-clock enrichment: values are non-deterministic but must be present.
    assert(out.where(col("processed_time").isNull).count() == 0)
    assert(out.where(col("processed_date").isNull).count() == 0)
    spark.sql(s"DROP TABLE $table")
  }

  test("idempotent commit: replaying a committed batch does not duplicate rows") {
    // The crash window plain append cannot close: table write done,
    // checkpoint offset not committed, stream restarts and re-runs the
    // batch. With idempotentCommit the re-run must REPLACE partition
    // batch_id=N, leaving counts and content unchanged.
    val in = tmpDir("gps-in5")
    val table = "gps_idem"
    GpsGenerator.writeJsonFiles(spark, in, n = 300, files = 2,
      baseEpoch = 1750000000L)
    MicroBatchPipeline.runAvailable(spark, MicroBatchPipeline.Config(
      inputDir = in, checkpointDir = tmpDir("gps-ckpt5"), table = table,
      clockEpochSec = Some(1750000000L), idempotentCommit = true))
    val afterFirst = spark.table(table).count()
    assert(afterFirst == 300)
    val batchIds = spark.table(table).select("batch_id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(batchIds.size == 1, "2 files under maxFilesPerTrigger=10 => one batch")

    // Simulate the replay: re-commit the SAME batch id with the same data
    // directly through the sink (what a restarted stream would do).
    val replay = Enrichment.enrich(
      graft.sources.JsonBatchReader.readGps(spark,
        new java.io.File(in).listFiles().filter(_.getName.endsWith(".json"))
          .map(_.getAbsolutePath).sorted.toSeq),
      clockEpochSec = Some(1750000000L))
    IdempotentParquetSink.write(replay, table, batchIds.head)
    spark.catalog.refreshTable(table)
    assert(spark.table(table).count() == afterFirst,
      "replaying a committed batch changed the row count")
    assert(spark.table(table).select("batch_id").distinct().count() == 1)
    spark.sql(s"DROP TABLE $table")
  }

  test("idempotent sink refuses a table it did not create") {
    // A table created by plain ParquetSink has no batch_id partition level;
    // a positional insertInto with dynamic overwrite against it would
    // misplace rows silently. The sink must fail loudly instead.
    import spark.implicits._
    val table = "gps_idem_foreign"
    ParquetSink.write(Seq((1L, "a")).toDF("id", "v"), table, Nil, "snappy")
    val e = intercept[IllegalArgumentException] {
      IdempotentParquetSink.write(Seq((2L, "b")).toDF("id", "v"), table, 0L)
    }
    assert(e.getMessage.contains("not partitioned by 'batch_id'"))
    spark.catalog.refreshTable(table)
    assert(spark.table(table).count() == 1, "failed write must not mutate the table")
    spark.sql(s"DROP TABLE $table")
  }

  test("sink validation cache is invalidated by a TableSwap drop-recreate") {
    // Regression for the cache-staleness window: once a table passed the
    // batch_id partition-spec guard, the per-JVM cache skipped it forever —
    // so a TableSwap.rewrite that replaced the table with a NON-batch_id
    // layout under the same name let the positional dynamic overwrite run
    // unguarded. The swap must invalidate, and the next write must fail
    // the re-run guard loudly.
    import spark.implicits._
    val table = "gps_idem_swapped"
    IdempotentParquetSink.write(Seq((1L, "a")).toDF("id", "v"), table, 0L)
    IdempotentParquetSink.write(Seq((2L, "b")).toDF("id", "v"), table, 1L) // cache hit
    assert(spark.table(table).count() == 2)
    graft.operators.TableSwap.rewrite(spark, table,
      Seq((9L, "z")).toDF("id", "v")) // plain layout: no batch_id partition
    val e = intercept[IllegalArgumentException] {
      IdempotentParquetSink.write(Seq((3L, "c")).toDF("id", "v"), table, 2L)
    }
    assert(e.getMessage.contains("not partitioned by 'batch_id'"))
    spark.catalog.refreshTable(table)
    assert(spark.table(table).count() == 1, "guarded write must not mutate the table")
    spark.sql(s"DROP TABLE $table")
  }

  test("explicit-schema read equals reference's inference read") {
    val in = tmpDir("gps-in3")
    GpsGenerator.writeJsonFiles(spark, in, 400, 2)
    val files = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".json")).map(_.getAbsolutePath).toSeq
    val explicit = JsonBatchReader.readGps(spark, files)
    val inferred = JsonBatchReader.readGps(spark, files, inferSchema = true)
    assert(explicit.schema == inferred.schema)
    assert(explicit.exceptAll(inferred).isEmpty &&
      inferred.exceptAll(explicit).isEmpty)
  }

  test("SQL enrichment path (reference default query) matches column DSL") {
    val df = GpsGenerator.batch(spark, 100)
    val viaSql = Enrichment.enrichSql(df, Some(Enrichment.defaultSql))
    val viaDsl = Enrichment.enrich(df)
    assert(viaSql.schema.fieldNames.toSeq == viaDsl.schema.fieldNames.toSeq)
    // Non-deterministic cols (clock, file) excluded from the value compare.
    val keep = GpsSchema.schema.fieldNames.map(col).toSeq
    assert(viaSql.select(keep: _*).exceptAll(viaDsl.select(keep: _*)).isEmpty)
    spark.catalog.dropTempView("temp_view")
  }
}
