package graft.streaming

import graft.core.GpsSchema
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The ingest pipeline (SURVEY §2.4 O1–O4), Spark-first.
  *
  * The reference drives ingest with a hand-rolled `while True` loop: SQS
  * long-poll → envelope parse → `spark.read.json` → enrich → Iceberg append
  * → delete SQS messages → sleep 10 s (spark-data-pipeline/
  * spark_job.py:172-188, poller.py:16-47). Delivery is at-least-once: a
  * crash between the table commit and the SQS delete re-processes the same
  * files and duplicates rows.
  *
  * Here the S3→SQS notification hop disappears: Spark's file stream source
  * does its own new-file listing, and checkpointed offsets + idempotent
  * batch handling give exactly-once per micro-batch — strictly stronger
  * than the reference (SURVEY §2.4 O2). The 10 s poll cadence maps to
  * `Trigger.ProcessingTime`; the ≤10-messages batch bound maps to
  * `maxFilesPerTrigger`; the empty-batch skip (spark_job.py:94-96) maps to
  * the `isEmpty` guard in `foreachBatch` (the source already emits only
  * new files, so the guard only matters for zero-record files).
  *
  * At 100 TB/day this shape holds: file listing is incremental (checkpoint
  * remembers seen files), each micro-batch is a bounded parquet write, and
  * nothing materializes on the driver but file names.
  */
object MicroBatchPipeline {

  /** Scan-time file attribution column, present only in quarantine mode
    * (see the source construction in [[start]]): folded into the
    * enriched main table's `input_file` and kept as `src_file` on DLQ
    * rows. */
  val SrcFileCol = "_src_file"

  final case class Config(
      inputDir: String,
      checkpointDir: String,
      table: String,
      partitionCols: Seq[String] = Nil, // reference intent: direction, seat_belt_status (spark_job.py:153)
      compression: String = "snappy",
      maxFilesPerTrigger: Int = 10, // ≙ SQS batch_size=10 (spark_job.py:173)
      processingInterval: Option[String] = Some("10 seconds"), // ≙ sleep(10); None => AvailableNow
      sqlQuery: Option[String] = Some(Enrichment.defaultSql),
      clockEpochSec: Option[Long] = None,
      // true => stamp rows with the micro-batch id and commit via dynamic
      // partition overwrite (IdempotentParquetSink): replaying a batch
      // after a crash between table write and checkpoint commit replaces
      // its own partition instead of double-appending. Default false keeps
      // the reference's plain-append table layout.
      idempotentCommit: Boolean = false,
      // Some(table) => malformed JSON lines are captured (PERMISSIVE +
      // explicit _corrupt_record, JsonBatchReader.readAccounted's
      // streaming twin) and appended to that quarantine table with their
      // batch id, instead of flowing into the main table as all-null
      // rows — the reference's silent-loss behavior (§1.3) made
      // auditable. None (default) keeps the original schema and plan.
      quarantineTable: Option[String] = None)

  /** Start the stream: JSON file source (explicit schema — no inference
    * double-read) → enrichment → create-or-append sink. */
  def start(spark: SparkSession, config: Config,
      sink: TableSink = ParquetSink): StreamingQuery = {
    val corruptCol = graft.sources.JsonBatchReader.CorruptCol
    val schema =
      if (config.quarantineTable.isDefined)
        GpsSchema.schema.add(corruptCol, org.apache.spark.sql.types.StringType)
      else GpsSchema.schema
    val source0 = spark.readStream
      .schema(schema)
      .option("multiline", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("maxFilesPerTrigger", config.maxFilesPerTrigger)
      .json(config.inputDir)
    // Quarantine mode caches each batch to split it (withSplitAccounted),
    // and input_file_name() evaluates EMPTY on rows scanned back from a
    // cache — so file attribution must bind at SCAN time or the enriched
    // table silently loses it (caught by the q355 ingest law, round 14).
    // The captured column also rides the DLQ rows: a quarantined line
    // without its source file is operationally useless.
    val source =
      if (config.quarantineTable.isDefined)
        source0.withColumn(SrcFileCol,
          org.apache.spark.sql.functions.input_file_name())
      else source0

    val trigger = config.processingInterval
      .map(Trigger.ProcessingTime(_))
      .getOrElse(Trigger.AvailableNow())

    // Inline ingest metrics (Dataset.observe): per-batch row and
    // malformed-line counts ride the StreamingQueryProgress events —
    // the ops dashboard feed — without any extra pass over the data.
    val observed = {
      import org.apache.spark.sql.functions.{count, lit, sum, when, col}
      val metrics =
        if (config.quarantineTable.isDefined)
          Seq(count(lit(1)).as("rows_in"),
            sum(when(col(corruptCol).isNotNull, 1L).otherwise(0L))
              .as("rows_bad"))
        else Seq(count(lit(1)).as("rows_in"))
      source.observe("ingest_metrics", metrics.head, metrics.tail: _*)
    }

    observed.writeStream
      .option("checkpointLocation", config.checkpointDir)
      .trigger(trigger)
      .foreachBatch { (raw: org.apache.spark.sql.DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{col, lit}
        def writeMain(batch: org.apache.spark.sql.DataFrame): Unit =
          if (!batch.isEmpty) {
            val hasSrcFile = batch.columns.contains(SrcFileCol)
            val enriched0 = config.clockEpochSec match {
              // Injected clock => deterministic column-DSL path (golden tests).
              case Some(_) => Enrichment.enrich(batch, config.clockEpochSec)
              case None    => Enrichment.enrichSql(batch, config.sqlQuery)
            }
            // quarantine mode: enrichment's own input_file_name() saw a
            // cache scan (empty) — fold in the scan-time attribution
            val enriched =
              if (hasSrcFile)
                enriched0.withColumn("input_file", col(SrcFileCol))
                  .drop(SrcFileCol)
              else enriched0
            if (config.idempotentCommit)
              IdempotentParquetSink.write(enriched, config.table, batchId,
                config.partitionCols, config.compression)
            else
              sink.write(enriched, config.table, config.partitionCols, config.compression)
            if (config.sqlQuery.isDefined && config.clockEpochSec.isEmpty)
              // The view lives in the batch's (cloned) session catalog.
              batch.sparkSession.catalog.dropTempView("temp_view") // spark_job.py:68-69
          }
        config.quarantineTable match {
          case Some(qt) =>
            // the shared split helper owns the batch-sized cache (the
            // corrupt-column query restriction recipe) and unpersists it
            // when both writes are done
            graft.sources.JsonBatchReader.withSplitAccounted(raw) { (good, badRows) =>
              val bad = badRows.select(col(corruptCol).as("raw_line"),
                col(SrcFileCol).as("src_file"))
              if (!bad.isEmpty) {
                if (config.idempotentCommit)
                  // same replay contract as the main table: a crash
                  // between this write and the checkpoint commit replays
                  // the batch, and the batch_id partition overwrite
                  // replaces the same quarantine rows instead of
                  // double-appending them
                  IdempotentParquetSink.write(bad, qt, batchId)
                else
                  // plain-append mode keeps the reference's
                  // at-least-once table semantics on BOTH tables;
                  // batch_id still recorded so replays are attributable
                  bad.withColumn("batch_id", lit(batchId))
                    .write.format("parquet").mode("append").saveAsTable(qt)
              }
              writeMain(good)
            }
          case None => writeMain(raw)
        }
        ()
      }
      .start()
  }

  /** Run to completion over the files currently in `inputDir` and return —
    * batch-style execution of the same pipeline (used by tests and
    * backfills).
    *
    * The micro-batch executes in a cloned session, so appends refresh the
    * clone's relation cache, not the caller's; the explicit refresh below
    * gives the launching session read-your-writes. (Other concurrent
    * sessions still need their own `refreshTable` — standard Spark
    * cross-session visibility.) */
  def runAvailable(spark: SparkSession, config: Config,
      sink: TableSink = ParquetSink): Unit = {
    val q = start(spark, config.copy(processingInterval = None), sink)
    q.awaitTermination()
    if (spark.catalog.tableExists(config.table))
      spark.catalog.refreshTable(config.table)
  }
}
