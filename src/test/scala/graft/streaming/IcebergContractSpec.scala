package graft.streaming

import graft.SparkSpec
import graft.core.SparkSessionFactory

/** No Iceberg runtime jar is available offline (zero egress), so the
  * Iceberg commit path cannot execute here. This spec pins the CONTRACT
  * instead: every option key, mode string, catalog config, and DDL the
  * prod profile would apply, asserted string-for-string against the
  * reference (spark-data-pipeline/spark_job.py). If a runtime jar appears,
  * these same surfaces drive a real create/append/CoW round-trip.
  */
class IcebergContractSpec extends SparkSpec {

  test("writer format and CoW option chain match spark_job.py:47-54 verbatim") {
    assert(IcebergSink.format == "iceberg") // spark_job.py:47
    assert(IcebergSink.writerOptions("snappy") == Seq(
      "write.format.default" -> "parquet",            // spark_job.py:49
      "write.delete.mode" -> "copy-on-write",         // spark_job.py:50
      "write.update.mode" -> "copy-on-write",         // spark_job.py:51
      "write.merge.mode" -> "copy-on-write",          // spark_job.py:52
      "write.parquet.compression-codec" -> "snappy")) // spark_job.py:54
    // compression is a passthrough, not hardcoded (spark_job.py:29,54)
    assert(IcebergSink.writerOptions("zstd").last == ("write.parquet.compression-codec" -> "zstd"))
  }

  test("catalog wiring matches spark_job.py:128-139 key-for-key") {
    val conf = SparkSessionFactory.icebergCatalogConf("lake", "arn:aws:s3:::wh", "eu-west-1").toMap
    assert(conf("spark.sql.catalog.lake") == "org.apache.iceberg.spark.SparkCatalog") // :132
    assert(conf("spark.sql.catalog.lake.client.region") == "eu-west-1")               // :133
    assert(conf("spark.sql.catalog.lake.warehouse") == "arn:aws:s3:::wh")             // :134
    assert(conf("spark.sql.catalog.lake.type") == "glue")                             // :135
    assert(conf("spark.sql.extensions") ==
      "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")            // :136
    // :137 hardcodes `spark.sql.catalog.dev.io-impl` — an evident bug (every
    // other key interpolates catalog_name); ours keys io-impl consistently.
    assert(conf("spark.sql.catalog.lake.io-impl") == "org.apache.iceberg.aws.s3.S3FileIO")
    // :138 — the s3a filesystem endpoint the reference pins alongside the
    // catalog (the only non-catalog key in its session builder).
    assert(conf("spark.hadoop.fs.s3a.endpoint") == "s3.amazonaws.com")
  }

  test("namespace DDL matches spark_job.py:144") {
    assert(SparkSessionFactory.namespaceDdl("lake", "gps") ==
      "CREATE NAMESPACE IF NOT EXISTS lake.gps")
  }

  test("the FULL writer chain executes against a source registered as 'iceberg'") {
    // Round 6: instead of stopping at resolution failure, a test-scope
    // DataSourceRegister ([[FakeIcebergSource]]) claims the short name
    // "iceberg", so IcebergSink.write drives Spark's REAL write path end
    // to end — name resolution, option chain, create-vs-append branch —
    // and the capture proves byte-for-byte what the sink hands Spark.
    import spark.implicits._
    val fqn = "iceberg_contract_probe"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    FakeIcebergSource.reset()
    try {
      IcebergSink.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), fqn, Nil, "zstd")
      assert(spark.catalog.tableExists(fqn), "create branch did not register the table")
      val created = FakeIcebergSource.captures.head
      // spark_job.py:59-64 — nonexistent table => CREATE via mode overwrite
      assert(created.mode == org.apache.spark.sql.SaveMode.Overwrite)
      assert(created.rows == 2 && created.schema.fieldNames.toSeq == Seq("id", "v"))
      // spark_job.py:49-54 — every writer option arrives verbatim
      IcebergSink.writerOptions("zstd").foreach { case (k, v) =>
        assert(created.options.get(k).contains(v), s"option $k lost or rewritten")
      }
      // second write: table now exists => APPEND branch, options unchanged
      IcebergSink.write(Seq((3, "c")).toDF("id", "v"), fqn, Nil, "zstd")
      val appended = FakeIcebergSource.captures.head
      assert(appended.mode == org.apache.spark.sql.SaveMode.Append)
      assert(appended.rows == 1)
      assert(FakeIcebergSource.captures.size == 2)
    } finally spark.sql(s"DROP TABLE IF EXISTS $fqn")
  }

  test("K2: optional identity partition columns flow through the writer") {
    import spark.implicits._
    val fqn = "iceberg_contract_partitioned"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    FakeIcebergSource.reset()
    try {
      IcebergSink.write(
        Seq(("2025-06-15", 1L), ("2025-06-16", 2L)).toDF("dt", "n"),
        fqn, Seq("dt"), "snappy")
      // partitionBy lands in the catalog's partition spec, exactly how the
      // reference's optional partition_cols surface (spark_job.py:56-57)
      val parts = spark.catalog.listColumns(fqn)
        .collect().filter(_.isPartition).map(_.name).toSeq
      assert(parts == Seq("dt"), s"partition spec was $parts")
    } finally spark.sql(s"DROP TABLE IF EXISTS $fqn")
  }

  test("create-or-append branch is shared with the executed parquet path") {
    // K3 semantics (spark_job.py:59-64) live in TableSink.createOrAppend,
    // inherited by BOTH sinks; PipelineSpec exercises it end-to-end through
    // ParquetSink (create on first batch, append on restart). Here: assert
    // the trait method is the single implementation point.
    // (Scala mixes the trait method into each object as a forwarder, so the
    // check is on the trait's declaration, where the single real body lives.)
    val m = classOf[TableSink].getDeclaredMethods.filter(_.getName.contains("createOrAppend"))
    assert(m.nonEmpty, "createOrAppend must be declared on the TableSink trait")
  }
}
