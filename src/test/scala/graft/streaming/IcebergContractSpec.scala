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

  test("write path executes the chain up to Iceberg source resolution") {
    // With no jar on the classpath the write must fail AT FORMAT RESOLUTION
    // (proving the sink actually routes through format("iceberg") and not a
    // silent fallback), not succeed as some other format.
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "v")
    val e = intercept[Exception] {
      IcebergSink.write(df, "iceberg_contract_probe", Nil, "snappy")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.toLowerCase.contains("iceberg")),
      s"expected failure to name the iceberg source, got: ${messages(e).mkString(" | ")}")
    assert(!spark.catalog.tableExists("iceberg_contract_probe"))
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
