package graft.sources

import graft.SparkSpec
import graft.core.GpsSchema
import org.apache.spark.sql.functions._

class SchemaAlignSpec extends SparkSpec {

  import spark.implicits._

  test("missing column becomes typed null; extra column dropped; order fixed") {
    // A drifted batch: no fuel_level (all-EV batch), plus a new field the
    // producer added, columns in a different order.
    val drifted = Seq(
      ("v1", 1.0, 2.0, 50.0, "N", 80.0, "Fastened", false, false,
        "2025-06-15 10:00:00", "new-firmware")).toDF(
      "vehicle_id", "latitude", "longitude", "speed_kmh", "direction",
      "battery_level", "seat_belt_status", "collision_detected",
      "sudden_braking", "timestamp", "firmware_rev")

    val aligned = SchemaAlign.align(drifted, GpsSchema.schema)
    assert(aligned.columns.toSeq == GpsSchema.schema.fieldNames.toSeq)
    val row = aligned.head()
    assert(row.isNullAt(row.fieldIndex("fuel_level")))
    assert(row.getAs[Double]("speed_kmh") == 50.0)
  }

  test("numeric widening: int-typed JSON batch casts to declared double") {
    val intBatch = Seq((1, 2, 3)).toDF("latitude", "longitude", "speed_kmh")
    val aligned = SchemaAlign.align(intBatch, GpsSchema.schema)
    assert(aligned.schema("speed_kmh").dataType.typeName == "double")
    assert(aligned.head().getAs[Double]("speed_kmh") == 3.0)
  }

  test("strict mode rejects unknown columns by name") {
    val drifted = Seq(("v1", "x")).toDF("vehicle_id", "mystery")
    val e = intercept[IllegalArgumentException] {
      SchemaAlign.align(drifted, GpsSchema.schema, strict = true)
    }
    assert(e.getMessage.contains("mystery"))
  }

  test("aligned drifting batches append into one table") {
    val t = "gps_drift"
    val b1 = Seq(("v1", 10.0)).toDF("vehicle_id", "speed_kmh")
    val b2 = Seq(("v2", 20.0, "fw9")).toDF("vehicle_id", "speed_kmh", "firmware_rev")
    SchemaAlign.align(b1, GpsSchema.schema)
      .write.format("parquet").mode("overwrite").saveAsTable(t)
    SchemaAlign.align(b2, GpsSchema.schema)
      .write.format("parquet").mode("append").saveAsTable(t)
    try {
      assert(spark.table(t).count() == 2)
      assert(spark.table(t).schema == GpsSchema.schema)
    } finally spark.sql(s"DROP TABLE $t")
  }
}
