package graft.sources

import graft.core.GpsSchema
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic GPS telemetry — the engine-side equivalent of the
  * reference's producer loop (producer/gps-tracking-simulation.py:50-82):
  * 20 fixed vehicle ids; lat ∈ [-90,90], lon ∈ [-180,180], speed ∈ [0,120];
  * 8-way direction enum; `fuel_level` null for the EV subset of the fleet
  * (producer:61-62); battery ∈ [10,100]; seat-belt enum; collision ~1/6
  * true; braking ~1/4 true; wall-clock 'yyyy-MM-dd HH:mm:ss' timestamp
  * string.
  *
  * Unlike the reference's driver-side `random`/Faker loop, records derive
  * from `spark.range(n)` + xxhash64-keyed column expressions: every field is
  * a pure function of (row id, seed), so output is identical regardless of
  * partitioning, cluster layout, or replays — generation distributes across
  * executors and scales to any n without driver materialization.
  */
object GpsGenerator {

  /** Uniform double in [lo, hi) with `dp` decimal places, keyed by (id, seed, tag). */
  private def uniform(tag: Int, seed: Long, lo: Double, hi: Double, dp: Int): Column = {
    val u = pmod(xxhash64(col("id"), lit(seed), lit(tag)), lit(1000000L))
      .cast("double") / 1000000.0d
    round(lit(lo) + u * (hi - lo), dp)
  }

  private def pick(tag: Int, seed: Long, values: Seq[String]): Column = {
    val idx = pmod(xxhash64(col("id"), lit(seed), lit(tag)), lit(values.size.toLong))
    element_at(array(values.map(lit): _*), (idx + 1).cast("int"))
  }

  /** `n` records as a DataFrame in [[GpsSchema.schema]] column order.
    *
    * `baseEpoch` seconds anchor the timestamp column (one record per second
    * per the producer's loop cadence); passing a fixed value keeps golden
    * tests deterministic — the reference's wall-clock call
    * (producer:58) is the non-reproducible part we make injectable.
    */
  def batch(spark: SparkSession, n: Long, seed: Long = 42L,
      baseEpoch: Long = 1750000000L): DataFrame = {
    val fleetSize = 20
    // vehicle_id: 8-hex-char stable id per vehicle slot (producer:21 uses
    // uuid4 prefixes; ours are reproducible).
    val vehicleSlot = pmod(xxhash64(col("id"), lit(seed), lit(0)), lit(fleetSize.toLong))
    val vehicleId = lpad(hex(xxhash64(vehicleSlot, lit(seed))).substr(1, 8), 8, "0")
    // ~25% of the fleet is EV => fuel_level null (producer:61-62 is_ev).
    val isEv = pmod(xxhash64(vehicleSlot, lit(seed), lit(1)), lit(4L)) === 0

    spark.range(n).select(
      uniform(2, seed, 10, 100, 2).as("battery_level"),
      (pmod(xxhash64(col("id"), lit(seed), lit(3)), lit(6L)) === 0).as("collision_detected"),
      pick(4, seed, GpsSchema.directions).as("direction"),
      when(isEv, lit(null).cast("double"))
        .otherwise(uniform(5, seed, 0, 100, 2)).as("fuel_level"),
      uniform(6, seed, -90, 90, 6).as("latitude"),
      uniform(7, seed, -180, 180, 6).as("longitude"),
      pick(8, seed, GpsSchema.seatBeltStates).as("seat_belt_status"),
      uniform(9, seed, 0, 120, 2).as("speed_kmh"),
      (pmod(xxhash64(col("id"), lit(seed), lit(10)), lit(4L)) === 0).as("sudden_braking"),
      date_format(timestamp_seconds(lit(baseEpoch) + col("id")),
        "yyyy-MM-dd HH:mm:ss").as("timestamp"),
      vehicleId.as("vehicle_id"))
  }

  /** Write `n` records as `files` newline-delimited JSON files under `dir` —
    * the on-disk shape Firehose produces for the Spark job to read
    * (infra.tf:32-39: buffered newline-delimited .json objects). */
  def writeJsonFiles(spark: SparkSession, dir: String, n: Long, files: Int,
      seed: Long = 42L, baseEpoch: Long = 1750000000L): Unit =
    batch(spark, n, seed, baseEpoch)
      .repartition(files)
      .write.mode("overwrite").json(dir)
}
