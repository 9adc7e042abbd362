package graft.queries

import graft.sources.GpsGenerator
import graft.streaming.Enrichment
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's own pipeline surface as a gate-checked query: generate
  * the producer's telemetry (S1), enrich with the reference's exact
  * transformation (T2–T5, fixed clock for determinism), aggregate per
  * direction — the SURVEY §7.2 acceptance query. No parquet input, so no
  * SQL oracle (rows-only driver check); PipelineSpec asserts golden values
  * through the full streaming path. */
object Gps {
  val defs: Seq[(String, QueryDef)] = Seq(
    "q70_gps_enrich_agg" -> QueryDef(
      build = (spark, dir) => {
        val n = if (dir.contains("sf0.1")) 600000L
          else if (dir.contains("sf0.01")) 60000L else 6000L
        val enriched = Enrichment.enrich(
          GpsGenerator.batch(spark, n, seed = 42L),
          clockEpochSec = Some(1750000000L))
        enriched.groupBy(col("direction"))
          .agg(
            count(lit(1)).as("n_fixes"),
            round(sum(col("speed_kmh").cast(DecimalType(28, 2))).cast(DoubleType) /
              count(col("speed_kmh")), 6).as("avg_speed"),
            sum(when(col("fuel_level").isNull, 1).otherwise(0)).as("n_ev_fixes"),
            sum(when(col("collision_detected"), 1).otherwise(0)).as("n_collisions"),
            max(col("processed_date")).as("processed_date"))
          .orderBy(col("direction"))
      },
      oracle = None,
      headline = true)
  )
}
