package graft.queries

import graft.operators.Multimodal

/** Multimodal binary-column pipeline corpus entry. The asset count scales
  * with the SF dir so bench reflects real partition-local decode cost.
  *
  * Oracle pattern (see [[VerifyInputs]]): the codec + histogram feature
  * are engine-specific, so Verify materializes the per-asset scalar rows
  * (`_q60_input`: asset_id, kind, n_bytes, l2sq) and DuckDB re-aggregates
  * the profile over identical inputs — the relational downstream is
  * value-checked, the codec itself stays spec-tested (MultimodalSpec
  * golden values).
  */
object Multi {

  /** Asset count for a SF dir — shared by the query and VerifyInputs so
    * the materialized rows always match the gate query's corpus. */
  def assetCount(dir: String): Long =
    if (dir.contains("sf0.1")) 50000L
    else if (dir.contains("sf0.01")) 5000L else 500L

  val defs: Seq[(String, QueryDef)] = Seq(
    "q60_multimodal_profile" -> QueryDef(
      build = (spark, dir) =>
        Multimodal.featureProfile(spark, assetCount(dir)),
      oracle = Some(s"""
        WITH f AS (SELECT kind, n_bytes, l2sq
                   FROM read_parquet('${Gps.VerifyOutToken}/_q60_input/*.parquet'))
        SELECT kind, COUNT(*) AS n_assets,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               ROUND(CAST(SUM(CAST(l2sq AS DECIMAL(28,9))) AS DOUBLE)
                     / COUNT(*), 9) AS avg_feature_l2sq
        FROM f GROUP BY kind ORDER BY kind"""),
      headline = true)
  )
}
