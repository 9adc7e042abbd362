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
      headline = true),

    // ---- q208: audio DSP profile over REAL decoded PCM ----
    // The speech-corpus screening pass, now that the WAV codec is real
    // (round 8): per duration class (chunk count), the zero-crossing
    // rate in ppm of adjacent-sample pairs (the voicing/noise
    // discriminator), mean per-sample energy, and peak amplitude — all
    // INTEGER arithmetic over decoded 16-bit samples, so the per-asset
    // rows are bit-deterministic. Oracle pattern as q60: Verify
    // materializes the per-asset stats (`_q208_input`) and DuckDB
    // re-aggregates the profile over identical rows; the decode + DSP
    // kernel itself is spec-pinned (MultimodalSpec planted-WAV
    // checksums).
    //
    // 100 TB posture: decode + stats are one partition-local iterator
    // pass per asset (payloads never shuffle); the profile agg is
    // |duration classes| rows.
    "q208_audio_profile" -> QueryDef(
      build = (spark, dir) =>
        Multimodal.audioProfile(spark, assetCount(dir)),
      oracle = Some(s"""
        WITH f AS (SELECT n_chunks, n_samples, zero_crossings, sum_sq,
                          max_abs
                   FROM read_parquet('${Gps.VerifyOutToken}/_q208_input/*.parquet'))
        SELECT n_chunks, COUNT(*) AS n_assets,
               CAST(SUM(n_samples) AS BIGINT) AS total_samples,
               (CAST(SUM(zero_crossings) AS BIGINT) * 1000000)
                 // (CAST(SUM(n_samples) AS BIGINT) - COUNT(*)) AS zc_ppm,
               CAST(SUM(sum_sq) AS BIGINT) // CAST(SUM(n_samples) AS BIGINT)
                 AS mean_energy,
               MAX(max_abs) AS peak_abs
        FROM f GROUP BY n_chunks ORDER BY n_chunks"""))
  )
}
