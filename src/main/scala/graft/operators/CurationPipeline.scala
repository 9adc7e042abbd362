package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable curation pipeline with exact, single-pass provenance
  * accounting — the user-facing API tying the corpus-filter family
  * (quality gates, language filters, dedup keep-one) into one auditable
  * run. Every production data pipeline needs the audit table ("how many
  * documents did each stage remove, and how much text was that"); the
  * naive implementation runs one count() per stage, re-executing the
  * lineage prefix N times — N scans of a 100 TB corpus for an N-stage
  * funnel.
  *
  * This operator instead MARKS rows: each stage contributes a keep
  * predicate (which may be a window expression), and a row's `drop_stage`
  * column records the FIRST stage that rejected it. Survivorship and the
  * full per-stage accounting then come out of ONE aggregation over one
  * scan — the funnel never re-executes.
  *
  * Stage contract: a stage's predicate sees the running DataFrame
  * including the `drop_stage` column and MUST treat already-dropped rows
  * as non-participants where its semantics depend on the cohort (a dedup
  * keep-one window orders already-dropped rows last so a dropped row can
  * never be the kept representative — see [[dedupKeepOne]]). Per-row
  * predicates (length, language, score thresholds) need no such care:
  * the first-failure marking already ignores their verdict on dropped
  * rows.
  */
object CurationPipeline {

  /** One funnel stage: `name` labels the audit row; `keep(df)` is a
    * boolean Column (true = survives this stage). */
  final case class Stage(name: String, keep: DataFrame => Column)

  val DropCol = "drop_stage"

  /** Convenience: exact-dup keep-one as a Stage. Keeps the first row per
    * `key` under `tieBreak` order among rows NOT yet dropped (dropped
    * rows sort last, so the representative is always a survivor of the
    * earlier stages; a group whose every row is already dropped marks
    * nothing new). */
  def dedupKeepOne(name: String, key: Column, tieBreak: Column): Stage =
    Stage(name, _ => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(key)
        .orderBy(col(DropCol).isNotNull.asc, tieBreak.asc)
      row_number().over(w) === 1
    })

  /** Apply the funnel: returns the input with `drop_stage` (null = kept,
    * else the first rejecting stage's name). One logical plan, no
    * actions. */
  def mark(df: DataFrame, stages: Seq[Stage]): DataFrame = {
    require(df.columns.forall(_ != DropCol), s"input already has $DropCol")
    stages.foldLeft(df.withColumn(DropCol, lit(null).cast("string"))) {
      (cur, s) =>
        cur.withColumn(DropCol,
          when(col(DropCol).isNull && !s.keep(cur), lit(s.name))
            .otherwise(col(DropCol)))
    }
  }

  /** The surviving corpus (drop_stage stripped). */
  def survivors(df: DataFrame, stages: Seq[Stage]): DataFrame =
    mark(df, stages).filter(col(DropCol).isNull).drop(DropCol)

  /** The audit table: one row per outcome (stage name or "kept") with
    * document and character counts — ONE aggregation over one scan.
    * `charsCol` is the corpus-size measure (e.g. n_chars). */
  def accounting(df: DataFrame, stages: Seq[Stage], charsCol: Column): DataFrame =
    mark(df, stages)
      .groupBy(coalesce(col(DropCol), lit("kept")).as("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(charsCol).as("n_chars"))
      .orderBy(col("stage"))
}
