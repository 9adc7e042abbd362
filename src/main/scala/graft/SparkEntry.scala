package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented capability module's query corpus. Each
  * entry pairs a Spark DataFrame builder with (when SQL-expressible) a
  * DuckDB oracle query producing the identical result.
  */
object SparkEntry {

  /** All capability modules, in SURVEY §2 inventory order. */
  def modules: Seq[(String, QueryDef)] =
    Relational.defs ++ Analytics.defs ++ Events.defs ++ Text.defs ++
      Curation.defs ++ Training.defs ++ Dedup.defs ++ Vectors.defs ++
      Retrieval.defs ++ Tokenizer.defs ++ Graph.defs ++ Mining.defs ++
      Telemetry.defs ++ Insights.defs ++ StreamingGate.defs ++
      Mixing.defs ++ CorpusStats.defs ++ Multi.defs ++ Classifier.defs ++
      Boosting.defs ++ Gps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    modules.toMap.apply("q05_region_revenue").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (name, d) => name -> d.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Includes the staged `_q*_input` tables' invariant/identity oracles
    * (VERDICT r14 #5) so every dir Verify writes carries a verdict. */
  def oracleSql: Map[String, String] =
    modules.collect { case (name, QueryDef(_, Some(sql), _)) => name -> sql }.toMap ++
      graft.queries.VerifyInputs.stagingOracles

  /** Subset benchmarked by graft.Bench. */
  def headlines: Seq[String] =
    modules.collect { case (name, d) if d.headline => name }
}
