package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the data-quality sweep a pipeline runs
  * before training on a new corpus drop: per column, null count, distinct
  * count, min and max, from a single aggregation over one scan.
  *
  * Output is long-form (one row per column) so profiles of any table
  * union/compare uniformly. Distinct counts are exact (`countDistinct`)
  * because the oracle needs determinism; at 100 TB swap `exact = false`
  * for HyperLogLog++ (one pass, bounded memory, ~2% error) — the only
  * difference in the plan is the Expand node exact distinct requires.
  */
object Profiler {

  /** Profile `cols` (default: every column) of `df`. min/max are cast to
    * string for type-uniform output. */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
      exact: Boolean = true): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = names.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)

    val entries = array(names.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }: _*)
    wide.select(explode(entries).as("p")).select("p.*").orderBy(col("col_name"))
  }
}
