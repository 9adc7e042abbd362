package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Align a drifting batch to a declared table schema.
  *
  * The reference tolerates schema drift implicitly: every batch is
  * re-inferred (spark_job.py:109), so a batch where `fuel_level` is
  * all-null or a producer adds a field just changes the inferred schema —
  * and the Iceberg sink then rejects or silently widens the table. With an
  * explicit schema (SURVEY §1.3) drift surfaces as an append-time error
  * instead. This makes the tolerance a deliberate, testable operation:
  * missing columns are added as typed nulls, present columns are cast to
  * the declared type, extras are dropped (or rejected under `strict`),
  * and output column order matches the table.
  */
object SchemaAlign {

  /** Align `df` to `target`. `strict = true` fails on unknown columns
    * instead of dropping them. */
  def align(df: DataFrame, target: StructType, strict: Boolean = false): DataFrame = {
    val have = df.columns.toSet
    val extras = have -- target.fieldNames.toSet
    if (strict && extras.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown columns ${extras.toSeq.sorted.mkString(", ")} not in target schema")
    val cols = target.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }
}
