package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pairs with the same key whose timestamps lie within
  * `delta` of each other.
  *
  * The naive plan — equijoin on the key, then filter |l.ts − r.ts| ≤ δ —
  * materializes every same-key pair before filtering: quadratic per hot
  * key, the classic 100 TB blow-up. The banded form quantizes time into
  * δ-wide buckets and equijoins on (key, bucket), with one side exploded
  * to its bucket and both neighbors: any qualifying pair shares one of the
  * three buckets, so the exact |Δt| ≤ δ predicate only evaluates
  * candidates at most 2δ apart — shuffle and compare costs drop from
  * Σ n_k² to Σ n_k · (local density). The same family of rewrites
  * (IEJoin/band join) that range-join-aware engines apply internally.
  */
object RangeJoin {

  /** Inner range join on `key` with `|leftTs − rightTs| ≤ deltaMicros`,
    * plus an optional extra predicate evaluated on candidates.
    * `left`/`right` must share only `key` as a column name; ts columns are
    * timestamps (compared in microseconds). */
  def bandJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, deltaMicros: Long,
      extraFilter: Column = lit(true)): DataFrame = {
    require(deltaMicros > 0, "delta must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - key
    require(overlap.isEmpty, s"column collision: $overlap — rename before joining")
    val bktOf: Column => Column = ts => floor(unix_micros(ts) / deltaMicros)
    val l = left.withColumn("__bkt", explode(array(
      bktOf(col(leftTs)) - 1, bktOf(col(leftTs)), bktOf(col(leftTs)) + 1)))
    val r = right.withColumn("__bkt", bktOf(col(rightTs)))
    l.join(r, Seq(key, "__bkt"))
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) <= deltaMicros)
      .filter(extraFilter)
      .drop("__bkt")
  }
}
