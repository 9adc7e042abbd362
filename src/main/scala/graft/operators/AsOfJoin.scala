package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) left join — for each left row, the most recent
  * right row with the same key and `rightTs <= leftTs`; null-extended when
  * no such row exists. The operator Spark's API lacks (DuckDB/Pandas have
  * ASOF JOIN / merge_asof natively; the gate query's oracle uses DuckDB's).
  *
  * Implementation is the scalable union-sort-window form, NOT the naive
  * range join: both inputs are tagged and unioned, shuffled ONCE on the
  * key, sorted within each key partition by (ts, side) — right rows sort
  * before left rows at equal timestamps so `<=` is inclusive — and each
  * left row picks up `last(right payload, ignoreNulls)` over the
  * unbounded-preceding window. Cost is one shuffle + one sort, linear in
  * |L|+|R|; the equivalent `JOIN ON key AND r.ts <= l.ts` + argmax
  * explodes quadratically per hot key at 100 TB.
  */
object AsOfJoin {

  /** Left as-of join. `left` and `right` must share only `key` as a column
    * name; output carries all left columns then all right non-key columns
    * (null when unmatched). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val rPayloadCols = right.columns.filterNot(_ == key).toSeq
    val overlap = left.columns.toSet.intersect(rPayloadCols.toSet)
    require(overlap.isEmpty, s"column collision: $overlap — rename before joining")

    val rStruct = struct(rPayloadCols.map(col): _*)
    val rStructType = right.select(rStruct).schema.head.dataType

    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col).toSeq: _*).as("__l"),
      lit(null).cast(rStructType).as("__r"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(left.select(struct(left.columns.map(col).toSeq: _*)).schema.head.dataType).as("__l"),
      rStruct.as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)).toSeq ++
        rPayloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
