package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField}

/** Stable, dense, deterministic row ids — the distributed zipWithIndex.
  *
  * `monotonically_increasing_id` depends on partition layout and
  * `row_number()` over a global window funnels the corpus through ONE
  * task. This assigns 0..n-1 in the order of `orderCols` with the classic
  * two-pass scheme: range-partition + sort on the key, count rows per
  * partition (first pass, counts only — a few longs to the driver, not
  * data), broadcast the cumulative offsets, then stamp offset+local index
  * per partition (second pass). Both passes are fully parallel; ids are a
  * pure function of the data, stable across cluster layout and retries.
  */
object StableIds {

  /** Append `idCol` holding this row's dense rank in `orderCols` order.
    * `orderCols` must be a total order (include a tie-break key). */
  def assign(df: DataFrame, orderCols: Seq[String],
      idCol: String = "row_id"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(StructField(idCol, LongType, nullable = false))
    // rdd.zipWithIndex = count pass + stamped pass, exactly the scheme above
    val stamped = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(stamped, schema)
  }
}
