package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the plain-parquet analog of
  * table clustering (Iceberg `write.sort-order`, Delta OPTIMIZE ZORDER).
  *
  * `writeClustered` range-partitions on the cluster keys and sorts within
  * each partition before writing, so every output file covers a disjoint
  * key range and each row group's min/max stats are tight. A later scan
  * with a predicate on the cluster key then skips whole files/row groups
  * via parquet statistics — at 100 TB this is the difference between
  * reading one file and reading all of them. (Multi-dimensional Z-order
  * interleaving is the extension point; single-key range clustering is
  * the 80% case and what the reference's partitionBy(direction) layout
  * approximates at day granularity.) */
object DataLayout {

  def writeClustered(df: DataFrame, table: String, clusterCols: Seq[String],
      numFiles: Int): Unit = {
    require(clusterCols.nonEmpty && numFiles > 0)
    val keys = clusterCols.map(col)
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.format("parquet").mode("overwrite").saveAsTable(table)
  }

  /** Per-file key ranges of a clustered table — the audit surface: ranges
    * must be pairwise disjoint for pruning to work. */
  def fileRanges(spark: SparkSession, table: String,
      clusterCol: String): DataFrame =
    spark.table(table)
      .select(input_file_name().as("file"), col(clusterCol).as("k"))
      .groupBy(col("file"))
      .agg(min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("k_min"))
}
