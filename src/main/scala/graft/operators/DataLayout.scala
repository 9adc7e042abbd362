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

  /** Morton/Z-value: interleave the low `bits` of two bucket ids — bit i
    * of `a` lands at position 2i+1, bit i of `b` at 2i. Composed from
    * codegen'd bit ops (no UDF): points close in BOTH dimensions get close
    * z-values, so range-clustering on z gives locality for 2-D predicates
    * that single-key clustering cannot. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Quantization bounds for [[writeClusteredZ]]: (aMin, aMax, bMin, bMax). */
  final case class ZBounds(aMin: Double, aMax: Double, bMin: Double, bMax: Double)

  /** Per-column (min, max) from parquet footer statistics — file-metadata
    * IO on the driver, NO executor scan job. Applies when `df` is a
    * single parquet-relation scan (optionally filtered/projected without
    * renaming the bound columns) with numeric footer stats for every
    * requested column in every file; anything else returns None and the
    * caller falls back. Footer bounds may be wider than the post-filter
    * data's true min/max — harmless for quantization (buckets get looser,
    * never wrong). */
  private[operators] def footerBounds(df: DataFrame, cols: Seq[String]): Option[Seq[(Double, Double)]] = {
    import scala.jdk.CollectionConverters._
    val plan = df.queryExecution.optimizedPlan
    val simpleScan = plan.collectLeaves().size == 1 && plan.collect { case n => n }
      .forall(n => n.children.isEmpty || n.nodeName == "Project" || n.nodeName == "Filter")
    // The requested columns must be PASSTHROUGH attributes of the scan
    // itself: a Project that computes or renames a value onto an existing
    // physical column's name (withColumn("x", x*100)) would otherwise
    // pass the shape check and return footer stats for the wrong data.
    // Same exprId as a leaf output attribute ⇔ untouched scan column.
    val leafOut = plan.collectLeaves().flatMap(_.output)
    val passthrough = cols.forall(c => plan.output.find(_.name == c)
      .exists(a => leafOut.exists(l => l.exprId == a.exprId && l.name == c)))
    val files = if (simpleScan && passthrough) df.inputFiles.toSeq else Seq.empty
    if (files.isEmpty) return None
    // Session Hadoop conf, not a bare Configuration: footer reads must see
    // the same fs credentials/defaultFS as the scan (s3a keys etc.), or
    // the open throws and every call silently pays the fallback scan job.
    val conf = df.sparkSession.sessionState.newHadoopConf()
    def numeric(v: Any): Option[Double] = v match {
      case n: java.lang.Number => Some(n.doubleValue())
      case _ => None
    }
    // Footer min/max are raw physical values: for DECIMAL-annotated ints
    // they are UNSCALED (off by 10^scale), for DATE/TIMESTAMP they are in
    // storage units that differ from the engine cast. Trust only plain
    // numeric physical types (no logical annotation, or a plain int one).
    def plainNumeric(ch: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean = {
      val ann = ch.getPrimitiveType.getLogicalTypeAnnotation
      ann == null || ann.isInstanceOf[
        org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation]
    }
    try {
      val perFile = files.map { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf))
        try {
          val chunks = reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala).toSeq
          cols.map { c =>
            val colChunks = chunks.filter(_.getPath.toDotString == c)
            val stats = colChunks.map(_.getStatistics)
            for {
              _ <- Option.when(colChunks.nonEmpty && colChunks.forall(plainNumeric) &&
                stats.forall(s => s != null && s.hasNonNullValue))(())
              mins <- traverse(stats.map(s => numeric(s.genericGetMin)))
              maxs <- traverse(stats.map(s => numeric(s.genericGetMax)))
            } yield (mins.min, maxs.max)
          }
        } finally reader.close()
      }
      traverse(cols.indices.map(i => traverse(perFile.map(_(i))).map(b =>
        (b.map(_._1).min, b.map(_._2).max))))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** Z-order-clustered write on two numeric dimensions: uniform
    * width_bucket quantization, Morton interleave, then the same
    * range-partition + sort-within as [[writeClustered]]. 2-D box
    * predicates touch O(perimeter) files instead of all of them.
    *
    * Quantization bounds, in order of preference (100 TB posture: never
    * pay a full scan for 4 scalars):
    *  1. explicit `bounds` — from table/catalog statistics (Iceberg
    *     manifests, ANALYZE TABLE) or domain knowledge;
    *  2. parquet footer min/max stats ([[footerBounds]] — driver-side
    *     metadata IO, no scan job) when `df` is a plain parquet scan;
    *  3. a blocking min/max aggregation job — exact but a full extra pass
    *     over the data; the fallback, not the default. */
  def writeClusteredZ(df: DataFrame, table: String,
      colA: String, colB: String, bits: Int = 8, numFiles: Int = 8,
      bounds: Option[ZBounds] = None): Unit = {
    val ZBounds(aMin, aMax, bMin, bMax) = bounds
      .orElse(footerBounds(df, Seq(colA, colB)).map { case Seq(a, b) =>
        ZBounds(a._1, a._2, b._1, b._2) })
      .getOrElse {
        val Array(r) = df.agg(
          min(col(colA)).cast("double"), max(col(colA)).cast("double"),
          min(col(colB)).cast("double"), max(col(colB)).cast("double")).collect()
        ZBounds(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      }
    val n = 1 << bits
    // width_bucket returns n+1 for x == max (the upper-boundary bucket);
    // unclamped, that bucket id is 2^bits, whose only set bit is ABOVE the
    // `bits` interleaved by zValue — max-key rows would alias to z≈0 and
    // land in the lowest-z file, widening its min/max stats and weakening
    // pruning at the upper boundary. Symmetrically, x < lo (stale explicit
    // bounds whose min sits above newly arrived data) returns 0, whose
    // -1 bucket would interleave as ALL bits set and scatter those rows to
    // the top z range. Clamp into [0, n-1] on both ends — out-of-bounds
    // rows degrade to the edge bucket, never to an aliased one.
    def bucket(c: String, lo: Double, hi: Double) =
      greatest(
        least(width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(n)) - 1,
          lit(n - 1L)),
        lit(0L))
    val bucketA = bucket(colA, aMin, aMax)
    val bucketB = bucket(colB, bMin, bMax)
    df.withColumn("__z", zValue(bucketA, bucketB, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
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
