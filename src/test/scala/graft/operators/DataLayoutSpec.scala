package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class DataLayoutSpec extends SparkSpec {

  test("clustered write produces disjoint per-file key ranges; scans prune") {
    try {
      DataLayout.writeClustered(
        Tables.orders(spark, sf), "orders_clustered", Seq("o_custkey"), numFiles = 8)
      val ranges = DataLayout.fileRanges(spark, "orders_clustered", "o_custkey")
        .collect()
      assert(ranges.length == 8)
      // pairwise disjoint: each file's min is >= the previous file's max
      // (range partitioning allows the boundary value to touch)
      val sorted = ranges.sortBy(_.getAs[Long]("k_min"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(b.getAs[Long]("k_min") >= a.getAs[Long]("k_max"),
          s"overlapping ranges: $a vs $b")
      }
      // content preserved
      assert(spark.table("orders_clustered").count() ==
        Tables.orders(spark, sf).count())
      // a key-range scan reads a subset of files (parquet stats pruning
      // surface): everything below the first file's max key lives in at
      // most 2 files (the first, plus a possible boundary-sharing second)
      val cut = sorted.head.getAs[Long]("k_max")
      val hit = spark.table("orders_clustered")
        .filter(col("o_custkey") < cut)
        .select(input_file_name()).distinct().count()
      assert(hit <= 2, s"range scan below $cut touched $hit of 8 files")
    } finally spark.sql("DROP TABLE IF EXISTS orders_clustered")
  }
}
