package graft.operators

import graft.SparkSpec
import graft.core.Tables

class CompactionSpec extends SparkSpec {

  test("compaction shrinks file count, preserves data, survives rename swap") {
    val li = Tables.lineitem(spark, sf)
    li.repartition(48).write.format("parquet")
      .mode("overwrite").saveAsTable("li_frag")
    try {
      val rowsBefore = spark.table("li_frag").count()
      val r = Compaction.compactTable(spark, "li_frag", targetFileBytes = 1L << 30)
      assert(r.filesBefore == 48)
      assert(r.filesAfter == 1) // everything fits one 1 GB target file
      assert(spark.table("li_frag").count() == rowsBefore)
      assert(spark.table("li_frag").exceptAll(li).isEmpty)
      // table remains writable after the swap
      li.limit(10).write.format("parquet").mode("append").saveAsTable("li_frag")
      assert(spark.table("li_frag").count() == rowsBefore + 10)
    } finally spark.sql("DROP TABLE IF EXISTS li_frag")
  }
}
