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

  test("recovers a swap stranded between DROP and RENAME") {
    // Simulate the crash window: data lives only under __swap_tmp, the
    // original name is gone. The next compactTable must complete the rename
    // first, then compact normally — no data loss, correct final state.
    val li = Tables.lineitem(spark, sf).limit(1000)
    try {
      li.repartition(8).write.format("parquet")
        .mode("overwrite").saveAsTable("li_crash__swap_tmp")
      assert(!spark.catalog.tableExists("li_crash"))
      val r = Compaction.compactTable(spark, "li_crash", targetFileBytes = 1L << 30)
      assert(spark.catalog.tableExists("li_crash"))
      assert(!spark.catalog.tableExists("li_crash__swap_tmp"))
      assert(spark.table("li_crash").count() == 1000)
      assert(r.filesAfter == 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_crash")
      spark.sql("DROP TABLE IF EXISTS li_crash__swap_tmp")
    }
  }

  test("clears a stale tmp left by a pre-DROP crash without touching the table") {
    // Crash BEFORE the DROP: both tables exist; the tmp is stale state from
    // the failed run and must be discarded, the original left as-is.
    val li = Tables.lineitem(spark, sf).limit(500)
    try {
      li.write.format("parquet").mode("overwrite").saveAsTable("li_stale")
      li.limit(100).write.format("parquet")
        .mode("overwrite").saveAsTable("li_stale__swap_tmp")
      Compaction.compactTable(spark, "li_stale", targetFileBytes = 1L << 30)
      assert(spark.table("li_stale").count() == 500) // original data, not the stale tmp's
      assert(!spark.catalog.tableExists("li_stale__swap_tmp"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_stale")
      spark.sql("DROP TABLE IF EXISTS li_stale__swap_tmp")
    }
  }
}
