package graft.operators

import graft.SparkSpec

/** Pins the parquet dual's snapshot-log semantics to the Iceberg
  * behaviors it emulates (ICEBERG.md §5): MERGE-equivalent upsert
  * produces a new version, the pre-merge content stays readable
  * (`VERSION AS OF` dual), the snapshot log lists every retained
  * version with its producing operation (`.snapshots` dual), and
  * `expire_snapshots` drops history without touching the live table.
  * With a real Iceberg runtime these assertions map 1:1 onto the
  * verification queries in ICEBERG.md §5 items 2, 4, 5. */
class SnapshotLogSpec extends SparkSpec {

  import spark.implicits._

  private def withTable(name: String)(body: => Unit): Unit =
    try body finally {
      (spark.catalog.listTables().collect().map(_.name))
        .filter(t => t == name || t.startsWith(name + TableSwap.SnapInfix) ||
          t == name + TableSwap.TmpSuffix)
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }

  test("merge produces a new version; time travel reads the pre-merge rows") {
    withTable("snap_merge") {
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "tag", "v")
        .write.saveAsTable("snap_merge")
      assert(TableSwap.currentVersion(spark, "snap_merge") == 0L)

      Upsert.mergeInto(spark, "snap_merge",
        Seq((2L, "b", 99.0), (3L, "c", 30.0)).toDF("id", "tag", "v"), Seq("id"))

      // live table is the merged content (WHEN MATCHED UPDATE, NOT MATCHED INSERT)
      val live = spark.table("snap_merge").as[(Long, String, Double)]
        .collect().sortBy(_._1).toSeq
      assert(live == Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))
      assert(TableSwap.currentVersion(spark, "snap_merge") == 1L)

      // ICEBERG.md §5.5: VERSION AS OF the pre-merge snapshot matches
      // the pre-merge rows (and count)
      val v0 = TableSwap.readVersion(spark, "snap_merge", 0L)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(v0 == Seq((1L, "a", 10.0), (2L, "b", 20.0)))
      // readVersion(current) is the live table
      assert(TableSwap.readVersion(spark, "snap_merge", 1L)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq == live)
    }
  }

  test("snapshot log lists every version with its producing operation") {
    withTable("snap_log") {
      Seq((1L, 1.0)).toDF("id", "v").write.saveAsTable("snap_log")
      Upsert.mergeInto(spark, "snap_log", Seq((2L, 2.0)).toDF("id", "v"), Seq("id"))
      TableSwap.rewrite(spark, "snap_log",
        spark.table("snap_log").repartition(1), operation = "rewrite")

      // ICEBERG.md §5.2: the snapshots metadata view returns one row per
      // snapshot, newest current, operations in commit order
      val log = TableSwap.snapshots(spark, "snap_log")
        .as[(Long, String, Boolean)].collect().sortBy(_._1).toSeq
      assert(log == Seq((0L, "append", false), (1L, "merge", false), (2L, "rewrite", true)))
    }
  }

  test("expire_snapshots drops old history, keeps the live table and newest snapshot") {
    withTable("snap_exp") {
      Seq((1L, 1.0)).toDF("id", "v").write.saveAsTable("snap_exp")
      Upsert.mergeInto(spark, "snap_exp", Seq((2L, 2.0)).toDF("id", "v"), Seq("id"))
      Upsert.mergeInto(spark, "snap_exp", Seq((3L, 3.0)).toDF("id", "v"), Seq("id"))
      assert(TableSwap.snapshotVersions(spark, "snap_exp") == Seq(0L, 1L))

      val dropped = TableSwap.expireSnapshots(spark, "snap_exp", keepLast = 1)
      assert(dropped == 1)
      assert(TableSwap.snapshotVersions(spark, "snap_exp") == Seq(1L))
      // expired version unreadable (as an expired Iceberg snapshot id is)...
      intercept[IllegalArgumentException] {
        TableSwap.readVersion(spark, "snap_exp", 0L)
      }
      // ...retained one still readable, live table untouched, version stable
      assert(TableSwap.readVersion(spark, "snap_exp", 1L).count() == 2L)
      assert(spark.table("snap_exp").count() == 3L)
      assert(TableSwap.currentVersion(spark, "snap_exp") == 2L)
    }
  }

  test("crash between rename-away and rename-in recovers with history intact") {
    withTable("snap_crash") {
      Seq((1L, 1.0)).toDF("id", "v").write.saveAsTable("snap_crash")
      Upsert.mergeInto(spark, "snap_crash", Seq((2L, 2.0)).toDF("id", "v"), Seq("id"))
      // simulate the crash window: next version materialized under tmp,
      // current renamed away to its snapshot slot, rename-in never ran
      spark.table("snap_crash").withColumn("v",
          org.apache.spark.sql.functions.col("v") * 2)
        .write.format("parquet").mode("overwrite")
        .saveAsTable("snap_crash" + TableSwap.TmpSuffix)
      spark.sql(s"ALTER TABLE snap_crash RENAME TO snap_crash${TableSwap.SnapInfix}1")

      TableSwap.recover(spark, "snap_crash")
      assert(spark.table("snap_crash").as[(Long, Double)].collect().sortBy(_._1).toSeq
        == Seq((1L, 2.0), (2L, 4.0)))
      assert(TableSwap.currentVersion(spark, "snap_crash") == 2L)
      // both historical versions still time-travelable
      assert(TableSwap.readVersion(spark, "snap_crash", 0L).count() == 1L)
      assert(TableSwap.readVersion(spark, "snap_crash", 1L).count() == 2L)
    }
  }
}
