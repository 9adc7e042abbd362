package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class StableIdsSpec extends SparkSpec {

  test("ids are dense 0..n-1 in key order, stable across input layout") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "source")
    val withIds = StableIds.assign(docs, Seq("doc_id")).cache()
    val n = docs.count()
    assert(withIds.count() == n)
    // dense + aligned with the key order: row_id == rank of doc_id
    val misaligned = withIds
      .withColumn("expected", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))) - 1)
      .where(col("row_id") =!= col("expected"))
    assert(misaligned.isEmpty)
    // layout-independence: scrambled input, same assignment
    val scrambled = StableIds.assign(docs.repartition(17), Seq("doc_id"))
    assert(scrambled.exceptAll(withIds).isEmpty &&
      withIds.exceptAll(scrambled).isEmpty)
  }

  test("composite order with tie-break") {
    import spark.implicits._
    val df = Seq(("b", 2, "x"), ("a", 9, "y"), ("b", 1, "z"), ("a", 1, "w"))
      .toDF("k", "v", "payload")
    val ids = StableIds.assign(df, Seq("k", "v")).orderBy("row_id")
      .select("payload").as[String].collect().toSeq
    assert(ids == Seq("w", "y", "z", "x"))
  }
}
