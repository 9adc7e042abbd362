package graft.operators

import graft.SparkSpec
import graft.core.Tables

class BucketingSpec extends SparkSpec {

  test("bucketed join plans without exchanges and matches the plain join") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(l, "lineitem_b", "o_orderkey", 8)

    // Force the shuffle-join path so exchange elision is observable.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")

      val plain = o.join(l, "o_orderkey")
      assert(joined.count() == plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)

      // Same tables joined WITHOUT bucketing info (raw parquet) do shuffle.
      val unbucketed = o.join(l, "o_orderkey")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE orders_b")
      spark.sql("DROP TABLE lineitem_b")
    }
  }
}
