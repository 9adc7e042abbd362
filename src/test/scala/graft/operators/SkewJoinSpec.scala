package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of rows share one hot key — the shape that breaks a hash join.
    val big = spark.range(20000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = spark.range(100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))

    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("left join preserves unmatched big-side rows") {
    val big = Seq((1L, "a"), (1L, "b"), (99L, "c")).toDF("k", "v")
    val small = Seq((1L, "dim")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 4, "left")
    assert(out.count() == 3)
    assert(out.where(col("name").isNull).count() == 1)
  }

  test("salt actually spreads a hot key across partitions") {
    val big = spark.range(8000).select(lit(1L).as("k"), col("id").as("payload"))
    val small = Seq((1L, "dim")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 8)
    // Count distinct salts the hot key was spread over (re-derive the salt
    // the same way the operator does).
    val spread = big
      .withColumn("__salt", pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .select("__salt").distinct().count()
    assert(spread == 8)
    assert(salted.count() == 8000)
  }

  test("works on real tables: orders x customer") {
    val o = Tables.orders(spark, sf).select("o_custkey", "o_orderkey")
    val c = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
    val salted = SkewJoin.saltedJoin(o, c, Seq("o_custkey"), salts = 4)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
