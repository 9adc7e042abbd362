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

  /** Non-empty output partitions of the join — the join shuffles by
    * (key, salt), so this observes the spread the salt actually bought
    * without re-deriving the operator's internal formula. */
  private def occupiedPartitions(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.mapPartitions(it => Iterator(if (it.hasNext) 1 else 0)).collect().sum

  test("salt actually spreads a hot key across partitions") {
    val big = spark.range(8000).select(lit(1L).as("k"), col("id").as("payload"))
    val small = Seq((1L, "dim")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 8)
    assert(salted.count() == 8000)
    assert(occupiedPartitions(salted) >= 4,
      "hot key stayed on ~one reducer despite salts = 8")
  }

  test("BYTE-IDENTICAL hot-key rows still spread (per-row salt component)") {
    // The null-ish-default-id shape: every hot row is the same bytes, so a
    // content-only salt would collapse them onto one reducer.
    val big = spark.range(8000).select(lit(1L).as("k"), lit(0L).as("payload"))
    val small = Seq((1L, "dim")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 8)
    assert(salted.count() == 8000)
    assert(occupiedPartitions(salted) >= 4,
      "identical rows collapsed onto one salt — per-row component missing")
  }

  test("a pre-existing __salt column is preserved, not clobbered or joined on") {
    val big = spark.range(100)
      .select((col("id") % 5).as("k"), lit(42).as("__salt"), col("id").as("payload"))
    val small = Seq((0L, "d0"), (1L, "d1"), (2L, "d2"), (3L, "d3"), (4L, "d4"))
      .toDF("k", "name")
    val out = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 4)
    val plain = big.join(small, Seq("k"))
    assert(out.columns.count(_ == "__salt") == 1)
    assert(out.exceptAll(plain).isEmpty && plain.exceptAll(out).isEmpty)
  }

  test("autoSalts: uniform keys degenerate to 1, a hot key sizes to its share") {
    // uniform: no key exceeds an even partition share -> plain join
    val uniform = spark.range(4000).select((col("id") % 1000).as("k"))
    assert(SkewJoin.autoSalts(uniform, Seq("k")) == 1)
    // one key owns half the rows: with 4 shuffle partitions an even share
    // is total/4, so the hot key needs ceil(half / quarter) = 2 salts
    // (hot key -1 sits outside the id range, so its count is exactly 4000)
    val skewed = spark.range(8000)
      .select(when(col("id") % 2 === 0, lit(-1L)).otherwise(col("id")).as("k"))
    assert(SkewJoin.autoSalts(skewed, Seq("k")) == 2)
    // clamp honored
    assert(SkewJoin.autoSalts(
      spark.range(8000).select(lit(1L).as("k")), Seq("k"), maxSalts = 3) == 3)
  }

  test("autoSaltedJoin equals the plain join under 10x hot-key mass") {
    // the q121 certificate shape at deliberately inflated skew: the hot
    // key's mass is ~10x the SkewJoinSpec baseline (180k of 200k rows)
    val big = spark.range(200000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = spark.range(100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))
    val n = SkewJoin.autoSalts(big, Seq("k"))
    assert(n > 1, "10x hot-key mass must trigger salting")
    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.autoSaltedJoin(big, small, Seq("k"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
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
