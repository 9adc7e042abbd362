package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact() equals the plain group-by on a planted skew, any k") {
    // 10k rows: "hot" owns 4k, "warm" 1k, 100 uniques own the rest
    val items = spark.range(10000).select(
      when(col("id") < 4000, "hot")
        .when(col("id") < 5000, "warm")
        .otherwise(concat(lit("u"), col("id") % 100)).as("item"))
    for (k <- Seq(2, 5, 100)) {
      val got = HeavyHitters.exact(items, "item", k)
        .as[(String, Long)].collect().toMap
      val want = items.groupBy("item").count()
        .filter(col("count") > lit(10000L / k))
        .as[(String, Long)].collect().toMap
      assert(got == want, s"k=$k")
    }
  }

  test("the sketch actually prunes: candidates ~ heavies, not the domain") {
    // Zipf-ish: ~890 distinct items, a handful heavy at k=50
    val n = 200000L
    val items = spark.range(n)
      .select(concat(lit("i"), expr(s"$n div (id + 1)")).as("item"))
    val distinctItems = items.distinct().count()
    val cand = HeavyHitters.candidateCount(items, "item", 50)
    assert(cand < distinctItems / 10,
      s"CMS pruned nothing: $cand candidates of $distinctItems distinct")
    assert(HeavyHitters.exact(items, "item", 50).count() >= 5)
  }

  test("empty input yields an empty result, not a crash") {
    val empty = spark.range(0).select(concat(lit("x"), col("id")).as("item"))
    assert(HeavyHitters.exact(empty, "item", 10).count() == 0)
  }

  test("NULL items are excluded, not crashed on, and don't inflate n") {
    // 4k nulls + 3k "hot" + 3k uniques. The documented contract: the
    // result equals the plain group-by over the NON-NULL domain — nulls
    // neither throw in the CMS probe nor count toward the n/k threshold.
    val items = spark.range(10000).select(
      when(col("id") < 4000, lit(null).cast("string"))
        .when(col("id") < 7000, lit("hot"))
        .otherwise(concat(lit("u"), col("id"))).as("item"))
    val got = HeavyHitters.exact(items, "item", 2)
      .as[(String, Long)].collect().toMap
    // non-null n = 6000; threshold 3000; "hot" has exactly 3000 -> NOT
    // strictly greater. With nulls wrongly included (n = 10000 -> 5000)
    // the answer is the same empty set, so ALSO check k=3: threshold
    // 2000 (non-null) admits "hot"; a null-inflated 3333 would not.
    assert(got.isEmpty)
    val got3 = HeavyHitters.exact(items, "item", 3)
      .as[(String, Long)].collect().toMap
    assert(got3 == Map("hot" -> 3000L))
  }
}
