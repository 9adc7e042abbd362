package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q104 — native Spark 4 `WITH RECURSIVE` chain walk. The recursion's
  * output is fully determined by a non-recursive model: walking a
  * customer's per-date order chain from the first link visits every
  * order exactly once, so MAX(depth) must equal the customer's order
  * count and the accumulator at max depth must equal the exact-decimal
  * total spend. Asserting against that model catches recursion bugs
  * (dropped links, double-visits, early termination) that the DuckDB
  * oracle — which runs the same recursive SQL — could share.
  */
class RecursiveSpec extends SparkSpec {

  test("q104: recursive chain walk matches the closed-form per-customer model") {
    val got = graft.SparkEntry.queries("q104_recursive_chain")(spark, sf)

    val model = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        count("*").as("chain_len"),
        max_by(col("o_orderkey"),
          struct(col("o_orderdate"), col("o_orderkey"))).as("last_orderkey"),
        sum(col("o_totalprice").cast("decimal(28,2)"))
          .cast("double").as("cum_spend"))

    val gotRows = got.orderBy("custkey").collect()
    val modelRows = model.orderBy("custkey").collect()
    assert(gotRows.length == modelRows.length && gotRows.nonEmpty,
      s"row count ${gotRows.length} vs model ${modelRows.length}")
    gotRows.zip(modelRows).foreach { case (g, m) =>
      assert(g.getAs[Long]("custkey") == m.getAs[Long]("custkey"))
      assert(g.getAs[Long]("chain_len") == m.getAs[Long]("chain_len"),
        s"custkey ${g.get(0)}: depth ${g.get(1)} != order count ${m.get(1)}")
      assert(g.getAs[Long]("last_orderkey") == m.getAs[Long]("last_orderkey"))
      assert(math.abs(g.getAs[Double]("cum_spend") - m.getAs[Double]("cum_spend")) < 1e-6,
        s"custkey ${g.get(0)}: accumulated spend diverged from exact total")
    }
  }
}
