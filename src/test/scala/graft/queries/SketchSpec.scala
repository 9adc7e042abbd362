package graft.queries

import graft.SparkSpec

class SketchSpec extends SparkSpec {

  test("q28 sketch estimates stay within their error bounds") {
    val row = graft.SparkEntry.queries("q28_sketch_aggs")(spark, sf).head()
    // HLL++ at rsd=0.02 should be well inside 5% on this cardinality.
    assert(row.getAs[Double]("hll_rel_err") < 0.05)
    // GK median with accuracy 10000 lands within 1% of the exact median.
    val approx = row.getAs[Double]("p50_approx")
    val exact = row.getAs[Double]("p50_exact")
    assert(math.abs(approx - exact) / exact < 0.01, s"p50 approx=$approx exact=$exact")
    // Deterministic: same input, same sketch.
    assert(graft.SparkEntry.queries("q28_sketch_aggs")(spark, sf).head() == row)
  }
}
