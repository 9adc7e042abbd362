package graft.queries

import graft.SparkSpec

class SketchSpec extends SparkSpec {

  test("q28 sketch estimates stay within their error bounds") {
    val row = graft.SparkEntry.queries("q28_sketch_aggs")(spark, sf).head()
    // Every in-row verdict column must certify its sketch: HLL++ at
    // rsd=0.02 inside 5%, GK quantiles at accuracy=10000 inside 1%.
    Seq("hll_within_5pct", "p25_within_1pct", "p50_within_1pct",
        "p75_within_1pct", "p95_within_1pct").foreach { c =>
      assert(row.getAs[Int](c) == 1, s"$c sketch error out of bound")
    }
    // Exact quantiles are ordered as quantiles must be.
    val ps = Seq("p25_exact", "p50_exact", "p75_exact", "p95_exact")
      .map(row.getAs[Double])
    assert(ps == ps.sorted, s"exact quantiles not monotone: $ps")
    // Deterministic: same input, same sketch.
    assert(graft.SparkEntry.queries("q28_sketch_aggs")(spark, sf).head() == row)
  }
}
