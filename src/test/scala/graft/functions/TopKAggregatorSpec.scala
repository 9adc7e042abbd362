package graft.functions

import graft.functions.TopKAggregator.{topK, Scored}
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {

  private val agg = topK(3)
  private def reduceAll(xs: Seq[Scored]) = xs.foldLeft(agg.zero)(agg.reduce)

  test("keeps the k best, best first") {
    val out = reduceAll(Seq(Scored(1, 0.2), Scored(2, 0.9), Scored(3, 0.5),
      Scored(4, 0.7), Scored(5, 0.1)))
    assert(out == Seq(Scored(2, 0.9), Scored(4, 0.7), Scored(3, 0.5)))
  }

  test("ties break to the lower id (the window's vec_id asc contract)") {
    val out = reduceAll(Seq(Scored(9, 0.5), Scored(2, 0.5), Scored(5, 0.5),
      Scored(1, 0.5)))
    assert(out == Seq(Scored(1, 0.5), Scored(2, 0.5), Scored(5, 0.5)))
  }

  test("merge of partial heaps equals reduce over the concatenation") {
    val xs = (1L to 20L).map(i => Scored(i, (i * 37 % 11) / 10.0))
    val (a, b) = xs.splitAt(9)
    assert(agg.merge(reduceAll(a), reduceAll(b)) == reduceAll(xs))
    assert(agg.merge(reduceAll(b), reduceAll(a)) == reduceAll(xs))
    assert(agg.merge(agg.zero, reduceAll(xs)) == reduceAll(xs))
    assert(agg.merge(reduceAll(xs), agg.zero) == reduceAll(xs))
  }

  test("fewer than k inputs returns them all, ordered") {
    assert(reduceAll(Seq(Scored(7, 0.3), Scored(4, 0.8))) ==
      Seq(Scored(4, 0.8), Scored(7, 0.3)))
  }
}
