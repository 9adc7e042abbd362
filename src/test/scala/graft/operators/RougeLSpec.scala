package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the LCS dynamic program on golden values and the invariants the
  * q284 oracle relies on (the oracle re-derives the pair set but trusts
  * these rows for the kernel itself). */
class RougeLSpec extends SparkSpec {

  private def lcs(a: String, b: String): Int =
    RougeL.lcsLen(RougeL.tokenize(a), RougeL.tokenize(b))

  test("golden LCS values") {
    assert(lcs("a b c d e", "a b c d e") == 5, "identity")
    assert(lcs("a b c", "x y z") == 0, "disjoint")
    assert(lcs("the cat ate the dog", "the dog ate the cat") == 3,
      "order matters: 'the ate the' — Jaccard would say identical")
    assert(lcs("a b c d", "b d") == 2, "subsequence extraction")
    assert(lcs("a x b y c", "a b c") == 3, "gapped common subsequence")
    assert(lcs("", "a b") == 0, "empty side")
  }

  test("LCS is symmetric and bounded by both lengths") {
    val cases = Seq(
      ("w1 w2 w3 w4 w5 w6", "w2 w4 w6 w8"),
      ("p q r s", "s r q p"),
      ("a a a b", "a b a a"))
    for ((x, y) <- cases) {
      val f = lcs(x, y); val r = lcs(y, x)
      assert(f == r, s"asymmetric on ($x, $y): $f vs $r")
      val (na, nb) =
        (RougeL.tokenize(x).length, RougeL.tokenize(y).length)
      assert(f <= math.min(na, nb), "LCS exceeded a side's length")
    }
  }

  test("LCS of a doc with its shuffled self stays below identity") {
    val toks = (1 to 30).map(i => s"t${i * 7 % 31}")
    val a = toks.mkString(" ")
    val b = toks.reverse.mkString(" ")
    assert(lcs(a, a) == 30)
    // a strictly-decreasing relabeling reversed shares only increasing
    // runs; for a permutation vs its reverse LCS is 1 when the
    // permutation is strictly monotone in the relabel order — here just
    // require a real gap
    assert(lcs(a, b) < 30, "reversal must lose sequence identity")
  }

  test("token cap bounds the DP input") {
    val long = (1 to 1000).map(i => s"w$i").mkString(" ")
    assert(RougeL.tokenize(long).length == RougeL.TokenCap)
    // identical long docs: LCS == cap, not the raw length
    assert(lcs(long, long) == RougeL.TokenCap)
  }

  test("lcsRows is partitioning-invariant and matches the scalar kernel") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat ate the dog"),
      (2L, "the dog ate the cat"),
      (3L, "an unrelated sentence entirely"),
      (4L, "the cat ate the dog today")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 4L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = RougeL.lcsRows(pairs, docs)
      .orderBy("doc_a", "doc_b").collect()
    val expect = Map((1L, 2L) -> 3L, (1L, 4L) -> 5L, (2L, 3L) -> 0L)
    for (r <- out) {
      val k = (r.getLong(0), r.getLong(1))
      assert(r.getLong(4) == expect(k), s"pair $k lcs ${r.getLong(4)}")
    }
    val re = RougeL.lcsRows(pairs.repartition(7), docs.repartition(5))
      .orderBy("doc_a", "doc_b").collect()
    assert(out.sameElements(re), "kernel not partitioning-invariant")
  }
}
