package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The q44 router: the statistic, the routing decision, and the theorem
  * routing rests on — both physical forms emit identical rows. */
class NgramJaccardSpec extends SparkSpec {
  import spark.implicits._

  /** (doc_id, n_sh, shash) stream for a corpus given as (doc_id, tokens);
    * same shape q44 builds (distinct 3-gram shingles, hashed). */
  private def ex(docs: Seq[(Long, String)]): DataFrame = {
    import graft.functions.TextFunctions.{shingles, tokens}
    val d = docs.toDF("doc_id", "text")
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"))
      .filter(col("n_sh") > 0)
    d.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("shingle")).as("shash"))
  }

  private def vocabDoc(id: Long, words: Int): (Long, String) =
    (id, (0 until words).map(w => s"w${id}_$w").mkString(" "))

  /** 6 docs: 0/1 near-dups (shared long run), 2-5 disjoint vocab. */
  private val planted: Seq[(Long, String)] = {
    val shared = (0 until 30).map(i => s"common$i").mkString(" ")
    Seq(
      (0L, shared + " tail0 tail00"),
      (1L, shared + " tail1 tail11 tail111"),
      vocabDoc(2L, 25), vocabDoc(3L, 25), vocabDoc(4L, 25), vocabDoc(5L, 25))
  }

  test("massPerDoc matches the closed form on a hand-built corpus") {
    // 4 docs sharing one 5-token run -> 3 shared shingles of df=4 each;
    // everything else df=1. mass = 3 * C(4,2) = 18; n = 4.
    val run = "alpha beta gamma delta epsilon"
    val docs = (0L until 4L).map(i =>
      (i, s"u${i}a u${i}b u${i}c $run u${i}d u${i}e"))
    val m = NgramJaccard.massPerDoc(ex(docs), 4)
    assert(m == 18.0 / 4)
  }

  test("sampledStats: n_docs exact at any sampleMod; mass exact at mod 1") {
    val run = "alpha beta gamma delta epsilon"
    val docs = (0L until 4L).map(i =>
      (i, s"u${i}a u${i}b u${i}c $run u${i}d u${i}e"))
    val e = ex(docs)
    // sampleMod = 1 samples the whole vocabulary -> both stats exact.
    val (n1, m1) = NgramJaccard.sampledStats(e, sampleMod = 1)
    assert(math.abs(n1 - 4.0) < 1e-9)
    assert(math.abs(m1 - 18.0) < 1e-9)
    // n_docs is the exact sum of 1/n_sh regardless of the mass sample.
    val (n64, _) = NgramJaccard.sampledStats(e, sampleMod = 64)
    assert(math.abs(n64 - 4.0) < 1e-9)
    // Empty stream -> (0, 0), no NPE from a NULL sum.
    val (n0, m0) = NgramJaccard.sampledStats(e.filter(col("doc_id") < 0))
    assert(n0 == 0.0 && m0 == 0.0)
  }

  test("sampled routing: naive under the crossover, prefix when forced over it") {
    val e = ex(planted)
    val (clean, _) = NgramJaccard.similarPairsAutoSampled(e, 0.2, sampleMod = 1)
    assert(clean == "naive")
    val (hot, _) =
      NgramJaccard.similarPairsAutoSampled(e, 0.2, crossover = 0.1, sampleMod = 1)
    assert(hot == "prefix")
  }

  test("routing: diverse vocabulary stays naive, hot-shingle mass flips to prefix") {
    val e = ex(planted)
    val (cleanRoute, _) = NgramJaccard.similarPairsAuto(e, 6, 0.2)
    assert(cleanRoute == "naive",
      "a corpus 1000x under the crossover must take the naive join")
    // same data, crossover forced under the observed mass — the decision
    // logic, not the constant, is what this asserts
    val (hotRoute, _) = NgramJaccard.similarPairsAuto(e, 6, 0.2, crossover = 0.1)
    assert(hotRoute == "prefix")
  }

  test("both routes emit identical pairs (the losslessness routing relies on)") {
    val e = ex(planted).cache()
    try {
      val naive = NgramJaccard.naivePairs(e, 0.2)
        .orderBy("doc_a", "doc_b").collect().toSeq
      val prefix = PrefixFilterJoin
        .similarPairs(e, "doc_id", "n_sh", "shash", 0.2, 0.19)
        .orderBy("doc_a", "doc_b").collect().toSeq
      assert(naive.nonEmpty, "planted near-dup pair not found")
      assert(naive == prefix)
      assert(naive.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
    } finally e.unpersist()
  }

  test("the routed prefix plan joins on keys — never cartesian/nested-loop") {
    val (_, pairs) = NgramJaccard.similarPairsAuto(ex(planted), 6, 0.2, crossover = 0.1)
    val p = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "prefix route degenerated into an all-pairs join")
  }
}
