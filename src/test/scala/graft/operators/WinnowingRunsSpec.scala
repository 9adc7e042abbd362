package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q354's operator pinned at the unit level: maximal aligned shared
  * fingerprint runs over documents with PLANTED overlapping passages
  * (VERDICT r13 #6 — the ExactSubstr semantic, not fixed windows).
  */
class WinnowingRunsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def runsOf(df: org.apache.spark.sql.DataFrame) =
    Winnowing.sharedRuns(
      Winnowing.fingerprints(df, "doc_id", "text", k = 3, w = 4),
      maxDocsPerFp = 50, gap = 4, k = 3)

  // distinct filler vocabularies so ONLY the planted passage is shared
  private def filler(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a planted shared passage is recovered as one aligned run") {
    val passage = (1 to 20).map(i => s"shared$i").mkString(" ")
    val d = docs(
      1L -> s"${filler("alpha", 12)} $passage ${filler("beta", 9)}",
      2L -> s"${filler("gamma", 7)} $passage ${filler("delta", 14)}")
    val runs = runsOf(d).collect()
    assert(runs.nonEmpty, "planted passage produced no shared run")
    // all matched fingerprints of the passage sit on ONE diagonal:
    // doc1 offset 12, doc2 offset 7 -> diag = 7 - 12 = -5
    assert(runs.forall(_.getAs[Long]("diag") == -5L),
      s"unexpected diagonals: ${runs.map(_.getAs[Long]("diag")).toSeq}")
    // the certified lower bound must reach most of the 20-token passage
    // (selection can start up to w-1=3 grams inside each edge) and
    // never exceed it
    val longest = runs.map(_.getAs[Long]("run_tokens")).max
    assert(longest >= 20L - 6L && longest <= 20L,
      s"certified run length $longest for a 20-token passage")
  }

  test("two passages at different alignments give two runs, not one") {
    val p1 = (1 to 12).map(i => s"one$i").mkString(" ")
    val p2 = (1 to 12).map(i => s"two$i").mkString(" ")
    val d = docs(
      1L -> s"$p1 ${filler("mid", 10)} $p2",
      2L -> s"$p2 ${filler("oth", 16)} $p1")
    val runs = runsOf(d).collect()
    val diags = runs.map(_.getAs[Long]("diag")).distinct.sorted
    assert(diags.length == 2,
      s"expected 2 alignment diagonals, got ${diags.toSeq}")
    // each run's certified length stays within its own 12-token passage
    assert(runs.forall(r => r.getAs[Long]("run_tokens") <= 12L),
      "a run leaked across the unshared middle")
    assert(runs.map(_.getAs[Long]("run_tokens")).max >= 6L)
  }

  test("unrelated documents share no runs; cap drops stop-fingerprints") {
    val d = docs(
      1L -> filler("aa", 30),
      2L -> filler("bb", 30))
    assert(runsOf(d).isEmpty, "disjoint vocabularies produced runs")
    // the same passage in 60 docs exceeds maxDocsPerFp=50 -> no pairs
    val passage = (1 to 15).map(i => s"hot$i").mkString(" ")
    val many = docs((1L to 60L).map(i =>
      i -> s"${filler(s"u${i}x", 5)} $passage"): _*)
    assert(runsOf(many).isEmpty,
      "stop-fingerprint cap failed to drop the 60-doc passage")
  }

  test("run census arithmetic: span + k, gaps-and-islands at gap=w") {
    // one 10-token passage: grams 0..7 shared; winnowed selections are
    // <= 4 apart, so one island with run_tokens = span + 3 <= 10
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val d = docs(1L -> s"$passage ${filler("x", 20)}",
      2L -> s"${filler("y", 20)} $passage")
    val runs = runsOf(d).collect()
    assert(runs.length == 1, s"expected one run, got ${runs.length}")
    val r = runs.head
    assert(r.getAs[Long]("p0") >= 0L, "island start must be a gram pos")
    assert(r.getAs[Long]("run_tokens") >= 4L &&
      r.getAs[Long]("run_tokens") <= 10L,
      s"run_tokens ${r.getAs[Long]("run_tokens")} outside [4, 10]")
    assert(r.getAs[Long]("n_fps") >= 1L)
  }
}
