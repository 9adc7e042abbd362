package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {

  private def fps(docs: Seq[(Long, String)], k: Int = 3, w: Int = 4) = {
    import spark.implicits._
    Winnowing.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
  }

  test("the winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    // k=3, w=4: any shared run of >= 6 tokens must yield a common fp.
    val shared = "alpha beta gamma delta epsilon zeta" // exactly 6 tokens
    val rnd = new scala.util.Random(5)
    def noise(n: Int) = (1 to n).map(_ => s"n${rnd.nextInt(500)}").mkString(" ")
    // 20 random embeddings of the shared run in unrelated noise
    val docs = (0L until 20L).map { id =>
      id -> s"${noise(5 + rnd.nextInt(20))} $shared ${noise(5 + rnd.nextInt(20))}"
    }
    val f = fps(docs).cache()
    val perDoc = f.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") === 20).count()
    assert(perDoc >= 1,
      "no fingerprint common to all 20 documents embedding the shared run")
  }

  test("fingerprints are deterministic and within-doc density is bounded") {
    val doc = Seq(1L -> (1 to 100).map(i => s"t${i % 7}").mkString(" "))
    val a = fps(doc).orderBy("fp", "pos").collect().toSeq
    val b = fps(doc).orderBy("fp", "pos").collect().toSeq
    assert(a == b)
    // winnowing picks at most one fp per window start but dedups: the
    // fingerprint count can never exceed the number of complete windows
    val nWindows = 100 - 3 + 1 - 4 + 1
    assert(a.size <= nWindows && a.nonEmpty)
  }

  test("stop-fingerprint cap drops over-common hashes from pairing") {
    import spark.implicits._
    // 10 identical docs: every fp appears in all 10 -> a cap of 5
    // suppresses all pairs; a cap of 50 yields all 45
    val docs = (0L until 10L).map(id => id -> "a b c d e f g h i j").toDF("doc_id", "text")
    val f = Winnowing.fingerprints(docs, "doc_id", "text")
    assert(Winnowing.sharedPairs(f, minShared = 1, maxDocsPerFp = 5).count() == 0)
    assert(Winnowing.sharedPairs(f, minShared = 1, maxDocsPerFp = 50).count() == 45)
  }

  test("disjoint vocabularies share nothing") {
    val docs = Seq(1L -> (1 to 50).map(i => s"x$i").mkString(" "),
      2L -> (1 to 50).map(i => s"y$i").mkString(" "))
    val f = fps(docs)
    assert(Winnowing.sharedPairs(f, minShared = 1).count() == 0)
  }
}
