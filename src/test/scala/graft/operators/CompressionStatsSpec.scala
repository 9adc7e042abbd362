package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the deflate-ratio kernel on ordering properties that hold for
  * ANY correct zlib build (exact output lengths are a zlib
  * implementation detail; the FILTER depends only on the bands). */
class CompressionStatsSpec extends SparkSpec {

  private def ratio(s: String): Double = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    CompressionStats.deflatedLen(b).toDouble / b.length
  }

  test("ratio orders repetition < varied prose < keystream bytes") {
    val rep = "ab" * 2000
    val prose = (0 until 600)
      .map(i => s"word${i % 97} tok${(i * 7) % 89} x${(i * 13) % 83}")
      .mkString(" ")
    val rand = Array.tabulate(4000)(i =>
      (scala.util.hashing.MurmurHash3.stringHash("s" + i) & 0x7f).toByte)
    val rRand = {
      val dl = CompressionStats.deflatedLen(rand.map(b => (b % 26 + 'a').toByte))
      dl.toDouble / rand.length
    }
    val (rRep, rProse) = (ratio(rep), ratio(prose))
    assert(rRep < rProse && rProse < rRand,
      s"ordering violated: rep=$rRep prose=$rProse rand=$rRand")
    assert(rRep < 0.05, s"pure repetition should collapse, got $rRep")
    // uniform a-z has a log2(26)/8 ≈ 0.59 information floor; deflate's
    // huffman gets close but never below it
    assert(rRand > 0.55, s"keystream should stay near its entropy floor, got $rRand")
  }

  test("ratioRows is deterministic and partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 40L)
      .map(i => (i, s"src${i % 3}", s"doc $i " + ("tok " * (i % 7 + 1).toInt)))
      .toDF("doc_id", "source", "text")
    val a = CompressionStats.ratioRows(docs).orderBy("doc_id").collect()
    val b = CompressionStats.ratioRows(docs.repartition(7))
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "rows changed under repartitioning")
    assert(a.forall(r => r.getLong(3) > 0), "empty deflate output")
  }
}
