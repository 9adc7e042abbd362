package graft.operators

import org.apache.spark.sql.DataFrame

/** Compression-ratio quality signal — the production screen the char-
  * entropy gate (q110) approximates: run each document through a REAL
  * zlib deflate (the JDK's `java.util.zip.Deflater`, level 6) and read
  * the output/input byte ratio. Highly compressible text is boilerplate
  * or repetition (dedup/drop it); incompressible "text" is usually
  * binary junk or encoded blobs (drop it); natural prose sits in a
  * stable middle band. Curation stacks (Dolma/DataComp lineage) ship
  * exactly this filter because it is cheap, language-agnostic, and
  * hard to game.
  *
  * Determinism: zlib output for a fixed (input, level, strategy) is
  * deterministic within a zlib build, and Verify + gate run in the same
  * JVM — the oracle re-aggregates the materialized per-doc rows
  * (`_q277_input`, the q60/q208 codec pattern) rather than recomputing
  * deflate. The kernel itself is spec-pinned on ordering properties
  * (repetition ≪ prose ≪ keystream) that hold for ANY correct deflate.
  *
  * 100 TB posture: one partition-local iterator pass per document (the
  * Deflater is allocated per row and `end()`ed — native memory is not
  * left to the GC); the rollup is |sources| rows.
  */
object CompressionStats {

  /** Deflated byte length of `bytes` at the given zlib level. */
  def deflatedLen(bytes: Array[Byte], level: Int = 6): Long = {
    val d = new java.util.zip.Deflater(level, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Per-doc measurement rows: (doc_id, source, raw_len, defl_len). */
  def ratioRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.selectExpr("doc_id", "source", "text")
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        val b = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (id, src, b.length.toLong, deflatedLen(b))
      })
      .toDF("doc_id", "source", "raw_len", "defl_len")
  }
}
