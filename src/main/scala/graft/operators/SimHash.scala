package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting.
  *
  * Per document: each token votes ±1 on each of 64 bits (sign of bit j of
  * xxhash64(token)); bit j of the fingerprint is 1 iff the vote sum is
  * positive. Similar documents differ in few bits, so near-dup search is
  * Hamming-distance search, solved at scale by the pigeonhole block trick:
  * split the 64-bit fingerprint into (maxHamming+1) blocks — any pair
  * within distance maxHamming agrees on at least one whole block, so an
  * equijoin on (block index, block value) finds all of them without a
  * cross product.
  *
  * All column expressions (no UDF); deterministic via xxhash64.
  */
object SimHash {

  /** 64-bit SimHash of a token array, as a Column. Compiled one-pass
    * kernel (see [[graft.functions.CodegenExpressions.SimHashExpr]]);
    * bit-identical to the per-bit HOF formulation
    * `OR_j (Σ_t sign(bit_j(xxhash64(t)))) > 0 ? 1<<j : 0`. */
  def simhash64(toks: Column): Column =
    graft.functions.CodegenExpressions.simhashCol(toks)

  /** doc_id, simhash, and the nearest Hamming distance found among block
    * collisions (null = no candidate within range). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks
    val fp = docs.select(col(idCol).as("doc_id"),
      simhash64(tokens(col(textCol))).as("simhash"))

    val blocks = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until nBlocks).map { k =>
        struct(lit(k).as("blk"),
          shiftright(col("simhash"), k * width)
            .bitwiseAND((1L << width) - 1).as("v"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.blk").as("blk"), col("b.v").as("v"))

    val a = blocks.select(col("blk"), col("v"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = blocks.select(col("blk"), col("v"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))

    val nn = a.join(b, Seq("blk", "v"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("ham"))
      .filter(col("ham") <= maxHamming)
      .groupBy(col("id_a")).agg(min(col("ham")).as("nn_hamming"))

    fp.join(nn, fp("doc_id") === nn("id_a"), "left")
      .select(col("doc_id"), col("simhash"), col("nn_hamming"))
      .orderBy(col("doc_id"))
  }
}
