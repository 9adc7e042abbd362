package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ProductQuantizer]] — the in-row encoder must agree exactly with the
  * relational assignment it replaces, and PQ/ADC must recover planted
  * cluster structure. */
class ProductQuantizerSpec extends SparkSpec {
  import ProductQuantizer._

  private def planted() = {
    import spark.implicits._
    // 4 well-separated base patterns × 10 noisy-ish copies each, 8 dims:
    // copy j of pattern p is base(p) with a deterministic ±0.01 wiggle.
    val rows = for {
      p <- 0 until 4
      j <- 0 until 10
    } yield {
      val base = Array.tabulate(8)(i => if (i % 4 == p) 1.0 else -0.25 * p)
      val v = base.zipWithIndex.map { case (x, i) =>
        x + 0.01 * (((p * 31 + j * 7 + i) % 5) - 2)
      }
      // id layout j*4+p: the 4 lowest ids (k-means init) span the 4
      // patterns, so Lloyd converges to one centroid per pattern.
      (j.toLong * 4 + p, v)
    }
    rows.toDF("vec_id", "emb")
      .select(col("vec_id"), quant(col("emb")).as("v"))
  }

  test("in-row encoder equals the relational assignment, code for code") {
    val e = planted().localCheckpoint(false)
    val m = 2; val subDim = 4
    val sub = subvectors(e, m, subDim)
    val cents = trainCodebooks(
      subvectors(e.filter(col("vec_id") % 2 === 0), m, subDim),
      k = 4, iters = 2).localCheckpoint(false)
    // relational argmin per (vec_id, s) — the oracle's algorithm
    val rel = sub.join(broadcast(cents), "s")
      .select(col("vec_id"), col("s"), col("cid"),
        sqDist(col("sv"), col("cv")).as("d"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(struct(col("cid"), col("d")),
        struct(col("d"), col("cid"))).as("best"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("best")))),
        x => x.getField("best").getField("cid")).as("code_rel"),
        sum(col("best").getField("d")).as("qerr_rel"))
    val cb = collectCodebook(cents, m, subDim)
    val (codeC, qerrC) = encodeColumns(cb, col("v"))
    val inRow = e.select(col("vec_id"), codeC.as("code"), qerrC.as("qerr"))
    val joined = inRow.join(rel, "vec_id")
    assert(joined.count() === 40)
    assert(joined.filter(col("code") =!= col("code_rel") ||
      col("qerr") =!= col("qerr_rel")).count() === 0)
  }

  test("PQ recovers planted clusters: one dominant code per pattern, " +
    "zero cross-pattern code collisions") {
    val e = planted().localCheckpoint(false)
    val m = 2; val subDim = 4
    val cents = trainCodebooks(subvectors(e, m, subDim), k = 4, iters = 2)
    val cb = collectCodebook(cents, m, subDim)
    val (codeC, _) = encodeColumns(cb, col("v"))
    val coded = e.select((col("vec_id") % 4).cast("int").as("pattern"),
      concat_ws(",", transform(codeC, _.cast("string"))).as("code"))
    // every member of a pattern must share that pattern's code, and the
    // 4 patterns must map to 4 distinct codes
    val perPattern = coded.groupBy(col("pattern"))
      .agg(countDistinct(col("code")).as("n_codes"))
    assert(perPattern.filter(col("n_codes") > 1).count() === 0)
    assert(coded.select(col("code")).distinct().count() === 4)
  }

  test("codebook is bounded and complete: m·k entries of subDim dims") {
    val e = planted()
    val m = 2; val subDim = 4
    val cents = trainCodebooks(subvectors(e, m, subDim), k = 4, iters = 1)
    val cb = collectCodebook(cents, m, subDim)
    assert(cb.cents.keySet === Set(0, 1))
    cb.cents.values.foreach { cs =>
      assert(cs.size <= 4 && cs.nonEmpty)
      cs.foreach { case (_, cv) => assert(cv.length === subDim) }
    }
  }
}
