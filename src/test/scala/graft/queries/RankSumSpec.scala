package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shared Mann-Whitney kernel behind q169/q171 — hand-computed
  * tie-corrected values, and the equivalence that justifies sharing:
  * the per-class sweep restricted to a binary label IS the global AUC. */
class RankSumSpec extends SparkSpec {
  import spark.implicits._

  // (score, label): ties at 10 (one pos, one neg) and 20 (two pos, one neg).
  // U = Σ_pos (#neg below + ½·#neg tied) = 1.5 + 2.5 + 2.5 = 6.5 → 2U = 13,
  // AUC = 13/18 → 722222 ppm by integer division.
  private val rows = Seq((10L, 1L), (10L, 0L), (20L, 1L), (5L, 0L), (20L, 0L), (20L, 1L))

  test("global kernel matches the hand-computed tie-corrected AUC") {
    val scored = rows.toDF("score", "label")
      .select(col("score"), when(col("label") === 1, 1L).otherwise(0L).as("pos"))
    val r = CorpusStats.rankSumAuc(scored).head
    assert(r.getAs[Long]("n_pos") == 3 && r.getAs[Long]("n_neg") == 3)
    assert(r.getAs[Long]("u2") == 13)
    assert(r.getAs[Long]("auc_ppm") == 722222L)
  }

  test("per-class kernel on a binary label equals the global kernel (q171 ≡ q169)") {
    val base = rows.toDF("score", "label")
    val classes = base.select(col("label").as("cls")).distinct()
    val perClass = CorpusStats.rankSumAuc(
      base.crossJoin(classes).select(col("cls"), col("score"),
        when(col("label") === col("cls"), 1L).otherwise(0L).as("pos")),
      "cls")
    Seq(0L, 1L).foreach { c =>
      val global = CorpusStats.rankSumAuc(
        base.select(col("score"),
          when(col("label") === c, 1L).otherwise(0L).as("pos"))).head
      val per = perClass.where(col("cls") === c).head
      Seq("n_pos", "n_neg", "u2", "auc_ppm").foreach { f =>
        assert(per.getAs[Long](f) == global.getAs[Long](f), s"cls=$c $f")
      }
    }
  }

  test("degenerate groups: all-positive scores yield a NULL ppm, not a crash") {
    // n_neg = 0 makes the divisor 0 — integer div returns NULL in both
    // engines rather than throwing; the kernel must pass that through.
    val scored = Seq((1L, 1L), (2L, 1L)).toDF("score", "pos")
    val r = CorpusStats.rankSumAuc(scored).head
    assert(r.getAs[Long]("n_neg") == 0 && r.isNullAt(r.fieldIndex("auc_ppm")))
  }
}
