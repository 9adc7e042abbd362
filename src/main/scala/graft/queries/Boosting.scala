package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Boosted decision-stump ensembles — the SECOND trained-model family
  * beside [[graft.operators.HashedLogReg]]'s linear one. Same
  * FineWeb-Edu-style task (distill the cheap stop-ratio labeler into a
  * learned scorer, q233's contract) so the two learners are directly
  * comparable, but a different hypothesis class and a different training
  * algorithm: discrete AdaBoost (Freund–Schapire) over interpretable
  * threshold stumps, where each round reweights the corpus toward the
  * docs the ensemble still gets wrong.
  *
  * Determinism recipe (the HashedLogReg fixed-point discipline, adapted):
  * weights are integers starting at 10⁶ per doc; round error ε is kept in
  * clamped ppm; the reweight multiplies by ε (correct) or 10⁶−ε (wrong)
  * and floor-divides by 10⁶ with a GREATEST(…,1) floor, so every weight
  * is always a positive BIGINT and both engines agree bit-for-bit. The
  * classic exp(±α) update is exactly this multiplier pair up to global
  * normalization (which cancels in the argmin); the final sign(Σ α_t h_t)
  * vote is evaluated WITHOUT logarithms by cross-multiplying the
  * β_t = ε_t/(10⁶−ε_t) odds: predict +1 iff Π_{h=+1} ε_t · Π_{h=−1}
  * (10⁶−ε_t) < Π_{h=−1} ε_t · Π_{h=+1} (10⁶−ε_t) — six factors ≤ 10⁶
  * per side (≤ 10³⁶), exact in DECIMAL(38,0)/HUGEINT, ties to −1.
  *
  * 100 TB posture: each round is ONE aggregate over the per-doc stats
  * table (8 conditional sums + the weight total — no explode, no join),
  * the model state crossing the driver is 16 numbers per round, and the
  * weight update is a map-side column rewrite. Stats build is a single
  * corpus pass. Rounds are inherently sequential (boosting's definition);
  * the per-round cost is the cheapest aggregate Spark can run.
  */
object Boosting {

  private[queries] val Rounds = 6

  /** Binary threshold features over the per-doc stats table — written in
    * the SQL dialect BOTH engines parse, so the exact strings below run
    * verbatim in the Spark plan and the DuckDB oracle. The label is a
    * SUM-ratio rule (stop ≥ 66‰), and no single feature sees the sum at
    * the right cut: f8/f9 bracket it (50‰/80‰) and f3–f6 see only the
    * per-term ratios (the/a at 30‰/40‰). Boosting's job — and the card's
    * measured story — is reconstructing the in-between sum rule as a
    * weighted soft-AND of these imperfect primitives. */
  private[queries] val Feats: Seq[String] = Seq(
    "the_cnt >= 3", "a_cnt >= 3", "n_tok >= 70",
    "the_cnt * 1000 >= 30 * n_tok", "the_cnt * 1000 >= 40 * n_tok",
    "a_cnt * 1000 >= 30 * n_tok", "a_cnt * 1000 >= 40 * n_tok",
    "stop_cnt >= 5",
    "stop_cnt * 1000 >= 50 * n_tok", "stop_cnt * 1000 >= 80 * n_tok")

  /** Per-doc stats + label: (doc_id, n_tok, the_cnt, a_cnt, stop_cnt,
    * ypos) — ypos replays q233's stop-ratio labeler (≥ 66‰). */
  private[queries] def stats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        expr("CAST(size(filter(toks, x -> x = 'the')) AS BIGINT)")
          .as("the_cnt"),
        expr("CAST(size(filter(toks, x -> x = 'a')) AS BIGINT)")
          .as("a_cnt"))
      .withColumn("stop_cnt", col("the_cnt") + col("a_cnt"))
      .withColumn("ypos",
        expr("(stop_cnt * 1000) div n_tok") >= 66L)

  /** One AdaBoost fit: returns the per-round picks (t, feat, pol,
    * wrong_w, tot_w, eps_ppm) and the doc frame with the FINAL weight
    * column `w` (the spec's handle for the ½-error invariant). Stump
    * selection minimizes weighted error with (wrong, j, pol) ascending
    * tie-break (pol −1 before +1), mirrored in the oracle's ORDER BY. */
  private[queries] def trainStumps(statsDf: DataFrame, rounds: Int)
      : (Seq[(Long, Long, Long, Long, Long, Long)], DataFrame,
         List[(Int, Long, Long)]) = {
    var cur = statsDf.withColumn("w", lit(1000000L)).localCheckpoint(false)
    val picks = Seq.newBuilder[(Long, Long, Long, Long, Long, Long)]
    var chosen = List.empty[(Int, Long, Long)] // (feat, pol, eps) newest first
    for (t <- 1 to rounds) {
      val aggCols = Feats.zipWithIndex.map { case (f, j) =>
        sum(when(expr(f) =!= col("ypos"), col("w")).otherwise(0L))
          .as(s"e$j")
      } :+ sum(col("w")).as("tot")
      val r = cur.agg(aggCols.head, aggCols.tail: _*).head
      val tot = r.getAs[Long]("tot")
      // pol +1: h = f ? +1 : −1 → wrong weight = e_j; pol −1 reverses.
      val cand16 = Feats.indices.flatMap { j =>
        val e = r.getAs[Long](s"e$j")
        Seq((e, j.toLong, 1L), (tot - e, j.toLong, -1L))
      }
      val (wrong, fj, pol) = cand16.minBy { case (e, j, p) => (e, j, p) }
      val eps = math.max(1L, math.min(999999L, wrong * 1000000L / tot))
      picks += ((t.toLong, fj, pol, wrong, tot, eps))
      chosen ::= ((fj.toInt, pol, eps))
      val cmp = if (pol == 1L) "=" else "!="
      cur = cur.withColumn("w", expr(
        s"GREATEST((w * (CASE WHEN (${Feats(fj.toInt)}) $cmp ypos" +
          s" THEN $eps ELSE ${1000000L - eps} END)) div 1000000, 1)"))
        .localCheckpoint(false)
    }
    (picks.result(), cur, chosen.reverse)
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- q316: AdaBoost stump ensemble (the second model family) ----
    // Card: one row per round — the chosen stump (feature id, polarity),
    // its weighted error in exact integers, and the final ensemble's
    // confusion + accuracy riding every row (the q278 pattern). The
    // oracle replays ALL rounds in SQL — candidate stacking, the
    // (wrong, j, pol) argmin, the clamped ε, the floor-div reweight and
    // the cross-multiplied final vote — so a selection disagreement in
    // any round cascades into a row mismatch (the q311 precedent).
    "q316_adaboost_stumps" -> QueryDef(
      build = (spark, dir) => {
        import spark.implicits._
        val d0 = stats(spark, dir)
        val (picks, cur, fs) = trainStumps(d0, Rounds)
        def side(flip: Boolean) = fs.map { case (j, pol, eps) =>
          val ind = if (pol == 1L) s"(${Feats(j)})" else s"(NOT (${Feats(j)}))"
          val (a, b) = if (flip) (1000000L - eps, eps) else (eps, 1000000L - eps)
          s"(CASE WHEN $ind THEN CAST($a AS DECIMAL(38,0))" +
            s" ELSE CAST($b AS DECIMAL(38,0)) END)"
        }.mkString(" * ")
        val predPos = expr(s"(${side(flip = false)}) < (${side(flip = true)})")
        val ens = cur
          .select(col("ypos"), predPos.as("ppos"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("ppos") && col("ypos"), 1L).otherwise(0L))
              .as("ens_tp"),
            sum(when(col("ppos") && !col("ypos"), 1L).otherwise(0L))
              .as("ens_fp"),
            sum(when(!col("ppos") && col("ypos"), 1L).otherwise(0L))
              .as("ens_fn"),
            sum(when(!col("ppos") && !col("ypos"), 1L).otherwise(0L))
              .as("ens_tn"))
          .select(col("n_docs"), col("ens_tp"), col("ens_fp"),
            col("ens_fn"), col("ens_tn"),
            expr("(ens_tp + ens_tn) * 1000000 div n_docs")
              .as("ens_acc_ppm"))
        picks.toDF("t", "feat", "pol", "wrong_w", "tot_w", "eps_ppm")
          .crossJoin(broadcast(ens))
          .orderBy(col("t"))
      },
      oracle = Some(adaboostOracle()))
  )

  /** The unrolled-SQL replay of [[trainStumps]] + the final vote. */
  private def adaboostOracle(): String = {
    def fval(alias: String) =
      "(CASE " + Feats.zipWithIndex.map { case (f, j) =>
        s"WHEN $alias.j = $j THEN (${f.replaceAll("\\b(n_tok|the_cnt|a_cnt|stop_cnt)\\b", "s.$1")})"
      }.mkString(" ") + " ELSE FALSE END)"
    val sb = new StringBuilder
    sb ++= """
        WITH d AS (SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(len(list_filter(toks, x -> x = 'the')) AS BIGINT)
                 AS the_cnt,
               CAST(len(list_filter(toks, x -> x = 'a')) AS BIGINT)
                 AS a_cnt
             FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
                   FROM documents)),
        s0 AS MATERIALIZED (SELECT doc_id, n_tok, the_cnt, a_cnt,
               the_cnt + a_cnt AS stop_cnt,
               ((the_cnt + a_cnt) * 1000) // n_tok >= 66 AS ypos,
               CAST(1000000 AS BIGINT) AS w
             FROM d)"""
    for (t <- 1 to Rounds) {
      val p = t - 1
      val esels = Feats.zipWithIndex.map { case (f, j) =>
        s"CAST(SUM(CASE WHEN ($f) != ypos THEN w ELSE 0 END) AS BIGINT) AS e$j"
      }.mkString(", ")
      val stack = Feats.indices.map { j =>
        s"SELECT $j AS j, 1 AS pol, e$j AS wrong, tot FROM err$t" +
          s" UNION ALL SELECT $j, -1, tot - e$j, tot FROM err$t"
      }.mkString(" UNION ALL ")
      sb ++= s""",
        err$t AS MATERIALIZED (SELECT $esels, CAST(SUM(w) AS BIGINT) AS tot FROM s$p),
        cand$t AS ($stack),
        pick$t AS MATERIALIZED (SELECT j, pol, wrong, tot,
               GREATEST(1, LEAST(999999, wrong * 1000000 // tot)) AS eps
             FROM cand$t ORDER BY wrong, j, pol LIMIT 1),
        s$t AS MATERIALIZED (SELECT s.doc_id, s.n_tok, s.the_cnt, s.a_cnt, s.stop_cnt,
               s.ypos,
               GREATEST((s.w * (CASE WHEN (CASE WHEN p.pol = 1
                   THEN ${fval("p")} ELSE NOT ${fval("p")} END) = s.ypos
                 THEN p.eps ELSE 1000000 - p.eps END)) // 1000000, 1) AS w
             FROM s$p s CROSS JOIN pick$t p)"""
    }
    def voteSide(flip: Boolean) = (1 to Rounds).map { t =>
      val h = s"(CASE WHEN p$t.pol = 1 THEN ${fval(s"p$t")}" +
        s" ELSE NOT ${fval(s"p$t")} END)"
      val (a, b) = if (flip) (s"1000000 - p$t.eps", s"p$t.eps")
                   else (s"p$t.eps", s"1000000 - p$t.eps")
      s"(CASE WHEN $h THEN CAST($a AS HUGEINT) ELSE CAST($b AS HUGEINT) END)"
    }.mkString(" * ")
    val pjoins = (1 to Rounds).map(t => s"CROSS JOIN pick$t p$t").mkString(" ")
    sb ++= s""",
        voted AS (SELECT s.ypos,
               (${voteSide(flip = false)}) < (${voteSide(flip = true)})
                 AS ppos
             FROM s0 s $pjoins),
        ens AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN ppos AND ypos THEN 1 ELSE 0 END)
                 AS BIGINT) AS ens_tp,
               CAST(SUM(CASE WHEN ppos AND NOT ypos THEN 1 ELSE 0 END)
                 AS BIGINT) AS ens_fp,
               CAST(SUM(CASE WHEN NOT ppos AND ypos THEN 1 ELSE 0 END)
                 AS BIGINT) AS ens_fn,
               CAST(SUM(CASE WHEN NOT ppos AND NOT ypos THEN 1 ELSE 0 END)
                 AS BIGINT) AS ens_tn
             FROM voted),
        rounds AS (${(1 to Rounds).map(t =>
          s"SELECT CAST($t AS BIGINT) AS t, CAST(j AS BIGINT) AS feat," +
            s" CAST(pol AS BIGINT) AS pol, wrong AS wrong_w, tot AS tot_w," +
            s" eps AS eps_ppm FROM pick$t").mkString(" UNION ALL ")})
        SELECT r.t, r.feat, r.pol, r.wrong_w, r.tot_w, r.eps_ppm,
               e.n_docs, e.ens_tp, e.ens_fp, e.ens_fn, e.ens_tn,
               (e.ens_tp + e.ens_tn) * 1000000 // e.n_docs AS ens_acc_ppm
        FROM rounds r CROSS JOIN ens e ORDER BY r.t"""
    sb.toString
  }
}
