package graft.queries

import graft.core.Tables
import graft.operators.{GlobalRank, HashedLogReg}
import org.apache.spark.sql.functions._

/** Trained-classifier curation — the FineWeb-Edu / DCLM family: a cheap
  * rule labels the corpus, a linear model over hashed token features is
  * FIT by distributed gradient descent to imitate it, and the corpus is
  * scored so retention can be chosen per score decile. See
  * [[graft.operators.HashedLogReg]] for the model, the fixed-point
  * determinism recipe, and the 100 TB posture.
  */
object Classifier {

  private val Rounds = 8
  private val InvLr = 16L
  private val ThreshPerMille = 66L
  private val StopTerms = Seq("the", "a")

  // The one previously-persisted feature table (the NgramJaccard
  // pattern): repeated invocations in one session hold at most ONE
  // cached copy.
  private var lastX: Option[org.apache.spark.sql.DataFrame] = None

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- q233: trained quality classifier (hashed-feature LR) ----
    // Train 8 fixed-point gradient rounds to imitate the stop-ratio
    // rule (stop-tokens/1000 ≥ 66 — linear in bucket counts, so
    // honestly learnable up to hash-collision noise), score every doc,
    // and report the per-decile retention the curation decision reads:
    // docs, rule-positives, and model/rule agreement per score decile.
    // Measured at both SFs: retention is strongly monotone (top deciles
    // ~100% positive, bottom ~0%) with ~90% agreement — the model
    // really learns the rule, it is not returning the rule.
    //
    // The DuckDB oracle replays the ENTIRE training run: 8 unrolled
    // rounds, each recomputing per-doc margins, hard-sigmoid errors,
    // per-bucket gradients, and the integer weight update from the
    // previous round's weight table — then scores and rolls up deciles.
    // Every quantity is scaled-integer with mirrored `div`//`//`
    // truncation, so the hash compare certifies the full iterative fit,
    // not just the final rollup.
    //
    // 100 TB posture: one tokenize shuffle, per-round work on the
    // bucketized |docs|·≤257 table, model = 257 longs on the driver;
    // the final ranking is the stat-routed GlobalRank (naive below the
    // measured ~2M-row crossover — these SFs — two-pass above).
    "q233_quality_classifier" -> QueryDef(
      build = (spark, dir) => {
        val docs = Tables.documents(spark, dir)
        val x = synchronized {
          lastX.foreach(_.unpersist(blocking = false))
          val built = HashedLogReg.withLabelAndBias(
            HashedLogReg.tokenFeatures(docs, "text", StopTerms),
            ThreshPerMille)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          lastX = Some(built)
          built
        }
        val n = docs.count()
        val w = HashedLogReg.train(x, n, Rounds, InvLr)
        val scored = HashedLogReg.score(x, w)
        val minZ = scored.agg(min(col("z"))).head.getLong(0)
        val ranked = GlobalRank.withRankAndPrefixAuto(
          scored.withColumn("zp", col("z") - lit(minZ)),
          "zp", "doc_id", rowCount = Some(n))._2
        ranked
          .withColumn("decile", expr(s"((rn - 1) * 10) div ${n}L + 1"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("y")).as("n_pos"),
            sum(when((col("y") === 1L) === (col("z") >= 0L), 1L)
              .otherwise(0L)).as("agree"))
          .orderBy(col("decile"))
      },
      oracle = Some(lrOracle(Rounds)))
  )

  /** q233's oracle: the full fixed-point training run unrolled. Round k
    * derives weight table w_k from w_{k-1} entirely in SQL — per-doc
    * margin (join x ⋈ w), hard-sigmoid error in ppm, per-bucket gradient,
    * integer update ((g // n) // invLr) with absent buckets as gradient
    * 0 — then the final weights score every doc and the decile rollup
    * mirrors the Spark side's GlobalRank ordering (z DESC, doc_id). */
  private def lrOracle(rounds: Int): String = {
    val head = s"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
          FROM documents),
        lab AS MATERIALIZED (
          SELECT doc_id,
                 CASE WHEN CAST(SUM(CASE WHEN term IN ('the', 'a')
                                  THEN 1 ELSE 0 END) AS BIGINT) * 1000
                      // CAST(COUNT(*) AS BIGINT) >= $ThreshPerMille
                      THEN 1 ELSE 0 END AS y
          FROM tok GROUP BY 1),
        x AS MATERIALIZED (
          SELECT f.doc_id, lab.y, f.j, f.x
          FROM (SELECT doc_id,
                       (instr('0123456789abcdef', substring(md5(term), 1, 1))
                        - 1) * 16
                       + instr('0123456789abcdef', substring(md5(term), 2, 1))
                       - 1 AS j,
                       CAST(COUNT(*) AS BIGINT) AS x
                FROM tok GROUP BY 1, 2) f
          JOIN lab USING (doc_id)
          UNION ALL
          SELECT doc_id, y, ${HashedLogReg.Buckets}, CAST(1 AS BIGINT)
          FROM lab),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lab),
        w0 AS (SELECT unnest(generate_series(0, ${HashedLogReg.Buckets}))
                        AS j,
                      CAST(0 AS BIGINT) AS wv)"""
    val body = (1 to rounds).map { k =>
      val p = k - 1
      s""",
        z$k AS (SELECT x.doc_id, MAX(x.y) AS y,
                       CAST(SUM(x.x * w.wv) AS BIGINT) AS z
                FROM x JOIN w$p w ON w.j = x.j GROUP BY x.doc_id),
        e$k AS (SELECT doc_id,
                       y * 1000000 - GREATEST(CAST(0 AS BIGINT),
                         LEAST(CAST(1000000 AS BIGINT), 500000 + z // 4))
                         AS err
                FROM z$k),
        g$k AS (SELECT x.j, CAST(SUM(e.err * x.x) AS BIGINT) AS g
                FROM e$k e JOIN x ON x.doc_id = e.doc_id GROUP BY x.j),
        w$k AS MATERIALIZED (
          SELECT w.j,
                 w.wv + ((COALESCE(g.g, 0) // nn.n) // $InvLr) AS wv
          FROM w$p w LEFT JOIN g$k g ON g.j = w.j CROSS JOIN nn)"""
    }.mkString
    s"""$head$body,
        zf AS (SELECT x.doc_id, MAX(x.y) AS y,
                      CAST(SUM(x.x * w.wv) AS BIGINT) AS z
               FROM x JOIN w$rounds w ON w.j = x.j GROUP BY x.doc_id),
        r AS (SELECT *, row_number() OVER (ORDER BY z DESC, doc_id) AS rn
              FROM zf)
        SELECT ((rn - 1) * 10) // nn.n + 1 AS decile,
               COUNT(*) AS n_docs, CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(CASE WHEN (y = 1) = (z >= 0) THEN 1 ELSE 0 END)
                 AS BIGINT) AS agree
        FROM r CROSS JOIN nn GROUP BY 1 ORDER BY decile"""
  }
}
