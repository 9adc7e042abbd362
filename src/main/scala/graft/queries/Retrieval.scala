package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lexical retrieval over `documents` — the ranking side of a
  * training-data pipeline (target-domain document selection, retrieval-
  * augmented filtering, search-quality evals all start from BM25).
  *
  * Determinism discipline (same as q88/q92): every per-(doc, term)
  * contribution is computed by an identical IEEE expression tree in both
  * engines over exact-integer inputs, rounded to 9 dp, accumulated in
  * DECIMAL, and the 6-dp rounded score is the rank key.
  */
object Retrieval {

  /** The fixed query — broadcastable at any SF (a real system would take
    * a query batch; the plan shape is identical). */
  private val QueryTerms = Seq("join", "vector", "window", "slow")
  private val K1 = 1.2
  private val B = 0.75

  // q115 constants (declared before `defs`: the oracle string is built
  // eagerly during defs initialization).
  private val MmrPool = 20
  private val MmrK = 5
  private val MmrLambda = 0.7

  /** (doc_id, n_terms_hit, score): every doc matching >= 1 query term
    * with its 6-dp BM25 score — q94's scorer, shared with the q224
    * ranking-quality gate. Stats broadcast; the model never shuffles. */
  private def bm25Scored(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("term"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val st = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    val tf = toks.filter(col("term").isin(QueryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("dft"))
    tf.join(broadcast(dft), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(st))
      .select(col("doc_id"), round(
        log(lit(1.0) + (col("n_docs") - col("dft") + lit(0.5)) /
          (col("dft") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) *
            (col("dl").cast("double") /
              (col("total_tokens").cast("double") / col("n_docs"))))),
        9).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        round(sum(col("contrib").cast(DecimalType(28, 9))).cast("double"),
          6).as("score"))
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- q94: BM25 top-k retrieval ----
    // Okapi BM25 (Robertson/Sparck Jones, public formulation):
    //   idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
    //   s(d, t) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    //
    // 100 TB posture: one tokenize pass feeds BOTH the doc-length table
    // (corpus-keyed partial agg) and the query-term tf table (the isin
    // filter discards non-query tokens before the shuffle, so the tf agg
    // ships only matching-term rows). df and the corpus stats are
    // vocabulary/scalar-sized and broadcast; the scoring join touches
    // only docs with ≥1 hit. No stage is quadratic, the only corpus-
    // sized shuffle is the doc-length count.
    "q94_bm25_topk" -> QueryDef(
      build = (spark, dir) => bm25Scored(spark, dir)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10),
      oracle = Some(s"""
        WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
                     FROM documents),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok
               GROUP BY doc_id),
        st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
               WHERE term IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
               GROUP BY 1, 2),
        dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dft FROM tf
                GROUP BY term),
        sc AS (SELECT f.doc_id,
                      ROUND(LN(CAST(1.0 AS DOUBLE)
                               + (st.n_docs - d.dft + CAST(0.5 AS DOUBLE))
                               / (d.dft + CAST(0.5 AS DOUBLE)))
                            * (f.tf * CAST(2.2 AS DOUBLE))
                            / (f.tf + CAST($K1 AS DOUBLE)
                               * (CAST(${1 - B} AS DOUBLE)
                                  + CAST($B AS DOUBLE)
                                  * (CAST(l.dl AS DOUBLE)
                                     / (CAST(st.total_tokens AS DOUBLE)
                                        / st.n_docs)))), 9) AS contrib
               FROM tf f JOIN dft d USING (term) JOIN dl l USING (doc_id), st)
        SELECT doc_id, COUNT(*) AS n_terms_hit,
               ROUND(CAST(SUM(CAST(contrib AS DECIMAL(28,9))) AS DOUBLE), 6)
                 AS score
        FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""")),

    // ---- q114: hybrid retrieval — reciprocal-rank fusion ----
    // The standard hybrid-search primitive (Cormack/Clarke/Buettcher,
    // SIGIR'09): fuse a lexical ranking (q94's BM25) with a dense ranking
    // (q50's cosine, query vector = embedding 0 — doc_id and vec_id share
    // an id space in this corpus) via RRF(d) = Σ_arms 1/(60 + rank_arm(d)).
    // Rank fusion is what makes hybrid retrieval robust: scores from the
    // two arms are incommensurable, ranks are not.
    //
    // Determinism: each arm's rank key is already engine-parity-proven
    // (q94's decimal-accumulated 6-dp score; q50's cosine + vec_id
    // tie-break). 1/(60+r) over exact integer ranks is one IEEE division
    // (correctly rounded, identical everywhere), rounded 9 dp and fused by
    // EXACT decimal addition; the 9-dp fused score is the rank key with
    // doc_id tie-break.
    //
    // 100 TB posture: both arms end in a top-k (corpus-sized work is
    // exactly q94's and q50's proven shapes — broadcast stats / broadcast
    // query side); rank assignment and the full-outer fusion join run on
    // two k-row sets, so the fusion stage is constant-size no matter the
    // corpus. A query BATCH adds a qid key to every stage and the fusion
    // join becomes (qid, doc_id)-keyed — same plan, sharded by query.
    "q114_hybrid_rrf" -> QueryDef(
      build = (spark, dir) => {
        import graft.functions.VectorFunctions.{cosine, vec64}
        import org.apache.spark.sql.expressions.Window
        // lexical arm: q94's scoring, kept to top 50 by (score, doc_id)
        val toks = Tables.documents(spark, dir)
          .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("term"))
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val st = dl.agg(count(lit(1)).as("n_docs"),
          sum(col("dl")).as("total_tokens"))
        val tf = toks.filter(col("term").isin(QueryTerms: _*))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("dft"))
        val lexTop = tf.join(broadcast(dft), Seq("term"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(st))
          .select(col("doc_id"), round(
            log(lit(1.0) + (col("n_docs") - col("dft") + lit(0.5)) /
              (col("dft") + lit(0.5))) *
              (col("tf") * lit(2.2)) /
              (col("tf") + lit(K1) * (lit(1 - B) + lit(B) *
                (col("dl").cast("double") /
                  (col("total_tokens").cast("double") / col("n_docs"))))),
            9).as("contrib"))
          .groupBy(col("doc_id"))
          .agg(round(sum(col("contrib").cast(DecimalType(28, 9))).cast("double"),
            6).as("lex_score"))
          .orderBy(col("lex_score").desc, col("doc_id")).limit(50)
        // rank over the 50-row set only (global window is constant-size)
        val lex = lexTop.withColumn("lex_rank", row_number().over(
            Window.orderBy(col("lex_score").desc, col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("lex_rank"))
        // dense arm: q50's cosine ranking for query vector 0, top 50
        val q0 = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
          .select(vec64(col("embedding")).as("qe"))
        val denseTop = Tables.embeddings(spark, dir).filter(col("vec_id") =!= 0)
          .select(col("vec_id"), vec64(col("embedding")).as("e"))
          .crossJoin(broadcast(q0))
          .select(col("vec_id"), cosine(col("qe"), col("e")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id")).limit(50)
        val dense = denseTop.withColumn("dense_rank", row_number().over(
            Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
          .select(col("vec_id").as("doc_id"), col("dense_rank"))
        def rrfTerm(rank: org.apache.spark.sql.Column): org.apache.spark.sql.Column = coalesce(
          round(lit(1.0) / (lit(60) + rank), 9).cast(DecimalType(28, 9)),
          lit(0).cast(DecimalType(28, 9)))
        lex.join(dense, Seq("doc_id"), "full_outer")
          .withColumn("rrf_score",
            (rrfTerm(col("lex_rank")) + rrfTerm(col("dense_rank")))
              .cast("double"))
          .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
            col("rrf_score"))
          .orderBy(col("rrf_score").desc, col("doc_id")).limit(20)
      },
      oracle = Some(s"""
        WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
                     FROM documents),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok
               GROUP BY doc_id),
        st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
               WHERE term IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
               GROUP BY 1, 2),
        dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dft FROM tf
                GROUP BY term),
        sc AS (SELECT f.doc_id,
                      ROUND(LN(CAST(1.0 AS DOUBLE)
                               + (st.n_docs - d.dft + CAST(0.5 AS DOUBLE))
                               / (d.dft + CAST(0.5 AS DOUBLE)))
                            * (f.tf * CAST(2.2 AS DOUBLE))
                            / (f.tf + CAST($K1 AS DOUBLE)
                               * (CAST(${1 - B} AS DOUBLE)
                                  + CAST($B AS DOUBLE)
                                  * (CAST(l.dl AS DOUBLE)
                                     / (CAST(st.total_tokens AS DOUBLE)
                                        / st.n_docs)))), 9) AS contrib
               FROM tf f JOIN dft d USING (term) JOIN dl l USING (doc_id), st),
        lex_top AS (
          SELECT doc_id,
                 ROUND(CAST(SUM(CAST(contrib AS DECIMAL(28,9))) AS DOUBLE), 6)
                   AS lex_score
          FROM sc GROUP BY doc_id ORDER BY lex_score DESC, doc_id LIMIT 50),
        lex AS (SELECT doc_id,
                       CAST(ROW_NUMBER() OVER (ORDER BY lex_score DESC, doc_id)
                            AS BIGINT) AS lex_rank
                FROM lex_top),
        q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
               WHERE vec_id = 0),
        dense_top AS (
          SELECT vec_id, list_cosine_similarity(qe, CAST(embedding AS DOUBLE[]))
                   AS cos
          FROM embeddings, q0 WHERE vec_id != 0
          ORDER BY cos DESC, vec_id LIMIT 50),
        dense AS (SELECT vec_id AS doc_id,
                         CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id)
                              AS BIGINT) AS dense_rank
                  FROM dense_top),
        fused AS (
          SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.lex_rank,
                 d.dense_rank,
                 CAST(COALESCE(CAST(ROUND(CAST(1.0 AS DOUBLE)
                                          / (60 + l.lex_rank), 9)
                                    AS DECIMAL(28,9)),
                               CAST(0 AS DECIMAL(28,9)))
                      + COALESCE(CAST(ROUND(CAST(1.0 AS DOUBLE)
                                            / (60 + d.dense_rank), 9)
                                      AS DECIMAL(28,9)),
                                 CAST(0 AS DECIMAL(28,9))) AS DOUBLE)
                   AS rrf_score
          FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id)
        SELECT doc_id, lex_rank, dense_rank, rrf_score
        FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 20""")),

    // ---- q115: MMR diversified re-ranking ----
    // Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98): from a
    // relevance-ranked candidate pool, greedily select k results trading
    // relevance against redundancy to what is already selected:
    //   pick_1 = argmax rel(d)
    //   pick_i = argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)
    // The standard diversification step between retrieval and the user (or
    // between retrieval and a training-example sampler — diverse few-shot
    // context assembly uses exactly this loop).
    //
    // Determinism: rel and all pairwise sims are rounded to 9 dp once;
    // every MMR objective is then one IEEE expression over those rounded
    // doubles (λ = 0.7 exact-double in both engines), rounded 9 dp, with
    // vec_id as the total tie-break at every argmax. The greedy trace is
    // therefore bit-identical across engines and partitionings.
    //
    // 100 TB posture: only candidate generation touches the corpus (q50's
    // proven broadcast-query shape). The greedy loop runs on the constant-
    // size candidate pool (20 rows, k=5 picks): pairwise sims are k·|pool|
    // rows, each iteration a tiny keyed agg + TakeOrdered — constant work
    // regardless of corpus size. A query batch adds a qid key to pool,
    // pairs, and every argmax window.
    "q115_mmr_rerank" -> QueryDef(
      build = (spark, dir) => {
        import graft.functions.VectorFunctions.{cosine, vec64}
        val emb = Tables.embeddings(spark, dir)
        val q0 = emb.filter(col("vec_id") === 0)
          .select(vec64(col("embedding")).as("qe"))
        val cand = emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), vec64(col("embedding")).as("e"))
          .crossJoin(broadcast(q0))
          .select(col("vec_id"), col("e"),
            round(cosine(col("qe"), col("e")), 9).as("rel"))
          .orderBy(col("rel").desc, col("vec_id")).limit(MmrPool)
          .localCheckpoint()
        val pairs = cand.select(col("vec_id").as("va"), col("e").as("ea"))
          .join(cand.select(col("vec_id").as("vb"), col("e").as("eb")),
            col("va") =!= col("vb"))
          .select(col("va"), col("vb"),
            round(cosine(col("ea"), col("eb")), 9).as("s"))
          .localCheckpoint()
        var selected: DataFrame = cand
          .orderBy(col("rel").desc, col("vec_id")).limit(1)
          .select(lit(1L).as("sel_rank"), col("vec_id"), col("rel"),
            col("rel").as("mmr"))
          .localCheckpoint()
        for (k <- 2 to MmrK) {
          val selIds = selected.select(col("vec_id"))
          val maxSim = pairs
            .join(selIds.withColumnRenamed("vec_id", "vb"), Seq("vb"))
            .groupBy(col("va")).agg(max(col("s")).as("max_s"))
          val next = cand.join(selIds, Seq("vec_id"), "left_anti")
            .join(maxSim, col("vec_id") === col("va"))
            .select(lit(k.toLong).as("sel_rank"), col("vec_id"), col("rel"),
              round(lit(MmrLambda) * col("rel") -
                lit(1 - MmrLambda) * col("max_s"), 9).as("mmr"))
            .orderBy(col("mmr").desc, col("vec_id")).limit(1)
          selected = selected.unionByName(next).localCheckpoint()
        }
        selected.orderBy(col("sel_rank"))
      },
      oracle = Some(mmrOracle)),

    // ---- q166: inverted-index posting-list statistics ----
    // The index-build diagnostic behind every sparse retriever: per
    // token, postings are the sorted doc-id list; the delta-gap
    // distribution decides compressibility (small gaps → tight
    // varint/PFOR blocks) and the df distribution decides skip-list
    // depth. Tokens are bucketed by ⌊log2 df⌋+1 (length(bin(df)) —
    // integer, no libm) and each bucket reports token count, posting
    // mass, and exact integer gap stats (sum, max, floor-avg).
    //
    // 100 TB posture: the (token → sorted postings) window partitions
    // by token — the natural index-build shuffle, one pass; gap
    // arithmetic is in-partition; the bucket rollup is vocabulary-
    // sized. No driver-side index materialization anywhere.
    "q166_posting_stats" -> QueryDef(
      build = (spark, dir) => {
        val ex = Tables.documents(spark, dir)
          .select(col("doc_id"),
            explode(array_distinct(split(trim(col("text")), " "))).as("t"))
          .filter(length(col("t")) > 0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("t")).orderBy(col("doc_id"))
        val posted = ex.select(col("t"), col("doc_id"),
          (col("doc_id") - lag(col("doc_id"), 1).over(w)).as("gap"),
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("t")))
            .as("df"))
        posted.groupBy(length(bin(col("df"))).as("df_log2_bucket"))
          .agg(countDistinct(col("t")).as("n_tokens"),
            count(lit(1)).as("postings"),
            coalesce(sum(col("gap")), lit(0L)).as("gap_sum"),
            coalesce(max(col("gap")), lit(0L)).as("gap_max"),
            expr("case when count(gap) = 0 then 0L " +
              "else sum(gap) div count(gap) end").as("gap_avg_floor"))
          .orderBy(col("df_log2_bucket"))
      },
      oracle = Some("""
        WITH ex AS (
          SELECT DISTINCT doc_id, t FROM (
            SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS t
            FROM documents)
          WHERE len(t) > 0),
        posted AS (
          SELECT t, doc_id,
                 doc_id - lag(doc_id) OVER (PARTITION BY t ORDER BY doc_id)
                   AS gap,
                 COUNT(*) OVER (PARTITION BY t) AS df
          FROM ex)
        SELECT CAST(len(bin(df)) AS INT) AS df_log2_bucket,
               COUNT(DISTINCT t) AS n_tokens, COUNT(*) AS postings,
               CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS gap_sum,
               CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS gap_max,
               CASE WHEN COUNT(gap) = 0 THEN 0
                    ELSE CAST(SUM(gap) AS BIGINT) // COUNT(gap) END
                 AS gap_avg_floor
        FROM posted GROUP BY 1 ORDER BY df_log2_bucket""")),

    // ---- q224: nDCG@10 of the BM25 ranking (graded relevance) ----
    // The ranking-quality metric the eval family lacked (q169/q190
    // grade CLASSIFIERS; this grades a RANKER): DCG@10 of q94's BM25
    // ordering against a graded relevance independent of the ranker —
    // raw query-term occurrences per doc, capped at 10 — normalized by
    // the ideal ordering's DCG at each position. Per-position gains
    // (2^rel − 1)/log2(pos+1) with the log2 rounded once at 9 dp
    // (continuous), cumulative sums in exact decimal, ndcg rounded at
    // 6 dp — the q94/q195 float discipline end to end.
    //
    // 100 TB posture: both top-10 lists are TakeOrdered over keyed
    // aggregations (BM25 stats broadcast, relevance one keyed agg);
    // the position windows run on 10 rows.
    "q224_ndcg_eval" -> QueryDef(
      build = (spark, dir) => {
        val rel = Tables.documents(spark, dir)
          .select(col("doc_id"),
            explode(split(trim(col("text")), " ")).as("term"))
          .filter(col("term").isin(QueryTerms: _*))
          .groupBy(col("doc_id"))
          .agg(least(count(lit(1)), lit(10L)).as("rel"))
        val sys10 = bm25Scored(spark, dir)
          .orderBy(col("score").desc, col("doc_id")).limit(10)
          .join(rel, Seq("doc_id"))
        val ideal10 = rel.orderBy(col("rel").desc, col("doc_id")).limit(10)
        def dcg(df: org.apache.spark.sql.DataFrame, ord: Seq[Column],
            out: String): org.apache.spark.sql.DataFrame = {
          val w = Window.orderBy(ord: _*)
          val wc = Window.orderBy(col("pos"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          df.withColumn("pos", row_number().over(w).cast(LongType))
            .withColumn("gain", round(
              (pow(lit(2.0), col("rel")) - 1.0) /
                round(log2(col("pos") + 1), 9), 9))
            .withColumn(out,
              sum(col("gain").cast(DecimalType(28, 9))).over(wc))
        }
        val sys = dcg(sys10, Seq(col("score").desc, col("doc_id")), "dcg")
          .select(col("pos"), col("doc_id"), col("rel"), col("dcg"))
        val ideal = dcg(ideal10, Seq(col("rel").desc, col("doc_id")), "idcg")
          .select(col("pos"), col("idcg"))
        sys.join(ideal, Seq("pos"))
          .select(col("pos"), col("doc_id"), col("rel"),
            round(col("dcg").cast(DoubleType) / col("idcg").cast(DoubleType),
              6).as("ndcg_at_pos"))
          .orderBy(col("pos"))
      },
      oracle = Some(s"""
        WITH tok AS (SELECT doc_id,
                            unnest(string_split(trim(text), ' ')) AS term
                     FROM documents),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok
               GROUP BY doc_id),
        st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
               WHERE term IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
               GROUP BY 1, 2),
        dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dft FROM tf
                GROUP BY term),
        sc AS (SELECT f.doc_id,
                      ROUND(LN(CAST(1.0 AS DOUBLE)
                               + (st.n_docs - d.dft + CAST(0.5 AS DOUBLE))
                               / (d.dft + CAST(0.5 AS DOUBLE)))
                            * (f.tf * CAST(2.2 AS DOUBLE))
                            / (f.tf + CAST($K1 AS DOUBLE)
                               * (CAST(${1 - B} AS DOUBLE)
                                  + CAST($B AS DOUBLE)
                                  * (CAST(l.dl AS DOUBLE)
                                     / (CAST(st.total_tokens AS DOUBLE)
                                        / st.n_docs)))), 9) AS contrib
               FROM tf f JOIN dft d USING (term) JOIN dl l USING (doc_id), st),
        scored AS (SELECT doc_id,
                          ROUND(CAST(SUM(CAST(contrib AS DECIMAL(28,9)))
                            AS DOUBLE), 6) AS score
                   FROM sc GROUP BY doc_id),
        rel AS (SELECT doc_id, LEAST(CAST(COUNT(*) AS BIGINT), 10) AS rel
                FROM tok
                WHERE term IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
                GROUP BY doc_id),
        sys10 AS (SELECT s.doc_id, s.score, r.rel
                  FROM scored s JOIN rel r USING (doc_id)
                  ORDER BY s.score DESC, s.doc_id LIMIT 10),
        sysd AS (SELECT doc_id, rel,
                        CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                          AS BIGINT) AS pos
                 FROM sys10),
        sysg AS (SELECT pos, doc_id, rel,
                        ROUND((POWER(2.0, rel) - 1.0)
                          / ROUND(log2(pos + 1), 9), 9) AS gain
                 FROM sysd),
        sysc AS (SELECT pos, doc_id, rel,
                        SUM(CAST(gain AS DECIMAL(28,9))) OVER (ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS dcg
                 FROM sysg),
        id10 AS (SELECT doc_id, rel FROM rel
                 ORDER BY rel DESC, doc_id LIMIT 10),
        idd AS (SELECT rel,
                       CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id)
                         AS BIGINT) AS pos
                FROM id10),
        idg AS (SELECT pos,
                       ROUND((POWER(2.0, rel) - 1.0)
                         / ROUND(log2(pos + 1), 9), 9) AS gain
                FROM idd),
        idc AS (SELECT pos,
                       SUM(CAST(gain AS DECIMAL(28,9))) OVER (ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS idcg
                FROM idg)
        SELECT s.pos, s.doc_id, s.rel,
               ROUND(CAST(s.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE), 6)
                 AS ndcg_at_pos
        FROM sysc s JOIN idc i ON i.pos = s.pos
        ORDER BY s.pos"""))
  )

  /** DuckDB replay of the q115 greedy trace: cand/pairs CTEs mirror the
    * Spark expressions; each pick k is an argmax CTE over the not-yet-
    * selected pool with the max-sim-to-selected redundancy term. */
  private def mmrOracle: String = {
    val steps = (2 to MmrK).map { k =>
      val selPrev = "SELECT vec_id FROM (" +
        (1 until k).map(i => s"SELECT vec_id FROM s$i")
          .mkString(" UNION ALL ") + s") sel$k"
      s"""m$k AS (
        SELECT c.vec_id, c.rel,
               ROUND(CAST($MmrLambda AS DOUBLE) * c.rel
                     - CAST(${1 - MmrLambda} AS DOUBLE) * MAX(p.s), 9) AS mmr
        FROM cand c JOIN pairs p ON p.va = c.vec_id
        WHERE p.vb IN ($selPrev) AND c.vec_id NOT IN ($selPrev)
        GROUP BY c.vec_id, c.rel),
      s$k AS (SELECT CAST($k AS BIGINT) AS sel_rank, vec_id, rel, mmr
              FROM m$k ORDER BY mmr DESC, vec_id LIMIT 1)"""
    }.mkString(",\n      ")
    val unionAll = (1 to MmrK)
      .map(i => s"SELECT sel_rank, vec_id, rel, mmr FROM s$i")
      .mkString(" UNION ALL ")
    s"""
      WITH q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
                  WHERE vec_id = 0),
      cand AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               ROUND(list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])),
                     9) AS rel
        FROM embeddings, q0 WHERE vec_id != 0
        ORDER BY rel DESC, vec_id LIMIT $MmrPool),
      pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               ROUND(list_cosine_similarity(a.e, b.e), 9) AS s
        FROM cand a, cand b WHERE a.vec_id != b.vec_id),
      s1 AS (SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, rel, rel AS mmr
             FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
      $steps
      SELECT sel_rank, vec_id, rel, mmr FROM ($unionAll) picks
      ORDER BY sel_rank"""
  }
}
