package graft.queries

import graft.core.Tables
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
      build = (spark, dir) => {
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
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
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
               FROM tf f JOIN dft d USING (term) JOIN dl l USING (doc_id), st)
        SELECT doc_id, COUNT(*) AS n_terms_hit,
               ROUND(CAST(SUM(CAST(contrib AS DECIMAL(28,9))) AS DOUBLE), 6)
                 AS score
        FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10"""))
  )
}
