package graft.queries

import graft.operators.Multimodal

/** Multimodal binary-column pipeline corpus entry. The asset count scales
  * with the SF dir so bench reflects real partition-local decode cost;
  * output is a deterministic per-kind profile (rows-only check — binary
  * media has no DuckDB-SQL equivalent; MultimodalSpec asserts exact
  * golden values).
  */
object Multi {
  val defs: Seq[(String, QueryDef)] = Seq(
    "q60_multimodal_profile" -> QueryDef(
      build = (spark, dir) => {
        val n = if (dir.contains("sf0.1")) 50000L
          else if (dir.contains("sf0.01")) 5000L else 500L
        Multimodal.featureProfile(spark, n)
      },
      oracle = None,
      headline = true)
  )
}
