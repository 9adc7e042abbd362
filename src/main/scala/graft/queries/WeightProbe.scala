package graft.queries

import graft.core.SparkSessionFactory
import org.apache.spark.sql.functions._

/** Round-14 calibration probe for q353's weighted-match threshold: runs
  * the SHARED scoring front ([[Dedup.weightedParts]]) at a given SF and
  * prints (a) a pair-level precision/recall row per decade threshold on
  * the rescaled score p5, and (b) the score BANDS per agreement pattern
  * split by truth — the data behind the pinned WeightedMatchT literal
  * and the factor caps (see the q353 docstring). Also the tool that
  * MEASURED the round-13 advice's 4-field frequency reweighting to be
  * insufficient (sf1 precision flat at 0.0997 across every threshold —
  * exchangeability within saturated blocks).
  *
  * Pair truth = a_key == b_key (the registries are noised copies of the
  * same customer rows). Pair-level PR is the calibration proxy; the
  * accepted T is then validated on the full B³ card via the gate.
  *
  * Run: `sbt "runMain graft.queries.WeightProbe /root/testdata/sf0.1"`
  */
object WeightProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSessionFactory.local(32, "graft-weight-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val wp = Dedup.weightedParts(spark, sfDir)
    val all = wp.scored
      .withColumn("is_true", when(col("a_key") === col("b_key"), 1L)
        .otherwise(0L))
      .localCheckpoint(false)
    val st = wp.lp.st
      .select(col("n_true_total"), greatest(col("n_a"), col("n_b")))
      .head()
    val nTrueTotal = st.getLong(0)
    val nMax = st.getLong(1)
    println(s"n_true_total=$nTrueTotal n_max=$nMax sf=$sfDir")
    // score bands per agreement pattern, split by truth
    all.groupBy(col("g_seg"), col("g_band"), col("g_tok"), col("g_ph"),
        col("is_true"))
      .agg(count(lit(1)).as("n"), min(col("p5")).as("p5_min"),
        max(col("p5")).as("p5_max"))
      .orderBy(col("g_ph").desc, col("g_tok").desc, col("g_band").desc,
        col("g_seg").desc, col("is_true").desc)
      .collect()
      .foreach(r => println(s"band seg=${r.getLong(0)} band=${r.getLong(1)}" +
        s" tok=${r.getLong(2)} ph=${r.getLong(3)} true=${r.getLong(4)}" +
        s" n=${r.getLong(5)} p5=[${r.get(6)}, ${r.get(7)}]"))
    // decade grid on p5 / n_max
    (10 to 26).foreach { e =>
      val t = BigDecimal(10).pow(e)
      val r = all.agg(
        sum(when(col("p5") >= lit(t.bigDecimal) * nMax, 1L)
          .otherwise(0L)).as("kept"),
        sum(when(col("p5") >= lit(t.bigDecimal) * nMax, col("is_true"))
          .otherwise(0L)).as("true_kept")).head()
      val kept = r.getLong(0); val tk = r.getLong(1)
      val prec = if (kept == 0) 0.0 else tk.toDouble / kept
      val rec = tk.toDouble / nTrueTotal
      println(f"T=1e$e%d kept=$kept%8d true=$tk%8d precision=$prec%.4f recall=$rec%.4f")
    }
    spark.stop()
  }
}
