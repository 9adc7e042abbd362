package graft

import graft.core.SparkSessionFactory

/** Scale-linearity probe: the flagship generate→enrich→aggregate pipeline
  * (q70's shape) at 1×/10×/100× the sf0.1 row count, one JSON line per
  * scale. Generation is `spark.range`-based (distributed, no disk), so
  * this measures how the ENGINE scales, not the storage: a near-linear
  * sec/row curve is the evidence that the plan (codegen'd per-row
  * expressions → partial agg → one exchange over 8 groups) has no hidden
  * superlinear stage. Run: `sbt "runMain graft.ScaleProbe [maxScale]"`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxScale = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSessionFactory.localFromEnv(32, "graft-scale-probe")
    val base = 600000L // sf0.1-equivalent
    // The FULL q70 aggregation (not groupBy.count, which would let
    // Catalyst prune most of the generated/enriched columns away).
    def run(n: Long): Long = graft.queries.Gps.aggOfSize(spark, n).count()
    Seq(1L, 10L, 100L).filter(_ <= maxScale).foreach { s =>
      val n = base * s
      if (s == 1L) run(n) // warmup once: codegen is shared across scales
      val t0 = System.nanoTime()
      val rows = run(n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"scale":$s,"rows":$n,"groups":$rows,"sec":$sec%.3f,"rows_per_sec":${(n / sec).toLong}}""")
    }
    spark.stop()
  }
}
