package graft

import graft.core.SparkSessionFactory

/** Scale-linearity probes, one JSON line per (probe, scale):
  *
  *  1. `gps`: the flagship generate→enrich→aggregate pipeline (q70's
  *     shape) at 1×/10×/100× the sf0.1 row count. `spark.range`-based
  *     generation (distributed, no disk) — measures how the ENGINE
  *     scales, not the storage. Near-linear sec/row ⇒ no hidden
  *     superlinear stage in the per-row + partial-agg plan.
  *
  *  2. `dedup`: MinHash+LSH near-dup (q46's operator) vs the exact
  *     shingle join (q44's shape) on the sf0.1 documents upsampled
  *     1×/2×/4×. Copy i's text goes through an alphabet rotation
  *     (translate, codegen'd), so each copy's shingle structure is
  *     EXACTLY the original's but its vocabulary is disjoint from every
  *     other copy — within-copy dup structure replicates, cross-copy
  *     candidates are ~zero, and true-pair volume scales linearly. The
  *     LSH curve should stay ~linear while exact grows superlinearly in
  *     co-shingled pairs — the measured form of the q44-vs-q46 scale
  *     argument.
  *
  * Run: `sbt "runMain graft.ScaleProbe [maxScale]"`. */
object ScaleProbe {

  private def timed(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val maxScale = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSessionFactory.localFromEnv(32, "graft-scale-probe")
    val base = 600000L // sf0.1-equivalent
    // The FULL q70 aggregation (not groupBy.count, which would let
    // Catalyst prune most of the generated/enriched columns away).
    def runGps(n: Long): Long = graft.queries.Gps.aggOfSize(spark, n).count()
    Seq(1L, 10L, 100L).filter(_ <= maxScale).foreach { s =>
      val n = base * s
      if (s == 1L) runGps(n) // warmup once: codegen is shared across scales
      val (sec, rows) = timed(runGps(n))
      println(f"""{"probe":"gps","scale":$s,"rows":$n,"groups":$rows,"sec":$sec%.3f,"rows_per_sec":${(n / sec).toLong}}""")
    }

    // dedup probe: salted upsampling of the documents corpus
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d0 = graft.core.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def corpus(s: Int) = (0 until s).map { i =>
      val rotated = alpha.drop(i % 26) + alpha.take(i % 26)
      d0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        translate(col("text"), alpha, rotated).as("text"))
    }.reduce(_ unionAll _)
    def lsh(s: Int): Long = graft.operators.MinHashLSH
      .nearDupPairs(corpus(s), "doc_id", "text", threshold = 0.4).count()
    def exact(s: Int): Long = {
      import graft.functions.TextFunctions.{shingles, tokens}
      val d = graft.core.Tables.spread(corpus(s))
        .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val ex = d.select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"))
        .select(col("doc_id"), col("n_sh"), explode(col("sh")).as("g"))
        .select(col("doc_id"), col("n_sh"), xxhash64(col("g")).as("gh"))
      val a = ex.select(col("doc_id").as("a"), col("n_sh").as("na"), col("gh"))
      val b = ex.select(col("doc_id").as("b"), col("n_sh").as("nb"), col("gh"))
      a.join(b, Seq("gh")).filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("nc"))
        .filter(col("nc").cast("double") / (col("na") + col("nb") - col("nc")) >= 0.4)
        .count()
    }
    lsh(1); exact(1) // warmup
    Seq(1, 2, 4, 8).filter(_ <= maxScale).foreach { s =>
      val (lSec, lPairs) = timed(lsh(s))
      val (eSec, ePairs) = timed(exact(s))
      println(f"""{"probe":"dedup","scale":$s,"docs":${d0.count() * s},"lsh_sec":$lSec%.3f,"lsh_pairs":$lPairs,"exact_sec":$eSec%.3f,"exact_pairs":$ePairs}""")
    }
    spark.stop()
  }
}
