package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 statistic pins (the q289/q320 lesson: every new statistic
  * gets an independent closed-form or cross-paradigm check).
  */
class Round13PropertySpec extends SparkSpec {

  test("autoLshBits: the log-N law and its clamps, pinned") {
    import graft.functions.VectorKernels.autoLshBits
    assert(autoLshBits(520L) == 5)    // q351 sf0.01 corpus (500 + 20)
    assert(autoLshBits(2080L) == 7)   // q351 sf0.1 corpus
    assert(autoLshBits(20800L) == 10) // q351 sf1 rehearsal corpus
    assert(autoLshBits(1L) == 4 && autoLshBits(0L) == 4)  // floor clamp
    assert(autoLshBits(Long.MaxValue / 2) == 24)          // ceiling clamp
    // monotone non-decreasing over decades
    val seq = Seq(10L, 100L, 1000L, 10000L, 100000L, 1000000L)
      .map(autoLshBits(_))
    assert(seq == seq.sorted, s"not monotone: $seq")
  }

  test("q351 oracle's SQL bits formula == VectorKernels.autoLshBits") {
    // The oracle re-derives the bits value with
    // LEAST(24, GREATEST(4, CEIL(LOG2(n / 30.0)))) — drift between that
    // text and the Scala law would silently decouple the gate from its
    // replay. Spark evaluates the same SQL here (same IEEE log2/ceil).
    import graft.functions.VectorKernels.autoLshBits
    val ns = Seq(1L, 29L, 30L, 31L, 500L, 520L, 2000L, 2080L, 20800L,
      100000L, 123456L, 1000000L)
    val df = spark.range(1).selectExpr(
      ns.map(n => s"LEAST(24, GREATEST(4, CAST(CEIL(LOG2($n / 30.0))" +
        s" AS BIGINT))) AS b$n"): _*)
    val row = df.head()
    ns.zipWithIndex.foreach { case (n, i) =>
      assert(row.getLong(i) == autoLshBits(n).toLong,
        s"n=$n sql=${row.getLong(i)} scala=${autoLshBits(n)}")
    }
  }

  test("q349 supernode claim: star edges give the same components as clique edges") {
    // The q349 argument: a complete bipartite all-agree block can
    // propagate as a star to its min node with IDENTICAL connected
    // components. Pin it independently: random bipartite blocks +
    // random extra cross-block pairs, components computed by an
    // in-test union-find over BOTH edge forms, and by the 6-round
    // min-label recipe over the star form — all three must agree.
    val rng = new scala.util.Random(4213L)
    for (trial <- 0 until 20) {
      val nBlocks = 1 + rng.nextInt(6)
      val blocks = (0 until nBlocks).map { b =>
        val as = (0 until 1 + rng.nextInt(5)).map(_ => rng.nextInt(200) * 2)
        val bs = (0 until 1 + rng.nextInt(5)).map(_ => rng.nextInt(200) * 2 + 1)
        (as.distinct, bs.distinct)
      }
      val extra = (0 until rng.nextInt(5)).map(_ =>
        (rng.nextInt(200) * 2, rng.nextInt(200) * 2 + 1))
      val clique = blocks.flatMap { case (as, bs) =>
        for (a <- as; b <- bs) yield (a, b)
      } ++ extra
      val star = blocks.flatMap { case (as, bs) =>
        val rep = (as ++ bs).min
        (as ++ bs).filter(_ != rep).map(n => (n, rep))
      } ++ extra
      val nodes = (blocks.flatMap(t => t._1 ++ t._2) ++
        extra.flatMap(t => Seq(t._1, t._2))).distinct
      def components(edges: Seq[(Int, Int)]): Map[Int, Int] = {
        val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
        def find(x: Int): Int =
          if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        nodes.map(n => n -> find(n)).toMap
      }
      val cc = components(clique)
      val cs = components(star)
      assert(nodes.forall(n => cc(n) == cs(n)), s"trial $trial: star != clique")
      // 6-round min-label propagation over the star form reaches the
      // same labels on these bounded-diameter graphs (the q349 card's
      // n_changed_last_round = 0 convergence certificate at both SFs
      // is the corpus-scale witness; this is the closed-form one)
      var lbl = nodes.map(n => n -> n).toMap
      val sym = star.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      for (_ <- 1 to 6) {
        val nbrMin = sym.groupBy(_._2).map { case (n, es) =>
          n -> es.map(e => lbl(e._1)).min
        }
        lbl = lbl.map { case (n, l) =>
          n -> math.min(l, nbrMin.getOrElse(n, l))
        }
      }
      assert(nodes.forall(n => lbl(n) == cc(n)),
        s"trial $trial: 6-round propagation did not reach the components")
    }
  }

  test("q351 planted jitter lands in the production near-dup zone") {
    // every planted copy must sit FAR above the 0.80 threshold and far
    // below 1.0 (a no-op jitter would make the gate vacuous); the
    // noise-vector background tops out ~0.6, so the zones are disjoint.
    import graft.functions.VectorFunctions.{cosine, vec64}
    val base = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), vec64(col("embedding")).as("e"))
    val corpus = Vectors.plantedNearDupCorpus(spark, sf)
    val planted = corpus.filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("vec_id"),
        vec64(col("embedding")).as("p"))
    val cos = planted.join(base, "vec_id")
      .select(cosine(col("p"), col("e")).as("c"))
      .agg(min(col("c")).as("lo"), max(col("c")).as("hi")).head()
    assert(cos.getDouble(0) > 0.95, s"planted cosine floor ${cos.getDouble(0)}")
    assert(cos.getDouble(1) < 0.9999, s"jitter was a no-op: ${cos.getDouble(1)}")
  }

  test("q351 background ceiling: no non-planted pair near the threshold") {
    // The gate's engine/oracle agreement at the 0.80 threshold assumes
    // no pair sits within a ulp of the boundary (Spark float kernel vs
    // DuckDB double cosine can differ in the last bit). The planted
    // floor is pinned above; this pins the OTHER margin: the max cosine
    // over every non-planted pair in the staged corpus (exhaustive
    // all-pairs — strictly wider than the gate's LSH candidate set)
    // must stay well below 0.80, so a fixture/corpus change can't
    // silently park pairs on the boundary (ADVICE r13).
    import graft.functions.VectorFunctions.{cosine, vec64}
    val corpus = Vectors.plantedNearDupCorpus(spark, sf)
      .select(col("vec_id"), vec64(col("embedding")).as("v"))
    val a = corpus.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = corpus.select(col("vec_id").as("ib"), col("v").as("vb"))
    val maxBg = a.crossJoin(b)
      .filter(col("ia") < col("ib") &&
        col("ib") - col("ia") =!= 10000000L) // exclude planted (src, copy)
      .select(cosine(col("va"), col("vb")).as("c"))
      .agg(max(col("c"))).head().getDouble(0)
    assert(maxBg < 0.75, s"background cosine ceiling too close: $maxBg")
  }
}
