package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural laws of the Mixing/CorpusStats corpus — properties the
  * oracle hash can't articulate (it proves value equality, not WHY the
  * values are right). Runs at sf0.001. */
class MixingSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q155: systematic resampling draws EXACTLY k points") {
    val total = run("q155_systematic_resample")
      .agg(sum(col("n_sampled"))).head.getLong(0)
    assert(total == 500L, s"systematic guarantee broken: $total picks")
  }

  test("q153: the hash split partitions the corpus") {
    val rows = run("q153_hash_split").collect()
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits == Set("train", "val", "test"))
    // ~80/10/10 by construction of the 204/230 bucket cuts
    val byName = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
  }

  test("q154: coverage thresholds are monotone and bounded by the vocabulary") {
    val rows = run("q154_vocab_coverage").collect()
    val needed = rows.map(_.getAs[Long]("types_needed"))
    assert(needed.sorted.sameElements(needed), "types_needed not monotone in pct")
    assert(needed.last <= rows.head.getAs[Long]("total_types"))
  }

  test("q151: per-class encoding stats are ordered enc_min <= enc_avg <= enc_max") {
    run("q151_target_encoding").collect().foreach { r =>
      val (mn, av, mx) = (r.getAs[Long]("enc_min_micro"),
        r.getAs[Long]("enc_avg_micro"), r.getAs[Long]("enc_max_micro"))
      // integer micro-dollar units since round 7; div truncation can put
      // avg below min by at most 1 micro-unit, hence the +-1 slack
      assert(mn - 1 <= av && av <= mx + 1, s"$r")
    }
  }

  test("q161: dedup reclaim accounting balances") {
    run("q161_dedup_reclaim").collect().foreach { r =>
      assert(r.getAs[Long]("reclaimed_tokens") ==
        r.getAs[Long]("total_tokens") - r.getAs[Long]("kept_tokens"))
      assert(r.getAs[Long]("inflation_ppm") >= 1000000L)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q163: source Jaccard is a full upper triangle with ppm in range") {
    val rows = run("q163_source_jaccard_matrix").collect()
    val sources = graft.core.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == sources * (sources - 1) / 2,
      s"${rows.length} pairs for $sources sources")
    rows.foreach { r =>
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j >= 0 && j <= 1000000L)
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
    }
  }

  test("q152: mixture weights sum to ~1 and sqrt-damp the dominant source") {
    val rows = run("q152_domain_mixture").collect()
    // ppm units since round 7; div truncation loses < 1 ppm per source
    val wsum = rows.map(_.getAs[Long]("weight_ppm")).sum
    assert(wsum > 1000000L - rows.length && wsum <= 1000000L,
      s"weights sum to $wsum ppm")
    // sqrt scaling compresses shares: every weight sits between its raw
    // share and the uniform share on the side toward uniform
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_share_ppm")
      val w = r.getAs[Long]("weight_ppm")
      val uniform = 1000000L / rows.length
      if (raw > uniform) assert(w <= raw + 1 && w >= uniform - 1)
      else assert(w >= raw - 1 && w <= uniform + 1)
    }
  }
}
