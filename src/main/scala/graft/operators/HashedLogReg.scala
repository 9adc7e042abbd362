package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed trained quality classifier over hashed token features —
  * the FineWeb-Edu / DCLM curation move: an expensive labeler (there a
  * teacher LLM; here any per-doc rule) labels a seed signal, a CHEAP
  * linear model is trained to imitate it, and the model scores the whole
  * corpus so retention can be chosen per score decile. The missing
  * curation family in rounds 1–8: every other quality filter here was a
  * fixed heuristic; this one is FIT to data by distributed gradient
  * descent.
  *
  * ==Model==
  *
  * Logistic regression with the HARD-SIGMOID link σ(z) = clamp(½ + z/4,
  * 0, 1) — the standard resource-constrained approximation (quantized
  * training uses the same link), chosen because it is RATIONAL: every
  * quantity lives in scaled BIGINT (weights in 1e-6 units, probabilities
  * in ppm) and every division is integer division, so training is
  * bit-deterministic on any engine and any partitioning — the q106
  * PageRank / q124 k-means fixed-point recipe applied to a trained
  * classifier. That determinism is what lets DuckDB hash-match an
  * 8-round iterative training run exactly (q233).
  *
  * Features: 256 hashed token-count buckets (md5 first two hex chars —
  * md5 is the engine-portable hash, see q47/q57) plus a bias. Hashed
  * bags are the standard trick that keeps the feature space fixed-width
  * at any vocabulary size (collisions are noise the model absorbs).
  *
  * ==100 TB posture==
  *
  * The corpus is tokenized ONCE ([[tokenFeatures]] — one explode +
  * hash-partitioned (doc, bucket) count with map-side combine, carrying
  * the label-side token stats in the same pass). Every training round is
  * two keyed aggregations over the BUCKETIZED table (|docs|·≤257 rows,
  * not token-scale): per-doc margin (sum over ≤257 terms) and per-bucket
  * gradient — both partial/final. The MODEL (257 longs) rides to the
  * driver per round and back as a literal array — scalar coordination,
  * never a data shuffle; broadcast-sized by construction. Round count is
  * fixed and small, so lineage stays bounded without checkpoints
  * (each round's job reads the one persisted feature table). */
object HashedLogReg {

  /** Feature-space width (hashed buckets); bucket `Buckets` is the bias. */
  val Buckets = 256

  /** ppm scale shared by probabilities, errors, and weights. */
  val Scale = 1000000L

  /** md5-hex bucket in [0, 256) — portable: Spark and DuckDB md5 agree,
    * and both sides index the same hex alphabet. */
  def hashBucket(termCol: String): Column = expr(
    s"(instr('0123456789abcdef', substring(md5($termCol), 1, 1)) - 1) * 16" +
      s" + instr('0123456789abcdef', substring(md5($termCol), 2, 1)) - 1")

  /** ONE corpus pass: whitespace-tokenize `textCol`, hash terms into
    * buckets, and return per-(doc, bucket) counts — columns (doc_id, j,
    * x, stopx) where `stopx` counts tokens from `stopTerms` (the
    * label-rule statistic, carried in the same shuffle so labeling costs
    * no second tokenize). Bucket rows only — the bias row is added by
    * [[withLabelAndBias]]. */
  def tokenFeatures(docs: DataFrame, textCol: String,
      stopTerms: Seq[String]): DataFrame =
    docs
      .select(col("doc_id"),
        explode(split(trim(col(textCol)), " ")).as("term"))
      .groupBy(col("doc_id"), hashBucket("term").as("j"))
      .agg(count(lit(1)).as("x"),
        sum(when(col("term").isin(stopTerms: _*), 1L).otherwise(0L))
          .as("stopx"))

  /** Label every doc by the integer stop-ratio rule (stop-tokens per
    * 1000 ≥ `threshPerMille` — the cheap heuristic the model distills),
    * and emit the training table: (doc_id, y, j, x) bucket rows plus one
    * bias row (j = [[Buckets]], x = 1) per doc. The label rule is LINEAR
    * in bucket counts (stop − t·total ≥ 0), so it is honestly learnable
    * from the hashed features up to bucket-collision noise. */
  def withLabelAndBias(feat: DataFrame, threshPerMille: Long): DataFrame = {
    val lab = feat.groupBy(col("doc_id"))
      .agg(sum(col("x")).as("total"), sum(col("stopx")).as("stopc"))
      .select(col("doc_id"),
        when(expr(s"(stopc * 1000) div total") >= threshPerMille, 1L)
          .otherwise(0L).as("y"))
    feat.select(col("doc_id"), col("j"), col("x")).join(lab, Seq("doc_id"))
      .select(col("doc_id"), col("y"), col("j"), col("x"))
      .unionAll(lab.select(col("doc_id"), col("y"),
        lit(Buckets).cast("int").as("j"), lit(1L).as("x")))
  }

  /** Fixed-point full-batch gradient descent: `rounds` rounds of
    * w_j += ((Σ_i err_i·x_ij div n) div invLr), err in ppm from the
    * hard-sigmoid margin. `x` must be persisted by the caller (it is
    * read twice per round). Returns the weight vector (index j; last
    * slot is the bias), bit-deterministic. */
  def train(x: DataFrame, nDocs: Long, rounds: Int = 8,
      invLr: Long = 16L, init: Option[Array[Long]] = None): Array[Long] =
    trainHistory(x, nDocs, rounds, invLr, init).last

  /** [[train]], returning the weight vector AFTER EVERY round (w_1 ..
    * w_rounds) — the per-round model snapshots training-dynamics
    * analyses (q243 dataset cartography) read. `init` warm-starts from
    * an existing model (the q246 incremental-refresh contract: continue
    * yesterday's fit on the grown corpus instead of retraining from
    * zero). Same loop, same determinism; `train` is its last element. */
  def trainHistory(x: DataFrame, nDocs: Long, rounds: Int = 8,
      invLr: Long = 16L,
      init: Option[Array[Long]] = None): Seq[Array[Long]] = {
    require(nDocs > 0, "empty corpus")
    init.foreach(w0 => require(w0.length == Buckets + 1,
      s"init weight vector must have ${Buckets + 1} slots"))
    val hist = Seq.newBuilder[Array[Long]]
    val w = init.map(_.clone()).getOrElse(new Array[Long](Buckets + 1))
    var r = 0
    while (r < rounds) {
      val warr = array(w.toSeq.map(lit): _*)
      val err = x
        .withColumn("t", col("x") * element_at(warr, col("j") + 1))
        .groupBy(col("doc_id"))
        .agg(max(col("y")).as("y"), sum(col("t")).as("z"))
        .select(col("doc_id"),
          (col("y") * lit(Scale) - greatest(lit(0L), least(lit(Scale),
            lit(Scale / 2) + expr("z div 4")))).as("err"))
      val grad = x.join(err, Seq("doc_id"))
        .groupBy(col("j"))
        .agg(sum(col("err") * col("x")).as("g"))
        .collect() // ≤ 257 rows — the model, by construction
      grad.foreach { row =>
        val j = row.getAs[Int]("j")
        val g = row.getAs[Long]("g")
        w(j) += (g / nDocs) / invLr // Long / truncates: ≡ div ≡ DuckDB //
      }
      hist += w.clone()
      r += 1
    }
    hist.result()
  }

  /** STATELESS in-row scorer over a token-array column — the streaming
    * dual of [[score]]: z = Σ_tokens w[bucket(token)] + w_bias equals the
    * bucketized Σ_j x_j·w_j exactly (integer addition is associative),
    * and y replays the stop-ratio label rule per row. The 257-long model
    * rides as a PLAN LITERAL (the strongest broadcast), so per-batch
    * scoring inside a micro-batch pipeline is a pure map: no shuffle, no
    * state store — the model-trained-offline / scored-online production
    * shape. Returns (z, y) columns over `toksCol`. */
  def inRowScore(toksCol: String, w: Array[Long], stopTerms: Seq[String],
      threshPerMille: Long): (Column, Column) = {
    require(w.length == Buckets + 1,
      s"weight vector must have ${Buckets + 1} slots")
    val wlit = w.mkString("array(", "L, ", "L)")
    val b = "(instr('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16" +
      " + instr('0123456789abcdef', substring(md5(t), 2, 1)) - 1"
    val z = expr(s"aggregate(transform($toksCol, t -> " +
      s"element_at($wlit, CAST(($b) AS INT) + 1)), ${w(Buckets)}L, " +
      "(acc, v) -> acc + v)")
    val inList = stopTerms.map(s => s"'$s'").mkString(", ")
    val y = expr(s"CASE WHEN (aggregate(transform($toksCol, t -> " +
      s"CASE WHEN t IN ($inList) THEN 1L ELSE 0L END), 0L, " +
      s"(acc, v) -> acc + v) * 1000) div size($toksCol) " +
      s">= ${threshPerMille}L THEN 1L ELSE 0L END")
    (z, y)
  }

  /** Score every doc with a trained weight vector: (doc_id, y, z) where
    * z is the micro-scaled margin. One keyed agg over the bucketized
    * table; the model is a literal array (broadcast-sized). */
  def score(x: DataFrame, w: Array[Long]): DataFrame = {
    val warr = array(w.toSeq.map(lit): _*)
    x.withColumn("t", col("x") * element_at(warr, col("j") + 1))
      .groupBy(col("doc_id"))
      .agg(max(col("y")).as("y"), sum(col("t")).as("z"))
  }
}
