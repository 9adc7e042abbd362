package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for the training-data pipeline.
  *
  * Media travels as an opaque `binary` column plus a typed metadata struct —
  * the only layout that scales: payloads stay in parquet, never in driver
  * memory, and all per-asset work runs as partition-local iterator
  * transforms (`mapPartitions` over a typed Dataset — the Scala-native
  * equivalent of a batched Pandas UDF: one JVM-side batch per partition, no
  * per-row closure dispatch, no serialization across a Python boundary).
  *
  * ── STUB BOUNDARY ──────────────────────────────────────────────────────
  * This container has no image/audio codecs, so `FakeCodec` stands in for
  * the real decoder: it derives deterministic "pixels"/"samples" from the
  * payload bytes. Every Spark-side contract — schemas, binary transport,
  * partition sizing, batch shape, feature layout — is real and tested;
  * swapping `FakeCodec` for e.g. javax.imageio / a JNI codec changes no
  * plan shape. The stub functions are the ONLY non-production code here.
  * ───────────────────────────────────────────────────────────────────────
  */
object Multimodal {

  final case class MediaMeta(
      kind: String,       // image | audio | video
      format: String,     // fake container tag
      width: Int,         // image/video frame width (px)
      height: Int,
      sampleRate: Int,    // audio only (Hz)
      nFrames: Int)       // video frame count / audio chunk count

  final case class MediaAsset(asset_id: Long, meta: MediaMeta, payload: Array[Byte])

  final case class MediaFeatures(
      asset_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float]) // fixed-dim feature vector (histogram stub)

  // ---- deterministic synthetic corpus --------------------------------

  /** Deterministic fake media corpus keyed by id — payload bytes are a
    * xxhash64 keystream, so any executor regenerates identical assets
    * (no driver materialization; scales to any n). */
  def syntheticAssets(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val meta = kind match {
        case "image" => MediaMeta(kind, "fake-img", 64 + (id % 4).toInt * 32,
          64 + (id % 3).toInt * 32, 0, 1)
        case "audio" => MediaMeta(kind, "fake-pcm", 0, 0, 16000, 4 + (id % 4).toInt)
        case _       => MediaMeta(kind, "fake-vid", 64, 64, 0, 8 + (id % 8).toInt)
      }
      MediaAsset(id, meta, FakeCodec.encode(id, seed, meta))
    })
  }

  // ---- operators (partition-local, batch-shaped) ---------------------

  /** Decode + feature-extract in one partition pass: 256-bin byte histogram
    * normalized to unit L1 — the stub feature. Real pipelines put the
    * expensive codec call exactly here, amortized per partition. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val hist = new Array[Int](256) // reused per partition — no per-row alloc
      it.map { a =>
        java.util.Arrays.fill(hist, 0)
        val decoded = FakeCodec.decode(a.payload)
        var i = 0
        while (i < decoded.length) { hist(decoded(i) & 0xff) += 1; i += 1 }
        val total = math.max(decoded.length, 1).toFloat
        MediaFeatures(a.asset_id, a.meta.kind, a.payload.length,
          hist.map(_ / total))
      }
    }
  }

  /** Frame sampling for video assets: keep every `everyN`-th frame of the
    * decoded stream; non-video passes through untouched. Output payload
    * shrinks accordingly — the transform the training pipeline runs before
    * feature extraction to bound cost. */
  def sampleFrames(assets: Dataset[MediaAsset], everyN: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.meta.kind != "video" || a.meta.nFrames <= 1) a
      else {
        val frameLen = a.payload.length / a.meta.nFrames
        val kept = (0 until a.meta.nFrames by everyN).toArray
        val out = new Array[Byte](kept.length * frameLen)
        kept.zipWithIndex.foreach { case (f, k) =>
          System.arraycopy(a.payload, f * frameLen, out, k * frameLen, frameLen)
        }
        a.copy(meta = a.meta.copy(nFrames = kept.length), payload = out)
      }
    })
  }

  /** Resize stub for images: recompute payload for the new dimensions
    * (deterministic), keeping the metadata contract honest. */
  def resize(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.meta.kind != "image") a
      else {
        val meta = a.meta.copy(width = w, height = h)
        a.copy(meta = meta, payload = FakeCodec.encode(a.asset_id, 42L, meta))
      }
    })
  }

  /** Media near-duplicate pairs: sign-LSH buckets over the per-asset
    * feature vector (the byte-histogram stub here; a real embedding in
    * prod) → bucket equijoin → exact cosine verify. The image-dedup
    * operation a training pipeline runs before captioning/training — same
    * candidates-then-verify shape as the text (q46) and embedding (q55)
    * dedup paths, so the 100 TB posture is shared: no all-pairs stage,
    * shuffle carries bucket ids + features only for collided candidates. */
  def nearDupAssets(features: Dataset[MediaFeatures],
      threshold: Double = 0.95, tables: Int = 8, bits: Int = 12): DataFrame = {
    import graft.functions.VectorFunctions.{cosine, lshBuckets, vec64}
    val f = features.toDF()
      .select(col("asset_id"), col("kind"), vec64(col("feature")).as("e"))
      .withColumn("bucket", explode(lshBuckets(col("e"), tables, bits)))
    val a = f.select(col("bucket"), col("asset_id").as("id_a"),
      col("kind").as("kind_a"), col("e").as("ea"))
    val b = f.select(col("bucket"), col("asset_id").as("id_b"), col("e").as("eb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("kind_a").as("kind"),
        cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("kind"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Per-asset scalar feature rows (asset_id, kind, n_bytes, l2sq) — the
    * engine-specific values (codec + histogram) reduced to plain scalars.
    * Shared by [[featureProfile]] and the Verify-time materialization that
    * lets DuckDB re-aggregate the q60 profile over identical inputs. */
  def featureRows(spark: SparkSession, n: Long): DataFrame =
    extractFeatures(syntheticAssets(spark, n)).toDF()
      .select(col("asset_id"), col("kind"), col("n_bytes"),
        round(aggregate(transform(col("feature"), x => x * x),
          lit(0.0d), (acc, v) => acc + v), 9).as("l2sq"))

  /** Deterministic per-kind feature profile — the queryable summary used by
    * the q60 corpus entry (fully ordered, reproducible: the mean
    * accumulates the 9-decimal per-asset l2sq as decimal, so the result is
    * independent of partitioning and summation order). */
  def featureProfile(spark: SparkSession, n: Long): DataFrame =
    featureRows(spark, n)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        round((sum(col("l2sq").cast(org.apache.spark.sql.types.DecimalType(28, 9)))
          .cast("double") / count(lit(1))), 9).as("avg_feature_l2sq"))
      .orderBy(col("kind"))

  // ---- STUB codec ----------------------------------------------------

  /** Deterministic stand-in for real media codecs (see STUB BOUNDARY). */
  object FakeCodec {
    /** xxhash-keystream payload: size derives from metadata, bytes from
      * (id, seed, block). */
    def encode(id: Long, seed: Long, meta: MediaMeta): Array[Byte] = {
      val size = meta.kind match {
        case "image" => meta.width * meta.height
        case "audio" => meta.sampleRate / 100 * meta.nFrames
        case _       => meta.width * meta.height * meta.nFrames
      }
      val out = new Array[Byte](size)
      var block = 0L
      var i = 0
      while (i < size) {
        var h = id * 0x9E3779B97F4A7C15L + seed * 0xC2B2AE3D27D4EB4FL + block
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        var j = 0
        while (j < 8 && i < size) { out(i) = (h >>> (j * 8)).toByte; i += 1; j += 1 }
        block += 1
      }
      out
    }

    /** "Decode": identity over the fake container (a real codec would
      * produce pixels/samples here). */
    def decode(payload: Array[Byte]): Array[Byte] = payload
  }
}
