package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equijoin for skewed keys.
  *
  * A shuffle join hashes rows to reducers by key, so one hot key (a viral
  * document, a null-ish default id) lands an entire 100 TB partition on one
  * executor. AQE's skew-join splitting handles this for batch sort-merge
  * joins; this operator is the manual path for the cases AQE can't touch —
  * streaming joins, broadcast-ineligible build sides, or when the skew is
  * known up front and re-planning mid-query is unwanted.
  *
  * Mechanics: each big-side row gets a deterministic pseudo-random salt in
  * [0, salts); the small side is replicated `salts` times. Joining on
  * (key, salt) spreads every hot key over `salts` reducers at the cost of
  * a `salts`× blow-up of the (small) replicated side. Result is exactly
  * the plain equijoin (spec-verified).
  */
object SkewJoin {

  /** Inner/left equijoin of `big ⋈ small` on `keys`, with the big side's
    * hot keys spread over `salts` reducers. The salt mixes xxhash64 over
    * the row's columns with a per-row component (partition id << 33 +
    * partition-local counter, via monotonically_increasing_id) — content
    * alone is NOT enough: a hot key whose rows are byte-identical
    * (exactly the null-ish-default-id case salting exists for) would
    * collapse onto one salt and not spread at all. The per-row component
    * is deterministic per file split (same split, same row order → same
    * ids on retry), so recomputed map outputs stay consistent — the
    * hazard rand() has and this does not. */
  private val SupportedJoinTypes = Set("inner", "left", "leftouter")

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Salting is only equivalent to the plain join when unmatched SMALL-side
    // rows never surface: the small side is replicated `salts` times, so
    // right/full would emit each unmatched small row `salts` times, and
    // semi/anti flip which side survives. Big side must be the left side.
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins with the big table on the left; got '$joinType'")
    // The working column must not shadow a real one on either side (the
    // join would silently equate them); uniquify instead of hard-coding.
    val saltCol = Iterator.iterate("__salt")(_ + "_")
      .dropWhile(n => big.columns.contains(n) || small.columns.contains(n))
      .next()
    val saltOfRow: Column =
      pmod(xxhash64(monotonically_increasing_id() +: big.columns.map(col).toSeq: _*),
        lit(salts)).cast("int")
    val b = big.withColumn(saltCol, saltOfRow)
    val s = small.withColumn(saltCol,
      explode(array((0 until salts).map(i => lit(i)): _*)))
    b.join(s, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Salt count sized from the DATA instead of guessed: one partial/final
    * count-by-key over the big side (map-side combine collapses the hot
    * key before the stat itself can skew), then
    *
    *   salts = ceil(hottest-key rows / even-partition rows), clamped to
    *   [1, maxSalts]
    *
    * — i.e. just enough replication that the hottest key's rows spread
    * back down to one even partition's worth per reducer, and exactly 1
    * (a plain join modulo a constant-zero salt column) when no key
    * exceeds an even share. Replication cost on the small side scales
    * with the skew that is actually present, not with a worst-case
    * constant: a uniform 100 TB join pays nothing, and the same call
    * survives the day one key goes viral. The 2-value collect is bounded.
    */
  def autoSalts(big: DataFrame, keys: Seq[String], maxSalts: Int = 64): Int = {
    val stats = big.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")).as("hot"), sum(col("cnt")).as("total"))
      .head
    if (stats.isNullAt(0)) return 1 // empty big side
    val (hot, total) = (stats.getLong(0), stats.getLong(1))
    val parts = big.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val even = math.max(1L, total / math.max(1, parts))
    math.min(maxSalts.toLong, math.max(1L, (hot + even - 1) / even)).toInt
  }

  /** [[saltedJoin]] with the salt count sized by [[autoSalts]]. */
  def autoSaltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      joinType: String = "inner", maxSalts: Int = 64): DataFrame =
    saltedJoin(big, small, keys, autoSalts(big, keys, maxSalts), joinType)
}
