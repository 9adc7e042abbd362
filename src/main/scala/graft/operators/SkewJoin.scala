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
    * hot keys spread over `salts` reducers. The salt derives from
    * xxhash64 over the big side's whole row, so plans stay deterministic
    * across retries and cluster layouts (no rand()). */
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
    val saltOfRow: Column =
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts)).cast("int")
    val b = big.withColumn("__salt", saltOfRow)
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
