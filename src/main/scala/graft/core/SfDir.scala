package graft.core

/** Centralized SF-dir scale parsing (ADVICE r12 #4: three separate
  * `contains("sf1")` chains would misclassify any path with `sf1` as a
  * token prefix — `sf10`, `sf1.5` — silently scaling row/asset counts
  * 10×). One rule, exact: take the LAST path component carrying a
  * trailing `sf<number>` tag (so `/root/testdata/sf0.1` and the
  * ScaleFixtures rehearsal dir `/dev/shm/graft-sf1` both parse), and
  * match the captured number EXACTLY against the known scale factors —
  * an unknown tag (sf10, sf1.5) falls to the base multiplier instead of
  * prefix-matching a wrong one.
  */
object SfDir {

  private val Tag = """(?:.*[^0-9A-Za-z])?sf([0-9]+(?:\.[0-9]+)?)$""".r

  /** Scale multiplier relative to the sf0.001 base: sf0.001 → 1,
    * sf0.01 → 10, sf0.1 → 100, sf1 → 1000. Unknown/absent tag → 1. */
  def multiplier(dir: String): Long = {
    val tag = dir.split('/').reverseIterator.collectFirst {
      case Tag(num) => num
    }.getOrElse("")
    tag match {
      case "1"    => 1000L
      case "0.1"  => 100L
      case "0.01" => 10L
      case _      => 1L
    }
  }

  /** Base-count scaling: `base` rows at sf0.001, ×10 per SF decade. */
  def scaled(dir: String, base: Long): Long = base * multiplier(dir)
}
