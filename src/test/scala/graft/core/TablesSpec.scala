package graft.core

import graft.SparkSpec

/** Session-hygiene contract for the nanos-timestamp events read. */
class TablesSpec extends SparkSpec {

  test("events read leaves nanosAsLong untouched; deferred execution works") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    val df = Tables.events(spark, sf) // lazy — no action yet
    // The scoped conf must be restored as soon as the relation is created...
    assert(spark.conf.getOption(key) == prev)
    // ...and the later execution must still read the NANOS column fine.
    assert(df.count() > 0)
    assert(df.schema("ts").dataType.typeName == "timestamp")
    assert(spark.conf.getOption(key) == prev)
  }
}
