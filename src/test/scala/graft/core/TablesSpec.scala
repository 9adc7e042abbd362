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

  test("spread parallelizes an under-split source and no-ops a wide one") {
    import spark.implicits._
    val cores = spark.sparkContext.defaultParallelism
    val narrow = (1 to 1000).toDF("x").coalesce(1)
    val s = Tables.spread(narrow)
    assert(s.rdd.getNumPartitions == cores)
    assert(s.count() == 1000)
    val wide = (1 to 1000).toDF("x").repartition(cores + 4)
    // already >= cores: must return the input plan unchanged (no extra
    // exchange at real scale)
    assert(Tables.spread(wide) eq wide)
  }
}
