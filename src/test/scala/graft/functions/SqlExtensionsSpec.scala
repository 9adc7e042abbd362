package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** The SQL surface must agree with the Column DSL exactly — same
  * expressions, two APIs. */
class SqlExtensionsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val registered = { GraftSqlExtensions.register(spark); true }

  test("SQL functions evaluate and match the DSL results") {
    assert(registered)
    Seq(("the quick brown fox jumps over the lazy dog", Array(1.0f, 2.0f, 2.0f)))
      .toDF("text", "emb").createOrReplaceTempView("ext_probe")

    val viaSql = spark.sql("""
      SELECT dot_product(CAST(emb AS ARRAY<DOUBLE>), CAST(emb AS ARRAY<DOUBLE>)) AS d,
             minhash_sig(shingles_of(split(trim(text), '\\s+'), 3), 8) AS mh,
             simhash64(split(trim(text), '\\s+')) AS sh,
             doc_fingerprint(text) AS fp,
             lsh_buckets(CAST(emb AS ARRAY<DOUBLE>), 2, 4) AS lb,
             lang_id(text) AS lang
      FROM ext_probe""").head()

    val viaDsl = spark.table("ext_probe").select(
      dot(vec64(col("emb")), vec64(col("emb"))).as("d"),
      minhashSignature(shingles(tokens(col("text")), 3), 8).as("mh"),
      graft.functions.CodegenExpressions.simhashCol(tokens(col("text"))).as("sh"),
      fingerprint(col("text")).as("fp"),
      lshBuckets(vec64(col("emb")), 2, 4).as("lb"),
      charNgramLangId(col("text")).as("lang")).head()

    assert(viaSql.getDouble(0) == viaDsl.getDouble(0))
    assert(viaSql.getSeq[Long](1) == viaDsl.getSeq[Long](1))
    assert(viaSql.getLong(2) == viaDsl.getLong(2))
    assert(viaSql.getLong(3) == viaDsl.getLong(3))
    assert(viaSql.getSeq[Long](4) == viaDsl.getSeq[Long](4))
    assert(viaSql.getString(5) == viaDsl.getString(5) && viaSql.getString(5) == "en")
  }

  test("non-literal size argument is rejected with a clear error") {
    assert(registered)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), CAST(rand()*4 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal int"))
  }
}
