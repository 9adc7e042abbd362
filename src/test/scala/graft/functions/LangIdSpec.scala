package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** The corpus's `lang` labels are synthetic (the text is English-ish
  * regardless), so language ID is asserted on planted real-language
  * sentences instead. */
class LangIdSpec extends SparkSpec {

  import spark.implicits._

  test("char-n-gram language ID classifies planted sentences") {
    val samples = Seq(
      ("en", "The quick brown fox jumps over the lazy dog and runs off"),
      ("en", "This is an example of the kind of sentence an engine processes"),
      ("de", "Der schnelle braune Fuchs springt über einen faulen Hund und die Wiese"),
      ("de", "Ich möchte nicht schon wieder in die Schule gehen und lernen"),
      ("fr", "Les enfants mangent que des pommes dans le jardin des voisins"),
      ("es", "Los niños están comiendo las manzanas de los vecinos en el jardín"),
      ("zh", "我在图书馆里看了一本关于历史的书，是很有意思的"),
    ).toDF("expected", "text")
    val out = samples.withColumn("got", charNgramLangId(col("text")))
    val wrong = out.where(col("got") =!= col("expected")).collect()
    assert(wrong.isEmpty, wrong.mkString("; "))
  }

  test("deterministic on ambiguous input (tie breaks stably)") {
    val df = Seq("xyz xyz xyz", "").toDF("text")
      .withColumn("got", charNgramLangId(col("text")))
    val r1 = df.collect().map(_.getString(1)).toSeq
    val r2 = df.collect().map(_.getString(1)).toSeq
    assert(r1 == r2)
  }
}
