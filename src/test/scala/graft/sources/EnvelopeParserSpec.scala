package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class EnvelopeParserSpec extends AnyFunSuite {

  private def envelope(pairs: (String, String)*): String = {
    val records = pairs.map { case (b, k) =>
      s"""{"s3":{"bucket":{"name":"$b"},"object":{"key":"$k"}}}"""
    }.mkString(",")
    s"""{"Records":[$records]}"""
  }

  test("builds s3a URIs from Records (spark_job.py:99)") {
    assert(EnvelopeParser.fileUris(envelope("b1" -> "raw/f1.json")) ==
      Seq("s3a://b1/raw/f1.json"))
  }

  test("multiple records in one message flatten in order") {
    assert(EnvelopeParser.fileUris(envelope("b" -> "k1", "b" -> "k2")) ==
      Seq("s3a://b/k1", "s3a://b/k2"))
  }

  test("empty Records list skips the message (spark_job.py:94-96)") {
    assert(EnvelopeParser.fileUris("""{"Records":[]}""").isEmpty)
  }

  test("missing Records key skips (payload.get default)") {
    assert(EnvelopeParser.fileUris("""{"Event":"s3:TestEvent"}""").isEmpty)
  }

  test("malformed JSON degrades to no files, not an exception") {
    assert(EnvelopeParser.fileUris("""not json at all {{{""").isEmpty)
  }

  test("record missing s3.object.key is dropped, others survive") {
    val body = """{"Records":[{"s3":{"bucket":{"name":"b"}}},
      {"s3":{"bucket":{"name":"b"},"object":{"key":"ok"}}}]}"""
    assert(EnvelopeParser.fileUris(body) == Seq("s3a://b/ok"))
  }

  test("batchFiles flattens across messages preserving arrival order") {
    val m1 = envelope("b" -> "f1")
    val m2 = """{"Records":[]}"""
    val m3 = envelope("b" -> "f2", "b" -> "f3")
    assert(EnvelopeParser.batchFiles(Seq(m1, m2, m3)) ==
      Seq("s3a://b/f1", "s3a://b/f2", "s3a://b/f3"))
  }

  test("protocol override (local test files)") {
    assert(EnvelopeParser.fileUris(envelope("" -> "tmp/x.json"), "file") ==
      Seq("file:///tmp/x.json"))
  }
}
