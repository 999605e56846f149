package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

class WarcSpec extends AnyFunSuite {

  private def rec(id: Int, body: String) =
    (s"https://x.example/$id", "2024-01-01T00:00:00Z", "text/html",
      body.getBytes(UTF_8))

  test("plain WARC round-trip: headers, status, mime, byte-exact bodies") {
    val docs = Seq(rec(1, "<p>hello</p>"), rec(2, "räksmörgås 中文 🙂"),
      rec(3, "a" * 10000))
    val out = Warc.parseAll(Warc.writeAll(docs))
    assert(out.length == 3)
    out.zip(docs).foreach { case (r, (uri, date, mime, body)) =>
      assert(r.warcType == "response" && r.targetUri == uri &&
        r.warcDate == date && r.httpStatus == 200 && r.contentType == mime)
      assert(java.util.Arrays.equals(r.body, body), s"body mismatch for $uri")
    }
  }

  test("gzip-member-per-record layout parses identically to plain") {
    val docs = Seq(rec(1, "one"), rec(2, "two two"), rec(3, "three three three"))
    val plain = Warc.parseAll(Warc.writeAll(docs))
    val gz = Warc.parseAll(Warc.gzipPerRecord(docs))
    assert(gz.map(_.targetUri) == plain.map(_.targetUri))
    gz.zip(plain).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.body, b.body))
    }
  }

  test("CRLF payload bytes inside a body do not break record framing") {
    // a body containing the record terminator sequence and a fake header
    val tricky = "line1\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\nstill body"
    val out = Warc.parseAll(Warc.writeAll(Seq(rec(1, tricky), rec(2, "after"))))
    assert(out.length == 2)
    assert(new String(out.head.body, UTF_8) == tricky)
    assert(new String(out(1).body, UTF_8) == "after")
  }

  test("truncated and desynced payloads fail loudly") {
    val bytes = Warc.writeAll(Seq(rec(1, "hello world")))
    val truncated = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 20)
    val e1 = intercept[IllegalArgumentException](Warc.parseAll(truncated))
    assert(e1.getMessage.contains("truncated"))
    val garbage = "not a warc at all\r\n\r\n".getBytes(UTF_8)
    val e2 = intercept[IllegalArgumentException](Warc.parseAll(garbage))
    assert(e2.getMessage.contains("WARC"))
  }

  test("WET conversion records round-trip and explode via wetTexts") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = new java.io.ByteArrayOutputStream()
    Warc.writeConversion(out, "https://x.example/a", "2024-01-01T00:00:00Z",
      "extracted text körper".getBytes(UTF_8))
    Warc.writeConversion(out, "https://x.example/b", "2024-01-01T00:00:00Z",
      "second page".getBytes(UTF_8))
    val rows = Warc.wetTexts(Seq(out.toByteArray).toDF("payload"), col("payload"))
      .select("warc_url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("https://x.example/a", "extracted text körper"),
      ("https://x.example/b", "second page")))
    // response-record explode ignores conversion records and vice versa
    assert(Warc.records(Seq(out.toByteArray).toDF("payload"), col("payload"))
      .count() == 0)
  }

  test("records() explodes response rows in Spark, blobs stay partition-local") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val blobA = Warc.writeAll(Seq(rec(1, "alpha"), rec(2, "beta")))
    val blobB = Warc.gzipPerRecord(Seq(rec(3, "gamma")))
    val df = Seq(blobA, blobB).toDF("payload")
    val rows = Warc.records(df, col("payload"))
      .select("warc_url", "http_status", "body_text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("https://x.example/1", 200, "alpha"),
      ("https://x.example/2", 200, "beta"),
      ("https://x.example/3", 200, "gamma")))
  }

  test("gunzip buffer hint never overflows Int for Common-Crawl-sized blobs") {
    // pre-fix, 600 MiB compressed * 4 wrapped negative and the
    // ByteArrayOutputStream constructor threw before parsing began
    val sixHundredMiB = 600 * 1024 * 1024
    val hint = Warc.gunzipSizeHint(sixHundredMiB)
    assert(hint > 0 && hint <= 256 * 1024 * 1024)
    assert(new java.io.ByteArrayOutputStream(Warc.gunzipSizeHint(Int.MaxValue)) != null)
    // small payloads keep the 4x heuristic exactly
    assert(Warc.gunzipSizeHint(1000) == 4000)
  }
}
