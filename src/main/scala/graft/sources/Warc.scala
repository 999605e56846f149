package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingest — the wire format web crawls
  * actually arrive in (Common Crawl ships `warc.gz` files of
  * gzip-member-per-record WARC/1.0 response records), i.e. step 0 of a
  * web-corpus training-data pipeline, ahead of the HTML→text extraction
  * ([[graft.ext.Cleaning.stripHtml]]) this engine already provides.
  *
  * Format (WARC/1.0): each record is
  * {{{
  *   WARC/1.0\r\n
  *   <header-name>: <value>\r\n ...          (incl. Content-Length)
  *   \r\n
  *   <Content-Length bytes of block>\r\n\r\n
  * }}}
  * A `response` record's block is a full HTTP response (status line +
  * headers + CRLFCRLF + body); the parser splits that too. The standard
  * `.warc.gz` layout concatenates one gzip MEMBER per record so readers
  * can split on member boundaries; `java.util.zip.GZIPInputStream`
  * decompresses concatenated members natively, so [[parseAll]] accepts
  * either plain or gzipped payloads (magic-sniffed).
  *
  * Scale shape: WARC payloads arrive as opaque binary columns (the
  * multimodal-column pattern — one blob per source file/chunk); records
  * explode per partition in a single batched pass, blobs never shuffle,
  * and downstream sees ordinary (url, date, status, mime, body) rows.
  * Both the writer and the parser are pure JVM — the writer exists so
  * tests and the oracle row can prove the parser against an independent
  * recomputation (the JPEG/WAV verification discipline).
  */
object Warc {

  /** One parsed WARC record; `body` is the HTTP response body for
    * `response` records (headers stripped), the raw block otherwise. */
  final case class WarcRecord(
      warcType: String, targetUri: String, warcDate: String,
      httpStatus: Int, contentType: String, body: Array[Byte])

  private val Crlf = "\r\n".getBytes(UTF_8)

  /** Serialize one WARC/1.0 response record wrapping an HTTP 200 response. */
  def writeResponse(out: ByteArrayOutputStream, uri: String, date: String,
      mime: String, body: Array[Byte]): Unit = {
    val http = new ByteArrayOutputStream()
    http.write(s"HTTP/1.1 200 OK\r\nContent-Type: $mime\r\nContent-Length: ${body.length}\r\n\r\n"
      .getBytes(UTF_8))
    http.write(body)
    val block = http.toByteArray
    out.write(("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes(UTF_8))
    out.write(block)
    out.write(Crlf); out.write(Crlf)
  }

  /** Serialize docs as one plain WARC byte stream (test/oracle helper). */
  def writeAll(docs: Seq[(String, String, String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    docs.foreach { case (uri, date, mime, body) =>
      writeResponse(out, uri, date, mime, body)
    }
    out.toByteArray
  }

  /** Gzip with one MEMBER per record — the standard `.warc.gz` layout. */
  def gzipPerRecord(docs: Seq[(String, String, String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    docs.foreach { case (uri, date, mime, body) =>
      val one = new ByteArrayOutputStream()
      writeResponse(one, uri, date, mime, body)
      val gz = new GZIPOutputStream(out)
      gz.write(one.toByteArray)
      // close(), not finish(): close releases the native Deflater
      // immediately (finish leaves one allocated per record until GC —
      // native-memory pressure on a many-record archive). The underlying
      // ByteArrayOutputStream's close() is a no-op, so the next record
      // still opens a new member on the same stream.
      gz.close()
    }
    out.toByteArray
  }

  /** Initial-capacity hint for the gunzip buffer: ~4× the compressed
    * length (typical WARC text ratio), clamped to a sane ceiling. The
    * naive `payload.length * 4` overflows Int for a ≥512 MiB gzipped
    * blob — exactly the ~1 GiB Common Crawl `.warc.gz` shape — making
    * the constructor throw before parsing starts. The clamp at 256 MiB
    * costs at most a few doubling copies on genuinely huge payloads and
    * never pre-commits a 2 GiB array on a bad ratio guess. */
  private[graft] def gunzipSizeHint(compressedLen: Int): Int =
    math.min(compressedLen.toLong * 4L, 256L * 1024 * 1024).toInt

  /** Parse a plain or gzipped (concatenated-member) WARC payload into
    * records. Loud failures: a payload that loses record sync throws with
    * the byte offset rather than silently skipping content. */
  def parseAll(payload: Array[Byte]): Seq[WarcRecord] = {
    val bytes =
      if (payload.length >= 2 && (payload(0) & 0xff) == 0x1f &&
          (payload(1) & 0xff) == 0x8b) {
        val in = new GZIPInputStream(new ByteArrayInputStream(payload), 65536)
        val out = new ByteArrayOutputStream(gunzipSizeHint(payload.length))
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } else payload
    val recs = Seq.newBuilder[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        val headEnd = indexOf(bytes, pos, "\r\n\r\n")
        require(headEnd >= 0, s"lost WARC record sync at byte $pos")
        val head = new String(bytes, pos, headEnd - pos, UTF_8)
        val lines = head.split("\r\n")
        require(lines.head.startsWith("WARC/"),
          s"not a WARC version line at byte $pos: ${lines.head.take(40)}")
        val hdrs = lines.tail.flatMap { l =>
          val i = l.indexOf(':')
          if (i > 0) Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
          else None
        }.toMap
        val len = hdrs.getOrElse("content-length",
          sys.error(s"WARC record at byte $pos lacks Content-Length")).toInt
        val blockStart = headEnd + 4
        require(blockStart + len <= bytes.length,
          s"truncated WARC block at byte $pos (need $len)")
        val block = java.util.Arrays.copyOfRange(bytes, blockStart, blockStart + len)
        val wtype = hdrs.getOrElse("warc-type", "")
        val rec =
          if (wtype == "response" && hdrs.getOrElse("content-type", "")
              .startsWith("application/http")) {
            val he = indexOf(block, 0, "\r\n\r\n")
            val (status, mime, body) =
              if (he < 0) (0, "", block)
              else {
                val hl = new String(block, 0, he, UTF_8).split("\r\n")
                val st = hl.head.split(" ") match {
                  case Array(_, code, _*) => code.toIntOption.getOrElse(0)
                  case _ => 0
                }
                val ct = hl.tail.collectFirst {
                  case l if l.toLowerCase.startsWith("content-type:") =>
                    l.substring(13).trim
                }.getOrElse("")
                (st, ct, java.util.Arrays.copyOfRange(block, he + 4, block.length))
              }
            WarcRecord(wtype, hdrs.getOrElse("warc-target-uri", ""),
              hdrs.getOrElse("warc-date", ""), status, mime, body)
          } else
            WarcRecord(wtype, hdrs.getOrElse("warc-target-uri", ""),
              hdrs.getOrElse("warc-date", ""), 0,
              hdrs.getOrElse("content-type", ""), block)
        recs += rec
        pos = blockStart + len
      }
    }
    recs.result()
  }

  private def indexOf(bytes: Array[Byte], from: Int, needle: String): Int = {
    val n = needle.getBytes(UTF_8)
    var i = from
    val limit = bytes.length - n.length
    while (i <= limit) {
      var j = 0
      while (j < n.length && bytes(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Serialize one WET-style `conversion` record (extracted plain text,
    * no HTTP envelope) — the layout of Common Crawl's `.wet.gz` files. */
  def writeConversion(out: ByteArrayOutputStream, uri: String, date: String,
      text: Array[Byte]): Unit = {
    out.write(("WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${text.length}\r\n\r\n").getBytes(UTF_8))
    out.write(text)
    out.write(Crlf); out.write(Crlf)
  }

  /** Explode a binary WET payload column (conversion records) into one
    * row per record: (warc_url, warc_date, text). */
  def wetTexts(df: DataFrame, payloadCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(payloadCol.as("p")).as[Array[Byte]]
      .mapPartitions(_.flatMap(p => parseAll(p).iterator
        .filter(_.warcType == "conversion")
        .map(r => (r.targetUri, r.warcDate, new String(r.body, UTF_8)))))
      .toDF("warc_url", "warc_date", "text")
  }

  /** Explode a binary WARC payload column into one row per `response`
    * record: (warc_url, warc_date, http_status, content_type, body,
    * body_text). Batched per-partition parse — payload blobs never
    * shuffle; only the exploded rows flow on. */
  def records(df: DataFrame, payloadCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(payloadCol.as("p")).as[Array[Byte]]
      .mapPartitions(_.flatMap(p => parseAll(p).iterator
        .filter(_.warcType == "response")
        .map(r => (r.targetUri, r.warcDate, r.httpStatus, r.contentType,
          r.body, new String(r.body, UTF_8)))))
      .toDF("warc_url", "warc_date", "http_status", "content_type",
        "body", "body_text")
  }
}
