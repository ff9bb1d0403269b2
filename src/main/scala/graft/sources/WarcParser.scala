package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lightweight WARC (Web ARChive, ISO 28500) record splitter.
  *
  * Reference: stages/text/download/base/iterator.py:60-112 +
  * common_crawl/warc_iterator.py:27-57 — iterate `response` records of a
  * WARC file into rows {url, warc_id, source_id, content:bytes}.
  *
  * Spark-first ingestion: `spark.read.format("binaryFile")` gives
  * (path, content) per WARC file; records split executor-side with this
  * parser inside a flatMap — each file is one task, no driver-side IO.
  * (Production note: CC WARCs are ~1 GiB gzip members; there the scan
  * uses splittable per-member ranges. The parser here handles the
  * uncompressed record grammar.)
  */
object WarcParser {

  final case class WarcRecord(url: String, warcId: String, warcType: String,
                              content: Array[Byte])

  private val HeaderEnd = "\r\n\r\n".getBytes("US-ASCII")

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Split raw (uncompressed) WARC bytes into records. */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      // find record start
      val start = indexOf(bytes, "WARC/1.".getBytes("US-ASCII"), pos)
      if (start < 0) return out.toSeq
      val headerEnd = indexOf(bytes, HeaderEnd, start)
      if (headerEnd < 0) return out.toSeq
      val header = new String(bytes, start, headerEnd - start, "UTF-8")
      val fields = header.split("\r\n").drop(1).flatMap { line =>
        val idx = line.indexOf(':')
        if (idx > 0) Some(line.substring(0, idx).trim.toLowerCase -> line.substring(idx + 1).trim)
        else None
      }.toMap
      val len = fields.get("content-length").flatMap(_.toLongOption).getOrElse(0L).toInt
      val bodyStart = headerEnd + HeaderEnd.length
      val bodyEnd = math.min(bytes.length, bodyStart + len)
      val body = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd)
      out += WarcRecord(
        url = fields.getOrElse("warc-target-uri", null),
        warcId = fields.getOrElse("warc-record-id", null),
        warcType = fields.getOrElse("warc-type", "unknown"),
        content = body)
      pos = bodyEnd
    }
    out.toSeq
  }

  /** HTTP response records only (the reference iterator's filter,
    * warc_iterator.py:42-45), with the HTTP header block stripped from
    * the payload so `content` is the raw HTML bytes.
    */
  def responses(bytes: Array[Byte]): Seq[WarcRecord] =
    parse(bytes).filter(_.warcType == "response").map { r =>
      val split = indexOf(r.content, HeaderEnd, 0)
      if (split >= 0 && new String(r.content, 0, math.min(5, r.content.length), "US-ASCII").startsWith("HTTP"))
        r.copy(content = java.util.Arrays.copyOfRange(r.content, split + HeaderEnd.length, r.content.length))
      else r
    }

  /** Directory of WARC files → rows (url, warc_id, source_id, content). */
  def read(spark: SparkSession, path: String): DataFrame = read(spark, Seq(path))

  /** Explicit WARC file list → rows — the acquisition flow passes the
    * exact files IT downloaded, so stale files from a previous run (or
    * another snapshot window) sharing the directory never leak in.
    */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        responses(bytes).map(r => (r.url, r.warcId, p, r.content))
      }
      .toDF("url", "warc_id", "source_id", "content")
  }

  /** Build a syntactically-valid WARC byte stream from (url, html) pairs —
    * the zero-egress test fixture (no network downloads in this sandbox).
    */
  def buildWarc(records: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (((url, html), i) <- records.zipWithIndex) {
      val httpHeader = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
      val body = httpHeader.getBytes("US-ASCII") ++ html
      val header =
        s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"
      out.write(header.getBytes("US-ASCII"))
      out.write(body)
      out.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    out.toByteArray
  }
}
