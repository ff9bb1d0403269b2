package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Wikipedia dump acquisition + wikitext extraction
  * (stages/text/download/wikipedia/{url_generation,iterator,extract}.py).
  *
  * URL generation parses `dumpstatus.json` for a finished
  * articlesmultistreamdump (fetch injected — zero egress here); the
  * iterator streams the MediaWiki XML (bz2 or plain) and yields main-
  * namespace, non-redirect articles; the extractor is a wikitext-lite
  * cleaner in the mwparserfromhell slot: templates, tables, refs,
  * comments and magic words removed, media links dropped, category
  * prefixes stripped, wikilinks/external links resolved to their
  * labels, headings kept as text, sections joined by blank lines.
  * Full-parser bit-parity is honestly NOT claimed (same posture as
  * TrafilaturaExtract); the cleaning ALGORITHM matches extract.py's
  * filter set.
  */
object WikipediaSource {

  /** Dump-file URLs for a language+date from its dumpstatus.json
    * (url_generation.py:_get_wikipedia_urls): xml multistream files of
    * a "done" articlesmultistreamdump.
    */
  def urlsFromDumpStatus(dumpStatusJson: String, language: String, dumpDate: String,
                         prefix: String = "https://dumps.wikimedia.org"): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(dumpStatusJson)
    val job = root.path("jobs").path("articlesmultistreamdump")
    require(job.path("status").asText() == "done", s"Dump $dumpDate is not finished")
    val files = job.path("files").fieldNames()
    val out = Seq.newBuilder[String]
    while (files.hasNext) {
      val f = files.next()
      if (f.contains("xml")) out += s"$prefix/${language}wiki/$dumpDate/$f"
    }
    out.result()
  }

  final case class Article(title: String, id: String, url: String,
                           language: String, sourceId: String, rawContent: String)

  /** MediaWiki XML STREAM (bz2 'BZh' — including concatenated
    * multistream dumps — or plain) → lazy main-namespace non-redirect
    * article records (iterator.py:iterate). Only the current page's
    * text is ever in memory; a multi-GB dump part streams through.
    */
  def iterateStream(rawIn: java.io.InputStream, language: String,
                    sourceId: String): Iterator[Article] = {
    val buf = new java.io.BufferedInputStream(rawIn)
    buf.mark(4)
    val magic = new Array[Byte](3)
    // readNBytes loops until 3 bytes or EOF — a plain read() may return
    // short on network streams and misclassify a valid bz2 dump
    val nRead = buf.readNBytes(magic, 0, 3)
    buf.reset()
    val in =
      if (nRead == 3 && magic(0) == 'B' && magic(1) == 'Z' && magic(2) == 'h')
        // decompressConcatenated: the articlesmultistream dumps are
        // many back-to-back bz2 streams (100 pages each) in one file
        new BZip2CompressorInputStream(buf, true)
      else buf
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(in, "UTF-8")

    new Iterator[Article] {
      private var title: String = null; private var ns: String = null; private var id: String = null
      private var redirect = false; private var text: String = null
      private var inPage = false; private var inRevision = false; private var depthId = 0
      private var pending: Article = null
      private var done = false

      private def advance(): Unit = {
        while (pending == null && !done) {
          if (!r.hasNext) { done = true; r.close() }
          else r.next() match {
            case javax.xml.stream.XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "page" => inPage = true; title = null; ns = null; id = null; redirect = false; text = null; depthId = 0
              case "revision" if inPage => inRevision = true
              case "redirect" if inPage => redirect = true
              case "title" if inPage && !inRevision => title = r.getElementText
              case "ns" if inPage && !inRevision => ns = r.getElementText
              // the PAGE id is the first <id> outside <revision>
              case "id" if inPage && !inRevision && depthId == 0 => id = r.getElementText; depthId += 1
              case "text" if inRevision => text = r.getElementText
              case _ =>
            }
            case javax.xml.stream.XMLStreamConstants.END_ELEMENT => r.getLocalName match {
              case "revision" => inRevision = false
              case "page" =>
                inPage = false
                if (title != null && ns == "0" && id != null && !redirect && text != null) {
                  val url = s"https://$language.wikipedia.org/wiki/" +
                    java.net.URLEncoder.encode(title, "UTF-8").replace("+", "%20")
                  pending = Article(title, id, url, language, sourceId, text)
                }
              case _ =>
            }
            case _ =>
          }
        }
      }

      def hasNext: Boolean = { advance(); pending != null }
      def next(): Article = {
        advance()
        if (pending == null) throw new NoSuchElementException("end of dump")
        val a = pending; pending = null; a
      }
    }
  }

  /** In-memory convenience over [[iterateStream]] (tests/fixtures). */
  def iterate(bytes: Array[Byte], language: String, sourceId: String): Seq[Article] =
    iterateStream(new ByteArrayInputStream(bytes), language, sourceId).toSeq

  /** Directory of dump files → article rows — one streaming task per
    * dump part ([[ArchiveIO.perFile]]: no whole-dump byte array, no
    * 2 GB binaryFile row ceiling).
    */
  def read(spark: SparkSession, path: String, language: String = "en"): DataFrame = {
    import spark.implicits._
    ArchiveIO.perFile(spark, path) { (p, in) =>
      iterateStream(in, language, p.split('/').last)
        .map(a => (a.title, a.id, a.url, a.language, a.sourceId, a.rawContent))
    }.toDF("title", "id", "url", "language", "source_id", "raw_content")
  }

  // ---------------- wikitext-lite extraction ----------------

  /** Default prefixes; per-language aliases plug in the same slots
    * (extract.py MEDIA_ALIASES / CAT_ALIASES tables).
    */
  val DefaultMediaPrefixes: Seq[String] = Seq("File", "Image", "Media")
  val DefaultCategoryPrefixes: Seq[String] = Seq("Category")

  private def removeNested(s: String, open: String, close: String): String = {
    // innermost-out removal of balanced delimiters ({{...}}, {|...|}):
    // each pass removes spans whose body contains no further opener,
    // until fixpoint
    val re = java.util.regex.Pattern.quote(open) + "[^" +
      java.util.regex.Pattern.quote(open.take(1)) + "]*?" +
      java.util.regex.Pattern.quote(close)
    var cur = s
    var prev: String = null
    while (prev != cur) { prev = cur; cur = cur.replaceAll(re, "") }
    cur
  }

  def cleanWikitext(raw: String,
                    mediaPrefixes: Seq[String] = DefaultMediaPrefixes,
                    categoryPrefixes: Seq[String] = DefaultCategoryPrefixes): String = {
    var s = raw
    // html comments, ref/table tags with bodies, magic words
    s = s.replaceAll("(?s)<!--.*?-->", "")
    s = s.replaceAll("(?si)<ref[^>]*/>", "")
    s = s.replaceAll("(?si)<ref[^>]*>.*?</ref>", "")
    s = s.replaceAll("(?si)<table[^>]*>.*?</table>", "")
    s = s.replaceAll("__[A-Z]*__", "")
    // templates {{...}} and wiki tables {|...|} (innermost-out)
    s = removeNested(s, "{{", "}}")
    s = removeNested(s, "{|", "|}")
    // wikilinks, innermost-out so nested captions resolve first
    val media = ("(?i)^(?:" + mediaPrefixes.mkString("|") + "):").r
    val cat = ("(?i)^(?:" + categoryPrefixes.mkString("|") + "):").r
    val link = java.util.regex.Pattern.compile("\\[\\[([^\\[\\]]*?)\\]\\]")
    var changed = true
    while (changed) {
      val m = link.matcher(s)
      val sb = new java.lang.StringBuilder
      var last = 0
      changed = false
      while (m.find()) {
        changed = true
        sb.append(s, last, m.start())
        val inner = m.group(1)
        if (media.findFirstIn(inner).isDefined) () // media link: drop
        else {
          val label = inner.split('|').last
          sb.append(cat.replaceFirstIn(if (inner.contains('|')) label else inner, ""))
        }
        last = m.end()
      }
      sb.append(s, last, s.length)
      s = sb.toString
    }
    // external links [url label] -> label; bare [url] -> ""
    s = s.replaceAll("\\[\\S+//[^\\s\\]]+ ([^\\]]*)\\]", "$1")
    s = s.replaceAll("\\[\\S+//[^\\s\\]]+\\]", "")
    // bold/italic markers, headings kept as their text
    s = s.replace("'''''", "").replace("'''", "").replace("''", "")
    s = s.replaceAll("(?m)^(={2,6})\\s*(.*?)\\s*\\1\\s*$", "$2")
    // leftover html tags
    s = s.replaceAll("(?s)<[^>]+>", "")
    // collapse runs of blank lines to section breaks, trim edges
    s = s.replaceAll("[ \\t]+\\n", "\n").replaceAll("\\n{3,}", "\n\n").trim
    s
  }

  /** DataFrame stage (extract.py shape): + text, failures dropped. */
  def extractColumns(df: DataFrame,
                     mediaPrefixes: Seq[String] = DefaultMediaPrefixes,
                     categoryPrefixes: Seq[String] = DefaultCategoryPrefixes): DataFrame = {
    import org.apache.spark.sql.functions._
    val u = udf((t: String) => if (t == null) null else cleanWikitext(t, mediaPrefixes, categoryPrefixes))
      .asNondeterministic() // pure but expensive: never evaluate twice
    df.withColumn("text", u(col("raw_content")))
      .filter(col("text").isNotNull && col("text") =!= "")
      .drop("raw_content")
  }
}
