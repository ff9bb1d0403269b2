package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class ArxivWikiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // ---------- fixture builders (zero egress: in-memory archives) ----------

  private def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close(); bos.toByteArray
  }
  private def tar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); val t = new TarArchiveOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      val e = new TarArchiveEntry(name); e.setSize(bytes.length)
      t.putArchiveEntry(e); t.write(bytes); t.closeArchiveEntry()
    }
    t.close(); bos.toByteArray
  }

  // ---------- arxiv ----------

  test("arxiv id formatting (pre/post-2007 forms)") {
    assert(ArxivSource.formatArxivId("2303.01234") == "2303.01234")
    assert(ArxivSource.formatArxivId("hep-th9901001") == "hep-th/9901001")
    intercept[IllegalArgumentException](ArxivSource.formatArxivId("???"))
  }

  test("monthly tar -> papers: bare-gz tex AND tar-of-project; non-UTF-8 paper dropped") {
    val single = "\\section{One}\nbody one".getBytes("UTF-8")
    val proj = tar(Seq(
      "main.tex" -> "\\section{Two}\nbody two".getBytes("UTF-8"),
      "style.sty" -> "ignored".getBytes("UTF-8"),
      "appendix.tex" -> "\\section{Extra}\nmore".getBytes("UTF-8")))
    val binaryJunk = Array[Byte](0x41, 0xC3.toByte, 0x28) // invalid UTF-8
    val monthly = tar(Seq(
      "2303/2303.00001.gz" -> gzip(single),
      "2303/2303.00002.gz" -> gzip(proj),
      "2303/2303.00003.gz" -> gzip(binaryJunk)))
    val papers = ArxivSource.iterate(monthly)
    assert(papers.map(_._1) == Seq("2303.00001", "2303.00002"))
    assert(papers(1)._2.size == 2) // only .tex members
  }

  test("tex cleaning: section prefix, comments, bibliography tail, zero-arg macros") {
    val tex =
      """% top comment
        |\documentclass{article}
        |\newcommand{\gm}{quality}
        |\begin{document}
        |preamble prose that must vanish
        |\section{Intro}
        |We study \gm signals. % trailing note
        |Also \gmx stays (longer name, no match on \gm prefix).
        |\bibliography{refs}
        |junk after
        |""".stripMargin
    val macros = ArxivSource.nonArgMacros(tex)
    assert(macros == Map("\\gm" -> "quality"))
    val cleaned = ArxivSource.cleanTexFile(tex, macros)
    assert(cleaned.startsWith("\\section{Intro}"))
    assert(cleaned.contains("We study quality signals."))
    assert(!cleaned.contains("trailing note") && !cleaned.contains("preamble prose"))
    assert(!cleaned.contains("junk after") && !cleaned.contains("\\bibliography"))
    assert(cleaned.contains("\\gmx")) // word-boundary guard
    // no section-like header -> empty
    assert(ArxivSource.cleanTexFile("no headers at all", Map.empty) == "")
  }

  test("arxiv DataFrame stage: binaryFile scan -> (id, source_id, text)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("arxiv_src").toString
    val tex = "\\section{S}\ncontent words here".getBytes("UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "arXiv_src_2303_001.tar"),
      tar(Seq("2303/2303.00001.gz" -> gzip(tex))))
    val out = ArxivSource.extractColumns(ArxivSource.read(spark, dir)).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("id") == "2303.00001")
    assert(r.getAs[String]("source_id") == "arXiv_src_2303_001.tar")
    assert(r.getAs[String]("text").contains("content words here"))
    // second scan is deterministic
    assert(ArxivSource.extractColumns(ArxivSource.read(spark, dir)).count() == 1)
  }

  // ---------- wikipedia ----------

  private def dumpXml(pages: Seq[(String, String, String, String, Boolean)]): String = {
    val body = pages.map { case (title, ns, id, text, redir) =>
      s"""<page><title>$title</title><ns>$ns</ns><id>$id</id>
         |${if (redir) "<redirect title=\"Elsewhere\"/>" else ""}
         |<revision><id>9${id}9</id><text>$text</text></revision></page>""".stripMargin
    }.mkString("\n")
    s"""<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/">$body</mediawiki>"""
  }

  test("dumpstatus.json -> multistream xml urls; unfinished dump rejected") {
    val done =
      """{"jobs":{"articlesmultistreamdump":{"status":"done","files":{
        |"enwiki-20260801-pages-articles-multistream1.xml-p1p41242.bz2":{"size":1},
        |"enwiki-20260801-md5sums.txt":{"size":1}}}}}""".stripMargin
    val urls = WikipediaSource.urlsFromDumpStatus(done, "en", "20260801")
    assert(urls == Seq("https://dumps.wikimedia.org/enwiki/20260801/enwiki-20260801-pages-articles-multistream1.xml-p1p41242.bz2"))
    val notDone = done.replace("\"done\"", "\"in-progress\"")
    intercept[IllegalArgumentException](
      WikipediaSource.urlsFromDumpStatus(notDone, "en", "20260801"))
  }

  test("bz2 xml dump -> main-namespace non-redirect articles with page (not revision) ids") {
    val xml = dumpXml(Seq(
      ("Alpha Article", "0", "11", "alpha body", false),
      ("Talk:Alpha", "1", "12", "talk body", false),        // non-main ns
      ("Beta", "0", "13", "beta body", true),               // redirect
      ("Gamma G", "0", "14", "gamma body", false)))
    val bos = new ByteArrayOutputStream()
    val bz = new BZip2CompressorOutputStream(bos)
    bz.write(xml.getBytes("UTF-8")); bz.close()
    val arts = WikipediaSource.iterate(bos.toByteArray, "en", "dump1.bz2")
    assert(arts.map(_.title) == Seq("Alpha Article", "Gamma G"))
    assert(arts.map(_.id) == Seq("11", "14")) // page id, not revision id 9119
    assert(arts.head.url == "https://en.wikipedia.org/wiki/Alpha%20Article")
    // plain (non-bz2) bytes take the uncompressed path
    assert(WikipediaSource.iterate(xml.getBytes("UTF-8"), "en", "d").size == 2)
  }

  test("wikitext-lite cleaning: templates, links, media, categories, refs, headings, quotes") {
    val raw =
      """{{Infobox thing|a={{nested|x}}|b=2}}
        |== History ==
        |'''Bold''' text with a [[plain link]] and a [[target|labeled link]].
        |A media file [[File:pic.png|thumb|caption with [[inner]] link]] vanishes.
        |[[Category:Things]] stays as its name.<ref name="n">cite</ref>
        |External [https://example.com/x the site] and bare [https://example.com/y].
        |<!-- hidden -->__NOTOC__
        |{| class="wikitable"
        || cell |
        ||}
        |Final ''italic'' words.""".stripMargin
    val t = WikipediaSource.cleanWikitext(raw)
    assert(t.contains("History") && !t.contains("=="))
    assert(t.contains("Bold text with a plain link and a labeled link."))
    assert(!t.contains("pic.png") && !t.contains("caption"))
    assert(t.contains("Things") && !t.contains("Category:"))
    assert(!t.contains("cite") && !t.contains("<ref"))
    assert(t.contains("External the site and bare ."))
    assert(!t.contains("hidden") && !t.contains("NOTOC"))
    assert(!t.contains("wikitable") && !t.contains("cell"))
    assert(t.contains("Final italic words."))
    assert(!t.contains("{{") && !t.contains("Infobox"))
  }

  test("wikipedia DataFrame stage end to end") {
    val dir = java.nio.file.Files.createTempDirectory("wiki_src").toString
    val xml = dumpXml(Seq(("Doc", "0", "1", "{{tmpl}} kept [[body]] words", false)))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "chunk1.xml"), xml.getBytes("UTF-8"))
    val out = WikipediaSource.extractColumns(WikipediaSource.read(spark, dir)).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("text") == "kept body words")
    assert(out(0).getAs[String]("title") == "Doc")
  }
}
