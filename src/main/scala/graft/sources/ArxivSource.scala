package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ArXiv LaTeX-source acquisition + extraction
  * (stages/text/download/arxiv/{url_generation,iterator,extract}.py —
  * themselves derived from the public RedPajama arxiv prep).
  *
  * A monthly `arXiv_src_*.tar` holds one `.gz` per paper; each gz is
  * either a single `.tex` file or a tar of a whole LaTeX project. The
  * iterator yields (id, source_id, content: all .tex files); the
  * extractor drops everything before the first sectioning command and
  * after the bibliography/appendix, strips comments, and inline-expands
  * user-defined zero-arg macros. Spark-first: `binaryFile` scan →
  * flatMap, all pure per-row work.
  */
object ArxivSource {

  /** arxiv-id display format (iterator.py:_format_arxiv_id):
    * "<archive><digits>" → "<archive>/<digits>"; bare digits unchanged.
    */
  def formatArxivId(raw: String): String = {
    val m = "^([a-zA-Z-]*)([\\d.]+)$".r.findFirstMatchIn(raw)
      .getOrElse(throw new IllegalArgumentException(s"Invalid arxiv id: $raw"))
    if (m.group(1).isEmpty) m.group(2) else s"${m.group(1)}/${m.group(2)}"
  }

  private def readAll(in: InputStream): Array[Byte] = in.readAllBytes()

  private def strictUtf8(bytes: Array[Byte]): Option[String] = {
    val dec = StandardCharsets.UTF_8.newDecoder()
    try Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  /** One paper's `.gz` payload → its .tex file contents
    * (iterator.py:_tex_proj_loader): a tar-of-project yields every
    * member ending in .tex; a bare gzip yields the single file. Any
    * non-UTF-8 tex file drops the whole paper (reference behavior).
    */
  def texProjectFiles(gzBytes: Array[Byte]): Option[Seq[String]] = {
    val raw =
      try readAll(new GZIPInputStream(new ByteArrayInputStream(gzBytes)))
      catch { case _: Exception => return None }
    // tar magic "ustar" at offset 257
    val isTar = raw.length > 262 &&
      new String(raw, 257, 5, StandardCharsets.US_ASCII) == "ustar"
    if (!isTar) return strictUtf8(raw).map(Seq(_))
    val tin = new TarArchiveInputStream(new ByteArrayInputStream(raw))
    val out = Seq.newBuilder[String]
    var entry = tin.getNextEntry
    while (entry != null) {
      if (!entry.isDirectory && entry.getName.endsWith(".tex")) {
        strictUtf8(readAll(tin)) match {
          case Some(s) => out += s
          case None => return None
        }
      }
      entry = tin.getNextEntry
    }
    Some(out.result())
  }

  /** Monthly tar STREAM → lazy (id, content files) records
    * (iterator.py:iterate). Only one paper's `.gz` (MB-scale) is ever
    * in memory; the multi-GB monthly tar itself streams through.
    */
  def iterateStream(in: java.io.InputStream): Iterator[(String, Seq[String])] = {
    val tin = new TarArchiveInputStream(in)
    Iterator.continually(tin.getNextEntry).takeWhile(_ != null).flatMap { entry =>
      if (!entry.isDirectory && entry.getName.endsWith(".gz")) {
        val base = entry.getName.split('/').last.stripSuffix(".gz")
        val id = try formatArxivId(base) catch { case _: Exception => base }
        texProjectFiles(readAll(tin)).map(files => (id, files))
      } else None
    }
  }

  /** In-memory convenience over [[iterateStream]] (tests/fixtures). */
  def iterate(tarBytes: Array[Byte]): Seq[(String, Seq[String])] =
    iterateStream(new ByteArrayInputStream(tarBytes)).toSeq

  /** Directory of monthly tars → rows (id, source_id, content) — one
    * streaming task per tar ([[ArchiveIO.perFile]]: no whole-archive
    * byte array, no 2 GB binaryFile row ceiling).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    ArchiveIO.perFile(spark, path) { (p, in) =>
      val bname = p.split('/').last
      iterateStream(in).map { case (id, files) => (id, bname, files) }
    }.toDF("id", "source_id", "content")
  }

  // ---------------- extraction (extract.py, RedPajama-derived) ----------------

  private val NewCommandRe =
    java.util.regex.Pattern.compile("\\\\\\bnewcommand\\b\\*?\\{(\\\\[a-zA-Z0-9]+?)\\}\\{(.*?)\\}$",
      java.util.regex.Pattern.MULTILINE)
  private val DefRe =
    java.util.regex.Pattern.compile("\\\\def\\s*(\\\\[a-zA-Z0-9]+?)\\s*\\{(.*?)\\}$",
      java.util.regex.Pattern.MULTILINE)
  private val SectionRe = {
    val kinds = Seq("chapter", "part", "section", "subsection", "subsubsection", "paragraph", "subparagraph")
    java.util.regex.Pattern.compile(
      "^(.*?)(" + kinds.map(k => s"\\\\\\b$k\\b\\*?(?:\\[.*?\\])?\\{.*?\\}").mkString("|") + ")",
      java.util.regex.Pattern.DOTALL)
  }
  private val LineCommentRe = java.util.regex.Pattern.compile("(?m)^%.*\\n?")
  private val InlineCommentRe = java.util.regex.Pattern.compile("(?m)[^\\\\]%.+$")
  private val TailRe = java.util.regex.Pattern.compile(
    "(\\\\appendix|\\\\begin\\{references\\}|\\\\begin\\{REFERENCES\\}|" +
      "\\\\begin\\{thebibliography\\}|\\\\bibliography\\{.*\\}).*$",
    java.util.regex.Pattern.DOTALL)

  /** Zero-arg user macro definitions across the project files
    * (extract.py:_build_non_arg_macros_dict).
    */
  def nonArgMacros(fileContent: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    Seq(NewCommandRe, DefRe).foreach { re =>
      val m = re.matcher(fileContent)
      while (m.find()) out += (m.group(1) -> m.group(2))
    }
    out.result()
  }

  /** extract.py:_clean_tex_file — section-prefix drop, comment strip,
    * bibliography/appendix tail drop, zero-arg macro inline expansion.
    */
  def cleanTexFile(content: String, macros: Map[String, String]): String = {
    val m = SectionRe.matcher(content)
    if (!m.find()) return ""
    var s = content.substring(m.start(2))
    s = LineCommentRe.matcher(s).replaceAll("")
    s = InlineCommentRe.matcher(s).replaceAll("")
    s = TailRe.matcher(s).replaceFirst("")
    macros.foreach { case (name, value) =>
      s = java.util.regex.Pattern
        .compile("(" + java.util.regex.Pattern.quote(name) + ")([^a-zA-Z0-9])")
        .matcher(s)
        .replaceAll(java.util.regex.Matcher.quoteReplacement(value) + "$2")
    }
    s
  }

  /** extract.py:extract — macros from ALL project files, clean each,
    * join with a newline; None when nothing survives.
    */
  def extract(contents: Seq[String]): Option[String] = {
    if (contents.isEmpty) return None
    val macros = contents.foldLeft(Map.empty[String, String])((acc, c) => acc ++ nonArgMacros(c))
    val cleaned = contents.map(cleanTexFile(_, macros)).mkString("\n")
    if (cleaned.nonEmpty) Some(cleaned) else None
  }

  /** DataFrame stage: (id, source_id, content) → + text, failed rows dropped. */
  def extractColumns(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val u = udf((c: Seq[String]) => if (c == null) null else ArxivSource.extract(c).orNull)
      .asNondeterministic() // pure but expensive: never evaluate twice
    df.withColumn("text", u(col("content")))
      .filter(col("text").isNotNull)
      .drop("content")
  }
}
