package graft.scrub

import java.util.regex.Pattern
import graft.text.{Constants, PyText, TextUtils}

/** Per-document text transforms ("DocumentModifier"s in the reference,
  * stages/text/modifiers/). Each is a pure String => String, compiled
  * once per executor (patterns are statics), applied via withColumn +
  * UDF — the Spark analogue of the reference's Modify stage
  * (stages/text/modules/modifier.py:23-98).
  */
object Modifiers {

  // ---- UrlRemover (modifiers/url_remover.py:22-31) ----
  private val urlRe = Pattern.compile("https?://\\S+|www\\.\\S+", Pattern.CASE_INSENSITIVE)
  def removeUrls(text: String): String = urlRe.matcher(text).replaceAll("")

  // ---- NewlineNormalizer (modifiers/newline_normalizer.py:24-33) ----
  private val nl3 = Pattern.compile("(\n){3,}")
  private val crlf3 = Pattern.compile("(\r\n){3,}")
  def normalizeNewlines(text: String): String =
    crlf3.matcher(nl3.matcher(text).replaceAll("\n\n")).replaceAll("\r\n\r\n")

  // ---- MarkdownRemover (modifiers/markdown_remover.py:26-43) ----
  private val mdBold = Pattern.compile("\\*\\*(.*?)\\*\\*")
  private val mdItalic = Pattern.compile("\\*(.*?)\\*")
  private val mdUnderline = Pattern.compile("_(.*?)_")
  private val mdLink = Pattern.compile("\\[.*?\\]\\((.*?)\\)")
  def removeMarkdown(text: String): String =
    PyText.splitLiteral(text, "\n").map { line =>
      var l = mdBold.matcher(line).replaceAll("$1")
      l = mdItalic.matcher(l).replaceAll("$1")
      l = mdUnderline.matcher(l).replaceAll("$1")
      mdLink.matcher(l).replaceAll("$1")
    }.mkString("\n")

  // ---- QuotationRemover (modifiers/quotation_remover.py:19-36) ----
  def removeQuotation(text: String): String = {
    if (PyText.len(PyText.strip(text)) > 2 && text.nonEmpty &&
        text.charAt(0) == '"' && text.charAt(text.length - 1) == '"') {
      val stripped = PyText.strip(text)
      val firstLine = PyText.splitLiteral(text, "\n")(0)
      if (!stripped.contains("\n") ||
          (firstLine.nonEmpty && firstLine.charAt(firstLine.length - 1) != '"'))
        return text.substring(1, text.length - 1)
    }
    text
  }

  // ---- LineRemover (modifiers/line_remover.py:20-34) ----
  def removeLines(text: String, patterns: Set[String]): String =
    PyText.splitLiteral(text, "\n").filterNot(patterns.contains).mkString("\n")

  // ---- FastTextLabelModifier (modifiers/fasttext.py:19-25) ----
  def fastTextLabel(label: String, text: String): String =
    label + " " + text.replace("\n", " ")

  // ---- BoilerPlateStringModifier (modifiers/c4.py:24-86) ----
  def removeBoilerplate(text: String, removeIfAtTopOrBottom: Boolean = true): String = {
    val paras = TextUtils.paragraphs(text)
    val boilerIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < paras.length) {
      val p = PyText.lower(PyText.strip(paras(i)))
      if (p.contains("lorem ipsum")) return ""
      if (Constants.policySubstrings.exists(p.contains)) {
        if (!removeIfAtTopOrBottom) return ""
        boilerIdx += i
      }
      i += 1
    }
    if (boilerIdx.isEmpty) return text
    if (TextUtils.indicesTopOrBottomOnly(boilerIdx.toArray, paras.length)) {
      val drop = boilerIdx.toSet
      paras.zipWithIndex.collect { case (p, idx) if !drop(idx) => p }.mkString("\n\n")
    } else text
  }

  // ---- Slicer (modifiers/slicer.py:19-77), string-boundary variant ----
  def slice(text: String, left: String, right: String,
            includeLeft: Boolean = true, includeRight: Boolean = true,
            stripResult: Boolean = true): String = {
    val li = text.indexOf(left)
    if (li == -1) return ""
    val start = if (includeLeft) li else li + left.length
    val ri = text.lastIndexOf(right)
    if (ri == -1) return ""
    val end = if (includeRight) ri + right.length else ri
    if (start >= end) return ""
    val r = text.substring(start, end)
    if (stripResult) PyText.strip(r) else r
  }
}
