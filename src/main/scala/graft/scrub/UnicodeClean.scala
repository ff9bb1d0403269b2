package graft.scrub

import java.text.Normalizer

/** UnicodeReformatter-lite (reference modifiers/unicode_reformatter.py
  * wraps ftfy.fix_text with 15 flags; ftfy has no JVM twin — SURVEY.md
  * §7.4 scopes this to the flags implementable with
  * java.text.Normalizer + explicit transforms):
  *
  *   - NFC normalization
  *   - control-character strip (keeping \n \t \r)
  *   - cp1252-in-UTF-8 mojibake repair ("â€™" → "’"): re-encode as
  *     windows-1252 bytes and re-decode as UTF-8 when that round trip
  *     yields strictly fewer mojibake markers
  *   - BOM / zero-width / replacement-char removal
  */
object UnicodeClean {

  private val mojibakeMarkers = Array("â€", "Ã©", "Ã¨", "Ã¼", "Ã¶", "Ã¤", "Ã±", "Ã§", "â€™", "â€œ")

  private def mojibakeCount(s: String): Int =
    mojibakeMarkers.map(m => graft.text.PyText.countOccurrences(s, m)).sum

  /** Attempt to undo UTF-8-read-as-cp1252 double encoding. The cp1252
    * ENCODER must REPORT unmappable chars (String.getBytes silently
    * substitutes '?', which would destroy CJK/emoji text that happens to
    * sit next to one mojibake marker) — docs mixing true non-Latin-1
    * characters with markers are left untouched.
    */
  def fixMojibake(s: String): String = {
    if (mojibakeCount(s) == 0) return s
    try {
      val enc = java.nio.charset.Charset.forName("windows-1252").newEncoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val bytes = enc.encode(java.nio.CharBuffer.wrap(s))
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val fixed = dec.decode(bytes).toString
      if (mojibakeCount(fixed) < mojibakeCount(s)) fixed else s
    } catch { case _: Exception => s }
  }

  def stripControl(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isCtl = (c < ' ' && c != '\n' && c != '\t' && c != '\r') || c == ''
      val isZw = c == '﻿' || c == '​' || c == '‌' || c == '‍' || c == '�'
      if (!isCtl && !isZw) sb.append(c)
      i += 1
    }
    sb.toString
  }

  def clean(s: String): String = {
    if (s == null) return null
    val fixed = fixMojibake(s)
    val normalized =
      if (Normalizer.isNormalized(fixed, Normalizer.Form.NFC)) fixed
      else Normalizer.normalize(fixed, Normalizer.Form.NFC)
    stripControl(normalized)
  }
}
