package graft.text

/** Python-compatible string primitives.
  *
  * The reference engine (ayushdg/NeMo-Curator) computes every heuristic
  * score over Python `str` semantics: `len()` counts code points,
  * `str.split()` splits on the Unicode-whitespace run, `str.strip()`
  * strips Unicode whitespace. Java's `String.length`/`split("\\s+")`
  * differ on astral characters and on Zs-category spaces (U+00A0 etc.),
  * so we re-implement the handful of primitives the filters use.
  * (cf. reference stages/text/utils/text_utils.py:62-86)
  */
object PyText {

  /** Matches Python's `str.isspace` for the code points that occur in web
    * text: Unicode whitespace + Zs/Zl/Zp space separators + NEL (U+0085)
    * + the \x1c..\x1f file/group/record/unit separators (covered by
    * Character.isWhitespace).
    */
  @inline def isSpace(cp: Int): Boolean =
    Character.isWhitespace(cp) || Character.isSpaceChar(cp) || cp == 0x85

  /** Python `len(s)` — code points, not UTF-16 units. */
  @inline def len(s: String): Int = s.codePointCount(0, s.length)

  /** Python `s.strip()` (Unicode whitespace). */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isSpace(s.charAt(i))) i += 1
    while (j > i && isSpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** Python `s.split()` — split on whitespace runs, no empty tokens. */
  def splitWhitespace(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isSpace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** Python `s.split(sep)` for a literal separator — keeps empty fields. */
  def splitLiteral(s: String, sep: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    var idx = s.indexOf(sep, from)
    while (idx >= 0) {
      out += s.substring(from, idx)
      from = idx + sep.length
      idx = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.toArray
  }

  /** Count non-overlapping occurrences of `sub` in `s` (Python
    * `s.count(sub)` / the length-diff trick of `s.replace(sub, "")`).
    */
  def countOccurrences(s: String, sub: String): Int = {
    if (sub.isEmpty) return len(s) + 1
    var count = 0
    var from = 0
    var idx = s.indexOf(sub, from)
    while (idx >= 0) {
      count += 1
      from = idx + sub.length
      idx = s.indexOf(sub, from)
    }
    count
  }

  /** Python `str.lower()` ~ Java toLowerCase with ROOT locale (avoids the
    * Turkish-I trap; Python lower() is locale-independent).
    */
  @inline def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
}
