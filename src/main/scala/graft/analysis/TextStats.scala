package graft.analysis

import java.util.regex.Pattern
import graft.text.{Constants, PyText, TextUtils}

/** Lightweight text analytics for large-scale training-data pipelines:
  * token counting, quality scoring, document fingerprinting, and a
  * stopword-based language heuristic. All pure per-row functions —
  * no shuffle, fully pipelined inside whole-stage codegen via UDFs.
  */
object TextStats {

  /** Whitespace token count (Python str.split() semantics). */
  def whitespaceTokenCount(text: String): Int =
    PyText.splitWhitespace(text).length

  /** BPE-ish subword-boundary tokenizer: the GPT-2 pre-tokenizer regex
    * family — contractions, letter runs, digit runs, punctuation runs,
    * whitespace runs. Deterministic, no vocabulary needed. Kept in the
    * Java∩RE2 regex subset (no lookaround) so the DuckDB oracle computes
    * the identical count.
    */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
  private val bpeRe: Pattern = Pattern.compile(bpePattern)

  /** The EXACT GPT-2 pre-tokenizer pattern, including the `\s+(?!\S)`
    * alternative that splits a multi-whitespace run so its LAST
    * whitespace char attaches to the following word (' return' for
    * indented code, not 'return'). Used by [[graft.text.BpeTokenizer]]
    * where the produced token TEXTS (hence ids) must match the real
    * artifact. [[bpePattern]] stays lookahead-free for the DuckDB
    * oracle; on SPACE-separated text the two patterns produce the same
    * token count (the lookahead just moves the run's final space onto
    * the following word), but a \t/\n-terminated run before a word
    * yields ONE extra whitespace token here (the leftover last char
    * can't join the word — ` ?` matches only a literal space), so
    * [[bpeTokenCount]] deliberately keeps the RE2 pattern both engines
    * share. BpeRegexSpec pins both facts.
    */
  val bpePatternGpt2: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** Token count by a direct scanner equivalent to [[bpePattern]] —
    * the regex's leftmost-first alternation is deterministic, so the
    * scanner reproduces its token boundaries exactly (~15 us/doc saved
    * on the curation path; BpeRegexSpec pins scanner ≡ regex on
    * adversarial random input including surrogate pairs).
    *
    * Alternative order at each position (as in the pattern):
    *   1. ' followed by s|t|re|ve|m|ll|d
    *   2. optional single space + letter run   (\p{L} = Character.isLetter)
    *   3. optional single space + number run   (\p{N} = Nd|Nl|No)
    *   4. optional single space + "other" run  ([^\s\p{L}\p{N}]; \s is the
    *      Java ASCII class [ \t\n\x0B\f\r], so non-ASCII whitespace is
    *      "other")
    *   5. ASCII-whitespace run
    */
  def bpeTokenCount(text: String): Int = {
    val len = text.length
    var i = 0
    var n = 0
    while (i < len) {
      val c = text.charAt(i)
      var consumed = false
      if (c == '\'' && i + 1 < len) {
        val c1 = text.charAt(i + 1)
        if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') { i += 2; consumed = true }
        else if ((c1 == 'r' || c1 == 'v') && i + 2 < len && text.charAt(i + 2) == 'e') { i += 3; consumed = true }
        else if (c1 == 'l' && i + 2 < len && text.charAt(i + 2) == 'l') { i += 3; consumed = true }
      }
      if (!consumed) {
        var j = i
        val cp0 = text.codePointAt(j)
        if (Character.isLetter(cp0)) j = runEnd(text, j, 1)
        else if (isBpeNumber(cp0)) j = runEnd(text, j, 2)
        else if (isAsciiWs(c)) {
          if (c == ' ' && i + 1 < len) {
            val cp1 = text.codePointAt(i + 1)
            if (Character.isLetter(cp1)) j = runEnd(text, i + 1, 1)
            else if (isBpeNumber(cp1)) j = runEnd(text, i + 1, 2)
            else if (!isAsciiWsCp(cp1)) j = runEnd(text, i + 1, 3) // "other" run
            else j = runEnd(text, i, 4) // whitespace run
          } else j = runEnd(text, i, 4)
        } else j = runEnd(text, i, 3)
        i = j
      }
      n += 1
    }
    n
  }

  @inline private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAsciiWsCp(cp: Int): Boolean = cp < 128 && isAsciiWs(cp.toChar)
  @inline private def isBpeNumber(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }
  /** End index of the greedy run of class `cls` (1=letter, 2=number,
    * 3=other, 4=ascii-whitespace) starting at `start` (must match).
    */
  @inline private def runEnd(text: String, start: Int, cls: Int): Int = {
    var j = start
    while (j < text.length) {
      val cp = text.codePointAt(j)
      val in = (cls: @unchecked) match {
        case 1 => Character.isLetter(cp)
        case 2 => isBpeNumber(cp)
        case 3 => !Character.isLetter(cp) && !isBpeNumber(cp) && !isAsciiWsCp(cp)
        case 4 => isAsciiWsCp(cp)
      }
      if (!in) return j
      j += Character.charCount(cp)
    }
    j
  }

  /** Composite heuristic quality score in [0,1]: blends length,
    * punctuation-terminated sentence ratio, stopword ratio, alpha ratio,
    * and mean word length fitness. Not a reference op — an additional
    * pipeline primitive (C4/Gopher-style signals reduced to one number).
    */
  def qualityScore(text: String): Double =
    qualityScoreParts(text, TextUtils.words(PyText.strip(text)), TextUtils.sentences(text))

  /** [[qualityScore]] over pre-tokenized words/sentences — lets the
    * curation annotate() path reuse the cascade's DocCtx tokenization
    * instead of re-splitting the document (same definitions:
    * TextUtils.words(strip) / TextUtils.sentences).
    */
  def qualityScoreParts(text: String, ws: Array[String], sents: Array[String]): Double = {
    if (ws.isEmpty) return 0.0
    val nchar = PyText.len(text)
    // length fitness: saturating ramp to 1.0 at 100 words
    val lenScore = math.min(1.0, ws.length / 100.0)
    // stopword ratio (clipped at 2x the typical 6% floor)
    var stop = 0
    var alphaChars = 0
    var totalWordChars = 0
    var i = 0
    while (i < ws.length) {
      val w = PyText.lower(ws(i))
      if (Constants.commonEnglishWords.contains(w)) stop += 1
      var j = 0
      while (j < w.length) {
        if (Character.isLetter(w.charAt(j))) alphaChars += 1
        j += 1
      }
      totalWordChars += w.length
      i += 1
    }
    val stopScore = math.min(1.0, stop.toDouble / ws.length / 0.06)
    val alphaScore = if (totalWordChars == 0) 0.0 else alphaChars.toDouble / totalWordChars
    val punctScore =
      if (sents.isEmpty) 0.0
      else sents.count(s => Constants.endMarks.exists(PyText.strip(s).endsWith)).toDouble / sents.length
    val mwl = totalWordChars.toDouble / ws.length
    val mwlScore = if (mwl >= 3 && mwl <= 10) 1.0 else 0.0
    val wsRatio = (nchar - totalWordChars).toDouble / math.max(1, nchar)
    val wsScore = if (wsRatio <= 0.25) 1.0 else math.max(0.0, 1.0 - (wsRatio - 0.25) * 4)
    (lenScore + stopScore + alphaScore + punctScore + mwlScore + wsScore) / 6.0
  }

  /** 64-bit polynomial rolling-hash document fingerprint (Rabin-style,
    * base 257 over Unicode CODE POINTS — the same fold the DuckDB oracle
    * computes with split+ord, so the two stay aligned for non-BMP input
    * too). Stable across JVMs; usable as a cheap content id for
    * incremental pipelines.
    */
  def fingerprint64(text: String): Long = {
    var h = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      h = h * 257 + cp
      i += Character.charCount(cp)
    }
    h
  }

  /** Windowed Rabin fingerprints (w-shingling): hash of every `w`-char
    * window, keeping the k smallest — a compact near-dup sketch.
    */
  def minKWindowHashes(text: String, w: Int = 16, k: Int = 8): Array[Long] = {
    if (text.length < w) return Array(fingerprint64(text))
    val pq = new java.util.PriorityQueue[java.lang.Long](k + 1, java.util.Comparator.reverseOrder())
    // precompute base^(w-1) for rolling update
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow *= 257; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * 257 + text.charAt(i); i += 1 }
    def offer(x: Long): Unit = {
      val mixed = {
        var v = x ^ (x >>> 33); v *= 0xff51afd7ed558ccdL; v ^ (v >>> 29)
      }
      if (!pq.contains(mixed)) {
        pq.offer(mixed)
        if (pq.size > k) pq.poll()
      }
    }
    offer(h)
    while (i < text.length) {
      h = (h - text.charAt(i - w) * pow) * 257 + text.charAt(i)
      offer(h)
      i += 1
    }
    val out = new Array[Long](pq.size)
    var j = out.length - 1
    while (j >= 0) { out(j) = pq.poll(); j -= 1 }
    out
  }

  /** Stopword-profile language heuristic over a handful of languages:
    * score = fraction of words in each language's tiny stopword set;
    * argmax wins, "und" (undetermined) if all zero. Cheap lexical
    * fallback where no trained model is available.
    */
  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "that", "is", "was", "for", "with", "have", "be"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "un", "une", "est", "dans", "que", "pour"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "un", "una", "es", "en", "que", "por"),
    "de" -> Set("der", "die", "das", "und", "ein", "eine", "ist", "nicht", "mit", "von", "zu", "auf"),
    "pt" -> Set("o", "a", "os", "as", "de", "e", "um", "uma", "que", "em", "para", "com")
  )

  // single-pass dispatch structures: lang order fixed to the sorted key
  // order the per-lang loop used, word -> bitmask of member languages
  private val langOrder: Array[String] = stopwords.keys.toArray.sorted
  private val stopwordMask: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    for (li <- langOrder.indices; w <- stopwords(langOrder(li)))
      m.merge(w, 1 << li, (a, b) => a | b)
    m
  }

  def heuristicLangId(text: String): (String, Double) = {
    val ws = PyText.splitWhitespace(PyText.lower(text))
    if (ws.isEmpty) return ("und", 0.0)
    // one pass over the words, one map lookup each (was: a full scan per
    // language); hit counts and the argmax are identical to the per-lang
    // loops — ties keep the alphabetically-first language either way
    val hits = new Array[Int](langOrder.length)
    var i = 0
    while (i < ws.length) {
      val mask = stopwordMask.getOrDefault(ws(i), 0)
      if (mask != 0) {
        var li = 0
        var m = mask
        while (m != 0) {
          if ((m & 1) != 0) hits(li) += 1
          m >>>= 1
          li += 1
        }
      }
      i += 1
    }
    var bestLang = "und"
    var bestScore = 0.0
    var li = 0
    while (li < langOrder.length) {
      val s = hits(li).toDouble / ws.length
      if (s > bestScore) { bestScore = s; bestLang = langOrder(li) }
      li += 1
    }
    (bestLang, bestScore)
  }
}
