package graft.text

/** Per-language stop lists for the extraction density gates.
  *
  * The reference builds its stop-list dict from the justext package's
  * shipped lists plus custom zh/ja/th lists vendored from stopwords-iso
  * (html_extractors/utils/__init__.py:18-66). Offline we carry: the
  * built-in English list ([[graft.extract.HtmlExtract.enStopwords]]) and
  * the same zh/ja/th DATA lists as plain resource files
  * (tools/gen_stoplists.py extracts them — data, not code). Additional
  * languages plug in by dropping `<lang>.txt` files on the classpath.
  */
object StopLists {

  /** Languages whose scripts don't use spaces: the reference disables
    * the boilerplate gate for these (html_extractors/base.py:19).
    */
  val nonSpacedLanguages: Set[String] = Set("THAI", "CHINESE", "JAPANESE", "KOREAN")

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  private def loadResource(name: String): Option[Set[String]] = {
    val in = getClass.getResourceAsStream(s"/stopwords/$name.txt")
    if (in == null) None
    else {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try Some(src.getLines().map(_.trim).filter(_.nonEmpty).toSet)
      finally src.close()
    }
  }

  /** Stop list for an ISO 639-1 code ("en", "zh", "ja", "th", …); empty
    * set when no list is available (density gates then keep nothing —
    * same failure mode as the reference with a missing stoplist).
    */
  def forLang(lang: String): Set[String] = {
    val key = lang.toLowerCase(java.util.Locale.ROOT)
    cache.computeIfAbsent(key, {
      case "en" => graft.extract.HtmlExtract.enStopwords
      case k    => loadResource(k).getOrElse(Set.empty)
    })
  }

  def isNonSpaced(langName: String): Boolean =
    nonSpacedLanguages.contains(langName.toUpperCase(java.util.Locale.ROOT)) ||
      Set("zh", "ja", "th", "ko").contains(langName.toLowerCase(java.util.Locale.ROOT))
}

/** Language-aware word segmentation, the shape of the reference's
  * get_word_splitter (text_utils.py:20-66): jieba for zh, MeCab for ja,
  * whitespace otherwise. Those segmenters are C/dict-backed and not
  * available offline, so zh/ja here run DICTIONARY forward-maximum
  * matching (jieba's own base strategy for words outside its HMM) over
  * a committed high-frequency lexicon (resources/lexicon/{zh,ja}.txt),
  * degrading per-codepoint exactly like the script-run splitter when no
  * lexicon entry matches — so with an empty lexicon the output is the
  * old fallback, and a full deploy lexicon drops into the same files.
  */
object Segmenter {

  /** (words, max word length in chars) per language, loaded once. */
  private lazy val lexicons: Map[String, (Set[String], Int)] =
    Seq("zh", "ja").map { l =>
      val words = Option(getClass.getResourceAsStream(s"/lexicon/$l.txt")).map { s =>
        val src = scala.io.Source.fromInputStream(s, "UTF-8")
        try src.getLines().map(_.trim).filter(w => w.nonEmpty && !w.startsWith("#")).toSet
        finally src.close()
      }.getOrElse(Set.empty[String])
      l -> (words, if (words.isEmpty) 1 else words.iterator.map(_.length).max)
    }.toMap

  private def isCjk(cp: Int): Boolean = {
    val b = Character.UnicodeBlock.of(cp)
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
      b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
      b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_B ||
      b == Character.UnicodeBlock.CJK_COMPATIBILITY_IDEOGRAPHS ||
      b == Character.UnicodeBlock.HIRAGANA ||
      b == Character.UnicodeBlock.KATAKANA ||
      b == Character.UnicodeBlock.HANGUL_SYLLABLES
  }

  /** Words of `text` under the language's segmentation convention.
    * Only zh/ja take the CJK-run path — the reference's
    * get_word_splitter special-cases exactly jieba (zh) and MeCab (ja)
    * and whitespace-splits everything else, including Korean and Thai.
    */
  def words(lang: String, text: String): Array[String] = {
    val l = lang.toLowerCase(java.util.Locale.ROOT)
    if (l != "zh" && l != "ja") return TextUtils.words(PyText.strip(text))
    val (lex, maxLen) = lexicons(l)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new java.lang.StringBuilder()
    def flushRun(): Unit = { if (run.length > 0) { out += run.toString; run.setLength(0) } }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isWhitespace(cp)) { flushRun(); i += Character.charCount(cp) }
      else if (isCjk(cp)) {
        flushRun()
        // forward maximum match: longest lexicon word starting here,
        // else the single codepoint (the run-splitter fallback)
        var len = math.min(maxLen, text.length - i)
        var matched: String = null
        while (matched == null && len >= 2) {
          val cand = text.substring(i, i + len)
          if (lex.contains(cand)) matched = cand
          len -= 1
        }
        if (matched != null) { out += matched; i += matched.length }
        else { out += new String(Character.toChars(cp)); i += Character.charCount(cp) }
      }
      else { run.appendCodePoint(cp); i += Character.charCount(cp) }
    }
    flushRun()
    out.toArray
  }
}
