package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.StopLists

/** The reference's CommonCrawlHTMLExtractor contract
  * (common_crawl/extract.py:28-105): decode bytes → detect language →
  * look up the language's stop list (NO list → row dropped) → run the
  * selected extraction algorithm ("justext" default / "resiliparse") →
  * emit (language, text) with the "\n\n" paragraph join; rows whose
  * extraction comes back empty are dropped.
  *
  * Language detection is INJECTED (the reference uses cld2; offline the
  * default is the char-frequency heuristic [[graft.analysis.TextStats
  * .heuristicLangId]] mapped to cld2-style language NAMES, documented
  * stand-in). Stop lists default to the en built-in plus the reference's
  * own custom zh/ja/th lists ([[StopLists]]); non-spaced languages run
  * jusText with the boilerplate gate disabled (justext.py:126-137).
  */
final class CommonCrawlExtractor(
    algorithm: String = "justext",
    langDetect: String => String = CommonCrawlExtractor.heuristicLangNames,
    stopLists: Map[String, Set[String]] = CommonCrawlExtractor.defaultStopLists,
    justextParams: JusText.Params = JusText.Params(),
    trafilaturaParams: TrafilaturaExtract = TrafilaturaExtract()) extends Serializable {
  require(Set("justext", "resiliparse", "trafilatura").contains(algorithm),
    s"Invalid algorithm: $algorithm")

  /** bytes → Some((language, text)) per the reference flow, None when
    * decode fails, the language has no stop list, or nothing survives.
    */
  def extract(htmlBytes: Array[Byte]): Option[(String, String)] =
    HtmlExtract.decode(htmlBytes).flatMap { html =>
      val lang = langDetect(html)
      stopLists.get(lang).flatMap { sw =>
        val text = algorithm match {
          case "justext" =>
            JusText.extract(html, sw, justextParams,
              keepBoilerplate = StopLists.isNonSpaced(lang))
          case "resiliparse" =>
            // non-spaced languages: whitespace tokens never match the
            // stop list, so the density gate must be bypassed (the
            // reference's resiliparse path skips it for
            // NON_SPACED_LANGUAGES exactly like justext's
            // is_boilerplate=False)
            HtmlExtract.extractText(html, sw,
              applyDensity = !StopLists.isNonSpaced(lang))
          case "trafilatura" =>
            trafilaturaParams.extract(html, sw, lang)
        }
        text.filter(_.nonEmpty).map(t => (lang, t))
      }
    }

  /** DataFrame shape of the reference stage: html bytes in, rows that
    * fail any gate dropped, (language, text) appended.
    */
  def extractColumns(df: DataFrame, htmlCol: String = "html"): DataFrame = {
    // nondeterministic ON PURPOSE (the fn is pure but expensive):
    // stops predicate pushdown from evaluating decode+langid+extract
    // twice per surviving row (once in the pushed Filter, once in the
    // Project) — same fix as Cascade.score
    val u = udf((b: Array[Byte]) =>
      if (b == null) null else extract(b).map { case (l, t) => (l, t) }.orNull)
      .asNondeterministic()
    df.withColumn("_ex", u(col(htmlCol)))
      .filter(col("_ex").isNotNull)
      .withColumn("language", col("_ex._1"))
      .withColumn("text", col("_ex._2"))
      .drop("_ex")
  }
}

object CommonCrawlExtractor {

  /** cld2-style language names for the iso codes the offline heuristic
    * can produce.
    */
  private val isoToName = Map(
    "en" -> "ENGLISH", "de" -> "GERMAN", "es" -> "SPANISH",
    "fr" -> "FRENCH", "pt" -> "PORTUGUESE", "zh" -> "CHINESE",
    "ja" -> "JAPANESE", "th" -> "THAI", "und" -> "Unknown")

  /** Offline stand-in for cld2: heuristic stopword langid over the
    * VISIBLE text (strip tags first so markup doesn't skew frequencies),
    * mapped to language names.
    */
  val heuristicLangNames: String => String = { html =>
    val visible = HtmlExtract.visibleLines(html, mainContent = false).mkString(" ")
    val (iso, _) = graft.analysis.TextStats.heuristicLangId(visible)
    isoToName.getOrElse(iso, "Unknown")
  }

  /** Reference default stop-list dict restricted to what ships offline:
    * the en built-in plus the custom zh/ja/th lists (get_stop_list_dict
    * vendors those same three; justext's other shipped lists plug in by
    * adding resource files).
    */
  val defaultStopLists: Map[String, Set[String]] = Map(
    "ENGLISH" -> HtmlExtract.enStopwords,
    "CHINESE" -> StopLists.forLang("zh"),
    "JAPANESE" -> StopLists.forLang("ja"),
    "THAI" -> StopLists.forLang("th"))
}
