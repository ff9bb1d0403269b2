package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Deterministic synthetic Common-Crawl-style page table (FIXTURES.md F1):
  * (url, warc_ts, html, text, lang). Seed-stable, no external data.
  *
  * Doc classes span every filter's keep AND drop regime so the cascade,
  * scrubbers, langid and dedup all see both sides. Domains are
  * Zipf-skewed to exercise salting; a fraction of rows carry non-UTF-8
  * html bytes to exercise the decode fallback; near/exact duplicate rows
  * are planted for dedup.
  */
object CCPages {

  private val cleanVocab: Array[String] = (
    "the quick brown fox jumps over a lazy dog and that is how stories " +
    "have always started with people who be willing to walk through rain " +
    "for reasons of their own choosing while others wait at home with " +
    "warm bread tea books letters from friends that arrive late but " +
    "matter more than most things we keep close to our hearts every day"
  ).split(" ")

  private val profane = Array("damn", "shit", "fuck")

  /** Deterministic per-doc RNG — seeded by doc index only. */
  private def rng(i: Long): java.util.Random = new java.util.Random(0x5eed + i * 2654435761L)

  private def sentence(r: java.util.Random, words: Int): String = {
    val sb = new StringBuilder
    for (j <- 0 until words) {
      if (j > 0) sb += ' '
      sb ++= cleanVocab(r.nextInt(cleanVocab.length))
    }
    sb += '.'
    sb.toString.capitalize
  }

  /** Clean prose doc (keep class): punctuated sentences, common English
    * words, 60-300 words.
    */
  def cleanDoc(i: Long): String = {
    val r = rng(i)
    val nSents = 6 + r.nextInt(18)
    (0 until nSents).map(_ => sentence(r, 8 + r.nextInt(10))).mkString(" ") +
      "\nIt was the end of the day and that was all they wrote.\n" +
      (0 until 3).map(_ => sentence(r, 10 + r.nextInt(8))).mkString(" ")
  }

  /** One drop-class doc per filter regime, cycling by class index. */
  def dropDoc(cls: Int, i: Long): String = {
    val r = rng(i * 31 + cls)
    cls % 14 match {
      case 0 => // symbol spam (SymbolsToWords)
        (0 until 80).map(_ => if (r.nextInt(3) == 0) "####" else "word").mkString(" ")
      case 1 => // digit heavy (Numbers)
        (0 until 80).map(_ => r.nextInt(100000).toString).mkString(" ")
      case 2 => // URL list (Urls)
        (0 until 40).map(k => s"http://site$k.example.com/path/$k").mkString(" ")
      case 3 => // bullet list (Bullets)
        (0 until 50).map(k => s"• item number $k of the list").mkString("\n")
      case 4 => // whitespace padded (WhiteSpace)
        (0 until 60).map(_ => "word").mkString("      ")
      case 5 => // parentheses (Parentheses)
        (0 until 60).map(_ => "(word) [item]").mkString(" ")
      case 6 => // boilerplate (BoilerPlateString)
        Array.fill(3)("this site uses cookies, including for analytics, personalization, and advertising purposes. for more information or to change your cookie settings, click here.").mkString("\n\n") +
          "\n\n" + sentence(r, 20)
      case 7 => // repeated lines (RepeatedLines)
        val line = sentence(r, 10)
        Array.fill(12)(line).mkString("\n")
      case 8 => // repeated paragraphs (RepeatedParagraphs)
        val para = sentence(r, 25)
        Array.fill(8)(para).mkString("\n\n")
      case 9 => // top-ngram repetition (RepeatingTopNGrams)
        val g = "free offer now"
        (0 until 60).map(_ => g).mkString(" ") + " " + sentence(r, 30)
      case 10 => // no end punctuation (Punctuation)
        (0 until 12).map(_ => sentence(r, 10).stripSuffix(".")).mkString("\n")
      case 11 => // ellipsis endings (Ellipsis)
        (0 until 12).map(_ => sentence(r, 8).stripSuffix(".") + "...").mkString("\n")
      case 12 => // short doc (WordCount)
        sentence(r, 10)
      case 13 => // long-token minified-js (LongWord)
        sentence(r, 30) + " " + ("x" * 1200) + " " + sentence(r, 30)
    }
  }

  /** PII-bearing doc (scrub class, still keep-quality prose). */
  def piiDoc(i: Long): String = {
    val base = cleanDoc(i)
    base + s"\nContact us at user$i@example.com or +1-555-${100 + (i % 900)}-${1000 + (i % 9000)} from 192.168.${i % 256}.${(i * 7) % 256} today."
  }

  def profaneDoc(i: Long): String = {
    val r = rng(i * 7)
    cleanDoc(i) + "\n" + s"Well ${profane((i % 3).toInt)} that was ${profane(((i + 1) % 3).toInt)} unexpected. " + sentence(r, 40)
  }

  private val navBoiler = "<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/about\">About</a></li></ul></nav>"
  private val footerBoiler = "<footer><p>Copyright 2024 Example Site. All rights reserved.</p></footer>"

  /** Wrap text in template HTML; the extractor recovers `text` exactly
    * when paragraphs pass the stopword-density gate.
    */
  def wrapHtml(title: String, text: String): String = {
    val paras = text.split("\n").map(p => s"<p>${escape(p)}</p>").mkString("\n")
    s"""<!DOCTYPE html>
<html><head><title>${escape(title)}</title><style>body{font:14px}</style>
<script>var x = 1 < 2;</script></head>
<body>$navBoiler
<main>
$paras
</main>
$footerBoiler</body></html>"""
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val langs = Array("en", "en", "en", "en", "en", "en", "pt", "hi", "zh", "en")
  private val domains: Array[String] = {
    // Zipf-ish: domain 0 is hot
    (0 until 50).flatMap(d => Array.fill(math.max(1, 50 / (d + 1)))(s"site$d.example.org")).toArray
  }

  final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                        text: String, lang: String)

  def page(i: Long): Page = {
    val r = rng(i)
    val cls = (i % 10).toInt
    val text = cls match {
      case 0 | 1 | 2 | 3 | 4 => cleanDoc(i) // 50% keepable prose
      case 5 => dropDoc((i / 10).toInt, i)  // rotating drop classes
      case 6 => piiDoc(i)
      case 7 => profaneDoc(i)
      case 8 if i % 40 == 8 => cleanDoc(8) // planted exact-duplicate group (rows 8,48,88,…)
      case 8 => cleanDoc(i)
      case 9 => cleanDoc(i - 9) + " " + sentence(rng(i + 1), 5) // near-dup of the class-0 row i-9
    }
    val lang = langs((i % langs.length).toInt)
    val domain = domains(r.nextInt(domains.length))
    val url = s"https://$domain/page/$i"
    val ts = new Timestamp(1700000000000L + (i % 30) * 86400000L + (i % 86400) * 1000L)
    val htmlStr = wrapHtml(s"Page $i", text)
    // ~2% of rows: non-UTF-8 (cp1252 bytes with a 0x92 curly quote)
    val html: Array[Byte] =
      if (i % 50 == 17) (htmlStr.replace("stories", "stor’ies")).getBytes("windows-1252")
      else htmlStr.getBytes("UTF-8")
    Page(url, ts, html, text, lang)
  }

  /** Build the cc_pages DataFrame distributed (no driver-side collect —
    * rows are generated executor-side from an id range).
    */
  def generate(spark: SparkSession, rows: Long, partitions: Int = 32): DataFrame =
    generateRange(spark, 0, rows, partitions)

  /** A SLICE of the same deterministic stream — a "next snapshot" for
    * incremental-dedup runs: rows i%40==8 duplicate the corpus's
    * planted exact group, class-9 rows near-dup their own in-slice base.
    */
  def generateRange(spark: SparkSession, start: Long, end: Long,
                    partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(start, end, 1, partitions).as[Long].map(i => page(i)).toDF()
  }
}
