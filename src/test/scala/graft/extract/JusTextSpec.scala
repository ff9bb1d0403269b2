package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Segmenter, StopLists}

class JusTextSpec extends AnyFunSuite {

  private val sw = HtmlExtract.enStopwords

  // long stopword-dense prose (> 200 chars, density >> 0.32)
  private val goodText =
    "it was the best of times and it was the worst of times and we have " +
    "been waiting for this day with great hope because the world is full " +
    "of other people who can be there for you and for them and this is " +
    "what we do with our days now"

  test("segmentation: block tags split paragraphs, scripts/heads removed") {
    val html = s"""<html><head><title>T</title><style>x{}</style></head>
      <body><div><a href="/">Home</a> <a href="/a">About</a></div>
      <p>$goodText</p>
      <p>short note</p></body></html>"""
    val paras = JusText.paragraphs(html)
    assert(paras.length == 3, paras.map(_.text).mkString("|"))
    assert(paras(0).text.contains("Home") && paras(0).charsInLinks > 0)
    assert(paras(1).text == goodText)
    assert(paras(2).text == "short note")
  }

  test("classification: link-heavy bad, long dense good, short short") {
    val html = s"""<body><div><a href="/">Home</a><a href="/a">About</a></div>
      <p>$goodText</p><p>short note</p></body>"""
    val paras = JusText.paragraphs(html)
    val cf = JusText.classify(paras, sw)
    assert(cf.toSeq == Seq("bad", "good", "short"), cf.toSeq)
  }

  test("revision: short between good stays good; trailing short next to bad drops") {
    val html = s"""<body><p>$goodText</p><p>tiny note here</p><p>$goodText</p>
      <p>all rights reserved</p></body>"""
    val paras = JusText.paragraphs(html)
    val cls = JusText.revise(paras, JusText.classify(paras, sw))
    assert(cls(0) == "good" && cls(1) == "good" && cls(2) == "good")
    assert(cls(3) == "bad") // short with (good, boundary-bad) neighbours
  }

  test("copyright mark forces bad") {
    val html = s"<body><p>© 2024 Example Corp $goodText</p></body>"
    val paras = JusText.paragraphs(html)
    assert(JusText.classify(paras, sw).head == "bad")
  }

  test("neargood between bads drops; between goods survives") {
    // 100-char dense text: length in [70, 200] -> neargood
    val mid = "it was the best of times and we have been waiting for this " +
      "day with great hope for all of us here"
    val htmlDrop = s"""<body><div><a href="/">x</a><a href="/y">y</a></div><p>$mid</p></body>"""
    val p1 = JusText.paragraphs(htmlDrop)
    val c1 = JusText.revise(p1, JusText.classify(p1, sw))
    assert(JusText.classify(p1, sw)(1) == "neargood")
    assert(c1(1) == "bad")
    val htmlKeep = s"<body><p>$goodText</p><p>$mid</p><p>$goodText</p></body>"
    val p2 = JusText.paragraphs(htmlKeep)
    val c2 = JusText.revise(p2, JusText.classify(p2, sw))
    assert(c2.toSeq == Seq("good", "good", "good"))
  }

  test("heading near good content is promoted") {
    val html = s"<body><h2>Section title words</h2><p>$goodText</p></body>"
    val paras = JusText.paragraphs(html)
    assert(paras(0).isHeading)
    val cls = JusText.revise(paras, JusText.classify(paras, sw))
    assert(cls.toSeq == Seq("good", "good"), cls.toSeq)
  }

  test("extract joins good paragraphs with \\n\\n; None when all boilerplate") {
    val html = s"""<body><div><a href="/">Home</a><a href="/b">B</a></div>
      <p>$goodText</p><p>tiny note</p><p>$goodText</p></body>"""
    val out = JusText.extract(html, sw)
    assert(out.contains(s"$goodText\n\ntiny note\n\n$goodText"))
    assert(JusText.extract("""<body><div><a href="/">Home</a><a href="/b">B</a></div></body>""", sw).isEmpty)
  }

  test("keepBoilerplate=true returns every paragraph (non-spaced language mode)") {
    val html = s"""<body><div><a href="/">Home</a><a href="/b">B</a></div><p>$goodText</p></body>"""
    val out = JusText.extract(html, sw, keepBoilerplate = true).get
    assert(out.split("\n\n").length == 2)
  }

  test("CommonCrawlExtractor: lang gate, per-language stop lists, algorithm dispatch") {
    val goodHtml = s"<html><body><p>$goodText</p></body></html>".getBytes("UTF-8")
    val ex = new CommonCrawlExtractor(algorithm = "justext")
    val Some((lang, text)) = ex.extract(goodHtml)
    assert(lang == "ENGLISH" && text == goodText)
    // resiliparse path: single stopword-dense paragraph round trips
    val exR = new CommonCrawlExtractor(algorithm = "resiliparse")
    assert(exR.extract(goodHtml).map(_._2).contains(goodText))
    // language with no stop list -> dropped (reference extract.py:80-83)
    val exNoList = new CommonCrawlExtractor(langDetect = _ => "KLINGON")
    assert(exNoList.extract(goodHtml).isEmpty)
    // non-spaced language: justext keeps all paragraphs (boilerplate
    // gate off), zh stop list present
    val zhHtml = "<html><body><p>这是一个测试的句子我们都好这是一个测试的句子</p></body></html>".getBytes("UTF-8")
    val exZh = new CommonCrawlExtractor(langDetect = _ => "CHINESE")
    val out = exZh.extract(zhHtml)
    assert(out.exists(_._2.contains("这是一个测试")), s"got $out")
    // undecodable bytes -> None is impossible (cp1252 fallback accepts
    // any byte sequence) but empty html -> None
    assert(ex.extract("<html><body></body></html>".getBytes("UTF-8")).isEmpty)
  }

  test("TrafilaturaExtract: fallback, dedup, density gate, output floor") {
    val t = TrafilaturaExtract()
    // nav-pruned main content is long enough -> no fallback; footer text absent
    val html = s"""<html><body><nav><a href="/">Home</a></nav><main>
      <p>$goodText</p><p>$goodText</p><p>$goodText</p>
      <footer>Copyright 2024</footer></main></body></html>"""
    val out = t.extract(html, sw).get
    assert(!out.contains("Home") && !out.contains("Copyright"))
    // dedup: same >=100-char paragraph 3x with max_repetitions=2 keeps 2
    assert(out.split("\n\n").length == 2)
    // short paragraphs bypass the dup check (min_duplcheck_size)
    val shortDup = s"<body><p>$goodText</p><p>hi there all</p><p>hi there all</p><p>hi there all</p></body>"
    val out2 = TrafilaturaExtract(requiredStopwordDensity = 0.0).extract(shortDup, sw).get
    assert(out2.split("\n\n").count(_ == "hi there all") == 3)
    // fallback: main content too small -> unpruned re-extraction keeps nav text
    val navHeavy = s"""<body><nav><p>$goodText</p></nav><main><p>tiny</p></main></body>"""
    val out3 = TrafilaturaExtract(requiredStopwordDensity = 0.0).extract(navHeavy, sw).get
    assert(out3.contains(goodText.substring(0, 20)))
    // density gate drops stopword-poor paragraphs
    val poor = "<body><main><p>" + ("lorem zzz qqq www " * 20) + "</p></main></body>"
    assert(t.extract(poor, sw).isEmpty)
    // non-spaced language skips the gate
    assert(TrafilaturaExtract(minExtractedSize = 1)
      .extract("<body><main><p>这是一个测试的句子这是一个测试的句子这是一个测试</p></main></body>",
        StopLists.forLang("zh"), "CHINESE").nonEmpty)
    // dispatch through CommonCrawlExtractor
    val ex = new CommonCrawlExtractor(algorithm = "trafilatura")
    val simple = s"<html><body><main><p>$goodText</p></main></body></html>".getBytes("UTF-8")
    assert(ex.extract(simple).map(_._2).contains(goodText))
  }

  test("CommonCrawlExtractor: DataFrame stage drops gated rows and appends (language, text)") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, s"<body><p>$goodText</p></body>".getBytes("UTF-8")),
      (2L, "<body><p>xq zv qqq</p></body>".getBytes("UTF-8"))) // und -> no stop list
    val df = rows.toDF("id", "html")
    val out = new CommonCrawlExtractor().extractColumns(df)
      .select("id", "language", "text").collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L && out(0).getString(1) == "ENGLISH")
    assert(out(0).getString(2) == goodText)
  }

  test("stop lists load for zh/ja/th and non-spaced detection works") {
    assert(StopLists.forLang("zh").size > 700)
    assert(StopLists.forLang("ja").size > 100)
    assert(StopLists.forLang("th").size > 100)
    assert(StopLists.forLang("en").contains("the"))
    assert(StopLists.forLang("xx").isEmpty)
    assert(StopLists.isNonSpaced("CHINESE") && StopLists.isNonSpaced("ja"))
    assert(!StopLists.isNonSpaced("en"))
  }

  test("segmenter: lexicon words match greedily, other CJK chars tokenize singly, latin runs split on whitespace") {
    // 一个 is a lexicon word; the rest fall back per-codepoint
    assert(Segmenter.words("zh", "这是一个测试").toSeq == Seq("这", "是", "一个", "测", "试"))
    assert(Segmenter.words("ja", "これはtestです").toSeq == Seq("これ", "は", "test", "です"))
    assert(Segmenter.words("en", "plain old words").toSeq == Seq("plain", "old", "words"))
  }

  test("zh stop list actually hits segmented zh text") {
    val words = Segmenter.words("zh", "这是一个测试的句子")
    val zh = StopLists.forLang("zh")
    assert(words.exists(zh.contains), "expected at least one zh stopword hit")
  }
}
