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

  test("stop lists load for zh/ja/th and non-spaced detection works") {
    assert(StopLists.forLang("zh").size > 700)
    assert(StopLists.forLang("ja").size > 100)
    assert(StopLists.forLang("th").size > 100)
    assert(StopLists.forLang("en").contains("the"))
    assert(StopLists.forLang("xx").isEmpty)
    assert(StopLists.isNonSpaced("CHINESE") && StopLists.isNonSpaced("ja"))
    assert(!StopLists.isNonSpaced("en"))
  }

  test("segmenter: CJK chars tokenize singly, latin runs split on whitespace") {
    assert(Segmenter.words("zh", "这是一个测试").toSeq == Seq("这", "是", "一", "个", "测", "试"))
    assert(Segmenter.words("ja", "これはtestです").toSeq == Seq("こ", "れ", "は", "test", "で", "す"))
    assert(Segmenter.words("en", "plain old words").toSeq == Seq("plain", "old", "words"))
  }

  test("zh stop list actually hits segmented zh text") {
    val words = Segmenter.words("zh", "这是一个测试的句子")
    val zh = StopLists.forLang("zh")
    assert(words.exists(zh.contains), "expected at least one zh stopword hit")
  }
}
