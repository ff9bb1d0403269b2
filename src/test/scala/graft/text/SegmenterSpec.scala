package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Dictionary forward-maximum-matching segmentation for zh/ja
  * (text_utils.py:39-60 slot): lexicon words match greedily-longest,
  * everything else degrades to the per-codepoint run splitter — so the
  * char-fallback properties (no lost characters, determinism) hold for
  * arbitrary input, and known words come back whole.
  */
class SegmenterSpec extends AnyFunSuite {

  test("forward maximum match prefers the LONGEST lexicon word") {
    // 为什么 (3 chars) wins over any shorter prefix
    assert(Segmenter.words("zh", "为什么不去").toSeq == Seq("为什么", "不", "去"))
    // 怎么样 over 怎么
    assert(Segmenter.words("zh", "怎么样了").toSeq == Seq("怎么样", "了"))
  }

  test("mixed script: latin runs intact, lexicon + fallback interleave") {
    assert(Segmenter.words("zh", "我们用spark处理数据").toSeq ==
      Seq("我们", "用", "spark", "处", "理", "数据"))
    assert(Segmenter.words("ja", "日本のAI研究").toSeq == Seq("日本", "の", "AI", "研究"))
  }

  test("property: segmentation never loses a non-space char and is deterministic (500 random mixes)") {
    val pool = "我们这是一个测试的句子什么时候 abc12 \t为什么"
    val rnd = new scala.util.Random(11)
    (1 to 500).foreach { _ =>
      val t = Vector.fill(rnd.nextInt(40))(pool(rnd.nextInt(pool.length))).mkString
      val w1 = Segmenter.words("zh", t)
      assert(w1.mkString == t.replaceAll("\\s+", ""), s"lost chars on $t")
      assert(w1.sameElements(Segmenter.words("zh", t)))
      // every token is either a lexicon word, a single CJK char, or a latin run
      w1.foreach(tok => assert(tok.nonEmpty))
    }
  }

  test("non-zh/ja languages always whitespace-split (reference parity incl. ko/th)") {
    assert(Segmenter.words("ko", "한국어 텍스트 분리").toSeq == Seq("한국어", "텍스트", "분리"))
    assert(Segmenter.words("th", "a b").toSeq == Seq("a", "b"))
  }
}
