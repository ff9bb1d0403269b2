package graft.text

import org.scalatest.funsuite.AnyFunSuite

class PyTextSpec extends AnyFunSuite {

  test("len counts code points, not UTF-16 units") {
    assert(PyText.len("abc") == 3)
    assert(PyText.len("a😀b") == 3) // emoji is one code point
  }

  test("splitWhitespace matches Python str.split()") {
    assert(PyText.splitWhitespace("  a  b\tc\nd  ").toSeq == Seq("a", "b", "c", "d"))
    assert(PyText.splitWhitespace("").isEmpty)
    assert(PyText.splitWhitespace("   ").isEmpty)
    assert(PyText.splitWhitespace("a b").toSeq == Seq("a", "b")) // NBSP is Python whitespace
  }

  test("splitLiteral keeps empty fields like Python str.split(sep)") {
    assert(PyText.splitLiteral("a\n\nb", "\n").toSeq == Seq("a", "", "b"))
    assert(PyText.splitLiteral("", "\n").toSeq == Seq(""))
    assert(PyText.splitLiteral("a\n\nb\n\nc", "\n\n").toSeq == Seq("a", "b", "c"))
  }

  test("strip removes Unicode whitespace from both ends only") {
    assert(PyText.strip(" \t a b \n ") == "a b")
    assert(PyText.strip(" x ") == "x")
  }

  test("countOccurrences is non-overlapping like str.count") {
    assert(PyText.countOccurrences("aaaa", "aa") == 2)
    assert(PyText.countOccurrences("abcabc", "abc") == 2)
    assert(PyText.countOccurrences("abc", "x") == 0)
  }

  test("ngram windows") {
    val g = TextUtils.ngrams(Array("a", "b", "c", "d"), 2)
    assert(g.map(_.mkString(" ")).toSeq == Seq("a b", "b c", "c d"))
    assert(TextUtils.ngrams(Array("a"), 2).isEmpty)
  }

  test("paragraphs and sentences match reference text_utils semantics") {
    assert(TextUtils.paragraphs("a\n\nb\n\nc").toSeq == Seq("a", "b", "c"))
    assert(TextUtils.sentences("a\n\nb\n \nc").toSeq == Seq("a", "b", "c"))
  }

  test("indicesTopOrBottomOnly (text_utils.py:88-109 code behavior)") {
    // NOTE: the reference docstring calls [0,1,9,10] "valid", but the
    // CODE requires the whole index list to be contiguous — [0,1,9,10]
    // has a gap and returns False. We match the code, not the docstring.
    assert(!TextUtils.indicesTopOrBottomOnly(Array(0, 1, 9, 10), 11))
    assert(TextUtils.indicesTopOrBottomOnly(Array(0, 1), 11))
    assert(TextUtils.indicesTopOrBottomOnly(Array(9, 10), 11))
    assert(!TextUtils.indicesTopOrBottomOnly(Array(0, 1, 3, 9, 10), 11))
    assert(!TextUtils.indicesTopOrBottomOnly(Array(3, 4), 11))
    assert(!TextUtils.indicesTopOrBottomOnly(Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10), 11))
  }
}
