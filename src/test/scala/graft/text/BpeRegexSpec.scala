package graft.text

import java.util.regex.Pattern
import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.TextStats

/** The GPT-2 pre-tokenizer pattern vs the RE2-safe oracle pattern:
  * token TEXTS differ on multi-whitespace runs (the `\s+(?!\S)`
  * alternative leaves the run's last char to the following word).
  * Token COUNTS agree whenever the run's final char is a SPACE (it
  * re-attaches to the word via ` ?`); a \t/\n immediately before a
  * word becomes one extra standalone whitespace token under GPT-2 —
  * which is why TextStats.bpeTokenCount keeps the RE2-safe pattern
  * both engines share, and only BpeTokenizer (id-producing) uses the
  * exact artifact pattern.
  */
class BpeRegexSpec extends AnyFunSuite {

  private def tokens(pattern: String, text: String): Vector[String] = {
    val m = Pattern.compile(pattern).matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }
  private def gpt2(text: String) = tokens(TextStats.bpePatternGpt2, text)
  private def oracle(text: String) = tokens(TextStats.bpePattern, text)

  test("multi-space run: last space attaches to the word (GPT-2 artifact behavior)") {
    assert(gpt2("a  b") == Vector("a", " ", " b"))
    assert(oracle("a  b") == Vector("a", "  ", "b")) // documented divergence in texts
  }

  test("indented code tokenizes as ' return', not 'return'") {
    assert(gpt2("    return x") == Vector("   ", " return", " x"))
    assert(gpt2("  if y:\n    z") == Vector(" ", " if", " y", ":", "\n   ", " z"))
  }

  test("single space, trailing whitespace, contractions unchanged") {
    assert(gpt2("a b") == Vector("a", " b"))
    assert(gpt2("a b  ") == Vector("a", " b", "  "))
    assert(gpt2("don't we'll") == Vector("don", "'t", " we", "'ll"))
  }

  test("pre-tokens always concatenate back to the input (both patterns)") {
    val samples = Seq("a  b", "    return x", "tab\t\tsep", "nl\n\n  mix \r\n end  ")
    samples.foreach { s =>
      assert(gpt2(s).mkString == s)
      assert(oracle(s).mkString == s)
    }
  }

  test("counts agree on space-only whitespace; GPT-2 adds one ws token per \\t/\\n-before-word run") {
    // "a\n\nb": oracle -> [a, \n\n, b]; GPT-2 -> [a, \n, \n, b] (the
    // leftover \n can't join 'b' the way a space would)
    assert(oracle("a\n\nb") == Vector("a", "\n\n", "b"))
    assert(gpt2("a\n\nb") == Vector("a", "\n", "\n", "b"))
  }

  test("property: count identical on space-only-ws strings; GPT-2 surplus == non-space-before-word runs") {
    val rnd = new scala.util.Random(42)
    val spacey = "ab1.  "
    (1 to 500).foreach { _ =>
      val s = Vector.fill(rnd.nextInt(60))(spacey(rnd.nextInt(spacey.length))).mkString
      assert(gpt2(s).length == oracle(s).length, s"count mismatch on ${s.map(_.toInt)}")
      assert(TextStats.bpeTokenCount(s) == oracle(s).length)
    }
    val mixed = "ab1.  \t\n"
    (1 to 500).foreach { _ =>
      val s = Vector.fill(rnd.nextInt(60))(mixed(rnd.nextInt(mixed.length))).mkString
      // surplus tokens = whitespace runs of length >= 2 whose LAST char
      // is not ' ', immediately followed by a non-whitespace char (a
      // single \n before a word is one `\s+` token under BOTH patterns)
      val surplus = """\s+\S""".r.findAllIn(s)
        .count(m => m.length >= 3 && m.charAt(m.length - 2) != ' ')
      assert(gpt2(s).length == oracle(s).length + surplus, s"on ${s.map(_.toInt)}")
      assert(gpt2(s).mkString == s)
    }
  }

  test("property: hand-rolled scanner count == oracle regex count on adversarial unicode input") {
    val rnd = new scala.util.Random(4242)
    // alphabet spanning every scanner branch: ASCII letters/digits,
    // contraction suffix chars after apostrophes, every Java-\s char,
    // non-ASCII whitespace (NBSP — "other" under the ASCII \s class),
    // unicode letters, Nl/No numbers (Ⅻ, ²), combining marks, an
    // astral-plane letter and emoji (surrogate pairs), and a lone
    // high surrogate
    val alphabet: Array[String] = Array(
      "a", "Z", "9", "'", "s", "t", "r", "e", "v", "m", "l", "d",
      " ", "\t", "\n", "\u000B", "\f", "\r", "\u00A0",
      "é", "Ω", "中", "Ⅻ", "²", "٣", "́", ".", ",", "#", "-",
      new String(Character.toChars(0x1D538)), // 𝔸 (category L, astral)
      new String(Character.toChars(0x1F600)), // 😀 (category So, astral)
      "\uD83D" // lone high surrogate
    )
    (1 to 2000).foreach { _ =>
      val s = Vector.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(TextStats.bpeTokenCount(s) == oracle(s).length,
        s"scanner/regex mismatch on ${s.map(_.toInt).mkString(",")}")
    }
  }
}
