package graft.scrub

import org.scalatest.funsuite.AnyFunSuite

class ScrubSpec extends AnyFunSuite {

  test("PII: emails") {
    assert(PiiScrub.scrubEmails("mail me at john.doe+x@sub.example.co.uk today") ==
      "mail me at {EMAIL} today")
  }

  test("PII: phones in common formats") {
    assert(PiiScrub.scrubPhones("call +1-555-123-4567 now") == "call {PHONE} now")
    assert(PiiScrub.scrubPhones("call (555) 123-4567 now") == "call {PHONE} now")
    assert(PiiScrub.scrubPhones("call 555-123-4567 now") == "call {PHONE} now")
    assert(PiiScrub.scrubPhones("call 555.123.4567 now") == "call {PHONE} now")
    // plain numbers survive
    assert(PiiScrub.scrubPhones("the year 2024 and 123456 items") ==
      "the year 2024 and 123456 items")
  }

  test("PII: IPv4 with octet bounds") {
    assert(PiiScrub.scrubIps("from 192.168.0.1 and 255.255.255.255") == "from {IP} and {IP}")
    assert(PiiScrub.scrubIps("version 1.2.3.400 stays") == "version 1.2.3.400 stays")
  }

  test("PII: combined pass is order-safe") {
    val in = "x user@a.com y 10.0.0.7 z +1-555-123-4567"
    assert(PiiScrub.scrubPii(in) == "x {EMAIL} y {IP} z {PHONE}")
  }

  test("profanity scrub + toxicity score") {
    val s = PiiScrub.defaultScrubber
    assert(s.scrub("well SHIT that hurt") == "well {PROFANITY} that hurt")
    assert(s.scrub("shitake mushrooms are fine") == "shitake mushrooms are fine") // word boundary
    assert(s.toxicityScore("damn shit fine fine") == 0.25) // 1 of 4 words (damn not in lexicon)
  }

  // ---- modifiers, vectors per reference modifiers/*.py ----

  test("UrlRemover (url_remover.py:22-31)") {
    assert(Modifiers.removeUrls("a https://x.com/p?q=1 b www.y.org c") == "a  b  c")
  }

  test("NewlineNormalizer (newline_normalizer.py:24-33)") {
    assert(Modifiers.normalizeNewlines("a\n\n\n\nb") == "a\n\nb")
    assert(Modifiers.normalizeNewlines("a\r\n\r\n\r\nb") == "a\r\n\r\nb")
    assert(Modifiers.normalizeNewlines("a\n\nb") == "a\n\nb")
  }

  test("MarkdownRemover (markdown_remover.py:26-43)") {
    assert(Modifiers.removeMarkdown("**bold** and *it* and _u_ and [t](http://u)") ==
      "bold and it and u and http://u")
  }

  test("QuotationRemover (quotation_remover.py:19-36)") {
    assert(Modifiers.removeQuotation("\"quoted text\"") == "quoted text")
    assert(Modifiers.removeQuotation("\"line\"\nmore\"") == "\"line\"\nmore\"") // first line ends with quote
    assert(Modifiers.removeQuotation("\"a\nb\"") == "a\nb")
    assert(Modifiers.removeQuotation("ab") == "ab")
  }

  test("LineRemover (line_remover.py:20-34)") {
    assert(Modifiers.removeLines("keep\ndrop\nkeep2", Set("drop")) == "keep\nkeep2")
  }

  test("BoilerPlateStringModifier (c4.py:24-86)") {
    assert(Modifiers.removeBoilerplate("some lorem ipsum text") == "")
    assert(Modifiers.removeBoilerplate("clean\n\nalso clean") == "clean\n\nalso clean")
    // boilerplate only at top -> stripped
    assert(Modifiers.removeBoilerplate("terms of use apply\n\nreal content\n\nmore real") ==
      "real content\n\nmore real")
    // boilerplate in the middle -> document unchanged
    val mid = "real\n\nprivacy policy\n\nmore real"
    assert(Modifiers.removeBoilerplate(mid) == mid)
  }

  test("Slicer string mode (slicer.py:19-77)") {
    assert(Modifiers.slice("abc START mid END xyz", "START", "END",
      includeLeft = false, includeRight = false) == "mid")
    assert(Modifiers.slice("no markers", "START", "END") == "")
  }

  test("FastTextLabelModifier (fasttext.py:19-25)") {
    assert(Modifiers.fastTextLabel("__label__hq", "a\nb") == "__label__hq a b")
  }
}
