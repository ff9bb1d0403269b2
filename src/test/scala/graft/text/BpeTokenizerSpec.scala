package graft.text

import org.scalatest.funsuite.AnyFunSuite

class BpeTokenizerSpec extends AnyFunSuite {

  // tiny GPT-2-style fixture: bytes h e l o w r d + 'Ġ' (space marker)
  // and merges building "hello"/"world" pieces step by step
  private def fixture(): BpeTokenizer = {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    val space = BpeTokenizer.byteToUnicode(' '.toInt) // 'Ġ' in GPT-2 terms
    val vocab = Map(
      "h" -> 0, "e" -> 1, "l" -> 2, "o" -> 3, "w" -> 4, "r" -> 5, "d" -> 6,
      "he" -> 7, "ll" -> 8, "hell" -> 9, "hello" -> 10,
      space -> 11, s"${space}w" -> 12, s"${space}wo" -> 13,
      "rl" -> 14, "rld" -> 15, s"${space}world" -> 16)
    val merges = Seq(
      ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
      (space, "w"), (s"${space}w", "o"), ("r", "l"), ("rl", "d"),
      (s"${space}wo", "rld"))
    BpeTokenizer.write(s"$dir/vocab.json", s"$dir/merges.txt", vocab, merges)
    BpeTokenizer.load(s"$dir/vocab.json", s"$dir/merges.txt")
  }

  test("merges apply in rank order and produce the expected ids") {
    val t = fixture()
    // "hello" -> h e l l o -> he ll o -> hell o -> hello (one token)
    assert(t.encode("hello").toSeq == Seq(10))
    // " world" pre-token: Ġ w o r l d -> Ġw o rl d -> Ġwo rld -> Ġworld
    assert(t.encode("hello world").toSeq == Seq(10, 16))
    assert(t.count("hello world") == 2)
  }

  test("unmergeable symbols fall back to byte-level vocab entries") {
    val t = fixture()
    // "held": h e l d -> he l d ; 'he','l','d' all in vocab
    assert(t.encode("held").toSeq == Seq(7, 2, 6))
  }

  test("symbols missing from a truncated vocab are dropped (or unkId)") {
    val t = fixture()
    assert(t.encode("zzz").isEmpty) // 'z' not in the fixture vocab
  }

  test("byte-unicode table: printable bytes map to themselves, others displaced") {
    assert(BpeTokenizer.byteToUnicode('a'.toInt) == "a")
    assert(BpeTokenizer.byteToUnicode(' '.toInt) != " ") // space is non-printable in the table
    assert(BpeTokenizer.byteToUnicode.distinct.length == 256)
  }

  test("plugs into the MegatronWriter and fertility slots") {
    val t = fixture()
    val dir = java.nio.file.Files.createTempDirectory("bpemeg").toString
    val stats = graft.io.MegatronWriter.writeShard(
      Iterator("hello world", "hello"), s"$dir/p", t.encode _, tokenSize = 2,
      appendEod = false, eodTokenId = -1)
    assert(stats.tokens == 2 + 1)
    assert(graft.io.MegatronWriter.readShard(s"$dir/p").map(_.toSeq) == Seq(Seq(10, 16), Seq(10)))
    val fert = graft.filters.CodeFilters.TokenizerFertility(countTokens = t.count _)
    assert(fert.score("hello world") == 11.0 / 2) // 11 chars / 2 tokens
  }
}
