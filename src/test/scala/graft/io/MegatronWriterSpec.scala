package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class MegatronWriterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("shard write/read round trip (uint16 vocab)") {
    val tokenize = MegatronWriter.hashTokenizer(50000)
    val docs = Seq("the quick brown fox", "jumps over", "the lazy dog sleeps here today")
    val dir = java.nio.file.Files.createTempDirectory("mega").toString
    val stats = MegatronWriter.writeShard(docs.iterator, s"$dir/part-0",
      tokenize, tokenSize = 2, appendEod = false, eodTokenId = -1)
    assert(stats.docs == 3 && stats.tokens == 4 + 2 + 6)
    val back = MegatronWriter.readShard(s"$dir/part-0")
    assert(back.map(_.toSeq) == docs.map(tokenize(_).toSeq))
  }

  test("idx layout bytes: header, version, dtype code, counts") {
    val dir = java.nio.file.Files.createTempDirectory("megaidx").toString
    MegatronWriter.writeIdx(s"$dir/x.idx", Array(3, 5), tokenSize = 2)
    val b = java.nio.ByteBuffer.wrap(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/x.idx")))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hdr = new Array[Byte](9); b.get(hdr)
    assert(new String(hdr.take(7), "ISO-8859-1") == "MMIDIDX" && hdr(7) == 0 && hdr(8) == 0)
    assert(b.getLong() == 1L)     // version
    assert(b.get() == 8)          // uint16 dtype code
    assert(b.getLong() == 2L)     // sequences
    assert(b.getLong() == 3L)     // documents = n + 1
    assert(b.getInt() == 3 && b.getInt() == 5)          // lengths
    assert(b.getLong() == 0L && b.getLong() == 6L)      // pointers (3 tokens * 2B)
    assert(b.getLong() == 0L && b.getLong() == 1L && b.getLong() == 2L) // doc indices
    assert(!b.hasRemaining)
  }

  test("append EOD adds one token per document") {
    val tokenize = MegatronWriter.hashTokenizer(100)
    val dir = java.nio.file.Files.createTempDirectory("megaeod").toString
    val stats = MegatronWriter.writeShard(Seq("a b", "c").iterator, s"$dir/p",
      tokenize, tokenSize = 2, appendEod = true, eodTokenId = 99)
    assert(stats.tokens == 2 + 1 + 1 + 1)
    val back = MegatronWriter.readShard(s"$dir/p")
    assert(back.forall(_.last == 99))
  }

  test("int32 path when vocab exceeds uint16") {
    val dir = java.nio.file.Files.createTempDirectory("mega32").toString
    val tokenize = (_: String) => Array(70000, 123456)
    MegatronWriter.writeShard(Seq("x").iterator, s"$dir/p", tokenize,
      tokenSize = 4, appendEod = false, eodTokenId = -1)
    assert(MegatronWriter.readShard(s"$dir/p").head.toSeq == Seq(70000, 123456))
  }

  test("distributed write: one shard per partition, all docs covered") {
    import spark.implicits._
    val df = spark.range(0, 100).selectExpr("concat('doc number ', id, ' text') AS text")
      .repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("megadist").toString
    val stats = MegatronWriter.write(df, "text", dir, MegatronWriter.hashTokenizer(50000), 50000)
    assert(stats.map(_.docs).sum == 100)
    assert(stats.size == 4)
    val allBack = stats.flatMap(s => MegatronWriter.readShard(s.path))
    assert(allBack.size == 100 && allBack.forall(_.length == 4))
  }

  test("tokenizer fertility filter keeps normal prose, drops token-dense noise") {
    val f = graft.filters.CodeFilters.TokenizerFertility()
    assert(f.keepDocument("the quick brown fox jumps over the lazy dog"))
    // punctuation-only text tokenizes ~1 char per token -> ratio < 2.5
    assert(!f.keepDocument(". , ! ? . , ! ? . , ! ?"))
    assert(!f.keepDocument("")) // zero tokens -> -1 sentinel, dropped
  }
}
