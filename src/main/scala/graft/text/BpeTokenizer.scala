package graft.text

import scala.jdk.CollectionConverters._

/** Byte-level BPE tokenizer loading the standard GPT-2 artifact pair
  * (`vocab.json` token→id map + `merges.txt` ranked merge list) — the
  * real-tokenizer slot behind MegatronWriter / TokenizerFertility /
  * TokenCount (the reference loads HF tokenizers; this reads the same
  * public on-disk format directly, no conversion).
  *
  * Algorithm (public, from the GPT-2 reference implementation):
  *   1. pre-tokenize with the GPT-2 regex ([[graft.analysis.TextStats
  *      .bpePatternGpt2]] — the exact artifact pattern incl. the
  *      `\s+(?!\S)` whitespace-run split);
  *   2. map each pre-token's UTF-8 bytes through the bytes→unicode
  *      table (printable stand-ins for control bytes);
  *   3. greedily merge the adjacent symbol pair with the LOWEST merge
  *      rank until no ranked pair remains;
  *   4. look up each resulting symbol in the vocab.
  */
final class BpeTokenizer(vocab: Map[String, Int], ranks: Map[(String, String), Int],
                         val unkId: Int = -1) extends Serializable {

  def vocabSize: Int = vocab.size

  /** BPE-merge one pre-token already mapped to byte-unicode symbols. */
  private def bpe(word: Vector[String]): Vector[String] = {
    var symbols = word
    var done = false
    while (!done && symbols.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < symbols.length - 1) {
        val r = ranks.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else symbols = symbols.take(bestIdx) :+
        (symbols(bestIdx) + symbols(bestIdx + 1)) :++ symbols.drop(bestIdx + 2)
    }
    symbols
  }

  /** Token id sequence for `text` (unknown symbols → unkId, dropped when
    * unkId < 0 — GPT-2 vocabs are byte-complete so this only fires on
    * truncated fixture vocabs).
    */
  def encode(text: String): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m = BpeTokenizer.preTokenRe.matcher(text)
    while (m.find()) {
      val pre = m.group()
      val mapped = pre.getBytes("UTF-8").toVector.map(b => BpeTokenizer.byteToUnicode(b & 0xff))
      bpe(mapped).foreach { sym =>
        vocab.get(sym) match {
          case Some(id) => out += id
          case None => if (unkId >= 0) out += unkId
        }
      }
    }
    out.toArray
  }

  def count(text: String): Int = encode(text).length
}

object BpeTokenizer {

  private[text] val preTokenRe =
    java.util.regex.Pattern.compile(graft.analysis.TextStats.bpePatternGpt2)

  /** GPT-2 bytes_to_unicode: printable ASCII/Latin-1 map to themselves,
    * the remaining byte values map to 256+n in order.
    */
  val byteToUnicode: Array[String] = {
    val printable = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    val out = new Array[String](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (printable(b)) out(b) = new String(Character.toChars(b))
      else { out(b) = new String(Character.toChars(256 + n)); n += 1 }
    }
    out
  }

  /** Load the standard artifact pair. `merges.txt` may start with a
    * `#version` header line; each following line is "left right".
    */
  def load(vocabJsonPath: String, mergesPath: String): BpeTokenizer = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val vocabMap = mapper.readValue(new java.io.File(vocabJsonPath),
      classOf[java.util.Map[String, Integer]]).asScala.map { case (k, v) => k -> v.toInt }.toMap
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(mergesPath)).asScala
    val ranks = lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex
      .flatMap { case (l, i) =>
        l.split(" ", 2) match {
          case Array(a, b) => Some((a, b) -> i)
          case _ => None
        }
      }.toMap
    new BpeTokenizer(vocabMap, ranks)
  }

  /** Fixture writer (tests): emit the same artifact pair `load` reads. */
  def write(vocabJsonPath: String, mergesPath: String,
            vocab: Map[String, Int], merges: Seq[(String, String)]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val jmap = new java.util.LinkedHashMap[String, Integer]()
    vocab.foreach { case (k, v) => jmap.put(k, v) }
    mapper.writeValue(new java.io.File(vocabJsonPath), jmap)
    val body = "#version: 0.2\n" + merges.map { case (a, b) => s"$a $b" }.mkString("\n") + "\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(mergesPath), body)
  }
}
