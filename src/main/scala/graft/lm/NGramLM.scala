package graft.lm

import java.io.{DataInputStream, DataOutputStream, BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import graft.text.PyText

/** KenLM-style word n-gram language model with stupid-backoff scoring
  * (Brants et al. 2007), used as a perplexity quality scorer.
  *
  * Required by the build target's north rule; the reference snapshot has
  * no KenLM stage (its only LM-ish dependency is sentencepiece in
  * filters/code.py:18), so the operator follows the reference's
  * DocumentFilter contract (stages/text/filters/doc_filter.py:18-104):
  * score = perplexity, keep iff perplexity ≤ threshold.
  *
  * The model is count tables for orders 1..n hashed into open-addressing
  * long→long maps — one flat structure, broadcast once per executor.
  * Scoring S(w|context) = count(context w)/count(context), backing off
  * with factor α=0.4 per order, floored at a uniform unigram smoothing.
  */
final class NGramLM(
    val order: Int,
    val vocabSize: Long,
    val totalUnigrams: Long,
    // counts(k) maps fingerprint of a (k+1)-gram -> count
    private val keys: Array[Array[Long]],
    private val vals: Array[Array[Long]]
) extends Serializable {

  private val alpha = 0.4

  @inline private def mix(h: Long): Long = {
    var x = h ^ (h >>> 33)
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  @inline private def lookup(k: Int, fp: Long): Long = {
    val ks = keys(k)
    val mask = ks.length - 1
    var i = (mix(fp) & mask).toInt
    while (true) {
      val key = ks(i)
      if (key == fp) return vals(k)(i)
      if (key == 0L) return 0L
      i = (i + 1) & mask
    }
    0L
  }

  @inline private def wordHash(w: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < w.length) { h ^= w.charAt(i); h *= 0x100000001b3L; i += 1 }
    if (h == 0L) 1L else h
  }

  /** combine word hashes into an n-gram fingerprint (order-sensitive). */
  @inline private def fpOf(hs: Array[Long], start: Int, len: Int): Long = {
    var fp = 0x9e3779b97f4a7c15L + len
    var i = start
    while (i < start + len) {
      fp = mix(fp ^ hs(i)) * 31 + 0x7f4a7c15
      i += 1
    }
    if (fp == 0L) 1L else fp
  }

  /** Stupid-backoff conditional score of token i given up to order-1
    * predecessors.
    */
  private def scoreToken(hs: Array[Long], i: Int): Double = {
    var n = math.min(order, i + 1)
    var backoff = 1.0
    while (n >= 2) {
      val num = lookup(n - 1, fpOf(hs, i - n + 1, n))
      if (num > 0) {
        val den = lookup(n - 2, fpOf(hs, i - n + 1, n - 1))
        if (den > 0) return backoff * num.toDouble / den
      }
      backoff *= alpha
      n -= 1
    }
    val uni = lookup(0, fpOf(hs, i, 1))
    // add-one smoothed unigram floor
    backoff * (uni + 1.0) / (totalUnigrams + vocabSize + 1.0)
  }

  /** Word-level perplexity of a document: exp(-mean log S). Lower = more
    * like the training corpus. Empty text → +inf (drop side).
    */
  def perplexity(text: String): Double = {
    val ws = PyText.splitWhitespace(PyText.lower(text))
    if (ws.isEmpty) return Double.PositiveInfinity
    val hs = ws.map(wordHash)
    var logSum = 0.0
    var i = 0
    while (i < ws.length) {
      logSum += math.log(scoreToken(hs, i))
      i += 1
    }
    math.exp(-logSum / ws.length)
  }

  def save(path: String): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.writeInt(0x4E474C4D) // "NGLM"
      out.writeInt(order); out.writeLong(vocabSize); out.writeLong(totalUnigrams)
      for (k <- 0 until order) {
        out.writeInt(keys(k).length)
        keys(k).foreach(out.writeLong)
        vals(k).foreach(out.writeLong)
      }
    } finally out.close()
  }
}

object NGramLM {

  def load(path: String): NGramLM = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path)))
    try {
      require(in.readInt() == 0x4E474C4D, s"$path is not an NGLM model")
      val order = in.readInt(); val vocab = in.readLong(); val total = in.readLong()
      val keys = new Array[Array[Long]](order)
      val vals = new Array[Array[Long]](order)
      for (k <- 0 until order) {
        val n = in.readInt()
        keys(k) = Array.fill(n)(in.readLong())
        vals(k) = Array.fill(n)(in.readLong())
      }
      new NGramLM(order, vocab, total, keys, vals)
    } finally in.close()
  }

  /** Count-based fit over a training corpus (deterministic). */
  def train(corpus: Seq[String], order: Int = 3): NGramLM = {
    val maps = Array.fill(order)(new java.util.HashMap[java.lang.Long, java.lang.Long]())
    var totalUnigrams = 0L
    val probe = new NGramLM(order, 0, 0, Array.fill(order)(Array(0L, 0L)), Array.fill(order)(Array(0L, 0L)))
    for (doc <- corpus) {
      val ws = PyText.splitWhitespace(PyText.lower(doc))
      val hs = ws.map(probe.wordHashExposed)
      for (n <- 1 to order; i <- 0 to ws.length - n) {
        val fp = probe.fpExposed(hs, i, n)
        maps(n - 1).merge(fp, 1L, (a, b) => a + b)
        if (n == 1) totalUnigrams += 1
      }
    }
    val keys = new Array[Array[Long]](order)
    val vals = new Array[Array[Long]](order)
    for (k <- 0 until order) {
      val m = maps(k)
      var cap = Integer.highestOneBit(math.max(16, m.size * 2 - 1)) * 2
      if (cap < m.size * 2) cap *= 2
      val ks = new Array[Long](cap)
      val vs = new Array[Long](cap)
      val mask = cap - 1
      m.forEach { (fp, c) =>
        var i = (mixStatic(fp) & mask).toInt
        while (ks(i) != 0L) i = (i + 1) & mask
        ks(i) = fp; vs(i) = c
      }
      keys(k) = ks; vals(k) = vs
    }
    new NGramLM(order, maps(0).size.toLong, totalUnigrams, keys, vals)
  }

  @inline private def mixStatic(h: Long): Long = {
    var x = h ^ (h >>> 33)
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  implicit private class Access(val m: NGramLM) extends AnyVal {
    def wordHashExposed(w: String): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < w.length) { h ^= w.charAt(i); h *= 0x100000001b3L; i += 1 }
      if (h == 0L) 1L else h
    }
    def fpExposed(hs: Array[Long], start: Int, len: Int): Long = {
      var fp = 0x9e3779b97f4a7c15L + len
      var i = start
      while (i < start + len) {
        fp = mixStatic(fp ^ hs(i)) * 31 + 0x7f4a7c15
        i += 1
      }
      if (fp == 0L) 1L else fp
    }
  }
}
