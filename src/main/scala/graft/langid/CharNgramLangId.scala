package graft.langid

import java.io.{DataInputStream, DataOutputStream, BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import graft.text.PyText

/** fastText-style language identifier: a linear classifier over hashed
  * character n-grams (the architecture of fastText's lid.176 — Joulin et
  * al. 2016, "Bag of Tricks for Efficient Text Classification").
  *
  * Matches the operator contract of the reference's FastTextLangId
  * (stages/text/filters/fasttext_filter.py:58-92): input text is
  * stripped and newlines become spaces, output is (top-1 language code
  * upper-cased, probability), keep iff probability ≥ 0.3.
  *
  * The model is a flat float array (buckets × classes log-odds) — cheap to
  * broadcast once per executor and read lock-free from all task threads.
  * Training is a deterministic multinomial Naive-Bayes fit (add-one
  * smoothing) so tests need no GPU, no downloads, and no RNG.
  */
final class CharNgramLangId(
    val labels: Array[String],
    val buckets: Int,
    val minN: Int,
    val maxN: Int,
    val weights: Array[Float],   // buckets * labels.length, log P(bucket|class)
    val priors: Array[Float]     // log P(class)
) extends Serializable {

  private val k = labels.length

  @inline private def bucketOf(h: Long): Int = {
    val m = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL
    (((m ^ (m >>> 33)) % buckets + buckets) % buckets).toInt
  }

  /** FNV-1a over the codepoints of an n-gram window. */
  @inline private def hashNgram(s: String, start: Int, end: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = start
    while (i < end) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Accumulate class log-scores over all char n-grams of the text. */
  def predict(rawText: String): (String, Double) = {
    val text = PyText.strip(rawText).replace('\n', ' ')
    val scores = new Array[Double](k)
    System.arraycopy(priors.map(_.toDouble), 0, scores, 0, k)
    var n = minN
    var ngrams = 0
    while (n <= maxN) {
      var i = 0
      val limit = text.length - n
      while (i <= limit) {
        val b = bucketOf(hashNgram(text, i, i + n))
        val base = b * k
        var c = 0
        while (c < k) { scores(c) += weights(base + c); c += 1 }
        ngrams += 1
        i += 1
      }
      n += 1
    }
    if (ngrams == 0) return (labels(0).toUpperCase(java.util.Locale.ROOT), 1.0 / k)
    // softmax over length-normalized log-joint (length-norm keeps the
    // temperature comparable across document sizes, as fastText does by
    // averaging ngram embeddings)
    var best = 0
    var c = 1
    while (c < k) { if (scores(c) > scores(best)) best = c; c += 1 }
    var denom = 0.0
    c = 0
    while (c < k) { denom += math.exp((scores(c) - scores(best)) / ngrams); c += 1 }
    (labels(best).toUpperCase(java.util.Locale.ROOT), 1.0 / denom)
  }

  def save(path: String): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.writeInt(0x4C494431) // "LID1"
      out.writeInt(labels.length)
      labels.foreach(out.writeUTF)
      out.writeInt(buckets); out.writeInt(minN); out.writeInt(maxN)
      priors.foreach(out.writeFloat)
      weights.foreach(out.writeFloat)
    } finally out.close()
  }
}

object CharNgramLangId {

  def load(path: String): CharNgramLangId = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path)))
    try {
      require(in.readInt() == 0x4C494431, s"$path is not a LID1 model")
      val k = in.readInt()
      val labels = Array.fill(k)(in.readUTF())
      val buckets = in.readInt(); val minN = in.readInt(); val maxN = in.readInt()
      val priors = Array.fill(k)(in.readFloat())
      val weights = Array.fill(buckets * k)(in.readFloat())
      new CharNgramLangId(labels, buckets, minN, maxN, weights, priors)
    } finally in.close()
  }

  /** Deterministic multinomial-NB training over hashed char n-grams. */
  def train(samples: Seq[(String, String)], buckets: Int = 1 << 16,
            minN: Int = 1, maxN: Int = 3): CharNgramLangId = {
    val labels = samples.map(_._1).distinct.sorted.toArray
    val k = labels.length
    val labelIdx = labels.zipWithIndex.toMap
    val counts = new Array[Double](buckets * k)
    val classTotals = new Array[Double](k)
    val classDocs = new Array[Double](k)

    val probe = new CharNgramLangId(labels, buckets, minN, maxN, new Array[Float](0), new Array[Float](0))
    for ((label, rawText) <- samples) {
      val c = labelIdx(label)
      classDocs(c) += 1
      val text = PyText.strip(rawText).replace('\n', ' ')
      var n = minN
      while (n <= maxN) {
        var i = 0
        val limit = text.length - n
        while (i <= limit) {
          val b = probe.hashExposed(text, i, i + n)
          counts(b * k + c) += 1
          classTotals(c) += 1
          i += 1
        }
        n += 1
      }
    }
    val weights = new Array[Float](buckets * k)
    var b = 0
    while (b < buckets) {
      var c = 0
      while (c < k) {
        weights(b * k + c) =
          math.log((counts(b * k + c) + 1.0) / (classTotals(c) + buckets)).toFloat
        c += 1
      }
      b += 1
    }
    val totalDocs = classDocs.sum
    val priors = classDocs.map(d => math.log((d + 1.0) / (totalDocs + k)).toFloat)
    new CharNgramLangId(labels, buckets, minN, maxN, weights, priors)
  }

  implicit private class HashAccess(val m: CharNgramLangId) extends AnyVal {
    def hashExposed(s: String, start: Int, end: Int): Int = {
      var h = 0xcbf29ce484222325L
      var i = start
      while (i < end) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      val mm = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL
      (((mm ^ (mm >>> 33)) % m.buckets + m.buckets) % m.buckets).toInt
    }
  }
}
