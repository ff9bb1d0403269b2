package graft.langid

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal reader/writer for the fastText binary model format, so a
  * production deployment can load real artifacts (e.g. a language-ID or
  * quality classifier the reference loads via the fasttext package,
  * filters/fasttext_filter.py:69-77) without conversion.
  *
  * Format (public, from the fastText C++ sources — FastText::saveModel /
  * Dictionary::save / DenseMatrix::save; all fields little-endian):
  *
  *   int32 magic = 793712314, int32 version = 12
  *   args: 11 × int32 (dim ws epoch minCount neg wordNgrams loss model
  *         bucket minn maxn lrUpdateRate) … loss/model are enums; then
  *         double t
  *   dictionary: int32 size, int32 nwords, int32 nlabels, int64 ntokens,
  *         int64 pruneidxSize, then `size` entries of
  *         (NUL-terminated word bytes, int64 count, int8 type)
  *   int8 quantInput, input matrix: int64 rows, int64 cols, rows×cols f32
  *   int8 qout,       output matrix: int64 rows, int64 cols, rows×cols f32
  *
  * Scope: supervised / non-quantized models (quant flags must be 0 —
  * quantized models raise with a clear message). Inference reproduces
  * fastText's predict pipeline: whitespace tokens + EOS, vocab lookup,
  * char-subword buckets for OOV (Dictionary::computeSubwords), word
  * n-gram buckets (Dictionary::addWordNgrams), mean of input rows,
  * output matrix product, softmax.
  */
object FastTextBin {

  val Magic = 793712314
  val Version = 12

  val EOS = "</s>"
  val BOW = "<"
  val EOW = ">"

  final case class Args(dim: Int, ws: Int, epoch: Int, minCount: Int, neg: Int,
                        wordNgrams: Int, loss: Int, model: Int, bucket: Int,
                        minn: Int, maxn: Int, lrUpdateRate: Int, t: Double)

  /** type 0 = word, 1 = label (entry_type in the C++ dictionary). */
  final case class Entry(word: String, count: Long, entryType: Byte)

  /** fastText's FNV-1a over UTF-8 bytes (Dictionary::hash), uint32
    * arithmetic carried in a Long masked to 32 bits.
    */
  def hash(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = 2166136261L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ bytes(i).toLong) & 0xffffffffL // int8_t cast then uint32 xor
      h = (h * 16777619L) & 0xffffffffL
      i += 1
    }
    h
  }

  final class Model(val args: Args, val vocab: Array[Entry],
                    val input: Array[Array[Float]], val output: Array[Array[Float]])
      extends Serializable {

    val nwords: Int = vocab.count(_.entryType == 0)
    val labels: Array[String] = vocab.filter(_.entryType == 1).map(_.word)
    private val wordIds: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      vocab.zipWithIndex.foreach { case (e, i) => m.put(e.word, i) }
      m
    }

    /** Dictionary::computeSubwords — char n-grams (UTF-8-boundary aware)
      * of BOW+word+EOW hashed into the bucket rows after the vocab rows.
      */
    def subwordIds(token: String): Seq[Int] = {
      if (args.maxn <= 0 || args.bucket <= 0) return Nil
      val word = (BOW + token + EOW).getBytes("UTF-8")
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < word.length) {
        if ((word(i) & 0xC0) != 0x80) {
          val ngram = new java.io.ByteArrayOutputStream()
          var j = i
          var n = 1
          while (j < word.length && n <= args.maxn) {
            ngram.write(word(j)); j += 1
            while (j < word.length && (word(j) & 0xC0) == 0x80) { ngram.write(word(j)); j += 1 }
            if (n >= args.minn && !(n == 1 && (i == 0 || j == word.length))) {
              val h = hashBytes(ngram.toByteArray) % args.bucket
              out += (nwords + h.toInt)
            }
            n += 1
          }
        }
        i += 1
      }
      out.toSeq
    }

    private def hashBytes(bytes: Array[Byte]): Long = {
      var h = 2166136261L
      var i = 0
      while (i < bytes.length) {
        h = (h ^ bytes(i).toLong) & 0xffffffffL
        h = (h * 16777619L) & 0xffffffffL
        i += 1
      }
      h
    }

    /** Dictionary::getLine + addWordNgrams: input-row ids for a line. */
    def lineIds(text: String): Seq[Int] = {
      val tokens = text.split("[ \t\n\r\u000B\f\u0000]+").filter(_.nonEmpty) :+ EOS
      val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
      val wordHashes = scala.collection.mutable.ArrayBuffer.empty[Long]
      tokens.foreach { tok =>
        val wid = wordIds.get(tok)
        if (wid != null && vocab(wid).entryType == 0) {
          // addSubwords(known): maxn<=0 -> the word row alone; else the
          // word row + its subword rows (getSubwords precomputes both).
          // EOS is excluded: Dictionary::initNgrams skips
          // computeSubwords for EOS, so real .bin artifacts never carry
          // '<</s>>' char-ngram rows
          ids += wid
          if (args.maxn > 0 && tok != EOS) ids ++= subwordIds(tok)
          wordHashes += hash(tok)
        } else if (wid == null) {
          // OOV word: subword rows only
          if (tok != EOS) ids ++= subwordIds(tok)
          wordHashes += hash(tok)
        } // known labels are not input features
      }
      // addWordNgrams: h = h*116049371 + next. C++ stores the uint32
      // token hash in an int32 vector and SIGN-EXTENDS it into uint64
      // (Dictionary::addWordNgrams takes std::vector<int32_t>) — mirror
      // that with .toInt.toLong or buckets diverge for hashes >= 2^31
      if (args.wordNgrams > 1 && args.bucket > 0) {
        var i = 0
        while (i < wordHashes.length) {
          var h = wordHashes(i).toInt.toLong
          var j = i + 1
          while (j < math.min(wordHashes.length, i + args.wordNgrams)) {
            h = h * 116049371L + wordHashes(j).toInt.toLong
            ids += (nwords + java.lang.Long.remainderUnsigned(h, args.bucket.toLong).toInt)
            j += 1
          }
          i += 1
        }
      }
      ids.toSeq
    }

    /** Mean of input rows (Model::computeHidden). */
    def sentenceVector(text: String): Array[Float] = {
      val ids = lineIds(text)
      val v = new Array[Float](args.dim)
      if (ids.isEmpty) return v
      ids.foreach { id =>
        val row = input(id)
        var d = 0
        while (d < args.dim) { v(d) += row(d); d += 1 }
      }
      var d = 0
      while (d < args.dim) { v(d) /= ids.length; d += 1 }
      v
    }

    /** Top-1 (label, probability) — softmax over output · hidden. */
    def predict(text: String): (String, Double) = {
      val probs = predictAll(text)
      probs.maxBy(_._2)
    }

    def predictAll(text: String): Seq[(String, Double)] = {
      val h = sentenceVector(text)
      val scores = output.map { row =>
        var s = 0.0
        var d = 0
        while (d < args.dim) { s += row(d) * h(d); d += 1 }
        s
      }
      val mx = scores.max
      val exps = scores.map(s => math.exp(s - mx))
      val z = exps.sum
      labels.toIndexedSeq.zip(exps.map(_ / z))
    }
  }

  def read(path: String): Model = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(path))).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == Magic, s"not a fastText model (magic $magic)")
    val version = buf.getInt()
    require(version <= Version, s"unsupported fastText version $version")
    val args = Args(buf.getInt(), buf.getInt(), buf.getInt(), buf.getInt(), buf.getInt(),
      buf.getInt(), buf.getInt(), buf.getInt(), buf.getInt(), buf.getInt(), buf.getInt(),
      buf.getInt(), buf.getDouble())
    // predictAll assumes flat softmax (output rows == nlabels); a
    // hierarchical-softmax model stores Huffman tree rows and would be
    // silently mis-zipped into garbage — reject it loudly
    require(args.loss == 3,
      s"only softmax-loss supervised models are supported (loss enum ${args.loss})")
    val size = buf.getInt(); val nwords = buf.getInt(); val nlabels = buf.getInt()
    buf.getLong() // ntokens
    val pruneidxSize = buf.getLong()
    require(pruneidxSize <= 0, "pruned dictionaries not supported")
    val vocab = Array.fill(size) {
      val sb = new java.io.ByteArrayOutputStream()
      var b = buf.get()
      while (b != 0) { sb.write(b); b = buf.get() }
      val count = buf.getLong()
      val tpe = buf.get()
      Entry(new String(sb.toByteArray, "UTF-8"), count, tpe)
    }
    require(vocab.count(_.entryType == 0) == nwords && vocab.count(_.entryType == 1) == nlabels,
      "dictionary type counts disagree with header")
    def matrix(): Array[Array[Float]] = {
      val quant = buf.get()
      require(quant == 0, "quantized (.ftz) models not supported — use the non-quantized .bin")
      val rows = buf.getLong().toInt
      val cols = buf.getLong().toInt
      Array.fill(rows) { val r = new Array[Float](cols); var i = 0; while (i < cols) { r(i) = buf.getFloat(); i += 1 }; r }
    }
    val input = matrix()
    val out = matrix()
    new Model(args, vocab, input, out)
  }

  /** Writer — primarily for fixture generation in tests; emits the same
    * byte layout `read` consumes (and real fastText can load).
    */
  def write(path: String, args: Args, vocab: Array[Entry],
            input: Array[Array[Float]], output: Array[Array[Float]]): Unit = {
    val vocabBytes = vocab.map(e => e.word.getBytes("UTF-8"))
    val dictLen = vocabBytes.map(_.length + 1 + 8 + 1).sum
    val matLen = (m: Array[Array[Float]]) => 1 + 16 + m.length * (if (m.isEmpty) 0 else m(0).length) * 4
    val buf = ByteBuffer.allocate(8 + 12 * 4 + 8 + 12 + 16 + dictLen + matLen(input) + matLen(output))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic).putInt(Version)
    buf.putInt(args.dim).putInt(args.ws).putInt(args.epoch).putInt(args.minCount)
      .putInt(args.neg).putInt(args.wordNgrams).putInt(args.loss).putInt(args.model)
      .putInt(args.bucket).putInt(args.minn).putInt(args.maxn).putInt(args.lrUpdateRate)
      .putDouble(args.t)
    buf.putInt(vocab.length).putInt(vocab.count(_.entryType == 0)).putInt(vocab.count(_.entryType == 1))
    buf.putLong(vocab.map(_.count).sum).putLong(0L)
    vocab.zip(vocabBytes).foreach { case (e, wb) =>
      buf.put(wb).put(0.toByte).putLong(e.count).put(e.entryType)
    }
    def putMatrix(m: Array[Array[Float]]): Unit = {
      buf.put(0.toByte).putLong(m.length.toLong).putLong(if (m.isEmpty) 0L else m(0).length.toLong)
      m.foreach(_.foreach(buf.putFloat))
    }
    putMatrix(input)
    putMatrix(output)
    Files.write(Paths.get(path), java.util.Arrays.copyOf(buf.array(), buf.position()))
  }
}
