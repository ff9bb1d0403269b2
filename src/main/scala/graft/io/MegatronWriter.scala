package graft.io

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Megatron-LM indexed-dataset writer — the training-stack export path
  * (reference io/writer/megatron_tokenizer.py:35-240). Produces the
  * `.bin` (concatenated token ids, little-endian) + `.idx`
  * (MMIDIDX header, version, dtype code, sequence lengths/pointers,
  * document indices) pair Megatron's IndexedDataset mmaps directly.
  *
  * Spark-first: one `.bin`/`.idx` pair per PARTITION via mapPartitions —
  * the exact sharding the reference gets from one pair per
  * DocumentBatch task. Tokenization is a pluggable `String =>
  * Array[Int]` (the reference loads an HF tokenizer; offline the
  * hash-vocab whitespace/BPE-ish tokenizers plug the same slot). Token
  * width follows the vocab: uint16 when vocabSize <= 65536 (dtype code
  * 8), int32 otherwise (dtype code 4).
  */
object MegatronWriter {

  val IndexHeader: Array[Byte] = "MMIDIDX".getBytes("ISO-8859-1") ++ Array[Byte](0, 0)

  final case class ShardStats(path: String, docs: Long, tokens: Long)

  /** Tokenize `textCol` and write one .bin/.idx shard per partition under
    * `outDir` (created if needed). Returns per-shard stats (small — one
    * row per partition).
    */
  def write(df: DataFrame, textCol: String, outDir: String,
            tokenize: String => Array[Int], vocabSize: Int,
            appendEod: Boolean = false, eodTokenId: Int = -1): Seq[ShardStats] = {
    require(!appendEod || eodTokenId >= 0, "appendEod requires eodTokenId")
    Files.createDirectories(Paths.get(outDir))
    val tokenSize = if (vocabSize > 65536) 4 else 2
    import df.sparkSession.implicits._
    df.select(col(textCol).cast("string")).as[String].mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val prefix = f"$outDir/part-$pid%05d"
      val stats = writeShard(rows, prefix, tokenize, tokenSize, appendEod, eodTokenId)
      Iterator.single(stats)
    }.collect().toSeq.filter(_.docs > 0)
  }

  /** Write one shard from an iterator of documents (executor-side). */
  def writeShard(docs: Iterator[String], prefix: String,
                 tokenize: String => Array[Int], tokenSize: Int,
                 appendEod: Boolean, eodTokenId: Int): ShardStats = {
    val lengths = scala.collection.mutable.ArrayBuffer.empty[Int]
    val bin = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(prefix + ".bin"), 1 << 16))
    try {
      docs.foreach { text =>
        val base = tokenize(if (text == null) "" else text)
        val tokens = if (appendEod) base :+ eodTokenId else base
        lengths += tokens.length
        val buf = ByteBuffer.allocate(tokens.length * tokenSize).order(ByteOrder.LITTLE_ENDIAN)
        if (tokenSize == 2) tokens.foreach { t =>
          // masking would silently corrupt the exported dataset — fail
          // fast on any id the uint16 width cannot represent
          require(t >= 0 && t <= 0xffff,
            s"token id $t does not fit uint16 — use vocabSize > 65536 for the int32 path")
          buf.putShort(t.toShort)
        }
        else tokens.foreach(buf.putInt)
        bin.write(buf.array())
      }
    } finally bin.close()
    writeIdx(prefix + ".idx", lengths.toArray, tokenSize)
    ShardStats(prefix, lengths.length.toLong, lengths.map(_.toLong).sum)
  }

  /** .idx layout (megatron_tokenizer.py:245-283 / Megatron-LM
    * indexed_dataset.py): header, version=1 (u64), dtype code (u8),
    * sequence count (u64), document count (u64), i32 sequence lengths,
    * i64 sequence byte pointers, i64 document indices 0..n.
    */
  def writeIdx(path: String, lengths: Array[Int], tokenSize: Int): Unit = {
    val n = lengths.length
    val buf = ByteBuffer.allocate(IndexHeader.length + 8 + 1 + 8 + 8 + n * 4 + n * 8 + (n + 1) * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(IndexHeader)
    buf.putLong(1L)
    buf.put((if (tokenSize == 4) 4 else 8).toByte)
    buf.putLong(n.toLong)
    buf.putLong((n + 1).toLong)
    lengths.foreach(buf.putInt)
    var ptr = 0L
    lengths.foreach { l => buf.putLong(ptr); ptr += l.toLong * tokenSize }
    (0 to n).foreach(i => buf.putLong(i.toLong))
    Files.write(Paths.get(path), buf.array())
  }

  /** Read one shard back (tests / spot checks): the per-document token
    * id sequences.
    */
  def readShard(prefix: String): Seq[Array[Int]] = {
    val idx = ByteBuffer.wrap(Files.readAllBytes(Paths.get(prefix + ".idx")))
      .order(ByteOrder.LITTLE_ENDIAN)
    val header = new Array[Byte](IndexHeader.length)
    idx.get(header)
    require(java.util.Arrays.equals(header, IndexHeader), "bad MMIDIDX header")
    require(idx.getLong() == 1L, "unsupported idx version")
    val dtypeCode = idx.get()
    val tokenSize = if (dtypeCode == 4) 4 else 2
    val n = idx.getLong().toInt
    idx.getLong() // document count = n + 1
    val lengths = Array.fill(n)(idx.getInt())
    val pointers = Array.fill(n)(idx.getLong())
    val bin = ByteBuffer.wrap(Files.readAllBytes(Paths.get(prefix + ".bin")))
      .order(ByteOrder.LITTLE_ENDIAN)
    lengths.zip(pointers).map { case (len, ptr) =>
      bin.position(ptr.toInt)
      Array.fill(len)(if (tokenSize == 2) bin.getShort() & 0xffff else bin.getInt())
    }.toSeq
  }

  /** Hash-vocab whitespace tokenizer — the offline stand-in for an HF
    * tokenizer: stable ids via xxhash-style mixing of each token into
    * [0, vocabSize).
    */
  def hashTokenizer(vocabSize: Int): String => Array[Int] = { text =>
    graft.text.PyText.splitWhitespace(text).map { w =>
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < w.length) { h ^= w.charAt(i); h *= 0x100000001b3L; i += 1 }
      h ^= h >>> 33
      (java.lang.Long.remainderUnsigned(h, vocabSize.toLong)).toInt
    }
  }
}
