package graft.sim

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Artifact-driven text embedder — the reference's embedder-stage
  * contract (stages/text/embedders/base.py:33-105: load a model once
  * per worker, mean-pool token vectors under the attention mask,
  * L2-normalize, append an embedding column) over a committed
  * word-vector artifact instead of a GPU sentence-transformer.
  *
  * The artifact is a flat binary table (magic "GEMB", dim, vocab size,
  * then word → float32[dim] rows) loaded ONCE per executor JVM through
  * the same classpath-or-filesystem resolution as the classifier
  * artifacts. Embedding = L2-normalized mean of the vectors of the
  * whitespace tokens found in the vocab (OOV tokens contribute
  * nothing, the way padding positions are masked out of the
  * reference's mean pooling); all-OOV text embeds to the zero vector.
  * A real exported embedding matrix (e.g. pruned word2vec/fastText
  * vectors) drops into the same file format at deploy time.
  *
  * 100 TB posture: pure map over a broadcast-sized artifact, fully
  * pipelined, no shuffle.
  */
object WordVecEmbedder {

  private val Magic = 0x47454D42 // "GEMB"

  final class Model(val dim: Int, val vectors: Map[String, Array[Float]]) extends Serializable {

    /** Mean-pool + L2-normalize (base.py:88-94 _mean_pooling). */
    def embed(text: String): Array[Float] = {
      val v = new Array[Float](dim)
      if (text == null || text.isEmpty) return v
      var n = 0
      text.split("\\s+").foreach { tok =>
        vectors.get(tok).foreach { row =>
          var d = 0
          while (d < dim) { v(d) += row(d); d += 1 }
          n += 1
        }
      }
      if (n == 0) return v
      var norm = 0.0
      var d = 0
      while (d < dim) { v(d) /= n; norm += v(d).toDouble * v(d); d += 1 }
      if (norm > 0) {
        val inv = (1.0 / math.sqrt(norm)).toFloat
        d = 0
        while (d < dim) { v(d) *= inv; d += 1 }
      }
      v
    }

    /** The reference's other pooling mode (base.py:96-105
      * _get_last_token): the L2-normalized vector of the LAST
      * non-padding token — here the last in-vocab token; all-OOV text
      * embeds to the zero vector.
      */
    def embedLastToken(text: String): Array[Float] = {
      val zero = new Array[Float](dim)
      if (text == null || text.isEmpty) return zero
      val last = text.split("\\s+").reverseIterator.flatMap(vectors.get).nextOption()
      last.fold(zero) { row =>
        var norm = 0.0
        var d = 0
        while (d < dim) { norm += row(d).toDouble * row(d); d += 1 }
        if (norm == 0) zero
        else {
          val inv = (1.0 / math.sqrt(norm)).toFloat
          val v = new Array[Float](dim)
          d = 0
          while (d < dim) { v(d) = row(d) * inv; d += 1 }
          v
        }
      }
    }
  }

  def write(path: String, dim: Int, vectors: Seq[(String, Array[Float])]): Unit = {
    val words = vectors.map(_._1.getBytes("UTF-8"))
    val len = 12 + vectors.map { case (w, _) => 4 + w.getBytes("UTF-8").length + 4 * dim }.sum
    val buf = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic).putInt(dim).putInt(vectors.size)
    vectors.zip(words).foreach { case ((_, vec), wb) =>
      require(vec.length == dim, s"vector length ${vec.length} != dim $dim")
      buf.putInt(wb.length).put(wb)
      vec.foreach(buf.putFloat)
    }
    Files.write(Paths.get(path), buf.array())
  }

  def read(path: String): Model = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(path))).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == Magic, s"$path is not a GEMB word-vector artifact")
    val dim = buf.getInt()
    val size = buf.getInt()
    val vectors = Map.newBuilder[String, Array[Float]]
    var i = 0
    while (i < size) {
      val wb = new Array[Byte](buf.getInt())
      buf.get(wb)
      val vec = new Array[Float](dim)
      var d = 0
      while (d < dim) { vec(d) = buf.getFloat(); d += 1 }
      vectors += new String(wb, "UTF-8") -> vec
      i += 1
    }
    new Model(dim, vectors.result())
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Model]()
  private def load(path: String): Model =
    cache.computeIfAbsent(path, p => read(graft.classify.Artifacts.resolve(p)))

  /** True iff `path` resolves (filesystem or classpath) to a GEMB
    * word-vector artifact — lets config entry points route a
    * model_identifier to this embedder and fall back to the GPU
    * sentence-transformer slot otherwise.
    */
  def isGembArtifact(path: String): Boolean =
    path.nonEmpty && (try {
      val resolved = graft.classify.Artifacts.resolve(path)
      val in = Files.newInputStream(Paths.get(resolved))
      try {
        // readNBytes, not read: a legal short read must not misroute a
        // valid artifact to the fallback embedder
        val b = in.readNBytes(4)
        b.length == 4 &&
          ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt() == Magic
      } finally in.close()
    } catch { case _: Exception => false })

  /** Append an embedding column (embedder-stage contract; the
    * reference's default output field is `embeddings`, pooling
    * `mean_pooling` | `last_token` — base.py:41).
    */
  def withEmbedding(df: DataFrame, modelPath: String, textCol: String = "text",
                    outCol: String = "embeddings",
                    pooling: String = "mean_pooling"): DataFrame = {
    require(pooling == "mean_pooling" || pooling == "last_token",
      s"unknown pooling mode: $pooling")
    val path = modelPath
    val lastTok = pooling == "last_token"
    // nondeterministic: embeddings feed downstream filters/joins —
    // never re-embed below a pushed predicate
    val u = udf((t: String) => {
      val m = load(path)
      (if (lastTok) m.embedLastToken(t) else m.embed(t)).toSeq
    }).asNondeterministic()
    df.withColumn(outCol, u(col(textCol)).cast("array<float>"))
  }

  /** Committed tiny artifact: 16 orthogonal one-hot topic vectors — a
    * doc mentioning topics {i, j} embeds to (e_i + e_j)/√2, so pair
    * cosines are exactly 1.0 (both topics shared), 0.5 (one), or 0.0
    * (none): SQL-replayable near-dup structure.
    */
  def writeTinyArtifact(path: String): Unit = {
    val dim = 16
    write(path, dim, (0 until dim).map { i =>
      val v = new Array[Float](dim); v(i) = 1f
      s"ztopic$i" -> v
    })
  }
}
