package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic text embedder — the executor-side EMBEDDER-STAGE shape
  * of the reference (the stages/text/embedders modules wrap sentence-transformers
  * on GPUs; out of scope offline) with a model-free feature-hashing
  * body: L2-normalized char-n-gram counts hashed into a fixed-dim
  * float vector. Near-identical texts land at cosine ≈ 1, unrelated
  * texts near 0, so the whole embedding-space pipeline (embed →
  * cluster → pairwise → dedup / ANN) runs end-to-end and a REAL model
  * plugs into the same `withEmbedding` slot (broadcast weights +
  * per-row inference — identical operator shape).
  */
object HashEmbedder {

  /** Embed one text: hashed char-{3,4}-gram counts, signed hashing
    * (feature-hashing trick), L2-normalized.
    */
  def embed(text: String, dim: Int = 64): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null || text.isEmpty) return v
    val t = text.toLowerCase(java.util.Locale.ROOT)
    var n = 3
    while (n <= 4) {
      var i = 0
      val limit = t.length - n
      while (i <= limit) {
        // FNV-1a over the window; bits 63..1 pick the bucket, bit 0 the sign
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + n) { h ^= t.charAt(j); h *= 0x100000001b3L; j += 1 }
        val idx = ((h >>> 1) % dim).toInt
        v(idx) += (if ((h & 1L) == 0L) 1f else -1f)
        i += 1
      }
      n += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** Append an embedding column (the embedder-stage contract). */
  def withEmbedding(df: DataFrame, textCol: String = "text",
                    outCol: String = "embedding", dim: Int = 64): DataFrame = {
    val u = udf((t: String) => embed(t, dim).toSeq)
    df.withColumn(outCol, u(col(textCol)).cast("array<float>"))
  }
}
