package graft.multimodal

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear scoring-head artifact ("GLIN"): dim, bias, float32 weight
  * row, sigmoid flag — the slot the reference's aesthetic and NSFW
  * heads occupy (models/aesthetics.py:32-68 MLP over 768-dim CLIP
  * embeddings; models/nsfw.py:61-97 normalization→MLP→sigmoid). Real
  * exported weights drop into the same format at deploy time; the
  * committed tiny artifacts make scores exactly replayable. Loaded
  * once per executor JVM with classpath fallback.
  */
object LinearHead {

  private val Magic = 0x474C494E // "GLIN"

  final class Model(val dim: Int, val bias: Double, val weights: Array[Float],
                    val sigmoid: Boolean) extends Serializable {
    /** Dot product in double + bias (+ sigmoid for probability heads). */
    def score(x: Seq[Float]): Double = {
      var s = bias
      val n = math.min(dim, x.length)
      var d = 0
      while (d < n) { s += weights(d).toDouble * x(d); d += 1 }
      if (sigmoid) 1.0 / (1.0 + math.exp(-s)) else s
    }
  }

  def write(path: String, bias: Double, weights: Array[Float], sigmoid: Boolean): Unit = {
    val buf = ByteBuffer.allocate(4 + 4 + 8 + 1 + 4 * weights.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic).putInt(weights.length).putDouble(bias)
      .put(if (sigmoid) 1.toByte else 0.toByte)
    weights.foreach(buf.putFloat)
    Files.write(Paths.get(path), buf.array())
  }

  def read(path: String): Model = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(path))).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == Magic, s"$path is not a GLIN linear-head artifact")
    val dim = buf.getInt()
    val bias = buf.getDouble()
    val sigmoid = buf.get() != 0
    val w = new Array[Float](dim)
    var d = 0
    while (d < dim) { w(d) = buf.getFloat(); d += 1 }
    new Model(dim, bias, w, sigmoid)
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Model]()
  private[graft] def load(path: String): Model =
    cache.computeIfAbsent(path, p => read(graft.classify.Artifacts.resolve(p)))
}

/** ImageAestheticFilterStage contract
  * (stages/image/filters/aesthetic_filter.py:28-105): score each
  * image's embedding with the aesthetic head, store the score, KEEP
  * rows with score >= threshold (default 0.5). Pure map + filter —
  * fully pipelined at any scale.
  */
final case class ImageAestheticFilter(
    modelPath: String,
    scoreThreshold: Double = 0.5,
    embeddingCol: String = "embedding",
    scoreCol: String = "aesthetic_score") {

  def score(df: DataFrame): DataFrame = {
    val path = modelPath
    val u = udf((e: Seq[Float]) => if (e == null) 0.0 else LinearHead.load(path).score(e))
      .asNondeterministic() // score once; a pushed keep filter would re-run the head
    df.withColumn(scoreCol, u(col(embeddingCol)))
  }

  def apply(df: DataFrame): DataFrame = score(df).filter(col(scoreCol) >= scoreThreshold)
}

/** ImageNSFWFilterStage contract
  * (stages/image/filters/nsfw_filter.py:30-105): sigmoid probability
  * head, KEEP rows with score < threshold (high score = NSFW, dropped).
  */
final case class ImageNsfwFilter(
    modelPath: String,
    scoreThreshold: Double = 0.5,
    embeddingCol: String = "embedding",
    scoreCol: String = "nsfw_score") {

  def score(df: DataFrame): DataFrame = {
    val path = modelPath
    val u = udf((e: Seq[Float]) => if (e == null) 1.0 else LinearHead.load(path).score(e))
      .asNondeterministic()
    df.withColumn(scoreCol, u(col(embeddingCol)))
  }

  def apply(df: DataFrame): DataFrame = score(df).filter(col(scoreCol) < scoreThreshold)
}

object ImageFilters {

  /** Committed tiny aesthetic head: weight d+1 on dimension d, no
    * sigmoid — over the one-hot topic embeddings of
    * [[graft.sim.WordVecEmbedder.writeTinyArtifact]] the score of a
    * doc with topics {i, j} is exactly (i+j+2)/√2.
    */
  def writeTinyAestheticArtifact(path: String): Unit =
    LinearHead.write(path, bias = 0.0,
      weights = Array.tabulate(16)(d => (d + 1).toFloat), sigmoid = false)

  /** Committed tiny NSFW head: +4 on even dimensions, −4 on odd,
    * sigmoid — topic-parity pairs score 0.9965 / 0.5 / 0.0035.
    */
  def writeTinyNsfwArtifact(path: String): Unit =
    LinearHead.write(path, bias = 0.0,
      weights = Array.tabulate(16)(d => if (d % 2 == 0) 4f else -4f), sigmoid = true)
}
