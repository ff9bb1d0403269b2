package graft.classify

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FineWebEdu-contract classifier
  * (stages/text/classifiers/fineweb_edu.py): a REGRESSION score per
  * document with the reference's exact output contract —
  * `float_score` (raw model output), `int_score` =
  * round(clip(score, 0, 5)) with Python's round-half-EVEN, and
  * `preds` = "high_quality" iff score ≥ 2.5 (fineweb_edu.py:114-115)
  * — plus filter_by over the label and max_chars truncation
  * (base ClassifierStage contract).
  *
  * The reference drives a DeBERTa regression head on GPUs; offline
  * this loads a linear bag-of-words artifact (score = bias + Σ
  * token-weights) through the same operator shape: per-JVM model
  * cache, per-row scoring, no training collect anywhere. 100 TB
  * posture: pure map, model loaded once per executor JVM.
  */
final case class FineWebEduClassifier(
    modelPath: String,
    labelField: String = "preds",
    floatScoreField: String = "float_score",
    intScoreField: String = "int_score",
    textField: String = "text",
    filterBy: Seq[String] = Nil,
    maxChars: Int = 0) {

  def score(df: DataFrame): DataFrame = {
    val path = modelPath
    val mc = maxChars
    val u = udf((t: String) => {
      if (t == null) null
      else {
        val clipped = if (mc > 0 && t.length > mc) t.substring(0, mc) else t
        val s = FineWebEdu.load(path).score(clipped)
        // int_score/label per fineweb_edu.py:114-115: round-half-even
        // clip to [0,5]; threshold 2.5 on the RAW score
        val i = math.rint(math.max(0.0, math.min(s, 5.0))).toInt
        val label = if (s >= 2.5) "high_quality" else "low_quality"
        (label, s, i)
      }
    })
    df.withColumn("_fw", u(col(textField)))
      .withColumn(labelField, col("_fw._1"))
      .withColumn(floatScoreField, col("_fw._2"))
      .withColumn(intScoreField, col("_fw._3"))
      .drop("_fw")
  }

  /** score + filter_by on the predicted label (empty = scoring only). */
  def apply(df: DataFrame): DataFrame = {
    val scored = score(df)
    if (filterBy.isEmpty) scored else scored.filter(col(labelField).isin(filterBy: _*))
  }
}

object FineWebEdu {

  /** Linear bag-of-words regression artifact: score = bias + Σ w(token)
    * over whitespace tokens (unknown tokens contribute 0).
    */
  final case class Model(bias: Double, weights: Map[String, Double]) extends Serializable {
    def score(text: String): Double = {
      var s = bias
      for (tok <- graft.text.PyText.splitWhitespace(text)) s += weights.getOrElse(tok, 0.0)
      s
    }
  }

  private val Magic = "GFWE1"

  def write(path: String, model: Model): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path))))
    try {
      out.writeBytes(Magic)
      out.writeDouble(model.bias)
      out.writeInt(model.weights.size)
      for ((w, v) <- model.weights.toSeq.sortBy(_._1)) {
        val b = w.getBytes(StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b); out.writeDouble(v)
      }
    } finally out.close()
  }

  def read(path: String): Model = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(path))))
    try {
      val magic = new Array[Byte](Magic.length)
      in.readFully(magic)
      require(new String(magic, StandardCharsets.US_ASCII) == Magic, s"bad artifact magic in $path")
      val bias = in.readDouble()
      val n = in.readInt()
      val weights = Map.newBuilder[String, Double]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        weights += new String(b, StandardCharsets.UTF_8) -> in.readDouble()
        i += 1
      }
      Model(bias, weights.result())
    } finally in.close()
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Model]()
  private[classify] def load(path: String): Model =
    cache.computeIfAbsent(path, p => read(Artifacts.resolve(p)))

  /** Marker tokens of the committed tiny artifact (predictions on
    * constructed input are exactly SQL-expressible: score =
    * 1.0 + 1.5·count(high marker) − 1.0·count(low marker)).
    */
  val HighMarker = "zeduhighz"
  val LowMarker = "zedulowz"

  /** Deterministic tiny artifact (committed at
    * src/main/resources/models/fineweb_tiny.bin).
    */
  def writeTinyArtifact(path: String): Unit =
    write(path, Model(bias = 1.0, weights = Map(HighMarker -> 1.5, LowMarker -> -1.0)))
}
