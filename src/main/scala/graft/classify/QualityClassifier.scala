package graft.classify

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.langid.FastTextBin

/** Quality-classifier stage with the reference's classifier contract
  * (stages/text/classifiers/base.py:66-228 — label_field, score_field,
  * text_field, filter_by, max_chars; quality.py:28-80 for the quality
  * instance). The reference drives a DeBERTa GPU model; offline this
  * loads a linear fastText `.bin` artifact through the same shape —
  * per-JVM model cache (one load per executor), per-row scoring, the
  * artifact swaps at deploy time, and NO training collect anywhere in
  * the scoring path. 100 TB posture: pure map, model loaded once per
  * executor JVM, fully pipelined.
  */
final case class QualityClassifier(
    modelPath: String,
    labelField: String = "quality_pred",
    scoreField: Option[String] = Some("quality_prob"),
    textField: String = "text",
    filterBy: Seq[String] = Nil,
    maxChars: Int = 6000) {

  /** Add label (+ optional probability) columns. */
  def score(df: DataFrame): DataFrame =
    QualityClassifier.scoreWith(df, modelPath, labelField, scoreField, textField, maxChars)

  /** score + filter_by (base.py: keep rows whose predicted label is in
    * the list; empty list = scoring only).
    */
  def apply(df: DataFrame): DataFrame =
    QualityClassifier.keepLabels(score(df), labelField, filterBy)
}

object QualityClassifier {
  /** filter_by: keep rows whose predicted label is in the list (empty
    * list = scoring only) — shared by every categorical contract.
    */
  private[classify] def keepLabels(df: DataFrame, labelField: String,
                                   labels: Seq[String]): DataFrame =
    if (labels.isEmpty) df else df.filter(col(labelField).isin(labels: _*))

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, FastTextBin.Model]()
  private def load(path: String): FastTextBin.Model =
    cache.computeIfAbsent(path, p => FastTextBin.read(Artifacts.resolve(p)))

  /** Shared scoring core for every DistributedDataClassifier-shaped
    * contract (quality / domain / content-type): per-JVM model cache,
    * max_chars truncation before tokenization (base.py:139-147),
    * top-1 (label, probability) per row.
    */
  private[classify] def scoreWith(df: DataFrame, modelPath: String, labelField: String,
                                  scoreField: Option[String], textField: String,
                                  maxChars: Int): DataFrame = {
    val path = modelPath
    val mc = maxChars
    val u = udf((t: String) => {
      if (t == null) ("", 0.0)
      else {
        val clipped = if (mc > 0 && t.length > mc) t.substring(0, mc) else t
        load(path).predict(clipped)
      }
    }).asNondeterministic() // expensive model call: evaluate once, never below pushed filters
    val scored = df.withColumn("_pred", u(col(textField)))
      .withColumn(labelField, col("_pred._1"))
    scoreField.fold(scored)(f => scored.withColumn(f, col("_pred._2"))).drop("_pred")
  }

  /** The committed tiny artifact's marker token. */
  val TinyMarker = "zqualityzmarkerz"

  /** Deterministic tiny artifact (committed at
    * src/main/resources/models/quality_tiny.bin): predicts __label__hq
    * with high confidence iff the text contains [[TinyMarker]] — the
    * marker input row dominates the weak-negative EOS prior. Unknown
    * words contribute nothing (bucket=0, maxn=0), so predictions are
    * exactly SQL-expressible: hq ⇔ contains(text, marker).
    */
  def writeTinyArtifact(path: String): Unit = {
    import FastTextBin._
    val args = Args(dim = 4, ws = 5, epoch = 5, minCount = 1, neg = 5, wordNgrams = 1,
      loss = 3, model = 3, bucket = 0, minn = 0, maxn = 0, lrUpdateRate = 100, t = 1e-4)
    val vocab = Array(Entry(EOS, 2, 0), Entry(TinyMarker, 1, 0),
      Entry("__label__hq", 1, 1), Entry("__label__lq", 1, 1))
    val input = Array(Array(-0.1f, 0f, 0f, 0f), Array(10f, 0f, 0f, 0f))
    val output = Array(Array(1f, 0f, 0f, 0f), Array(-1f, 0f, 0f, 0f))
    write(path, args, vocab, input, output)
  }
}
