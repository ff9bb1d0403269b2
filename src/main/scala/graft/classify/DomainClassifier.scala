package graft.classify

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain / content-type classifier stages with the reference's
  * DistributedDataClassifier contract (classifiers/base.py:151-228;
  * domain.py:29-77, content_type.py:28-78): label_field, optional
  * score_field, text_field, filter_by, max_chars, argmax over a
  * per-class score. The reference drives GPU DeBERTa models whose
  * LABEL SET is read from the model artifact at setup (base.py:125-126
  * sorts `config.label2id` — labels are data, never code); offline
  * these load a linear fastText `.bin` artifact through the same shape
  * and likewise take their labels from the artifact dictionary. The
  * artifact swaps at deploy time. 100 TB posture: pure map, model
  * loaded once per executor JVM, fully pipelined.
  */
final case class DomainClassifier(
    modelPath: String,
    labelField: String = "domain_pred",
    scoreField: Option[String] = None,
    textField: String = "text",
    filterBy: Seq[String] = Nil,
    maxChars: Int = 2000) {

  def score(df: DataFrame): DataFrame =
    QualityClassifier.scoreWith(df, modelPath, labelField, scoreField, textField, maxChars)

  def apply(df: DataFrame): DataFrame =
    QualityClassifier.keepLabels(score(df), labelField, filterBy)
}

/** domain.py:80-129 — same contract and taxonomy over 52 languages;
  * only the default output column (and the deploy artifact) differ.
  */
final case class MultilingualDomainClassifier(
    modelPath: String,
    labelField: String = "multilingual_domain_pred",
    scoreField: Option[String] = None,
    textField: String = "text",
    filterBy: Seq[String] = Nil,
    maxChars: Int = 2000) {

  def score(df: DataFrame): DataFrame =
    QualityClassifier.scoreWith(df, modelPath, labelField, scoreField, textField, maxChars)

  def apply(df: DataFrame): DataFrame =
    QualityClassifier.keepLabels(score(df), labelField, filterBy)
}

/** content_type.py:28-78 — 11 speech types, max_chars 5000. */
final case class ContentTypeClassifier(
    modelPath: String,
    labelField: String = "content_pred",
    scoreField: Option[String] = None,
    textField: String = "text",
    filterBy: Seq[String] = Nil,
    maxChars: Int = 5000) {

  def score(df: DataFrame): DataFrame =
    QualityClassifier.scoreWith(df, modelPath, labelField, scoreField, textField, maxChars)

  def apply(df: DataFrame): DataFrame =
    QualityClassifier.keepLabels(score(df), labelField, filterBy)
}

object DomainClassifier {

  /** The published 26-domain taxonomy of nvidia/domain-classifier
    * (model-card id2label order). The committed tiny artifact carries
    * exactly these labels so `filter_by=["Games","Sports"]` — the
    * reference docs' own example — works verbatim.
    */
  val DomainLabels: Seq[String] = Seq(
    "Adult", "Arts_and_Entertainment", "Autos_and_Vehicles", "Beauty_and_Fitness",
    "Books_and_Literature", "Business_and_Industrial", "Computers_and_Electronics",
    "Finance", "Food_and_Drink", "Games", "Health", "Hobbies_and_Leisure",
    "Home_and_Garden", "Internet_and_Telecom", "Jobs_and_Education",
    "Law_and_Government", "News", "Online_Communities", "People_and_Society",
    "Pets_and_Animals", "Real_Estate", "Science", "Sensitive_Subjects", "Shopping",
    "Sports", "Travel_and_Transportation")

  /** FIXTURE speech-type taxonomy for the committed tiny content-type
    * artifact: 11 labels matching the card's class count, including
    * the two the reference's own docs cite ("Blogs", "News" —
    * distributed-classifier.md:322 and the content-type tutorial). The
    * real label set ships inside the deploy artifact's dictionary and
    * is read from there, never from code — swapping the artifact swaps
    * the taxonomy.
    */
  val ContentTypeFixtureLabels: Seq[String] = Seq(
    "Analysis", "Blogs", "Boilerplate", "Conversational", "Creative_Writing",
    "Instructional", "Legal", "News", "Promotional", "Reviews", "Speeches")

  /** Per-label marker token the tiny artifacts respond to. */
  def markerFor(prefix: String, label: String): String =
    prefix + label.toLowerCase(java.util.Locale.ROOT).replace("_", "")

  /** Deterministic k-class tiny artifact: one marker word per label,
    * marker i carries weight 10 on dimension i, label row i reads
    * dimension i — so a text containing exactly one marker predicts
    * that label with probability e^5 / (e^5 + k - 1) (hidden = mean of
    * the marker row and the zero EOS row), and marker-less text
    * deterministically scores 0 everywhere (argmax = first label).
    * Unknown words contribute nothing (bucket=0, maxn=0), so
    * predictions on constructed input are exactly SQL-expressible.
    */
  def writeTinyArtifact(path: String, labels: Seq[String], markerPrefix: String): Unit = {
    import graft.langid.FastTextBin._
    val k = labels.size
    val args = Args(dim = k, ws = 5, epoch = 5, minCount = 1, neg = 5, wordNgrams = 1,
      loss = 3, model = 3, bucket = 0, minn = 0, maxn = 0, lrUpdateRate = 100, t = 1e-4)
    // labels stored RAW (no fastText __label__ prefix): this contract
    // mirrors the DeBERTa classifiers, whose config.label2id keys are
    // the bare taxonomy strings the user passes to filter_by
    val vocab = (Entry(EOS, 2, 0) +:
      labels.map(l => Entry(markerFor(markerPrefix, l), 1, 0)).toArray) ++
      labels.map(l => Entry(l, 1, 1))
    val zero = new Array[Float](k)
    val input = zero +: labels.indices.map { i =>
      val r = new Array[Float](k); r(i) = 10f; r
    }.toArray
    val output = labels.indices.map { i =>
      val r = new Array[Float](k); r(i) = 1f; r
    }.toArray
    write(path, args, vocab, input, output)
  }

  def writeTinyDomainArtifact(path: String): Unit =
    writeTinyArtifact(path, DomainLabels, "zdomz")

  def writeTinyContentTypeArtifact(path: String): Unit =
    writeTinyArtifact(path, ContentTypeFixtureLabels, "zctz")
}
