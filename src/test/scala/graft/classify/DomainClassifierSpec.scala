package graft.classify

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class DomainClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val domArtifact = "src/main/resources/models/domain_tiny.bin"
  private val ctArtifact = "src/main/resources/models/content_tiny.bin"

  test("committed domain artifact carries the 26-label taxonomy and filter_by works verbatim") {
    val m = graft.langid.FastTextBin.read(domArtifact)
    assert(m.labels.toSeq == DomainClassifier.DomainLabels)
    assert(m.labels.length == 26)

    val docs = Seq(
      (1L, "zdomzsports match report from last night"),
      (2L, "zdomzgames speedrun leaderboard update"),
      (3L, "zdomzfinance quarterly earnings analysis"),
      (4L, "no marker at all here")
    ).toDF("doc_id", "text")

    // the reference docs' own example: filter_by=["Games", "Sports"]
    val kept = DomainClassifier(domArtifact, filterBy = Seq("Games", "Sports"))(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))

    val preds = DomainClassifier(domArtifact, scoreField = Some("domain_prob")).score(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3))).toMap
    assert(preds(3L)._1 == "Finance")
    assert(math.abs(preds(1L)._2 - math.exp(5) / (math.exp(5) + 25)) < 1e-9)
    // marker-less text scores 0 everywhere -> deterministic first label
    assert(preds(4L)._1 == DomainClassifier.DomainLabels.head)
  }

  test("multilingual variant shares the taxonomy under its own default column") {
    val docs = Seq((1L, "zdomznews aktuelle nachrichten")).toDF("doc_id", "text")
    val out = MultilingualDomainClassifier(domArtifact).score(docs)
    assert(out.columns.contains("multilingual_domain_pred"))
    assert(out.select("multilingual_domain_pred").head.getString(0) == "News")
  }

  test("content-type classifier: 11 labels, max_chars 5000 truncation, prob constant") {
    val m = graft.langid.FastTextBin.read(ctArtifact)
    assert(m.labels.length == 11)
    assert(m.labels.toSeq == DomainClassifier.ContentTypeFixtureLabels)
    assert(m.labels.contains("Blogs") && m.labels.contains("News"))

    val beyondCap = ("x " * 3000) + "zctznews" // marker at char ~6000 > 5000 cap
    val docs = Seq((1L, "zctzreviews two stars would not recommend"),
      (2L, beyondCap)).toDF("doc_id", "text")
    val out = ContentTypeClassifier(ctArtifact, scoreField = Some("content_prob")).score(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == "Reviews")
    assert(math.abs(out(1L)._2 - math.exp(5) / (math.exp(5) + 10)) < 1e-9)
    assert(out(2L)._1 == DomainClassifier.ContentTypeFixtureLabels.head) // marker truncated away
  }

  test("regenerating both artifacts is byte-identical to the committed files") {
    for ((committed, gen) <- Seq(
      (domArtifact, DomainClassifier.writeTinyDomainArtifact(_)),
      (ctArtifact, DomainClassifier.writeTinyContentTypeArtifact(_))
    ): Seq[(String, String => Unit)]) {
      val tmp = java.io.File.createTempFile("tiny", ".bin").getPath
      gen(tmp)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tmp)),
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(committed))))
    }
  }
}
