package graft.classify

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val artifact = "src/main/resources/models/quality_tiny.bin"

  test("committed artifact scores deterministically and filter_by keeps only matching labels") {
    val docs = Seq(
      (1L, s"${QualityClassifier.TinyMarker} long informative page body"),
      (2L, "spammy low grade page body"),
      (3L, s"another ${QualityClassifier.TinyMarker} page"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")

    val scored = QualityClassifier(artifact).score(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3))).toMap
    assert(scored(1L)._1 == "__label__hq" && scored(1L)._2 > 0.99)
    assert(scored(3L)._1 == "__label__hq")
    assert(scored(2L)._1 == "__label__lq" && scored(2L)._2 > 0.5)
    assert(scored(4L)._1 == "") // null text -> empty label, never crashes

    val kept = QualityClassifier(artifact, filterBy = Seq("__label__hq"))(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("max_chars truncation applies before scoring (marker beyond the cap is invisible)") {
    val long = ("x " * 4000) + QualityClassifier.TinyMarker // marker at char ~8000
    val docs = Seq((1L, long)).toDF("doc_id", "text")
    val capped = QualityClassifier(artifact, maxChars = 6000).score(docs)
      .select("quality_pred").head.getString(0)
    assert(capped == "__label__lq")
    val uncapped = QualityClassifier(artifact, maxChars = 0).score(docs)
      .select("quality_pred").head.getString(0)
    assert(uncapped == "__label__hq")
  }

  test("artifact resolves from the classpath when the CWD-relative file is absent") {
    // a path that exists in no working directory, but whose
    // src/main/resources/ suffix IS a classpath resource
    val ghost = s"/nonexistent/deploy/root/$artifact"
    val resolved = Artifacts.resolve(ghost)
    assert(resolved != ghost && java.nio.file.Files.exists(java.nio.file.Paths.get(resolved)))
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(resolved)),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(artifact))))
    // second resolve returns the cached extraction, and scoring through
    // the ghost path works end to end
    assert(Artifacts.resolve(ghost) == resolved)
    val pred = QualityClassifier(ghost)
      .score(Seq((1L, s"${QualityClassifier.TinyMarker} body")).toDF("doc_id", "text"))
      .select("quality_pred").head.getString(0)
    assert(pred == "__label__hq")
    intercept[java.io.FileNotFoundException](Artifacts.resolve("no/such/resource.bin"))
  }

  test("regenerating the artifact is byte-identical to the committed file") {
    val tmp = java.io.File.createTempFile("qtiny", ".bin").getPath
    QualityClassifier.writeTinyArtifact(tmp)
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tmp))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(artifact))
    assert(java.util.Arrays.equals(a, b))
  }
}
