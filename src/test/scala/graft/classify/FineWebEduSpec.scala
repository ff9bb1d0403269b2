package graft.classify

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** FineWebEdu contract (fineweb_edu.py:114-115): int_score =
  * round-half-EVEN(clip(score, 0, 5)), label thresholds the RAW score
  * at 2.5, filter_by over the label, max_chars truncation.
  */
class FineWebEduSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("fwe").resolve("m.bin").toString
    FineWebEdu.writeTinyArtifact(p)
    p
  }
  private val hi = FineWebEdu.HighMarker
  private val lo = FineWebEdu.LowMarker

  test("artifact round trip and linear scoring") {
    val m = FineWebEdu.read(path)
    assert(m.bias == 1.0)
    assert(m.score(s"$hi plain words") == 2.5)
    assert(m.score(s"$hi $hi $lo") == 3.0)
    assert(m.score("nothing known") == 1.0)
  }

  test("int_score is round-half-even of the clipped score; label thresholds the raw score") {
    val df = Seq(
      (1L, s"$hi x"),              // 2.5 -> int 2 (half-even), high_quality
      (2L, s"$hi $hi x"),          // 4.0 -> 4, high
      (3L, s"$hi $hi $hi x"),      // 5.5 -> clip 5, high
      (4L, s"$lo $lo $lo x"),      // -2.0 -> clip 0, low
      (5L, "x"),                   // 1.0 -> 1, low
      (6L, s"$hi $lo $lo x")       // 0.5 -> int 0 (rint(0.5)=0 half-even), low
    ).toDF("doc_id", "text")
    val out = FineWebEduClassifier(path).score(df)
      .orderBy("doc_id")
      .collect().map(r => (r.getString(2), r.getDouble(3), r.getInt(4)))
    assert(out(0) == ("high_quality", 2.5, 2))
    assert(out(1) == ("high_quality", 4.0, 4))
    assert(out(2) == ("high_quality", 5.5, 5))
    assert(out(3) == ("low_quality", -2.0, 0))
    assert(out(4) == ("low_quality", 1.0, 1))
    assert(out(5) == ("low_quality", 0.5, 0))
  }

  test("filter_by keeps only the listed labels; max_chars truncates before scoring") {
    val df = Seq((1L, s"$hi $hi a"), (2L, "b")).toDF("doc_id", "text")
    val kept = FineWebEduClassifier(path, filterBy = Seq("high_quality")).apply(df)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // marker beyond the char cutoff contributes nothing
    val longPrefix = "x " * 20
    val df2 = Seq((1L, s"$longPrefix$hi")).toDF("doc_id", "text")
    val scored = FineWebEduClassifier(path, maxChars = 10).score(df2).collect()(0)
    assert(scored.getDouble(3) == 1.0)
  }
}
