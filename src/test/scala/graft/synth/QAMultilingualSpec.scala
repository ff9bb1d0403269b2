package graft.synth

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class QAMultilingualSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("response post-processing strips model bolding, template formats {language}") {
    assert(QAMultilingual.processResponse("**Q: hi**\n*A: hello*") == "Q: hi\nA: hello")
    assert(QAMultilingual.processResponse("plain") == "plain")
    assert(QAMultilingual.formatPrompt("QA in {language}.", "Thai") == "QA in Thai.")
  }

  test("generate: one llm call per sample, language cycles deterministically") {
    val out = QAMultilingual.generate(spark, "Write a QA pair in {language}.",
      Seq("English", "German"), numSamples = 4,
      llm = p => s"**$p**")
    val rows = out.select("id", "language", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq("English", "German", "English", "German"))
    assert(rows.head._3 == "Write a QA pair in English.") // stars stripped
    // injected chooser overrides the default pick
    val fixed = QAMultilingual.generate(spark, "{language}", Seq("a", "b"), 2,
      llm = identity, chooseLanguage = _ => "Zulu")
    assert(fixed.select("language").distinct().head.getString(0) == "Zulu")
  }
}
