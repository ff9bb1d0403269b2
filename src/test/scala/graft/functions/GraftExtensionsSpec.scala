package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("cosine_similarity registers and resolves from SQL") {
    // the shared test session predates the extension; apply the same
    // descriptor the extension injects
    val (id, info, builder) = GraftExtensions.cosineSimilarityDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val r = spark.sql(
      """SELECT cosine_similarity(cast(array(1.0, 0.0) AS array<float>),
        |                         cast(array(1.0, 0.0) AS array<float>)) AS s""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-9)
    val wrongArity = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(cast(array(1.0) AS array<float>))").collect()
    }
    assert(wrongArity.getMessage.contains("2 arguments") ||
      wrongArity.getMessage.toLowerCase.contains("invalid"), wrongArity.getMessage)
  }
}
