package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def df = Seq(
    (1L, Seq(1f, 0f, 0f), Seq(1f, 0f, 0f)),      // identical -> 1.0
    (2L, Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),      // orthogonal -> 0.0
    (3L, Seq(1f, 2f, 3f), Seq(-1f, -2f, -3f)),   // opposite -> -1.0
    (4L, Seq(0f, 0f, 0f), Seq(1f, 1f, 1f)),      // zero norm -> -1.0 sentinel
    (5L, Seq(1f, 2f), Seq(1f, 2f, 3f))           // size mismatch -> -1.0 sentinel
  ).toDF("id", "a", "b")
    .withColumn("a", col("a").cast("array<float>"))
    .withColumn("b", col("b").cast("array<float>"))

  test("native expression matches the scalar implementation on all regimes") {
    val rows = df.withColumn("sim", CosineSimilarity(col("a"), col("b")))
      .select("id", "sim").as[(Long, Double)].collect().toMap
    assert(math.abs(rows(1L) - 1.0) < 1e-9)
    assert(math.abs(rows(2L)) < 1e-9)
    assert(math.abs(rows(3L) + 1.0) < 1e-9)
    assert(rows(4L) == -1.0 && rows(5L) == -1.0)
    // bit-identical to the Seq implementation (same accumulation order)
    val seqs = Seq((Seq(0.3f, -0.7f, 0.11f), Seq(0.9f, 0.2f, -0.4f)))
    val expr = seqs.toDF("a", "b")
      .withColumn("a", col("a").cast("array<float>"))
      .withColumn("b", col("b").cast("array<float>"))
      .select(CosineSimilarity(col("a"), col("b"))).as[Double].head()
    assert(expr == graft.sim.Knn.cosine(seqs.head._1, seqs.head._2))
  }

  test("null inputs yield SQL null (nullSafe binary expression)") {
    val withNull = Seq((1L, Some(Seq(1f, 2f)), None: Option[Seq[Float]]))
      .toDF("id", "a", "b")
      .withColumn("a", col("a").cast("array<float>"))
      .withColumn("b", col("b").cast("array<float>"))
    val r = withNull.select(CosineSimilarity(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("wrong input types are rejected at analysis") {
    val bad = Seq((1, "x")).toDF("i", "s")
    val ex = intercept[Exception] {
      bad.select(CosineSimilarity(col("i"), col("s"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("cosine") ||
      ex.getMessage.toLowerCase.contains("data type"), ex.getMessage)
  }

  test("stays inside whole-stage codegen (no UDF boundary in the plan)") {
    // a LocalTableScan folds the projection eagerly — materialize to
    // parquet so the plan has a real scan + codegen'd project
    val dir = java.nio.file.Files.createTempDirectory("cossim").toString
    df.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).withColumn("sim", CosineSimilarity(col("a"), col("b")))
    val plan = q.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a whole-stage-codegen'd operator; the
    // expression must sit inside one, with no UDF eval boundary
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("cosine_similarity")), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    assert(q.count() == 5)
  }
}
