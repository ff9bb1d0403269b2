package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Offline twin of IcebergSmokeSpec: drives the SAME CatalogTableIO
  * code path (DataFrameWriterV2 createOrReplace / append / catalog
  * read) against Spark's built-in session catalog with the parquet
  * provider, so the seam the Iceberg deploy relies on is executed in
  * every test run — not only on hosts that carry the Iceberg runtime
  * jar. Transform partitioning (days(ts)) is Iceberg-only and stays in
  * the env-gated spec; identity partitioning exercises the
  * partitionedBy branch here.
  */
class CatalogSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("CatalogTableIO write/read/append against the built-in session catalog") {
    val pages = Seq(
      ("http://a/1", "body one", "en"),
      ("http://a/2", "body two", "de")
    ).toDF("url", "text", "lang")

    val io = new CatalogTableIO("spark_catalog.default")
    try {
      io.write(pages, "pages_smoke")
      assert(io.read(spark, "pages_smoke").count() == 2)

      // createOrReplace must REPLACE, not append or fail
      io.write(pages.filter(col("lang") === "en"), "pages_smoke")
      assert(io.read(spark, "pages_smoke").count() == 1)

      io.write(pages, "pages_smoke")
      io.append(pages.filter(col("lang") === "en"), "pages_smoke")
      assert(io.read(spark, "pages_smoke").count() == 3)
      assert(io.read(spark, "pages_smoke").filter(col("lang") === "de").count() == 1)
    } finally spark.sql("DROP TABLE IF EXISTS spark_catalog.default.pages_smoke")
  }

  test("identity-partitioned catalog write prunes partitions at the scan") {
    val pages = Seq(
      ("http://a/1", "body one", "en"),
      ("http://a/2", "body two", "de"),
      ("http://a/3", "body three", "en")
    ).toDF("url", "text", "lang")

    val io = new CatalogTableIO("spark_catalog.default")
    try {
      io.write(pages, "pages_part_smoke", partitionCols = Seq("lang"))
      val byLang = io.read(spark, "pages_part_smoke").filter(col("lang") === "en")
      assert(byLang.count() == 2)
      // the filter must reach the scan as a NON-EMPTY partition filter
      // — a full scan with a post-scan predicate would still mention
      // "lang" in the plan text, so match the PartitionFilters list
      // itself
      val scanText = byLang.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*lang[^\\]]*\\]".r.findFirstIn(scanText).isDefined,
        s"expected lang inside a non-empty PartitionFilters list, got:\n$scanText")
    } finally spark.sql("DROP TABLE IF EXISTS spark_catalog.default.pages_part_smoke")
  }
}
