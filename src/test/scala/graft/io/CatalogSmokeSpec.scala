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

  test("overwrite-by-filter replaces only the matching slice") {
    val pages = Seq(
      ("http://a/1", "old en one", "en"),
      ("http://a/2", "body two", "de"),
      ("http://a/3", "old en three", "en")
    ).toDF("url", "text", "lang")
    val io = new CatalogTableIO("spark_catalog.default")
    try {
      io.write(pages, "pages_ow_smoke", partitionCols = Seq("lang"))
      // recompute the en slice only; the de row must survive untouched
      val fresh = Seq(("http://a/9", "new en", "en")).toDF("url", "text", "lang")
      io.overwriteWhere(fresh, "pages_ow_smoke", col("lang") === "en")
      val back = io.read(spark, "pages_ow_smoke")
      assert(back.count() == 2)
      assert(back.filter(col("lang") === "de").select("text").head.getString(0) == "body two")
      assert(back.filter(col("lang") === "en").select("url").head.getString(0) == "http://a/9")
      // column order of the incoming frame must not matter
      val shuffledCols = Seq(("fr", "nouvelle", "http://a/10")).toDF("lang", "text", "url")
      io.overwriteWhere(shuffledCols.select("url", "text", "lang"), "pages_ow_smoke",
        col("lang") === "fr")
      assert(io.read(spark, "pages_ow_smoke").count() == 3)
      // rows where the condition evaluates to NULL must SURVIVE the
      // overwrite (Iceberg deletes only cond=TRUE rows; the v1 fallback's
      // remainder filter must not let NULL swallow them)
      val nullLang = Seq(("http://a/11", "no lang", null.asInstanceOf[String]))
        .toDF("url", "text", "lang")
      io.append(nullLang, "pages_ow_smoke")
      io.overwriteWhere(Seq(("http://a/12", "new de", "de")).toDF("url", "text", "lang"),
        "pages_ow_smoke", col("lang") === "de")
      val after = io.read(spark, "pages_ow_smoke")
      assert(after.count() == 4)
      assert(after.filter(col("lang").isNull).count() == 1)
    } finally spark.sql("DROP TABLE IF EXISTS spark_catalog.default.pages_ow_smoke")
  }

  test("schema evolution: add-column then append; old rows read null") {
    val io = new CatalogTableIO("spark_catalog.default")
    try {
      io.write(Seq(("http://a/1", "body", "en")).toDF("url", "text", "lang"), "pages_evo_smoke")
      io.addColumns(spark, "pages_evo_smoke", "quality_score DOUBLE")
      io.append(Seq(("http://a/2", "scored", "de", 0.75))
        .toDF("url", "text", "lang", "quality_score"), "pages_evo_smoke")
      val back = io.read(spark, "pages_evo_smoke")
      assert(back.columns.toSeq == Seq("url", "text", "lang", "quality_score"))
      assert(back.filter(col("url") === "http://a/1").head.isNullAt(3))
      assert(back.filter(col("url") === "http://a/2")
        .select("quality_score").head.getDouble(0) == 0.75)
    } finally spark.sql("DROP TABLE IF EXISTS spark_catalog.default.pages_evo_smoke")
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
