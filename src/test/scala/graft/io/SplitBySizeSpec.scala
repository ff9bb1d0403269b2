package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SplitBySizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("rewrites one large parquet into several near-target files, content-equal") {
    val dir = java.nio.file.Files.createTempDirectory("split").toString
    spark.range(0, 20000)
      .select(col("id"), sha2(col("id").cast("string"), 256).as("payload"))
      .coalesce(1).write.parquet(s"$dir/in")
    SplitBySize.rewrite(spark, s"$dir/in", s"$dir/out", targetSizeMb = 1)
    val outFiles = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(outFiles.length > 1, s"expected a split, got ${outFiles.length} file(s)")
    // every output file stays in the target's ballpark (2x slack for
    // encoding-ratio drift between the sampled and rewritten files)
    assert(outFiles.forall(_.length < 2L * 1024 * 1024))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 20000)
    assert(back.agg(sum(col("id"))).head.getLong(0) == 20000L * 19999 / 2)

    // in-place rewrite is refused — Overwrite would delete the source
    // before the lazy scan runs
    intercept[IllegalArgumentException] {
      SplitBySize.rewrite(spark, s"$dir/in", s"$dir/in", 1)
    }
    intercept[IllegalArgumentException] {
      SplitBySize.rewrite(spark, s"$dir/in", s"$dir/in/nested", 1)
    }
  }
}
