package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** WebDataset shard reading: contiguous same-key members collapse to
  * one sample, absent extensions are null, one streaming task per
  * shard.
  */
class WebDatasetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("shard round trip: grouped members, missing parts null, order preserved") {
    val shard = WebDataset.buildShard(Seq(
      "000001" -> Map("jpg" -> Array[Byte](1, 2, 3), "json" -> """{"w":640}""".getBytes("UTF-8"),
        "txt" -> "a caption".getBytes("UTF-8")),
      "000002" -> Map("jpg" -> Array[Byte](9), "txt" -> "no json".getBytes("UTF-8")),
      "000003" -> Map("json" -> "{}".getBytes("UTF-8"))))
    val dir = java.nio.file.Files.createTempDirectory("wds")
    java.nio.file.Files.write(dir.resolve("shard-000.tar"), shard)

    val rows = WebDataset.read(spark, dir.toString).orderBy("key").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "000001" && rows(0).getString(1) == "shard-000.tar")
    assert(rows(0).getAs[Array[Byte]]("jpg").toSeq == Seq[Byte](1, 2, 3))
    assert(rows(0).getString(3) == """{"w":640}""")
    assert(rows(0).getString(4) == "a caption")
    assert(rows(1).isNullAt(3) && rows(1).getString(4) == "no json")
    assert(rows(2).isNullAt(2) && rows(2).getString(3) == "{}")
  }

  test("webdataset keys split at the FIRST dot and include the directory prefix") {
    val shard = WebDataset.buildShard(Seq(
      "d1/0001" -> Map("jpg" -> Array[Byte](1), "metadata.json" -> "{}".getBytes("UTF-8"),
        "txt" -> "cap".getBytes("UTF-8")),
      "d2/0001" -> Map("jpg" -> Array[Byte](2))))
    val dir = java.nio.file.Files.createTempDirectory("wds2")
    java.nio.file.Files.write(dir.resolve("s.tar"), shard)
    val rows = WebDataset.read(spark, dir.toString).orderBy("key").collect()
    // d1/0001's three members are ONE sample (the dotted
    // `.metadata.json` extension doesn't fragment it), and the same
    // basename in another directory is a DIFFERENT sample
    assert(rows.map(_.getString(0)).toSeq == Seq("d1/0001", "d2/0001"))
    assert(rows(0).getString(4) == "cap")
    assert(rows(0).isNullAt(3)) // compound ext doesn't match the json column
    assert(rows(1).getAs[Array[Byte]]("jpg").toSeq == Seq[Byte](2))
  }

  test("duplicate-removal by id parquet is the existing anti-join (image dedup removal stage)") {
    import spark.implicits._
    val images = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "payload")
    val removals = Seq("b").toDF("id")
    // ImageDuplicatesRemovalStage (image/deduplication/removal.py):
    // drop rows whose id is in the removal parquet — left_anti
    val kept = images.join(removals, Seq("id"), "left_anti")
    assert(kept.select("id").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "c"))
  }
}
