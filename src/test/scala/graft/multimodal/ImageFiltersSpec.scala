package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ImageFiltersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val aesArtifact = "src/main/resources/models/aesthetic_tiny.bin"
  private val nsfwArtifact = "src/main/resources/models/nsfw_tiny.bin"
  private val embArtifact = "src/main/resources/models/embed_tiny.bin"

  test("GLIN artifact roundtrip: bias + dot product, sigmoid flag") {
    val tmp = java.io.File.createTempFile("glin", ".bin").getPath
    LinearHead.write(tmp, bias = 1.5, weights = Array(2f, -1f, 0.5f), sigmoid = false)
    val m = LinearHead.read(tmp)
    assert(m.dim == 3 && m.bias == 1.5 && !m.sigmoid)
    assert(math.abs(m.score(Seq(1f, 2f, 4f)) - (1.5 + 2 - 2 + 2)) < 1e-9)

    LinearHead.write(tmp, bias = 0.0, weights = Array(1f), sigmoid = true)
    assert(math.abs(LinearHead.read(tmp).score(Seq(0f)) - 0.5) < 1e-12)
  }

  test("aesthetic keeps >= threshold, NSFW keeps strictly < threshold; null embedding drops") {
    val e = (i: Int, j: Int) => {
      val v = new Array[Float](16)
      v(i) = 0.70710677f; v(j) = 0.70710677f
      v.toSeq
    }
    val df = Seq(
      (1L, e(3, 11)),   // aes (4+12)/√2 = 11.31, nsfw both-odd 0.0035
      (2L, e(0, 8)),    // aes (1+9)/√2 = 7.07, nsfw both-even 0.9965
      (3L, e(0, 9)),    // aes (1+10)/√2 = 7.78, nsfw mixed EXACTLY 0.5
      (4L, null.asInstanceOf[Seq[Float]])
    ).toDF("id", "embedding")

    val aes = ImageAestheticFilter(aesArtifact, scoreThreshold = 10.0)
    assert(aes(df).select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    // null embedding scores 0.0 -> dropped by any positive threshold
    assert(aes.score(df).filter(col("id") === 4L).select("aesthetic_score").head.getDouble(0) == 0.0)

    val nsfw = ImageNsfwFilter(nsfwArtifact)
    val nsfwScores = nsfw.score(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(nsfwScores(3L) - 0.5) < 1e-15) // z = 4x - 4x = exact 0
    assert(nsfw(df).select("id").collect().map(_.getLong(0)).toSet == Set(1L)) // 0.5 is NOT < 0.5; null -> 1.0
  }

  test("reader -> embed -> score -> filter end to end over a fixture shard") {
    val mkSample = (id: Int, topics: (Int, Int)) =>
      (f"$id%06d", Map(
        "jpg" -> s"ztopic${topics._1} body ztopic${topics._2}".getBytes("UTF-8"),
        "json" -> s"""{"id":$id}""".getBytes("UTF-8")))
    val shardDir = java.nio.file.Files.createTempDirectory("wds").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$shardDir/shard0.tar"),
      WebDataset.buildShard(Seq(mkSample(1, (3, 11)), mkSample(2, (0, 8)), mkSample(3, (0, 9)))))

    val rows = WebDataset.read(spark, shardDir)
      .withColumn("decoded", col("jpg").cast("string"))
    val emb = graft.sim.WordVecEmbedder.withEmbedding(rows, embArtifact,
      textCol = "decoded", outCol = "embedding")
    val kept = ImageNsfwFilter(nsfwArtifact)(
      ImageAestheticFilter(aesArtifact, scoreThreshold = 10.0)(emb))
      .select("key").collect().map(_.getString(0)).toSeq
    assert(kept == Seq("000001"))
  }

  test("regenerating both head artifacts is byte-identical") {
    for ((committed, gen) <- Seq(
      (aesArtifact, ImageFilters.writeTinyAestheticArtifact(_)),
      (nsfwArtifact, ImageFilters.writeTinyNsfwArtifact(_))
    ): Seq[(String, String => Unit)]) {
      val tmp = java.io.File.createTempFile("glin", ".bin").getPath
      gen(tmp)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tmp)),
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(committed))))
    }
  }
}
