package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The image tutorial's dedup flow
  * (tutorials/image/getting-started/image_dedup_example.py) over the
  * ported stages: webdataset shards → reader → (decode stub) →
  * embedder → semantic-dedup removal ids → duplicates-removal
  * anti-join → writer — CLIP weights being the documented deploy swap
  * (the committed word-vector artifact fills the embedder slot).
  */
class ImagePipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("dedup pipeline end to end: shards -> embed -> semantic dedup -> removal -> writer") {
    // 12 images over 3 shards; ids 3k and 3k+1 carry the SAME payload
    // topics (identical embeddings = planted near-dups), 3k+2 distinct
    val dir = java.nio.file.Files.createTempDirectory("imgpipe").toString
    (0 until 3).foreach { s =>
      val members = (0 until 4).map { i =>
        val id = s * 4 + i
        // ids 4s and 4s+1 share a topic pair (identical embeddings =
        // the planted dup); 4s+2 / 4s+3 get their own disjoint topics
        val text = if (i < 2) s"ztopic${4 * s % 16} ztopic${(4 * s + 1) % 16}"
          else s"ztopic${(4 * s + i) % 16}"
        (f"img$id%05d", Map("jpg" -> text.getBytes("UTF-8")))
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(f"$dir/shard-$s%05d.tar"),
        WebDataset.buildShard(members))
    }

    // reader (one task per shard) + decode stub (UTF-8 payload)
    val rows = WebDataset.read(spark, s"$dir/*.tar")
      .select(col("key").as("image_id"), col("jpg"))
      .withColumn("decoded", col("jpg").cast("string"))
    assert(rows.count() == 12)

    // embedder slot: committed GEMB artifact
    val emb = graft.sim.WordVecEmbedder.withEmbedding(rows,
      modelPath = "src/main/resources/models/embed_tiny.bin",
      textCol = "decoded", outCol = "embedding")

    // semantic dedup removal over the embedding column (numeric ids)
    val withVid = emb.withColumn("vec_id",
      substring(col("image_id"), 4, 5).cast("long"))
    val removed = graft.dedup.SemanticDedup.removalIdsRanked(
      withVid.select("vec_id", "embedding"), k = 4, eps = 0.1)
    // each shard's identical pair loses one member -> 3 removals
    assert(removed.count() == 3)

    // ImageDuplicatesRemovalStage = the shared left_anti pattern
    val kept = withVid.join(removed, Seq("vec_id"), "left_anti")
    assert(kept.count() == 9)

    // writer: surviving images to fresh shards + sidecars
    val out = java.nio.file.Files.createTempDirectory("imgpipe_out").toString
    val meta = ImageWriter.write(
      kept.repartition(1).sortWithinPartitions("image_id"), out, imagesPerTar = 4)
    assert(meta.count() == 9)
    assert(WebDataset.read(spark, s"$out/*.tar").count() == 9)
  }
}
