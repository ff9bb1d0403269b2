package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Stage-level timing of the embed->cluster->pairwise path at sf0.1
  * (the round-3 emb_text_neardup calibration work: fit dominates; the
  * embedder materializes once). Diagnostic main, not part of Bench.
  */
object ProfileEmb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // warmup whole path
    graft.dedup.SemanticDedup.nearDupPairs(
      graft.sim.HashEmbedder.withEmbedding(docs.limit(500)).select("doc_id","embedding"),
      k = 8, eps = 0.05, idCol = "doc_id").count()
    val emb = graft.sim.HashEmbedder.withEmbedding(docs).select("doc_id", "embedding")
    time("embed+checkpoint") { emb.localCheckpoint(true).count() }
    val mat = emb.localCheckpoint(true)
    time("fit(k=10)") { graft.dedup.SemanticDedup.fitModel(mat, 10); 0L }
    time("withBlocks") { graft.dedup.SemanticDedup.withBlocks(mat, 8, idCol="doc_id").count() }
    time("full nearDupPairs") { graft.dedup.SemanticDedup.nearDupPairs(emb, 8, 0.05, idCol="doc_id").count() }
    spark.stop()
  }
}
