package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Cross-checks the embedding-cosine near-dup pair set against the
  * exact token-Jaccard verified set at sf0.01 (driver gate scale:
  * must be EQUAL) and sf0.1 (metrics diverge by a handful of pairs —
  * hashed-ngram cosine >= 0.95 vs token-J >= 0.5 disagree near their
  * thresholds; documented, not a clustering miss). Diagnostic main.
  */
object CheckPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = graft.sim.HashEmbedder.withEmbedding(docs).select("doc_id", "embedding")
      val sem = graft.dedup.SemanticDedup.nearDupPairs(emb, 8, 0.05, idCol = "doc_id")
        .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sem2 = graft.dedup.SemanticDedup.nearDupPairs(emb, 8, 0.05, idCol = "doc_id", probes = 2)
        .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val jac = graft.dedup.MinHashLSH.verifiedPairs(docs, minJaccard = 0.5)
        .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"$dir sem=${sem.size} jac=${jac.size} equal=${sem == jac} missing=${(jac -- sem).take(5)} extra=${(sem -- jac).take(5)}")
      println(s"$dir probes=2: sem=${sem2.size} missing=${(jac -- sem2).size} (boundary splits recovered: ${(sem2 -- sem).size})")
    }
    spark.stop()
  }
}
