package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Sustained-throughput measurement: full curation over a 1M-doc
  * generated corpus at local[32] (BASELINE.md protocol).
  */
object SustainedRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(args(0))
    // warmup pass on a slice
    graft.pipeline.CurationPipeline.keptOutput(
      graft.pipeline.CurationPipeline.curate(corpus.limit(50000))).count()
    val t0 = System.nanoTime()
    val kept = graft.pipeline.CurationPipeline.keptOutput(
      graft.pipeline.CurationPipeline.curate(corpus)).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val total = corpus.count()
    println(f"[sustained] docs=$total kept=$kept wall=$sec%.1f s docs_per_s=${total / sec}%.0f")
    spark.stop()
  }
}
