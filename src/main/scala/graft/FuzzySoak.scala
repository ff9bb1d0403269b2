package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Fuzzy-dedup soak + scaling probe: MinHash+LSH+CC removal ids over a
  * generated corpus at a chosen parallelism (BASELINE.md protocol).
  */
object FuzzySoak {
  def main(args: Array[String]): Unit = {
    val corpusPath = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(corpusPath)
      .withColumn("doc_id", xxhash64(col("url")))
      .select("doc_id", "text")
    val t0 = System.nanoTime()
    val removed = graft.dedup.MinHashLSH.removalIds(corpus).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val docs = corpus.count()
    // same-moment host-interference context (see HostCanary scaladoc):
    // a wall measured while the canary reads < ~0.85 is host-degraded
    val canary = HostCanary.efficiency()
    println(f"[fuzzy] cores=$cpus docs=$docs removed=$removed wall=$sec%.1f s docs_per_s=${docs / sec}%.0f host_canary=$canary%.3f")
    spark.stop()
  }
}
