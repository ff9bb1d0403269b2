package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Live crash/resume drill for the fuzzy-dedup cache_path contract
  * ([[graft.dedup.FuzzyCheckpoint]]): run the checkpointed removal over
  * a generated corpus, printing which stage tables were already
  * committed in the cache before this run. Protocol (BASELINE.md):
  * a control run on a fresh cache records count + xorhash; a drill run
  * is SIGKILLed mid-stage and rerun on the same cache — the rerun must
  * report the completed stages as cached, recompute only the rest, and
  * land the identical xorhash.
  */
object FuzzyCkptDrill {
  def main(args: Array[String]): Unit = {
    val corpusPath = args(0)
    val cachePath = args(1)
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val io = new graft.io.ManifestParquetIO(cachePath)
    val cached = Seq("minhashes", "edges", "components").filter(io.committedTable)
    println(s"[ckpt-drill] pre-run cached stages: ${if (cached.isEmpty) "none" else cached.mkString(",")}")

    val corpus = spark.read.parquet(corpusPath)
      .withColumn("doc_id", xxhash64(col("url")))
      .select("doc_id", "text")
    val t0 = System.nanoTime()
    val removal = graft.dedup.FuzzyCheckpoint.removalIds(corpus, graft.dedup.MinHashLSH.Params(), cachePath)
    val agg = removal.agg(count("*").as("n"),
      // order-independent fingerprint of the removal id set
      expr("bit_xor(xxhash64(doc_id))").as("xh")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[ckpt-drill] cores=$cpus removed=${agg.getLong(0)} xorhash=${agg.getLong(1)} wall=$sec%.1f s host_canary=${HostCanary.efficiency()}%.3f")
    spark.stop()
  }
}
