package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.ConcurrentHashMap

/** Scratch dissection of the fuzzy pipeline's bucket+edges stage (the
  * one ProfileFuzzy shows NOT scaling 8->32): times the fused chain
  * exactly as MinHashLSH runs it, with a per-stage task-time listener
  * to separate skew from serialized resources.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val corpusPath = args(0)
    val cpus = args(1).toInt
    val sp = if (args.length > 2) args(2).toInt else cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sp)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.MinHashLSH

    val taskMax = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    val taskSum = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    val gcSum = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    val taskN = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = lock.synchronized {
        val sid = e.stageId
        val d = e.taskInfo.duration
        taskMax(sid) = Math.max(taskMax(sid), d)
        taskSum(sid) += d
        if (e.taskMetrics != null) gcSum(sid) += e.taskMetrics.jvmGCTime
        taskN(sid) += 1
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = lock.synchronized {
        val s = e.stageInfo
        val sid = s.stageId
        val wall = (s.completionTime.getOrElse(0L) - s.submissionTime.getOrElse(0L)) / 1000.0
        println(f"[stage] id=$sid name=${s.name.takeWhile(_ != '\n').take(40)}%-40s tasks=${taskN(sid)} wall=$wall%5.1f s taskSum=${taskSum(sid) / 1000.0}%6.1f s taskMax=${taskMax(sid) / 1000.0}%5.1f s gcSum=${gcSum(sid) / 1000.0}%6.1f s")
      }
    })

    val corpus = spark.read.parquet(corpusPath)
      .withColumn("doc_id", xxhash64(col("url")))
      .select("doc_id", "text")
    val sigs = MinHashLSH.signatures(corpus).localCheckpoint(true)
    sigs.count()
    val bands = MinHashLSH.bands(sigs).localCheckpoint(true)
    bands.count()
    println("[probe] --- fused chain starts ---")

    val t0 = System.nanoTime()
    val n = bands.groupBy("band", "band_hash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "transform(slice(ids, 1, size(ids) - 1), (x, i) -> struct(x as src, ids[i + 1] as dst))"
      )).as("e")).select(col("e.src"), col("e.dst")).distinct().count()
    println(f"[probe] cpus=$cpus sp=$sp fused_bucket_edges=${(System.nanoTime() - t0) / 1e9}%.1f s edges=$n")

    println("[probe] --- window-lag variant ---")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "band_hash").orderBy("doc_id")
    val t1 = System.nanoTime()
    val n2 = bands
      .withColumn("src", lag(col("doc_id"), 1).over(w))
      .filter(col("src").isNotNull)
      .select(col("src"), col("doc_id").as("dst"))
      .distinct().count()
    println(f"[probe] cpus=$cpus sp=$sp lag_bucket_edges=${(System.nanoTime() - t1) / 1e9}%.1f s edges=$n2")
    Thread.sleep(500)
    spark.stop()
  }
}
