package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall breakdown of the fuzzy-dedup pipeline at a chosen
  * parallelism — the diagnostic twin of [[FuzzySoak]] (which times only
  * the end-to-end job). Each phase is forced with a count() so the wall
  * attribution is per stage, at the cost of recomputing upstream work
  * (signatures are localCheckpointed once to keep attribution honest).
  */
object ProfileFuzzy {
  def main(args: Array[String]): Unit = {
    val corpusPath = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.{ConnectedComponents, MinHashLSH}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }

    val splits = if (args.length > 2) args(2).toInt else 0
    val raw = spark.read.parquet(corpusPath)
      .withColumn("doc_id", xxhash64(col("url")))
      .select("doc_id", "text")
    // Materialize the (optionally re-split) corpus up front so the
    // signatures timing is pure compute — no parquet decode, and the
    // wave-packing effect of the split count is directly measurable.
    val corpus = t("scan") {
      val c = (if (splits > 0) raw.repartition(splits) else raw).localCheckpoint(true)
      c.count()
      c
    }
    val sigs = t("signatures") {
      MinHashLSH.signatures(corpus).localCheckpoint(true)
    }
    val bands = t("bands")(MinHashLSH.bands(sigs).localCheckpoint(true))
    // Same lag()-window chain-edge construction as the production path
    // (MinHashLSH.candidateEdges) so this stage's wall matches what
    // removalIds actually runs — just applied to the checkpointed bands.
    val edges = t("bucket+edges") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("band", "band_hash").orderBy("doc_id")
      bands.withColumn("src", lag(col("doc_id"), 1).over(w))
        .filter(col("src").isNotNull)
        .select(col("src"), col("doc_id").as("dst"))
        .distinct()
        .localCheckpoint(true)
    }
    println(s"[profile] edges=${edges.count()}")
    val comps = t("components")(ConnectedComponents.run(edges).localCheckpoint(true))
    t("removal-filter") {
      comps.filter(col("id") =!= col("component")).count()
    }
    spark.stop()
  }
}
