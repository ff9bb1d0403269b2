package graft

import org.apache.spark.sql.SparkSession

/** Time individual catalog entries in isolation (twice each — the
  * second pass separates fixed JIT/planning ramp from steady-state).
  * Args: sfDir entryName [entryName...]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      val t1 = { val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      val t2 = { val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      println(f"[qt] $name cold=$t1%.2f s warm=$t2%.2f s")
    }
    spark.stop()
  }
}
