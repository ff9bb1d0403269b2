package graft
import org.apache.spark.sql.SparkSession
/** One-off generator for resume-drill corpora (kept out of Bench). */
object DrillGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.fixtures.CCPages.generate(spark, args(0).toLong, partitions = if (args.length > 2) args(2).toInt else 16)
      .write.mode("overwrite").parquet(args(1))
    spark.stop()
  }
}
