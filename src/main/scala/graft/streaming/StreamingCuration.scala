package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.pipeline.CurationPipeline

/** Structured-Streaming front end for the curation pipeline.
  *
  * The reference has no event-time streaming (Xenna "streaming mode" is
  * pipelined batch, backends/xenna/executor.py:105-116); this module is
  * the additional scale path: continuously curate newly-landed page files
  * and keep per-language keep/drop rates over event-time windows with a
  * watermark. All stateless curation steps reuse the exact batch
  * operators — one code path, two execution modes.
  */
object StreamingCuration {

  /** File-source stream of cc_pages-shaped parquet → curated stream. */
  def curatedStream(spark: SparkSession, inputDir: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val pages = spark.readStream.schema(schema).parquet(inputDir)
    CurationPipeline.curate(pages)
  }

  /** Event-time keep-rate per (window, lang) with a watermark — bounded
    * state, late rows beyond 1 hour dropped.
    */
  def keepRates(curated: DataFrame, tsCol: String = "warc_ts"): DataFrame =
    curated
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "10 minutes"), col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .select(col("window.start").as("window_start"), col("lang"), col("docs"), col("kept"))

  /** Streaming exact dedup: drop content-duplicate documents within the
    * watermark horizon. State is the set of (md5) keys seen inside the
    * watermark window — bounded by arrival rate × horizon, evicted by
    * the engine (dropDuplicatesWithinWatermark), unlike a plain
    * dropDuplicates whose state grows without bound. The batch analogue
    * is ExactDedup.removeDuplicates; on a stream "keep first arrival"
    * replaces "keep min id" (arrival order IS the precedence).
    */
  def dedupExactStream(pages: DataFrame, tsCol: String = "warc_ts",
                       textCol: String = "text", horizon: String = "1 hour"): DataFrame =
    pages
      .withColumn("_dup_hash", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("_dup_hash")
      .drop("_dup_hash")

  /** Write the kept documents as a parquet sink with checkpointing —
    * exactly-once file output; restarts resume from the checkpoint.
    */
  def writeKept(curated: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    CurationPipeline.keptOutput(curated)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
}
