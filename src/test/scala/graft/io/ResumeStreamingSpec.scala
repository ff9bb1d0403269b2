package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.streaming.StreamingCuration
import java.nio.file.Files

class ResumeStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("checkpointed run resumes exactly: committed units are skipped, output equals single-run") {
    val root = Files.createTempDirectory("tableio").toString
    val io = new ManifestParquetIO(root)
    val df = spark.range(0, 100).withColumn("unit", (col("id") % 4).cast("string"))

    def process(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("doubled", col("id") * 2)

    // first run "crashes" after two units: simulate by pre-committing units 0,1
    io.runCheckpointed(df.filter(col("unit").isin("0", "1")), "unit", "out")(process)
    assert(io.committedUnits("out") == Set("0", "1"))

    // resume processes only units 2,3
    io.runCheckpointed(df, "unit", "out")(process)
    assert(io.committedUnits("out") == Set("0", "1", "2", "3"))

    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 100)
    assert(out.agg(sum("doubled")).head.getLong(0) == (0L until 100L).map(_ * 2).sum)

    // idempotent: a third run does nothing new
    val manifestLines = Files.readAllLines(java.nio.file.Paths.get(s"$root/out_manifest.jsonl")).size
    io.runCheckpointed(df, "unit", "out")(process)
    assert(Files.readAllLines(java.nio.file.Paths.get(s"$root/out_manifest.jsonl")).size == manifestLines)
  }

  test("streaming curation (AvailableNow) matches batch curation on the same input") {
    val tmp = Files.createTempDirectory("stream").toString
    val pages = spark.read.parquet("src/test/resources/cc_pages_tiny").limit(300)
    pages.write.parquet(s"$tmp/in")

    val curatedStream = StreamingCuration.curatedStream(spark, s"$tmp/in", pages.schema)
    val q = StreamingCuration.writeKept(curatedStream, s"$tmp/out", s"$tmp/ckpt")
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$tmp/out")
    val batch = graft.pipeline.CurationPipeline.keptOutput(
      graft.pipeline.CurationPipeline.curate(spark.read.parquet(s"$tmp/in")))
    assert(streamed.count() == batch.count())
    assert(streamed.select("url").as[String].collect().toSet ==
      batch.select("url").as[String].collect().toSet)
  }

  test("streaming exact dedup drops content duplicates within the watermark") {
    val tmp = Files.createTempDirectory("sdedup").toString
    // cc_pages_tiny carries a planted exact-duplicate group (rows 8,48,88,...)
    spark.read.parquet("src/test/resources/cc_pages_tiny").limit(300)
      .write.parquet(s"$tmp/in")
    // expectations read the MATERIALIZED input (re-evaluating an
    // unordered limit() could pick a different 300 rows)
    val pages = spark.read.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(pages.schema).parquet(s"$tmp/in")
    val deduped = StreamingCuration.dedupExactStream(stream)
    val q = deduped.writeStream.format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/out")
    val batchDistinct = pages.select("text").distinct().count()
    assert(out.count() == batchDistinct,
      s"streamed dedup ${out.count()} vs batch distinct $batchDistinct")
    assert(out.select("text").distinct().count() == out.count())
  }

  test("sessionization: streaming flatMapGroupsWithState matches batch windows") {
    import graft.streaming.Sessionize
    val tmp = Files.createTempDirectory("sess").toString
    // testdata timestamps are TIMESTAMP_NTZ (pyarrow, isAdjustedToUTC
    // false); the typed Event encoder needs TIMESTAMP — cast once here
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    // one file -> one micro-batch: with several files AvailableNow
    // triggers per-file batches in file order, and a later file carrying
    // older events falls behind the watermark and is dropped (correct
    // streaming semantics, but not what this equivalence test probes)
    events.coalesce(1).write.parquet(s"$tmp/in")

    val batch = Sessionize.sessionizeBatch(spark.read.parquet(s"$tmp/in")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4))).toSet

    val stream = spark.readStream.schema(events.schema).parquet(s"$tmp/in")
      .as[Sessionize.Event]
    val q = Sessionize.sessionizeStream(stream).writeStream
      .format("memory").queryName("sessions_t").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("sessions_t").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4))).toSet

    // append-mode emits only sessions closed by the final watermark; all
    // emitted sessions must be exact batch sessions, and most sessions
    // should have been emitted
    assert(streamed.subsetOf(batch),
      s"streaming emitted sessions not in batch: ${streamed.diff(batch).take(3)}")
    assert(streamed.size >= batch.size / 2, s"only ${streamed.size}/${batch.size} sessions emitted")
  }

  test("watermarked keep-rate aggregation compiles to a streaming plan") {
    val tmp = Files.createTempDirectory("stream2").toString
    val pages = spark.read.parquet("src/test/resources/cc_pages_tiny").limit(200)
    pages.write.parquet(s"$tmp/in")
    val rates = StreamingCuration.keepRates(
      StreamingCuration.curatedStream(spark, s"$tmp/in", pages.schema))
    val q = rates.writeStream.format("memory").queryName("rates_t")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; the plan executing
    // without error (stateful agg + watermark) is the contract here
    assert(spark.table("rates_t").columns.toSet == Set("window_start", "lang", "docs", "kept"))
  }
}
