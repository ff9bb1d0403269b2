package graft.video

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The video tutorial's composed flow
  * (tutorials/video/getting-started/video_split_clip_example.py) over
  * the ported stages and fixture mp4s: reader metadata probe →
  * fixed-stride clip extraction → per-clip frame-selection plan →
  * transcode command assembly → clip writer — every decode-free stage
  * chained on real DataFrames, GPU embedding/captioning stages being
  * the documented deploy seams.
  */
class VideoPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("splitting pipeline end to end: probe -> clips -> frame plan -> writer") {
    // two fixture videos: 200 frames @25fps (8 s) and 100 frames @25fps (4 s)
    val videos = Seq(
      ("/in/v0.mp4", Mp4Probe.buildFixtureMp4(640, 480, 1000, 8000, 200, 40)),
      ("/in/v1.mp4", Mp4Probe.buildFixtureMp4(320, 240, 1000, 4000, 100, 40))
    ).toDF("video_name", "video")

    // 1. VideoReaderStage metadata (Mp4Probe = the ffprobe slot)
    val withMeta = Mp4Probe.withMetadata(videos)
      .select(col("video_name"), col("video"),
        col("metadata.width").as("width"), col("metadata.height").as("height"),
        col("metadata.framerate").as("framerate"),
        col("metadata.num_frames").as("num_frames"),
        col("metadata.duration").as("duration"),
        col("metadata.video_codec").as("video_codec"))
    assert(withMeta.filter(col("width") === 640).count() == 1)

    // 2. FixedStrideExtractorStage: 4 s clips every 3 s, min 2 s
    val clips = SceneClips.fixedStrideClips(withMeta, 4.0, 3.0, 2.0)
    // v0 (8 s): spans (0,4),(3,7),(6,8); v1 (4 s): (0,4) -> 4 clips
    assert(clips.count() == 4)

    // 3. ClipFrameExtractionStage plan over each clip's timestamps
    val withTs = clips.withColumn("frame_timestamps", expr(
      """transform(sequence(0, CAST((span_end - span_start) * framerate AS INT) - 1),
           i -> CAST(i / framerate AS FLOAT))"""))
    val planned = FrameExtraction.withExtractedFrames(withTs, targetFps = Seq(1.0))
    val sig = FrameExtraction.signature(FrameExtraction.Sequence, 1.0)
    val firstPlan = planned.filter(col("video_name") === "/in/v0.mp4" && col("span_start") === 0.0)
      .select(col("extracted_frames")).head.getAs[Map[String, scala.collection.Seq[Int]]](0)
    // 4 s of 25 fps frames sampled at 1 fps -> 0, 25, 50, 75 plus the
    // final frame: the endpoint half-interval epsilon admits sample
    // 4.0 s, which clamps beyond-end to frame 99 (last ts 3.96 s)
    assert(firstPlan(sig).toSeq == Seq(0, 25, 50, 75, 99))

    // 4. ClipTranscodingStage command for one video's clip batch
    val v0clips = clips.filter(col("video_name") === "/in/v0.mp4")
      .select("clip_uuid", "span_start", "span_end").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val cmd = FfmpegCommands.transcodeCommand("v0.mp4", v0clips)
    assert(cmd.count(_ == "-ss") == 3 && cmd.last.endsWith(".mp4"))

    // 5. ClipWriterStage: the clip rows (fixture bytes as the
    // transcoded buffer) land in the deterministic layout
    val out = java.nio.file.Files.createTempDirectory("vidpipe").toString
    val writerIn = clips
      .withColumn("source_video", col("video_name"))
      .withColumn("clip_chunk_index", lit(0))
      .withColumn("buffer", col("video"))
      .withColumn("filtered", lit(false))
    val stats = ClipWriter.write(writerIn, out, "/in")
    assert(stats.count() == 2) // one chunk per video
    val total = stats.agg(sum(col("num_clips_passed"))).head.getLong(0)
    assert(total == 4)
    // every clip mp4 + v0 metadata json exists; the json carries the
    // PROBED clip metadata (width/num_bytes from the buffer itself)
    val uuids = clips.select("clip_uuid").as[String].collect()
    uuids.foreach { u =>
      assert(new java.io.File(s"$out/clips/$u.mp4").exists())
      assert(new java.io.File(s"$out/metas/v0/$u.json").exists())
    }
    val aJson = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$out/metas/v0/${uuids.head}.json")), "UTF-8")
    assert(aJson.contains("\"width\":"))
    assert(aJson.contains("\"valid\":"))
    assert(new java.io.File(s"$out/processed_videos/v0.mp4.json").exists())
    assert(new java.io.File(s"$out/processed_videos/v1.mp4.json").exists())
  }
}
