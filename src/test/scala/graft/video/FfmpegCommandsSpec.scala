package graft.video

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class FfmpegCommandsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("transcode command: libx264 batch of two clips, token-exact") {
    val cmd = FfmpegCommands.transcodeCommand("input.mp4",
      Seq(("u1", 0.0, 2.5), ("u2", 2.5, 5.0)))
    assert(cmd == Seq(
      "ffmpeg", "-hide_banner", "-loglevel", "error",
      "-threads", "1", "-ss", "0.0", "-to", "2.5", "-i", "input.mp4",
      "-map", "0:v:0", "-c:v", "libx264",
      "-threads", "1", "-map", "0:a:0?", "-c:a", "copy", "u1.mp4",
      "-threads", "1", "-ss", "2.5", "-to", "5.0", "-i", "input.mp4",
      "-map", "1:v:0", "-c:v", "libx264",
      "-threads", "1", "-map", "1:a:0?", "-c:a", "copy", "u2.mp4"))
  }

  test("transcode command: nvenc with hwaccel, input bit rate, 10-bit pix_fmt force") {
    val cmd = FfmpegCommands.transcodeCommand("v.mp4", Seq(("u", 1.0, 3.0)),
      encoder = "h264_nvenc", useHwaccel = true,
      useBitRate = Some("4500K"), forcePixFmt = true, ffmpegVerbose = true)
    assert(cmd == Seq(
      "ffmpeg", "-hide_banner", "-loglevel", "warning",
      "-threads", "1", "-hwaccel", "cuda", "-hwaccel_output_format", "cuda",
      "-ss", "1.0", "-to", "3.0", "-i", "v.mp4", "-map", "0:v:0",
      "-c:v", "h264_nvenc", "-b:v", "4500K",
      "-rc:v", "vbr", "-cq:v", "21", "-tune", "hq", "-b_ref_mode", "middle",
      "-temporal-aq", "1", "-rc-lookahead", "20", "-spatial-aq", "1",
      "-pix_fmt", "yuv420p",
      "-threads", "1", "-map", "0:a:0?", "-c:a", "copy", "u.mp4"))
    // non-nvenc hwaccel takes the auto path; unknown encoders reject
    val auto = FfmpegCommands.transcodeCommand("v.mp4", Seq(("u", 0.0, 1.0)),
      useHwaccel = true)
    assert(auto.containsSlice(Seq("-hwaccel", "auto")))
    intercept[IllegalArgumentException] {
      FfmpegCommands.transcodeCommand("v.mp4", Nil, encoder = "mpeg4")
    }
  }

  test("preview and raw-frame commands match the reference argument lists") {
    assert(FfmpegCommands.previewCommand("in.mp4", "out.webp") == Seq(
      "ffmpeg", "-threads", "4", "-y", "-i", "in.mp4", "-loglevel", "error",
      "-vf", "fps=1.0,scale=-1:240", "-c:v", "libwebp", "-lossless", "0",
      "-compression_level", "6", "-q:v", "50", "-loop", "0", "out.webp"))
    assert(FfmpegCommands.rawFramesCommand("v.mp4", 320, 180) == Seq(
      "ffmpeg", "-hide_banner", "-loglevel", "warning", "-threads", "4",
      "-i", "v.mp4", "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", "320x180", "-"))
    assert(FfmpegCommands.rawFramesCommand("v.mp4", 320, 180, useGpu = true)
      .containsSlice(Seq("-vf", "scale_npp=320:180,hwdownload,format=nv12")))
  }

  test("fixedStrideClips mirrors the reference's own test vector (8 clips over 20 s)") {
    import spark.implicits._
    // tests/stages/video/clipping/test_fixed_stride_extractor_stage.py
    // test_clip_generation_logic: len 5.0 stride 2.5 min 1.0, 600
    // frames at 30 fps -> exactly these 8 spans and uuid5 ids
    val vids = Seq(("test_video.mp4", 600, 30.0)).toDF("video_name", "num_frames", "framerate")
    val rows = SceneClips.fixedStrideClips(vids, 5.0, 2.5, 1.0)
      .select("span_start", "span_end", "clip_uuid").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getString(2)))
    val expected = Seq((0.0, 5.0), (2.5, 7.5), (5.0, 10.0), (7.5, 12.5),
      (10.0, 15.0), (12.5, 17.5), (15.0, 20.0), (17.5, 20.0))
    assert(rows.map(t => (t._1, t._2)).toSeq == expected)
    rows.zip(expected).foreach { case ((s, e, u), _) =>
      assert(u == graft.dedup.IdGenerator.uuid5(
        s"test_video.mp4_${(s * 30.0).toInt}_${(e * 30.0).toInt}"))
    }
  }

  test("fixedStrideClips: stride spans, min-length drop, duration clamp, uuid5 ids") {
    import spark.implicits._
    val vids = Seq(("v", 100, 10.0)).toDF("video_name", "num_frames", "framerate")
    // duration 10s; len 4 stride 3 min 2 -> (0,4),(3,7),(6,10); (9,10) is 1s, dropped
    val rows = SceneClips.fixedStrideClips(vids, 4.0, 3.0, 2.0)
      .select("clip_uuid", "span_start", "span_end", "start_event", "end_event")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
    assert(rows.map(t => (t._2, t._3, t._4, t._5)).toSeq ==
      Seq((0.0, 4.0, 0, 40), (3.0, 7.0, 30, 70), (6.0, 10.0, 60, 100)))
    assert(rows.head._1 == graft.dedup.IdGenerator.uuid5("v_0_40"))
    // missing metadata yields no clips, not a crash
    val bad = Seq(("w", null.asInstanceOf[java.lang.Integer], 10.0))
      .toDF("video_name", "num_frames", "framerate")
    assert(SceneClips.fixedStrideClips(bad, 4.0, 3.0, 2.0).count() == 0)
  }
}
