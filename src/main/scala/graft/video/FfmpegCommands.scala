package graft.video

/** The reference's ffmpeg invocations as PURE command builders — the
  * argument lists are the deploy contract (a wrong flag order silently
  * re-encodes audio or drops the stream map), so they are ported 1:1
  * and locked by token-exact specs; actually spawning ffmpeg is the
  * codec seam kept out of this sandbox.
  *
  * Sources: ClipTranscodingStage._build_ffmpeg_command
  * (stages/video/clipping/clip_extraction_stages.py:201-312),
  * PreviewStage._generate_preview (stages/video/preview/preview.py:
  * 78-101), get_frames_from_ffmpeg
  * (stages/video/clipping/video_frame_extraction.py:39-86).
  */
object FfmpegCommands {

  val ValidEncoders: Set[String] = Set("libopenh264", "libx264", "h264_nvenc")

  /** One batched transcode command: per clip, decoder threads →
    * hwaccel → input (-ss/-to trim, stream map, encoder) → encoding
    * options (input bit rate, NVENC tuning, 10-bit pix_fmt force) →
    * output (audio stream-copy with the optional `?` map, uuid.mp4).
    */
  def transcodeCommand(videoFilename: String,
                       clips: Seq[(String, Double, Double)], // (uuid, startS, endS)
                       encoder: String = "libx264",
                       encoderThreads: Int = 1,
                       useHwaccel: Boolean = false,
                       useBitRate: Option[String] = None,
                       forcePixFmt: Boolean = false,
                       ffmpegVerbose: Boolean = false): Seq[String] = {
    require(ValidEncoders.contains(encoder),
      s"Expected encoder of `libopenh264`, `libx264`, or `h264_nvenc`. Got $encoder")
    val cmd = scala.collection.mutable.ArrayBuffer(
      "ffmpeg", "-hide_banner", "-loglevel", if (ffmpegVerbose) "warning" else "error")
    clips.zipWithIndex.foreach { case ((uuid, startS, endS), i) =>
      cmd ++= Seq("-threads", encoderThreads.toString)
      if (useHwaccel) {
        if (encoder == "h264_nvenc")
          cmd ++= Seq("-hwaccel", "cuda", "-hwaccel_output_format", "cuda")
        else cmd ++= Seq("-hwaccel", "auto")
      }
      cmd ++= Seq("-ss", fmt(startS), "-to", fmt(endS), "-i", videoFilename,
        "-map", s"$i:v:0", "-c:v", encoder)
      useBitRate.foreach(b => cmd ++= Seq("-b:v", b))
      if (encoder == "h264_nvenc") {
        cmd ++= Seq("-rc:v", "vbr", "-cq:v", "21", "-tune", "hq", "-b_ref_mode",
          "middle", "-temporal-aq", "1", "-rc-lookahead", "20", "-spatial-aq", "1")
        if (forcePixFmt) cmd ++= Seq("-pix_fmt", "yuv420p")
      }
      cmd ++= Seq("-threads", encoderThreads.toString,
        "-map", s"$i:a:0?", "-c:a", "copy", s"$uuid.mp4")
    }
    cmd.toSeq
  }

  /** Python str(float) for the -ss/-to span values (the reference
    * interpolates the raw float span).
    */
  private def fmt(d: Double): String = graft.text.PyFloat.repr(d)

  /** The webp preview command (fps+scale filter, libwebp knobs). */
  def previewCommand(inputMp4: String, outputWebp: String,
                     targetFps: Double = 1.0, targetHeight: Int = 240,
                     threads: Int = 4, compressionLevel: Int = 6,
                     quality: Int = 50): Seq[String] = Seq(
    "ffmpeg", "-threads", threads.toString, "-y", "-i", inputMp4,
    "-loglevel", "error",
    "-vf", s"fps=${fmt(targetFps)},scale=-1:$targetHeight",
    "-c:v", "libwebp", "-lossless", "0",
    "-compression_level", compressionLevel.toString,
    "-q:v", quality.toString, "-loop", "0", outputWebp)

  /** Raw RGB24 frame dump at a fixed size; the GPU variant scales via
    * NPP and downloads NV12, falling back to CPU on failure (the
    * fallback policy lives with the runner at deploy).
    */
  def rawFramesCommand(videoFile: String, width: Int, height: Int,
                       useGpu: Boolean = false): Seq[String] =
    if (useGpu) Seq(
      "ffmpeg", "-hide_banner", "-loglevel", "warning", "-threads", "1",
      "-hwaccel", "auto", "-hwaccel_output_format", "cuda", "-i", videoFile,
      "-vf", s"scale_npp=$width:$height,hwdownload,format=nv12",
      "-f", "rawvideo", "-pix_fmt", "rgb24", "-")
    else Seq(
      "ffmpeg", "-hide_banner", "-loglevel", "warning", "-threads", "4",
      "-i", videoFile, "-f", "rawvideo", "-pix_fmt", "rgb24",
      "-s", s"${width}x$height", "-")
}
