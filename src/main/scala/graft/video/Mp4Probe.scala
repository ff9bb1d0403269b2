package graft.video

import java.nio.ByteBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Codec-free MP4 (ISO BMFF) container probe — the metadata surface of
  * the reference's VideoReaderStage (stages/video/io/video_reader.py:
  * 30-200 populates tasks/video.py VideoMetadata: size, width, height,
  * framerate, num_frames, duration, video/audio codec). The reference
  * shells out to PyAV/ffprobe; this walks the box tree directly — the
  * same codec-free posture as [[graft.audio.WavIO]]'s RIFF parse —
  * so the input-hint's binary payload columns probe without any
  * decoder:
  *
  *   - `moov/mvhd`: presentation timescale + duration (v0/v1)
  *   - per `trak`: `tkhd` width/height (16.16 fixed point),
  *     `mdia/hdlr` handler ('vide'/'soun'), `mdia/mdhd` media
  *     timescale, `stbl/stsd` first-entry fourcc (codec),
  *     `stbl/stts` sample table (frame count + total tick duration
  *     → exact average framerate)
  *
  * Untrusted-input hardening as in WavIO: declared box sizes are
  * clamped to the remaining payload, and malformed/truncated boxes
  * end the walk with whatever was recovered (all-None metadata for
  * non-MP4 bytes — the reference logs-and-skips the same way).
  */
object Mp4Probe {

  final case class VideoMetadata(
      size: Long,
      width: Option[Int],
      height: Option[Int],
      framerate: Option[Double],
      numFrames: Option[Int],
      duration: Option[Double],
      videoCodec: Option[String],
      audioCodec: Option[String])

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  def probe(bytes: Array[Byte]): VideoMetadata = {
    var mvhdTimescale = 0L
    var mvhdDuration = 0L
    var width, height = Option.empty[Int]
    var videoCodec, audioCodec = Option.empty[String]
    var numFrames = Option.empty[Int]
    var frameTicks = 0L
    var mediaTimescale = 0L

    // per-trak scratch, committed when the handler type is known
    final class Trak {
      var w, h = Option.empty[Int]
      var handler: String = ""
      var codec = Option.empty[String]
      var sttsFrames = 0L
      var sttsTicks = 0L
      var mdhdTimescale = 0L
    }

    def u32(b: ByteBuffer): Long = b.getInt() & 0xffffffffL

    def walk(b: ByteBuffer, end: Int, trak: Trak): Unit = {
      while (b.position() + 8 <= end) {
        val start = b.position()
        var size = u32(b)
        val tpe = {
          val t = new Array[Byte](4); b.get(t); new String(t, "US-ASCII")
        }
        var header = 8
        if (size == 1 && b.position() + 8 <= end) { size = b.getLong(); header = 16 }
        if (size == 0) size = (end - start).toLong // box extends to end
        // compare against the REMAINING length, never start + size — a
        // hostile 64-bit largesize near Long.MaxValue would overflow
        // the sum negative, pass a start+size > end check, and rewind
        // boxEnd before start into an exception-free infinite loop
        if (size < header || size > (end - start).toLong) return // malformed: stop
        val boxEnd = (start + size).toInt
        tpe match {
          case t if Containers(t) =>
            val child = if (t == "trak") new Trak else trak
            walk(b, boxEnd, child)
            if (t == "trak") child.handler match {
              case "vide" =>
                width = child.w.orElse(width); height = child.h.orElse(height)
                videoCodec = child.codec.orElse(videoCodec)
                if (child.sttsFrames > 0) {
                  numFrames = Some(child.sttsFrames.toInt)
                  frameTicks = child.sttsTicks
                  mediaTimescale = child.mdhdTimescale
                }
              case "soun" => audioCodec = child.codec.orElse(audioCodec)
              case _ =>
            }
          case "mvhd" if boxEnd - b.position() >= 4 =>
            val v = b.get(b.position()) & 0xff
            if (v == 1 && boxEnd - b.position() >= 32) {
              mvhdTimescale = b.getInt(b.position() + 20) & 0xffffffffL
              mvhdDuration = b.getLong(b.position() + 24)
            } else if (v == 0 && boxEnd - b.position() >= 24) {
              // a truncated v1 box (24..31 payload bytes) must NOT fall
              // through here — the v0 offsets would read its 64-bit
              // creation/modification fields as timescale/duration
              mvhdTimescale = b.getInt(b.position() + 12) & 0xffffffffL
              mvhdDuration = b.getInt(b.position() + 16) & 0xffffffffL
            }
          case "tkhd" if trak != null && boxEnd - b.position() >= 84 =>
            val v = b.get(b.position()) & 0xff
            val off = if (v == 1) b.position() + 88 else b.position() + 76
            if (off + 8 <= boxEnd) {
              trak.w = Some((b.getInt(off) >>> 16)) // 16.16 fixed
              trak.h = Some((b.getInt(off + 4) >>> 16))
            }
          case "mdhd" if trak != null && boxEnd - b.position() >= 16 =>
            val v = b.get(b.position()) & 0xff
            // v1 reads the timescale at offset 20..24 — require the
            // box to actually contain it, never read into a sibling
            if (v == 1 && boxEnd - b.position() >= 24)
              trak.mdhdTimescale = b.getInt(b.position() + 20) & 0xffffffffL
            else if (v == 0)
              trak.mdhdTimescale = b.getInt(b.position() + 12) & 0xffffffffL
          case "hdlr" if trak != null && boxEnd - b.position() >= 12 =>
            val t = new Array[Byte](4)
            val p = b.position()
            b.position(p + 8); b.get(t); b.position(p)
            trak.handler = new String(t, "US-ASCII")
          case "stsd" if trak != null && boxEnd - b.position() >= 16 =>
            // [ver/flags][entry_count][entry: size + fourcc ...]
            val t = new Array[Byte](4)
            val p = b.position()
            b.position(p + 12); b.get(t); b.position(p)
            trak.codec = Some(new String(t, "US-ASCII").trim)
          case "stts" if trak != null && boxEnd - b.position() >= 8 =>
            val p = b.position()
            val entries = b.getInt(p + 4)
            var i = 0
            var off = p + 8
            while (i < entries && off + 8 <= boxEnd) {
              val count = b.getInt(off) & 0xffffffffL
              val delta = b.getInt(off + 4) & 0xffffffffL
              trak.sttsFrames += count
              trak.sttsTicks += count * delta
              i += 1
              off += 8
            }
          case _ =>
        }
        b.position(boxEnd)
      }
    }

    if (bytes != null && bytes.length >= 8) {
      try walk(ByteBuffer.wrap(bytes), bytes.length, null)
      catch { case _: Exception => } // truncated/hostile input: keep what parsed
    }

    val duration =
      if (mvhdTimescale > 0 && mvhdDuration > 0) Some(mvhdDuration.toDouble / mvhdTimescale)
      else None
    val framerate =
      if (frameTicks > 0 && mediaTimescale > 0)
        numFrames.map(n => n.toDouble * mediaTimescale / frameTicks)
      else None
    VideoMetadata(if (bytes == null) 0L else bytes.length.toLong,
      width, height, framerate, numFrames, duration, videoCodec, audioCodec)
  }

  /** VideoReaderStage shape over a binary payload column: append a
    * metadata struct (pure map, no decode).
    */
  def withMetadata(df: DataFrame, payloadCol: String = "video",
                   outCol: String = "metadata"): DataFrame = {
    // nondeterministic: the box walk runs once per row, never
    // re-evaluated per referenced struct field or below pushed filters
    val u = udf((b: Array[Byte]) => {
      val m = probe(b)
      (m.size, m.width, m.height, m.framerate, m.numFrames, m.duration,
        m.videoCodec, m.audioCodec)
    }).asNondeterministic()
    df.withColumn(outCol, u(col(payloadCol)).cast(
      "struct<size:bigint,width:int,height:int,framerate:double," +
        "num_frames:int,duration:double,video_codec:string,audio_codec:string>"))
  }

  /** Fixture builder (tests — the sibling of WavIO.buildPcmWav): a
    * minimal valid box tree with one video and one audio trak.
    */
  def buildFixtureMp4(width: Int, height: Int, timescale: Int, durationTicks: Int,
                      frameCount: Int, frameDelta: Int,
                      videoFourcc: String = "avc1",
                      audioFourcc: String = "mp4a"): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    def concat(parts: Array[Byte]*): Array[Byte] = parts.toArray.flatten
    val mvhd = box("mvhd", {
      val b = ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(durationTicks)
      b.array()
    })
    def tkhd(w: Int, h: Int) = box("tkhd", {
      val b = ByteBuffer.allocate(84)
      b.position(76)
      b.putInt(w << 16).putInt(h << 16)
      b.array()
    })
    def mdhd = box("mdhd", {
      val b = ByteBuffer.allocate(24)
      b.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(durationTicks)
      b.array()
    })
    def hdlr(handler: String) = box("hdlr", {
      val b = ByteBuffer.allocate(24)
      b.position(8); b.put(handler.getBytes("US-ASCII"))
      b.array()
    })
    def stsd(fourcc: String) = box("stsd", {
      val b = ByteBuffer.allocate(24)
      b.putInt(0).putInt(1).putInt(16).put(fourcc.getBytes("US-ASCII"))
      b.array()
    })
    val stts = box("stts", {
      val b = ByteBuffer.allocate(16)
      b.putInt(0).putInt(1).putInt(frameCount).putInt(frameDelta)
      b.array()
    })
    def trak(handler: String, fourcc: String, withStts: Boolean) =
      box("trak", concat(tkhd(width, height), box("mdia", concat(
        mdhd, hdlr(handler),
        box("minf", box("stbl",
          if (withStts) concat(stsd(fourcc), stts) else stsd(fourcc)))))))
    concat(
      box("ftyp", "isom0000".getBytes("US-ASCII")),
      box("moov", concat(mvhd,
        trak("vide", videoFourcc, withStts = true),
        trak("soun", audioFourcc, withStts = false))))
  }
}
