package graft.video

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class Mp4ProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("box walk recovers dimensions, duration, frame count, fps and codecs") {
    // 1920x1080, timescale 12800, duration 64000 ticks = 5 s,
    // 150 frames of 426.67 ticks -> displayed fps from stts: 12800*150/64000 = 30
    val mp4 = Mp4Probe.buildFixtureMp4(1920, 1080, timescale = 12800,
      durationTicks = 64000, frameCount = 150, frameDelta = 64000 / 150)
    val m = Mp4Probe.probe(mp4)
    assert(m.width.contains(1920) && m.height.contains(1080))
    assert(m.duration.exists(d => math.abs(d - 5.0) < 1e-9))
    assert(m.numFrames.contains(150))
    // stts deltas are integral (426 ticks/frame), so the exact average
    // fps is 12800*150/63900
    assert(m.framerate.exists(f => math.abs(f - 12800.0 * 150 / (150 * 426)) < 1e-9))
    assert(m.videoCodec.contains("avc1") && m.audioCodec.contains("mp4a"))
    assert(m.size == mp4.length)
  }

  test("hostile/degenerate payloads never throw and yield empty metadata") {
    assert(Mp4Probe.probe(null).width.isEmpty)
    assert(Mp4Probe.probe(Array.empty[Byte]).duration.isEmpty)
    assert(Mp4Probe.probe("not an mp4 at all just text".getBytes).videoCodec.isEmpty)
    // truncated: declared size exceeds payload
    val mp4 = Mp4Probe.buildFixtureMp4(640, 480, 1000, 2000, 50, 40)
    val cut = java.util.Arrays.copyOf(mp4, mp4.length / 3)
    Mp4Probe.probe(cut) // must not throw
    // box with absurd size field
    val evil = java.util.Arrays.copyOf(mp4, mp4.length)
    evil(0) = 0x7f.toByte // first box claims ~2 GB
    Mp4Probe.probe(evil)
    // 64-bit largesize near Long.MaxValue: start+size overflows
    // negative — must terminate, not rewind into an infinite loop
    val overflow = {
      val b = java.nio.ByteBuffer.allocate(32)
      b.putInt(16).put("ftyp".getBytes).put("isom0000".getBytes)
      b.putInt(1).put("moov".getBytes).putLong(0x7ffffffffffffff0L)
      b.array()
    }
    assert(Mp4Probe.probe(overflow).duration.isEmpty) // returns, promptly
    // truncated VERSION-1 mvhd (24..31 payload bytes): must yield no
    // duration, not misread the 64-bit creation/modification fields
    // through the v0 offsets
    val truncV1 = {
      val payload = java.nio.ByteBuffer.allocate(28)
      payload.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1, flags
      payload.putLong(3000000000L).putLong(3000000001L) // creation/modification
      payload.putInt(0) // 4 bytes into where timescale would start
      val b = java.nio.ByteBuffer.allocate(8 + 8 + 28 + 8 + 28)
      b.putInt(16).put("ftyp".getBytes).put("isom0000".getBytes)
      b.putInt(8 + 8 + 28).put("moov".getBytes)
      b.putInt(8 + 28).put("mvhd".getBytes).put(payload.array())
      b.array()
    }
    assert(Mp4Probe.probe(truncV1).duration.isEmpty)
  }

  test("DataFrame stage appends the VideoMetadata struct (pure map)") {
    val mp4 = Mp4Probe.buildFixtureMp4(640, 480, 1000, 3000, 90, 33)
    val df = Seq((1L, mp4), (2L, "garbage".getBytes)).toDF("id", "video")
    val out = Mp4Probe.withMetadata(df)
    val rows = out.select(col("id"), col("metadata.width"), col("metadata.duration"),
      col("metadata.video_codec")).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows(1L)._1.contains(640))
    assert(rows(1L)._2.exists(d => math.abs(d.asInstanceOf[Double] - 3.0) < 1e-9))
    assert(rows(1L)._3.contains("avc1"))
    assert(rows(2L)._1.isEmpty && rows(2L)._3.isEmpty)
  }
}
