package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BinaryOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    b.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(64)
    b.put(0xff.toByte).put(0xd8.toByte)
    // APP0 segment to walk over
    b.put(0xff.toByte).put(0xe0.toByte).putShort(8).put(Array.fill[Byte](6)(0))
    // SOF0: len 17, precision, height, width
    b.put(0xff.toByte).put(0xc0.toByte).putShort(17).put(8.toByte)
      .putShort(h.toShort).putShort(w.toShort)
    b.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
    b.array()
  }

  test("image dimensions from container headers: png/jpeg/gif/bmp, malformed safe") {
    assert(BinaryOps.imageDimensions(png(640, 480)).contains((640, 480)))
    assert(BinaryOps.imageDimensions(jpeg(1920, 1080)).contains((1920, 1080)))
    assert(BinaryOps.imageDimensions(gif(320, 200)).contains((320, 200)))
    val bmp = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put("BM".getBytes).position(14)
    bmp.putInt(40).putInt(800).putInt(-600) // BITMAPINFOHEADER; top-down negative height
    assert(BinaryOps.imageDimensions(bmp.array()).contains((800, 600)))

    assert(BinaryOps.imageDimensions(null).isEmpty)
    assert(BinaryOps.imageDimensions("plain text payload".getBytes).isEmpty)
    assert(BinaryOps.imageDimensions(png(1, 1).take(12)).isEmpty) // truncated IHDR
    // JPEG that never reaches an SOF marker
    assert(BinaryOps.imageDimensions(Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0, 0)
      .map(_.toByte)).isEmpty)
    // a text payload starting with 'BM' must NOT parse as a bitmap
    assert(BinaryOps.imageDimensions(
      "BMW announced today that the numbers were good".getBytes).isEmpty)
    // WebP VP8X canvas (24-bit LE minus-one) and simple VP8 keyframe dims
    val vp8x = {
      val b = java.nio.ByteBuffer.allocate(30)
      b.put("RIFF".getBytes).putInt(0).put("WEBP".getBytes).put("VP8X".getBytes)
      b.position(24)
      b.put(Array(0x7f, 0x02, 0x00).map(_.toByte)) // width-1 = 639
      b.put(Array(0xdf, 0x01, 0x00).map(_.toByte)) // height-1 = 479
      b.array()
    }
    assert(BinaryOps.imageDimensions(vp8x).contains((640, 480)))
    val vp8 = {
      val b = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(0).put("WEBP".getBytes).put("VP8 ".getBytes)
      b.position(23)
      b.put(Array(0x9d, 0x01, 0x2a).map(_.toByte)) // keyframe start code
      b.putShort(320.toShort).putShort(240.toShort)
      b.array()
    }
    assert(BinaryOps.imageDimensions(vp8).contains((320, 240)))
    // a RIFF that is not WEBP (e.g. WAVE) yields None
    val wav = graft.audio.WavIO.buildPcmWav(160, 16000)
    assert(BinaryOps.imageDimensions(wav).isEmpty)

    // FILL bytes before the SOF marker (FF FF FF C0) are spec-valid
    val filled = {
      val base = jpeg(111, 222)
      val b = java.nio.ByteBuffer.allocate(base.length + 2)
      b.put(base, 0, 12) // SOI + APP0
      b.put(0xff.toByte).put(0xff.toByte) // two fill bytes
      b.put(base, 12, base.length - 12)
      b.array()
    }
    assert(BinaryOps.imageDimensions(filled).contains((111, 222)))
  }

  test("withMediaMeta fills width/height for image payloads, null otherwise") {
    val df = Seq((1L, png(64, 32)), (2L, "not an image".getBytes)).toDF("id", "payload")
    val out = BinaryOps.withMediaMeta(df)
      .select(col("id"), col("meta.magic"), col("meta.width"), col("meta.height"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == (("png", Some(64), Some(32))))
    assert(out(2L)._2.isEmpty && out(2L)._3.isEmpty)
  }
}
