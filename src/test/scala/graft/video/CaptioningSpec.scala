package graft.video

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CaptioningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("compute_windows: every branch of the reference arithmetic") {
    import Captioning.{WindowInfo, computeWindows}
    assert(computeWindows(0) == Nil)
    assert(computeWindows(3) == Nil) // below WINDOW_MIN_FRAMES
    assert(computeWindows(4) == Seq(WindowInfo(0, 3)))
    assert(computeWindows(128) == Seq(WindowInfo(0, 127))) // exactly one window
    assert(computeWindows(256) == Seq(WindowInfo(0, 127), WindowInfo(128, 255))) // rem 0
    assert(computeWindows(300) == Seq(WindowInfo(0, 127), WindowInfo(128, 299))) // rem 44 < 64: merge
    assert(computeWindows(320) == Seq(WindowInfo(0, 127), WindowInfo(128, 255),
      WindowInfo(256, 319))) // rem 64 >= threshold: own window
    assert(computeWindows(130, windowSize = 64, remainderThreshold = 2) ==
      Seq(WindowInfo(0, 63), WindowInfo(64, 127), WindowInfo(128, 129)))
  }

  test("prompt templates are byte-verbatim the reference's (md5-pinned) and variants dispatch") {
    assert(md5(Captioning.prompt("default")) == "dac131878cb68061e5c8d876d3b61e1c")
    assert(md5(Captioning.prompt("av")) == "f3dad6c3c332bfb937d7ca4799e6aaf4")
    assert(md5(Captioning.prompt("av-surveillance")) == "6bbe69ef92c5a5ff19c0f5488f581e5a")
    assert(md5(Captioning.enhancePrompt("default")) == "6c0f3bcc7090a75f7ed96c10ca602ee5")
    assert(md5(Captioning.enhancePrompt("av-surveillance")) == "d31d76ea0b18699a390e205899590999")
    assert(Captioning.prompt("av", promptText = Some("custom")) == "custom") // override wins
    intercept[IllegalArgumentException](Captioning.prompt("no-such-variant"))
  }

  test("create_message carries the video slot + text prompt as the single user turn") {
    val json = Captioning.createMessageJson("describe it")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(root.size() == 1 && root.get(0).get("role").asText() == "user")
    val content = root.get(0).get("content")
    assert(content.get(0).get("type").asText() == "video")
    assert(content.get(1).get("type").asText() == "text")
    assert(content.get(1).get("text").asText() == "describe it")
  }

  test("prepare -> caption -> enhance end to end over injected models") {
    val clips = Seq((1L, 300), (2L, 2)).toDF("clip_id", "total_frames")
    val windows = Captioning.prepareWindows(clips, windowSize = 128, remainderThreshold = 64)
      .withColumn("window_ref", concat_ws(":", col("clip_id"), col("window_start")))
    // clip 2 is below min frames and vanishes; clip 1 -> 2 windows (merge)
    assert(windows.select("clip_id").collect().map(_.getLong(0)).toSeq == Seq(1L, 1L))

    val vlm: (String, String) => String = (p, ref) => s"caption[$ref] from ${p.length}-char prompt"
    val captioned = Captioning.withCaptions(windows, vlm)
    val caps = captioned.select("caption").as[String].collect().sorted
    assert(caps.head == "caption[1:0] from 84-char prompt")

    val llm: (String, String) => String = (sys, c) => s"${sys.length}:$c enhanced"
    val enhanced = Captioning.enhanceCaptions(captioned, llm)
      .select("enhanced_caption").as[String].collect().sorted
    assert(enhanced.head == "179:caption[1:0] from 84-char prompt enhanced")
  }
}
