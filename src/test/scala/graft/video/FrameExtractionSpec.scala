package graft.video

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Vectors cross-checked against the reference's numpy implementation
  * (decoder_utils.py sample_closest / find_closest_indices run
  * verbatim under numpy).
  */
class FrameExtractionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import FrameExtraction._

  private def uniform(n: Int, fps: Float): Array[Float] =
    Array.tabulate(n)(i => i * (1f / fps))

  test("signature string matches FrameExtractionSignature.to_str") {
    assert(signature(Sequence, 2.0) == "FrameExtractionPolicy.sequence-2000")
    assert(signature(Middle, 0.25) == "FrameExtractionPolicy.middle-250")
  }

  test("sample_closest matches the numpy reference vectors") {
    // 13 frames at 10fps sampled at 2fps -> every 5th frame
    val (i1, c1, _) = sampleClosest(uniform(13, 10), 2)
    assert(i1.toSeq == Seq(0, 5, 10) && c1.toSeq == Seq(1, 1, 1))
    // at the source rate -> all frames once
    val (i2, _, _) = sampleClosest(uniform(13, 10), 10)
    assert(i2.toSeq == (0 until 13))
    // irregular timestamps at 1fps: closest-with-left-tie, dup counts
    val src3 = Array(0.0f, 0.4f, 0.9f, 2.0f, 2.05f, 3.7f)
    val (i3, c3, _) = sampleClosest(src3, 1)
    assert(i3.toSeq == Seq(0, 2, 3, 5) && c3.toSeq == Seq(1, 1, 1, 2))
    // supersampling a 2-frame clip at 10fps repeats each frame 3x
    val (i4, c4, _) = sampleClosest(Array(0.0f, 0.5f), 10)
    assert(i4.toSeq == Seq(0, 1) && c4.toSeq == Seq(3, 3))
    // single frame: numpy's -1 index = the only frame
    val (i5, _, _) = sampleClosest(Array(1.25f), 2)
    assert(i5.toSeq == Seq(0))
    // equidistant tie goes LEFT
    assert(findClosestIndices(Array(0.0f, 1.0f), Array(0.5f)).toSeq == Seq(0))
  }

  test("sample grid is bit-identical to np.arange(dtype=float32) on a long clip (env-gated)") {
    val python = Seq("python3", "/usr/bin/python3", "/usr/local/bin/python3").find { p =>
      try new ProcessBuilder(p, "-c", "import numpy").start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    }
    assume(python.isDefined, "no python3 with numpy available")
    // 100k frames at 30fps sampled at 7.3fps — long enough that a
    // double-precision grid diverges from numpy's float32 fill by 1 ulp
    // on thousands of elements (the left-on-tie flip risk)
    val src = Array.tabulate(100000)(i => (i / 30.0).toFloat)
    val (_, _, samples) = sampleClosest(src, 7.3)
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(4 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putFloat)
    val scalaHash = md.digest(bb.array()).map("%02x".format(_)).mkString
    val script =
      """import numpy as np, hashlib
        |src = np.array([i / 30.0 for i in range(100000)], dtype=np.float32)
        |step = 1.0 / 7.3
        |a = np.arange(float(src[0]), float(src[-1]) + step * 0.5, step, dtype=np.float32)
        |print(len(a), hashlib.md5(a.tobytes()).hexdigest())
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("np_grid").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/g.py"), script.getBytes("UTF-8"))
    val proc = new ProcessBuilder(python.get, s"$dir/g.py").redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8").trim
    assume(proc.waitFor() == 0, s"python failed: $out")
    assert(out == s"${samples.length} $scalaHash", s"grid diverges from numpy: $out")
  }

  test("policy slicing: sequence all frames, middle takes the left-of-pair") {
    assert(frameIndices(uniform(13, 10), Sequence, 2).toSeq == Seq(0, 5, 10))
    assert(frameIndices(uniform(6, 10), Middle, 2).toSeq == Seq(2)) // even: n/2 - 1
    assert(frameIndices(uniform(7, 10), Middle, 2).toSeq == Seq(3)) // odd: n/2
    intercept[UnsupportedOperationException] { frameIndices(uniform(5, 10), First, 2) }
    intercept[IllegalArgumentException] { frameIndices(Array.empty[Float], Sequence, 2) }
  }

  test("supersampling repeats frames per sample (decode preallocates counts.sum())") {
    // 2 frames at 2fps sampled at 10fps -> each frame decoded 3x
    assert(frameIndices(Array(0.0f, 0.5f), Sequence, 10).toSeq ==
      Seq(0, 0, 0, 1, 1, 1))
    // LCM path strides the REPEATED sequence, like frames[::k]:
    // lcm(2,5)=10 over the 2fps clip -> base [0,0,0,1,1,1];
    // [::5] -> positions 0,5 -> frames 0 AND 1; [::2] -> [0,0,1]
    val plan = extractionPlan(Array(0.0f, 0.5f), Seq(Sequence), Seq(2.0, 5.0))
    assert(plan("FrameExtractionPolicy.sequence-2000").toSeq == Seq(0, 1))
    assert(plan("FrameExtractionPolicy.sequence-5000").toSeq == Seq(0, 0, 1))
    // beyond-end override: duplicated trailing pts resolve to the LAST
    // index, not the left tie (decoder_utils.py:315-316)
    assert(findClosestIndices(Array(0.0f, 1.0f, 1.0f), Array(1.2f)).toSeq == Seq(2))
  }

  test("LCM decode sharing: one pass at lcm fps, strided per target") {
    // reference's own vectors (test_clip_frame_extraction.py):
    assert(lcmMultiple(Seq(2.0, 3.0, 4.0)) == 12)
    assert(lcmMultiple(Seq(5.0)) == 5)
    assert(lcmMultiple(Seq(3.0, 5.0, 7.0)) == 105)
    // FramePurpose defaults: AESTHETICS -> 1 fps, EMBEDDINGS -> 2 fps
    assert(PurposeAesthetics == 1 && PurposeEmbeddings == 2)
    assert(lcmMultiple(Seq(2.0, 5.0)) == 10)
    assert(useLcmFps(Seq(2.0, 5.0)) && !useLcmFps(Seq(2.5, 5.0)) && !useLcmFps(Seq(2.0)))
    val plan = extractionPlan(uniform(13, 10), Seq(Sequence), Seq(2.0, 5.0))
    // lcm=10 selects 0..12; [::5] -> 0,5,10; [::2] -> evens
    assert(plan("FrameExtractionPolicy.sequence-2000").toSeq == Seq(0, 5, 10))
    assert(plan("FrameExtractionPolicy.sequence-5000").toSeq ==
      Seq(0, 2, 4, 6, 8, 10, 12))
    // non-integral target skips the shortcut and samples directly
    val direct = extractionPlan(uniform(13, 10), Seq(Sequence), Seq(2.5, 5.0))
    assert(direct("FrameExtractionPolicy.sequence-2500").toSeq == Seq(0, 4, 8, 12))
  }

  test("DataFrame stage appends the signature map; null timestamps get an empty map") {
    val df = Seq(
      (1L, Seq.tabulate(13)(i => i * 0.1f)),
      (2L, null.asInstanceOf[Seq[Float]])
    ).toDF("id", "frame_timestamps")
    val out = FrameExtraction.withExtractedFrames(df, targetFps = Seq(2.0, 5.0))
    val m = out.select("id", "extracted_frames").collect()
      .map(r => r.getLong(0) -> r.getAs[Map[String, scala.collection.Seq[Int]]](1)).toMap
    assert(m(1L)("FrameExtractionPolicy.sequence-2000").toSeq == Seq(0, 5, 10))
    assert(m(2L).isEmpty)
  }
}
