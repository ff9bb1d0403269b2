package graft.video

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MotionFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("score math: hand-computed global mean and patch min on a 2x4 field") {
    // frame 1: pixel (0,0) flow (3,4) -> |v|=5, everything else 0
    // frame 2: all pixels flow (6,0) -> |v|=6
    val h = 2; val w = 4
    val f1 = new Array[Float](h * w * 2)
    f1(0) = 3f; f1(1) = 4f
    val f2 = Array.tabulate(h * w * 2)(i => if (i % 2 == 0) 6f else 0f)
    val (gm, pm) = MotionFilter.motionScores(Seq(f1, f2), h, w, patch = 2)
    // magnitudes / (h+w)=6: frame1 sums 5/6, frame2 sums 8*1 = 8
    assert(math.abs(gm - (5.0 / 6 + 8.0) / (2 * 8)) < 1e-12)
    // per-pixel avg: pixel0 = (5/6 + 1)/2, others = 1/2; 2x2 patches ->
    // left patch mean = ((5/6+1)/2 + 3*0.5)/4, others 0.5 -> min 0.5
    assert(math.abs(pm - 0.5) < 1e-12)

    // one whole-frame patch: patch min equals global mean
    val (gm2, pm2) = MotionFilter.motionScores(Seq(f1, f2), h, w, patch = 256)
    assert(math.abs(gm2 - pm2) < 1e-15)

    // empty frame list -> the failed-decode fake scores
    assert(MotionFilter.motionScores(Nil, h, w) == (-1.0, -1.0))
  }

  test("decode-stage sampling arithmetic and resolution gate") {
    assert(MotionFilter.sampleStep(30.0, 2.0) == 15) // the reference's own example
    assert(MotionFilter.sampleStep(1.0, 2.0) == 1)   // clamped at 1
    assert(MotionFilter.sampleStep(25.0, 2.0) == 12) // Python round() is half-EVEN: 12.5 -> 12
    assert(MotionFilter.maxFrames(durationSeconds = 30.0) == 30) // 2fps * 30s * 0.5
    assert(MotionFilter.maxFrames(durationSeconds = 2.0) == 10)  // floor of 10
    assert(MotionFilter.maxFrames(durationSeconds = 10.5) == 10) // 10.5 rounds half-even to 10
    assert(MotionFilter.resolutionOk(256, 256))
    assert(!MotionFilter.resolutionOk(255, 1920) && !MotionFilter.resolutionOk(1080, 100))
  }

  test("filterClips: keep rule, failed-decode path, score_only mode") {
    val h = 2; val w = 2
    def const(v: Float) = Seq.tabulate(h * w * 2)(i => if (i % 2 == 0) v else 0f)
    val df = Seq(
      (1L, Some(Seq(const(0.1f)))),  // gm = 0.1/4 = 0.025 -> kept
      (2L, Some(Seq(const(0.001f)))), // gm = 0.00025 < 0.00098 -> small
      (3L, Option.empty[Seq[Seq[Float]]]) // failed decode -> -1/-1 -> small
    ).toDF("clip_id", "decoded_motion_data")

    val kept = MotionFilter.filterClips(df, h, w)
    assert(kept.select("clip_id").collect().map(_.getLong(0)).toSeq == Seq(1L))

    val scored = MotionFilter.filterClips(df, h, w, scoreOnly = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.size == 3)
    assert(scored(3L) == -1.0)
    assert(math.abs(scored(1L) - 0.1f / 4) < 1e-9)

    // per-patch floor alone drops a clip whose global mean passes:
    // one dead 1-pixel patch (patch=1) with zero motion
    val mixed = Seq.tabulate(h * w * 2)(i => if (i % 2 == 0 && i > 0) 1f else 0f)
    val df2 = Seq((1L, Some(Seq(mixed)))).toDF("clip_id", "decoded_motion_data")
    assert(MotionFilter.filterClips(df2, h, w, patch = 1).count() == 0)
    assert(MotionFilter.filterClips(df2, h, w, patch = 2).count() == 1)
  }
}
