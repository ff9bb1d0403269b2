package graft.video

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SceneClipsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("scenes from transition predictions: edges, trailing scene, entire-scene fallback") {
    import SceneClips.scenesFromPredictions
    // transitions at 3 and 7 over 10 frames
    val p = Seq(0, 0, 0, 1, 0, 0, 0, 1, 0, 0)
    assert(scenesFromPredictions(p) == Seq((0, 3), (4, 7), (8, 9)))
    // video ending ON a transition has no trailing scene
    assert(scenesFromPredictions(Seq(0, 0, 1, 0, 1)) == Seq((0, 2), (3, 4)))
    // a leading transition at index 0 never closes a scene (i != 0
    // guard), and its 1->0 edge moves the first scene's start to 1
    assert(scenesFromPredictions(Seq(1, 0, 0, 1, 0)) == Seq((1, 3), (4, 4)))
    // no transitions: the whole video as one scene (end = length)
    assert(scenesFromPredictions(Seq(0, 0, 0, 0)) == Seq((0, 4)))
    assert(scenesFromPredictions(Seq(0, 0, 0, 0), entireSceneAsClip = false) == Nil)
  }

  test("filter: truncate vs stride max-length, crop, min-length order") {
    import SceneClips._
    val scenes = Seq((0, 25), (30, 34))
    assert(filterScenes(scenes, maxLength = Some(10)) == Seq((0, 10), (30, 34))) // truncate
    assert(filterScenes(scenes, maxLength = Some(10), maxLengthMode = "stride") ==
      Seq((0, 10), (10, 20), (20, 25), (30, 34)))
    // stride drops a FINAL span under min_length, and the floor then
    // also applies post-hoc
    assert(filterScenes(scenes, minLength = Some(6), maxLength = Some(10),
      maxLengthMode = "stride") == Seq((0, 10), (10, 20)))
    assert(filterScenes(Seq((0, 10)), cropLength = Some(3)) == Seq((3, 7)))
    assert(filterScenes(Seq((0, 6)), cropLength = Some(3)) == Nil) // zero-length after crop
    intercept[NotImplementedError](filterScenes(scenes, maxLength = Some(5),
      maxLengthMode = "bogus"))
  }

  test("DataFrame stage explodes spans; clip aesthetic reduces mean/min and drops empty clips") {
    val df = Seq((1L, Seq(0, 0, 1, 0, 0))).toDF("vid", "predictions")
    val out = SceneClips.clipsFromPredictions(df)
      .select("clip_start", "clip_end").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.toSeq == Seq((0, 2), (3, 4)))

    val e = (i: Int, j: Int) => {
      val v = new Array[Float](16); v(i) = 0.70710677f; v(j) = 0.70710677f; v.toSeq
    }
    val clips = Seq(
      (1L, Seq(e(7, 12), e(0, 8))),   // scores 14.85 and 7.07
      (2L, Seq.empty[Seq[Float]]),    // no frames -> -1.0
      (3L, null.asInstanceOf[Seq[Seq[Float]]])
    ).toDF("clip_id", "frame_embeddings")
    val aes = "src/main/resources/models/aesthetic_tiny.bin"
    val minScores = ClipAestheticFilter(aes, scoreThreshold = 0.5).score(clips)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(minScores(1L) - 10 * 0.7071067690849304) < 1e-9) // min of the two
    assert(minScores(2L) == -1.0 && minScores(3L) == -1.0)
    val meanKept = ClipAestheticFilter(aes, scoreThreshold = 10.0, reduction = "mean")(clips)
      .select("clip_id").collect().map(_.getLong(0)).toSeq
    assert(meanKept == Seq(1L)) // mean (14.85+7.07)/2 = 10.96 >= 10
    intercept[IllegalArgumentException](ClipAestheticFilter(aes, reduction = "max"))
  }
}
