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

  test("extractClips stage glue: strict threshold, truncated frame knobs, second spans, uuid5 ids") {
    // 120 frames at 25 fps, one shot boundary at frame 60; prob 0.4 is
    // NOT a transition (strict >)
    val probs = Seq.tabulate(120)(i => if (i == 60) 0.9 else if (i == 30) 0.4 else 0.1)
    val df = Seq(("vid1", probs, 25.0)).toDF("video_name", "shot_probs", "framerate")
    val out = SceneClips.extractClips(df, minLengthS = 1.0)
      .select("clip_uuid", "span_start", "span_end").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // scenes (0,60) + trailing (61,119); crop int(0.5*25)=12 ->
    // (12,48),(73,107); both >= min int(1.0*25)=25 frames
    assert(out.map(c => (c._2, c._3)).toSeq == Seq((12 / 25.0, 48 / 25.0), (73 / 25.0, 107 / 25.0)))
    assert(out.head._1 == graft.dedup.IdGenerator.uuid5("vid1_12_48"))

    // limit_clips caps; crop 0 disables cropping (Python falsiness)
    val capped = SceneClips.extractClips(df, minLengthS = 1.0, cropS = 0.0, limitClips = 1)
      .select("span_start", "span_end").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(capped.toSeq == Seq((0.0, 60 / 25.0)))

    // falsy framerate: the reference skips the video entirely — a zero
    // fps must yield no clips, never a non-advancing stride loop
    val zeroFps = Seq(("vid2", probs, 0.0)).toDF("video_name", "shot_probs", "framerate")
    assert(SceneClips.extractClips(zeroFps).count() == 0)
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
