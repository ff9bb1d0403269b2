package graft.video

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TransNetV2 clip-extraction POST-PROCESSING — the pure scene logic
  * of TransNetV2ClipExtractionStage
  * (stages/video/clipping/transnetv2_extraction.py:195-325): the shot
  * NN emits a per-frame 0/1 transition array (the model slot); scenes
  * derive from transition edges, then filter by max-length
  * (truncate, or stride into max_length spans dropping a final
  * sub-min-length remainder), optional start/end cropping, and a
  * min-length floor. All ported exactly, including the
  * trailing-scene and entire-scene-as-clip rules.
  */
object SceneClips {

  /** _get_scenes (transnetv2_extraction.py:195-226): a scene opens at
    * the frame after a 1→0 edge and closes at the next 0→1 edge; a
    * trailing open scene closes at the last frame; with no
    * transitions, optionally the whole video is one scene.
    */
  def scenesFromPredictions(predictions: Seq[Int],
                            entireSceneAsClip: Boolean = true): Seq[(Int, Int)] = {
    val scenes = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var tPrev = 0
    var t = -1
    var start = 0
    var i = -1
    predictions.foreach { p =>
      i += 1
      t = p
      if (tPrev == 1 && t == 0) start = i
      if (tPrev == 0 && t == 1 && i != 0) scenes += ((start, i))
      tPrev = t
    }
    if (scenes.nonEmpty && t == 0) scenes += ((start, i))
    if (scenes.isEmpty && entireSceneAsClip) scenes += ((0, predictions.length))
    scenes.toSeq
  }

  /** _create_spans (transnetv2_extraction.py:299-325): consecutive
    * max_length spans; a final span under min_length is dropped.
    */
  def createSpans(start: Int, end: Int, maxLength: Int,
                  minLength: Option[Int]): Seq[(Int, Int)] = {
    require(maxLength > 0, s"maxLength must be positive (got $maxLength)") // a 0 would never advance
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var cur = start
    var done = false
    while (cur < end && !done) {
      val curEnd = math.min(cur + maxLength, end)
      if (minLength.exists(m => curEnd - cur < m) && curEnd == end) done = true
      else { spans += ((cur, curEnd)); cur = curEnd }
    }
    spans.toSeq
  }

  /** _crop_scenes: shrink both ends, dropping non-positive scenes. */
  def cropScenes(scenes: Seq[(Int, Int)], cropLength: Int): Seq[(Int, Int)] =
    scenes.map { case (s, e) => (s + cropLength, e - cropLength) }
      .filter { case (s, e) => e - s > 0 }

  /** _get_filtered_scenes (transnetv2_extraction.py:229-280): order is
    * max-length (truncate | stride) → crop → min-length.
    */
  def filterScenes(scenes: Seq[(Int, Int)], minLength: Option[Int] = None,
                   maxLength: Option[Int] = None,
                   maxLengthMode: String = "truncate",
                   cropLength: Option[Int] = None): Seq[(Int, Int)] = {
    val afterMax = maxLength match {
      case None => scenes
      case Some(ml) => maxLengthMode match {
        case "truncate" => scenes.map { case (s, e) => (s, math.min(s + ml, e)) }
        case "stride" => scenes.flatMap { case (s, e) => createSpans(s, e, ml, minLength) }
        case other => throw new NotImplementedError(s"Method `$other` not implemented!")
      }
    }
    val afterCrop = cropLength.fold(afterMax)(c => cropScenes(afterMax, c))
    minLength.fold(afterCrop)(m => afterCrop.filter { case (s, e) => e - s >= m })
  }

  /** TransNetV2ClipExtractionStage glue
    * (transnetv2_extraction.py:95-143): threshold the model's
    * per-frame shot probabilities (STRICT >, :195), derive and filter
    * scenes with the stage's second→frame knobs (TRUNCATED via
    * int(s·fps); a 0/None knob disables its filter — Python
    * falsiness), emit spans back in SECONDS (frame/framerate) with
    * uuid5 clip ids over "{video}_{startFrame}_{endFrame}" under
    * NAMESPACE_URL, capped at limit_clips when positive. Stage
    * defaults: threshold 0.4, min 2.0 s, max 10.0 s stride, crop
    * 0.5 s.
    */
  def extractClips(df: DataFrame, probsCol: String = "shot_probs",
                   nameCol: String = "video_name", fpsCol: String = "framerate",
                   threshold: Double = 0.4, minLengthS: Double = 2.0,
                   maxLengthS: Double = 10.0, maxLengthMode: String = "stride",
                   cropS: Double = 0.5, entireSceneAsClip: Boolean = true,
                   limitClips: Int = -1): DataFrame = {
    val esc = entireSceneAsClip
    val u = udf((probs: Seq[Double], name: String, fps: Double) => {
      // the reference skips videos with falsy framerate before the
      // span math (transnetv2_extraction.py:100-102) — without this a
      // zero fps makes maxLength 0 and the stride loop never advances
      if (fps <= 0 || probs == null) Seq.empty[(String, Double, Double)]
      else {
      val preds = probs.map(p => if (p > threshold) 1 else 0)
      val scenes = filterScenes(scenesFromPredictions(preds, esc),
        minLength = if (minLengthS != 0) Some((minLengthS * fps).toInt) else None,
        maxLength = if (maxLengthS != 0) Some((maxLengthS * fps).toInt) else None,
        maxLengthMode = maxLengthMode,
        cropLength = if (cropS != 0) Some((cropS * fps).toInt) else None)
      val capped = if (limitClips > 0) scenes.take(limitClips) else scenes
      capped.map { case (s, e) =>
        (graft.dedup.IdGenerator.uuid5(s"${name}_${s}_${e}"), s / fps, e / fps)
      }
      }
    })
    df.withColumn("_c", explode(u(col(probsCol), col(nameCol), col(fpsCol))))
      .withColumn("clip_uuid", col("_c._1"))
      .withColumn("span_start", col("_c._2"))
      .withColumn("span_end", col("_c._3"))
      .drop("_c")
  }

  /** DataFrame stage: explode per-video transition predictions into
    * clip-span rows (clip_start, clip_end). Pure per-row work.
    */
  def clipsFromPredictions(df: DataFrame, predictionsCol: String = "predictions",
                           entireSceneAsClip: Boolean = true,
                           minLength: Option[Int] = None,
                           maxLength: Option[Int] = None,
                           maxLengthMode: String = "truncate",
                           cropLength: Option[Int] = None): DataFrame = {
    val esc = entireSceneAsClip
    val u = udf((p: Seq[Int]) =>
      filterScenes(scenesFromPredictions(p, esc), minLength, maxLength,
        maxLengthMode, cropLength))
    df.withColumn("_sc", explode(u(col(predictionsCol))))
      .withColumn("clip_start", col("_sc._1"))
      .withColumn("clip_end", col("_sc._2"))
      .drop("_sc")
  }

  /** FixedStrideExtractorStage (clip_extraction_stages.py:347-412):
    * spans of `clipLenS` every `clipStrideS` seconds over duration =
    * num_frames / framerate (clips shorter than `minClipLengthS`
    * dropped, the last span clamped to the duration), each with the
    * uuid5("{video}_{int(start*fps)}_{int(end*fps)}") clip id. Pure
    * per-row arithmetic; rows with missing/zero metadata yield no
    * clips (the reference's incomplete-metadata skip). The reference's
    * `limit_clips` is an already-clipped idempotency guard on mutable
    * VideoTask state, not a cap on produced spans — stateless
    * DataFrame rows have nothing to guard, so it has no counterpart
    * here.
    */
  def fixedStrideClips(df: DataFrame, clipLenS: Double, clipStrideS: Double,
                       minClipLengthS: Double,
                       nameCol: String = "video_name", framesCol: String = "num_frames",
                       fpsCol: String = "framerate"): DataFrame = {
    // a zero/negative stride would spin the span iterator forever
    // inside an executor task — fail fast at plan time instead
    require(clipStrideS > 0, s"clipStrideS must be > 0, got $clipStrideS")
    val u = udf((name: String, numFrames: java.lang.Integer, fps: java.lang.Double) => {
      if (name == null || numFrames == null || fps == null || fps <= 0)
        Seq.empty[(String, Double, Double, Int, Int)]
      else {
        val duration = numFrames.toDouble / fps
        val bounds = Iterator.iterate(0.0)(_ + clipStrideS).takeWhile(_ < duration)
          .map(s => (s, math.min(s + clipLenS, duration)))
          .filter { case (s, e) => e - s >= minClipLengthS }
          .toSeq
        bounds.map { case (s, e) =>
          val startEvent = (s * fps).toInt
          val endEvent = (e * fps).toInt
          (graft.dedup.IdGenerator.uuid5(s"${name}_${startEvent}_${endEvent}"),
            s, e, startEvent, endEvent)
        }
      }
    }).asNondeterministic() // pure; avoid Catalyst re-evaluation per projection
    df.withColumn("_fc", explode(u(col(nameCol), col(framesCol), col(fpsCol))))
      .withColumn("clip_uuid", col("_fc._1"))
      .withColumn("span_start", col("_fc._2"))
      .withColumn("span_end", col("_fc._3"))
      .withColumn("start_event", col("_fc._4"))
      .withColumn("end_event", col("_fc._5"))
      .drop("_fc")
  }
}
