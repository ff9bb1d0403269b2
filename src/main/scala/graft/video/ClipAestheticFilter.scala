package graft.video

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ClipAestheticFilterStage contract
  * (stages/video/filtering/clip_aesthetic_filter.py:29-120): score
  * each clip's extracted frame embeddings with the aesthetic head,
  * REDUCE across frames (`mean` | `min`, default min), keep clips
  * with reduced score >= threshold (default 0.5); clips with no
  * frames/embeddings score -1.0 and always drop. The CLIP encoder is
  * the GPU deploy-time swap; the head is the same committed GLIN
  * artifact the image tier uses.
  */
final case class ClipAestheticFilter(
    modelPath: String,
    scoreThreshold: Double = 0.5,
    reduction: String = "min",
    framesCol: String = "frame_embeddings",
    scoreCol: String = "aesthetic_score") {

  require(reduction == "mean" || reduction == "min", s"Invalid reduction: $reduction")

  def score(df: DataFrame): DataFrame = {
    val path = modelPath
    val red = reduction
    val u = udf((frames: Seq[Seq[Float]]) => {
      if (frames == null || frames.isEmpty) -1.0
      else {
        val scores = frames.map(f =>
          if (f == null) -1.0 else graft.multimodal.LinearHead.load(path).score(f))
        if (red == "mean") scores.sum / scores.size else scores.min
      }
    }).asNondeterministic() // per-frame head scores: run once, never below the pushed keep filter
    df.withColumn(scoreCol, u(col(framesCol)))
  }

  def apply(df: DataFrame): DataFrame = score(df).filter(col(scoreCol) >= scoreThreshold)
}
