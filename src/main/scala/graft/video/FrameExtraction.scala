package graft.video

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ClipFrameExtractionStage's sampling-policy arithmetic
  * (stages/video/clipping/clip_frame_extraction.py:34-131 over
  * utils/decoder_utils.py:287-389,606-666), decode-free: everything up
  * to the PyAV `get_batch` call — which frame indices each
  * (policy, target_fps) signature selects from a clip's presentation
  * timestamps — is pure arithmetic and ported exactly, including the
  * LCM decode-sharing shortcut and sample_closest's half-interval
  * endpoint epsilon, left-on-tie closest matching, and dedup. The
  * decode itself is codec-bound and stays a deploy-time seam; the
  * stage emits indices for the decoder to fetch.
  */
object FrameExtraction {

  /** FrameExtractionPolicy (decoder_utils.py:70-80). Only sequence and
    * middle are implemented by the reference's extract_frames.
    */
  sealed abstract class Policy(val name: String)
  case object First extends Policy("first")
  case object Middle extends Policy("middle")
  case object Last extends Policy("last")
  case object Sequence extends Policy("sequence")

  /** FramePurpose.value → the default target fps per purpose
    * (decoder_utils.py:83-91, clip_frame_extraction.py:61-64).
    */
  val PurposeAesthetics = 1
  val PurposeEmbeddings = 2

  /** FrameExtractionSignature.to_str (decoder_utils.py:105-112):
    * "FrameExtractionPolicy.{name}-{fps*1000 as int}".
    */
  def signature(policy: Policy, targetFps: Double): String =
    s"FrameExtractionPolicy.${policy.name}-${(targetFps * 1000).toInt}"

  /** lcm_multiple (clip_frame_extraction.py:70-73): int-cast then LCM. */
  def lcmMultiple(fps: Seq[Double]): Long =
    fps.map(_.toLong).reduce((a, b) => if (a == 0 || b == 0) 0 else a / gcd(a, b) * b)

  private def gcd(a: Long, b: Long): Long = if (b == 0) math.abs(a) else gcd(b, a % b)

  /** The decode-sharing gate (clip_frame_extraction.py:89-93): >1
    * target and every target integral.
    */
  def useLcmFps(fps: Seq[Double]): Boolean =
    fps.length > 1 && fps.forall(f => f == math.floor(f) && !f.isInfinite)

  /** find_closest_indices (decoder_utils.py:287-318): closest src index
    * per dst element; ties go LEFT.
    */
  def findClosestIndices(src: Array[Float], dst: Array[Float]): Array[Int] =
    dst.map { d =>
      // beyond-end override first (decoder_utils.py:315-316): anything
      // at or past the last timestamp clamps to the final index —
      // also what makes a duplicated trailing pts resolve RIGHT
      if (d >= src(src.length - 1)) src.length - 1
      else {
        var right = java.util.Arrays.binarySearch(src, d) match {
          case i if i >= 0 => i // exact hit = searchsorted left insertion point
          case i => -i - 1
        }
        right = math.min(math.max(right, 1), src.length - 1)
        val left = right - 1
        // single-element src never reaches here (the clamp above
        // catches it — numpy's clip(·,1,0)/index -1 path)
        if (left >= 0 && math.abs(d - src(right)) >= math.abs(d - src(left))) left
        else right
      }
    }

  /** sample_closest (decoder_utils.py:321-389): indices+counts of the
    * closest timestamps on the target-fps grid; endpoint adds half a
    * sample interval so the final frame joins when it fits; dedup
    * collapses repeats into counts.
    */
  def sampleClosest(src: Array[Float], sampleRate: Double,
                    start: Option[Double] = None, stop: Option[Double] = None,
                    endpoint: Boolean = true, dedup: Boolean = true):
      (Array[Int], Array[Int], Array[Float]) = {
    require(sampleRate > 0, s"Sample rate must be greater than 0, got sample_rate=$sampleRate")
    val interval = 1.0 / sampleRate
    val s0 = start.getOrElse(src(0).toDouble)
    var s1 = stop.getOrElse(src(src.length - 1).toDouble)
    if (endpoint) s1 += interval * 0.5
    // np.arange(start, stop, step, dtype=float32): ceil((stop-start)/step)
    // elements (length computed in double), FILLED in float32 exactly as
    // numpy's FLOAT_fill does — buf[0] = f32(start), buf[1] =
    // f32(start+step), buf[i>=2] = buf[0] + f32(i) * (buf[1] - buf[0]),
    // every operation in float32. Grid values 1 ulp off numpy's flip the
    // left-on-tie closest-index choice on long clips, so the arithmetic
    // must match bit for bit, not just to double rounding.
    val n = math.max(0, math.ceil((s1 - s0) / interval).toLong).toInt
    var samples = new Array[Float](n)
    if (n > 0) samples(0) = s0.toFloat
    if (n > 1) samples(1) = (s0 + interval).toFloat
    if (n > 2) {
      val startF = samples(0)
      val delta = samples(1) - samples(0)
      var i = 2
      while (i < n) { samples(i) = startF + i.toFloat * delta; i += 1 }
    }
    var idx = findClosestIndices(src, samples)
    if (!endpoint && samples.nonEmpty &&
      math.abs(samples(samples.length - 1) - s1) <= 1e-8 + 1e-5 * math.abs(s1)) {
      idx = idx.dropRight(1); samples = samples.dropRight(1)
    }
    if (dedup) {
      val grouped = idx.groupBy(identity).toArray.sortBy(_._1)
      (grouped.map(_._1), grouped.map(_._2.length), samples)
    } else (idx, Array.fill(idx.length)(1), samples)
  }

  /** extract_frames' index selection (decoder_utils.py:641-659) as
    * ABSOLUTE frame indices, one per SAMPLE: policy slices the
    * timestamp list (sequence = all; middle = the single middle frame,
    * even counts take the left of the pair), sample_closest picks the
    * target-fps grid, and the decoder materializes each index `counts`
    * times (decode_video_cpu_frame_ids preallocates counts.sum()
    * frames) — supersampling REPEATS frames, so the returned sequence
    * repeats indices. first/last raise, as in the reference.
    */
  def frameIndices(timestamps: Array[Float], policy: Policy, sampleRateFps: Double): Array[Int] = {
    require(timestamps.nonEmpty, "Can't extract frames from empty video")
    val (sliced, offset) =
      if (policy == Sequence || timestamps.length == 1) (timestamps, 0)
      else if (policy == Middle) {
        val n = timestamps.length
        val i = if (n % 2 == 0) n / 2 - 1 else n / 2
        (timestamps.slice(i, i + 1), i)
      } else throw new UnsupportedOperationException(
        "Extraction policies apart from Sequence and Middle not available yet")
    val (idx, counts, _) = sampleClosest(sliced, sampleRateFps)
    idx.zip(counts).flatMap { case (i, c) => Array.fill(c)(i + offset) }
  }

  /** The full stage arithmetic for one clip (clip_frame_extraction
    * .py:77-124): signature → selected frame indices, sharing one
    * LCM-rate pass when every target fps is integral (the decoded
    * frames are then strided `[::lcm/fps]` — equivalently every k-th
    * selected index).
    */
  def extractionPlan(timestamps: Array[Float], policies: Seq[Policy],
                     targetFps: Seq[Double]): Map[String, Array[Int]] =
    policies.flatMap { policy =>
      if (useLcmFps(targetFps)) {
        val lcm = lcmMultiple(targetFps)
        val base = frameIndices(timestamps, policy, lcm.toDouble)
        targetFps.map { fps =>
          val k = (lcm / fps).toInt
          signature(policy, fps) ->
            base.zipWithIndex.collect { case (v, i) if i % k == 0 => v }
        }
      } else targetFps.map(fps =>
        signature(policy, fps) -> frameIndices(timestamps, policy, fps))
    }.toMap

  /** DataFrame stage: appends `extracted_frames` (map signature →
    * array of frame indices) from a presentation-timestamps column —
    * a pure zero-exchange map; rows with null/empty timestamps get an
    * empty map (the reference's errors["buffer"]="empty" route).
    */
  def withExtractedFrames(df: DataFrame, tsCol: String = "frame_timestamps",
                          policies: Seq[Policy] = Seq(Sequence),
                          targetFps: Seq[Double] = Seq(2.0),
                          outCol: String = "extracted_frames"): DataFrame = {
    val pol = policies; val fps = targetFps
    val f = udf { ts: scala.collection.Seq[Float] =>
      if (ts == null || ts.isEmpty) Map.empty[String, Seq[Int]]
      else extractionPlan(ts.toArray, pol, fps).map { case (k, v) => k -> v.toSeq }
    }.asNondeterministic() // pure, but keep Catalyst from re-evaluating per projection
    df.withColumn(outCol, f(col(tsCol)))
  }
}
