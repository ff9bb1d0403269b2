package graft.video

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Video caption tier — the pure-logic surface of
  * CaptionPreparationStage / CaptionGenerationStage /
  * CaptionEnhancementStage (stages/video/caption/) over the
  * injected-model posture: frame decode and the Qwen VL/LLM calls are
  * GPU/codec-bound deploy-time swaps, while the WINDOWING arithmetic
  * (utils/windowing_utils.py:41-77), the verbatim PROMPT TEMPLATES
  * (caption_preparation._PROMPTS, caption_enhancement._ENHANCE_PROMPTS
  * — extracted byte-verbatim into a resource; the prompt is the API
  * contract), the variant dispatch with prompt_text override, and the
  * chat-message structure (models/prompt_formatter.create_message) are
  * all replicated exactly.
  */
object Captioning {

  /** windowing_utils.WINDOW_MIN_FRAMES. */
  val WindowMinFrames = 4

  final case class WindowInfo(start: Int, end: Int)

  /** compute_windows (windowing_utils.py:41-77): full windows of
    * `windowSize`; a remainder ≥ `remainderThreshold` becomes its own
    * window, a smaller one merges into the last full window; videos
    * under WINDOW_MIN_FRAMES yield nothing; ≤ one window when the
    * video fits.
    */
  def computeWindows(totalFrames: Int, windowSize: Int = 128,
                     remainderThreshold: Int = 64): Seq[WindowInfo] = {
    if (totalFrames < WindowMinFrames) return Nil
    if (totalFrames <= windowSize) return Seq(WindowInfo(0, totalFrames - 1))
    val numFull = totalFrames / windowSize
    val remainder = totalFrames % windowSize
    val full = (0 until numFull).map(i => WindowInfo(i * windowSize, i * windowSize + windowSize - 1))
    if (remainder >= remainderThreshold)
      full :+ WindowInfo(totalFrames - remainder, totalFrames - 1)
    else if (remainder > 0)
      full.init :+ WindowInfo(full.last.start, totalFrames - 1)
    else full
  }

  private lazy val promptMaps: (Map[String, String], Map[String, String]) = {
    val in = getClass.getClassLoader.getResourceAsStream("video/caption_prompts.json")
    require(in != null, "missing resource video/caption_prompts.json")
    val root = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in) finally in.close()
    def toMap(node: com.fasterxml.jackson.databind.JsonNode): Map[String, String] = {
      val b = Map.newBuilder[String, String]
      node.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText())
      b.result()
    }
    (toMap(root.get("prompts")), toMap(root.get("enhance_prompts")))
  }

  /** _get_prompt (caption_preparation.py:62-73): explicit prompt_text
    * wins; unknown variants fail loudly.
    */
  def prompt(variant: String = "default", promptText: Option[String] = None): String =
    promptText.getOrElse(promptMaps._1.getOrElse(variant,
      throw new IllegalArgumentException(s"Invalid prompt variant: $variant")))

  /** _get_enhance_prompt (caption_enhancement.py). */
  def enhancePrompt(variant: String = "default", promptText: Option[String] = None): String =
    promptText.getOrElse(promptMaps._2.getOrElse(variant,
      throw new IllegalArgumentException(s"Invalid prompt variant: $variant")))

  /** PromptFormatter.create_message: the user message carrying a video
    * slot + the text prompt, serialized as JSON.
    */
  def createMessageJson(prompt: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val content = mapper.createArrayNode()
    content.addObject().put("type", "video")
    content.addObject().put("type", "text").put("text", prompt)
    val msg = mapper.createObjectNode()
    msg.put("role", "user")
    msg.set[com.fasterxml.jackson.databind.JsonNode]("content", content)
    val arr = mapper.createArrayNode()
    arr.add(msg)
    mapper.writeValueAsString(arr)
  }

  /** CaptionPreparationStage shape over a clips table: explode each
    * clip's frame count into window rows carrying (window_start,
    * window_end, prompt, llm message). Stage defaults window_size=256,
    * remainder_threshold=128 (caption_preparation.py:84-86).
    */
  def prepareWindows(clips: DataFrame, totalFramesCol: String = "total_frames",
                     windowSize: Int = 256, remainderThreshold: Int = 128,
                     promptVariant: String = "default",
                     promptText: Option[String] = None): DataFrame = {
    val p = prompt(promptVariant, promptText)
    val msg = createMessageJson(p)
    val ws = windowSize
    val rt = remainderThreshold
    val u = udf((n: Int) => computeWindows(n, ws, rt).map(w => (w.start, w.end)))
    clips.withColumn("_w", explode(u(col(totalFramesCol))))
      .withColumn("window_start", col("_w._1"))
      .withColumn("window_end", col("_w._2"))
      .drop("_w")
      .withColumn("caption_prompt", lit(p))
      .withColumn("llm_input", lit(msg))
  }

  /** CaptionGenerationStage shape: the VL model is an injected
    * `(prompt, windowRef) => caption` seam applied per window row.
    */
  def withCaptions(windows: DataFrame, vlm: (String, String) => String,
                   promptCol: String = "caption_prompt",
                   refCol: String = "window_ref",
                   outCol: String = "caption"): DataFrame = {
    val f = vlm
    val u = udf((p: String, ref: String) => f(p, ref)).asNondeterministic()
    windows.withColumn(outCol, u(col(promptCol), col(refCol)))
  }

  /** CaptionEnhancementStage shape: the enhance prompt is the system
    * turn, the existing caption the user turn, via an injected LLM.
    */
  def enhanceCaptions(df: DataFrame, llm: (String, String) => String,
                      promptVariant: String = "default",
                      promptText: Option[String] = None,
                      captionCol: String = "caption",
                      outCol: String = "enhanced_caption"): DataFrame = {
    val sys = enhancePrompt(promptVariant, promptText)
    val f = llm
    val u = udf((c: String) => if (c == null) null else f(sys, c)).asNondeterministic()
    df.withColumn(outCol, u(col(captionCol)))
  }
}
