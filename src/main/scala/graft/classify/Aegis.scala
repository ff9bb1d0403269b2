package graft.classify

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.PyText

/** AEGIS content-safety classifier contract
  * (stages/text/classifiers/aegis.py:236-476 + aegis_utils.py): wrap
  * each document in the verbatim LlamaGuard safety-policy prompt
  * (max_chars truncation BEFORE wrapping, aegis.py:250), run the LLM,
  * parse its completion into one of the 15 AEGIS_LABELS
  * ("safe" / category "O1".."O13" / "unknown"), then optionally
  * filter_by. The 7B LlamaGuard+LoRA model itself is GPU-bound and
  * rides the injected `llm: String => String` seam (the NemotronCC /
  * ASR / fetch posture — a deployment passes a real inference
  * endpoint); the PROMPT BYTES and the response-parsing decision table
  * are the reference's own, extracted verbatim from aegis_utils.py
  * into resources (the prompt IS the API contract — a model served
  * the wrong bytes returns garbage).
  *
  * 100 TB posture: pure map (one LLM call per row inside
  * mapPartitions-style UDF batching), no shuffle.
  */
final case class AegisClassifier(
    llm: String => String,
    labelField: String = "aegis_pred",
    rawOutputField: String = "_aegis_raw_pred",
    keepRawOutput: Boolean = false,
    textField: String = "text",
    filterBy: Seq[String] = Nil,
    maxChars: Int = 6000) extends Serializable {

  def apply(df: DataFrame): DataFrame = {
    val f = llm
    val mc = maxChars
    val u = udf((t: String) => {
      val doc = if (t == null) "" else if (mc > 0 && t.length > mc) t.substring(0, mc) else t
      val raw = f(Aegis.formatAegis(doc))
      (Aegis.parseResponse(raw), raw)
    }).asNondeterministic() // one LLM call per row — never re-evaluate
    val scored = df.withColumn("_p", u(col(textField)))
      .withColumn(labelField, col("_p._1"))
    val withRaw =
      if (keepRawOutput) scored.withColumn(rawOutputField, col("_p._2")).drop("_p")
      else scored.drop("_p")
    if (filterBy.isEmpty) withRaw else withRaw.filter(col(labelField).isin(filterBy: _*))
  }
}

/** InstructionDataGuardClassifier contract (aegis.py:478-600 +
  * create_output_dataframe:220-227): a sigmoid probability head over
  * the pooled representation emitting
  * `instruction_data_guard_poisoning_score` plus
  * `is_poisoned = score >= 0.5`. The AEGIS-hidden-state MLP
  * (InstructionDataGuardNet, aegis.py:53-77) is GPU-bound; here the
  * head is a GLIN sigmoid artifact over an embedding column — real
  * exported weights drop into the same slot.
  */
final case class InstructionDataGuard(
    modelPath: String,
    labelField: String = "is_poisoned",
    scoreField: String = "instruction_data_guard_poisoning_score",
    embeddingCol: String = "embedding") {

  def score(df: DataFrame): DataFrame = {
    val path = modelPath
    val u = udf((e: Seq[Float]) =>
      if (e == null) 0.0 else graft.multimodal.LinearHead.load(path).score(e))
      .asNondeterministic()
    df.withColumn(scoreField, u(col(embeddingCol)))
      .withColumn(labelField, col(scoreField) >= 0.5)
  }
}

object Aegis {

  /** aegis_utils.py AEGIS_LABELS — position 0/1 are the non-category
    * outcomes, categories are labels.drop(2).
    */
  val Labels: Seq[String] = Seq("unknown", "safe",
    "O1", "O2", "O3", "O4", "O5", "O6", "O7", "O8", "O9", "O10", "O11", "O12", "O13")

  private def resource(name: String): String = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Byte-verbatim prompt halves of aegis_utils.format_aegis (the
    * message is spliced between them; extracted with a sentinel so the
    * f-string's literal indentation survives).
    */
  val PromptPrefix: String = resource("aegis/prompt_prefix.txt")
  val PromptSuffix: String = resource("aegis/prompt_suffix.txt")

  /** format_aegis(message) — aegis_utils.py:158-180. */
  def formatAegis(message: String): String = PromptPrefix + message + PromptSuffix

  /** PostProcessAegisResponsesStage._parse_response (aegis.py:316-331):
    * first line "safe" → safe; "unsafe" → second line must be exactly
    * one category id, else unknown; anything else → unknown.
    */
  def parseResponse(raw: String): String = {
    // a null completion (failed endpoint) is "anything else" -> the
    // decision table's unknown branch, never an executor NPE
    if (raw == null) return "unknown"
    val lines = raw.split("\n", -1)
    if (PyText.strip(lines(0)) == "safe") "safe"
    else if (PyText.strip(lines(0)) == "unsafe") {
      if (lines.length < 2) "unknown"
      else {
        val potential = PyText.strip(lines(1))
        if (Labels.drop(2).contains(potential)) potential else "unknown"
      }
    } else "unknown"
  }

  /** Extract the document back out of a formatted prompt — the
    * fixture-LLM helper (tests and the zero-egress catalog entry
    * respond from the message content, which also verifies the prompt
    * bytes around it).
    */
  def messageOf(prompt: String): String = {
    require(prompt.startsWith(PromptPrefix) && prompt.endsWith(PromptSuffix),
      "prompt does not carry the verbatim AEGIS template")
    prompt.substring(PromptPrefix.length, prompt.length - PromptSuffix.length)
  }
}
