package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** QAMultilingualSyntheticStage
  * (stages/synthetic/qa_multilingual_synthetic.py:32-129): generate
  * `numSamples` documents from a prompt template with a `{language}`
  * slot, one LLM call per sample, post-processing the response by
  * stripping every `*` (some models bold their output). The model call
  * is the injected `llm` seam shared with NemotronCC; the reference
  * picks the language with `secrets.choice` (cryptographic randomness)
  * — here the chooser is injectable and defaults to a deterministic
  * per-id pick so tests and oracles can replay it (production callers
  * inject their own randomness if they want the reference's behavior).
  */
object QAMultilingual {

  /** _process_llm_response (qa_multilingual_synthetic.py:64-72). */
  def processResponse(generated: String): String =
    if (generated.contains("*")) generated.replace("*", "") else generated

  /** Python str.format's `{language}` substitution for this template. */
  def formatPrompt(template: String, language: String): String =
    template.replace("{language}", language)

  /** One response row per input id: language ← chooser(id), prompt ←
    * template.format(language), text ← processResponse(llm(prompt)).
    * Pure zero-exchange map.
    */
  def withResponses(df: DataFrame, prompt: String, languages: Seq[String],
                    llm: String => String,
                    chooseLanguage: Long => String = null,
                    idCol: String = "id"): DataFrame = {
    require(languages.nonEmpty, "languages must be non-empty")
    val langs = languages.toIndexedSeq
    val choose: Long => String =
      if (chooseLanguage != null) chooseLanguage
      else id => langs((math.floorMod(id, langs.size.toLong)).toInt)
    val f = udf { id: Long =>
      val language = choose(id)
      val p = formatPrompt(prompt, language)
      val resp = llm(p)
      (language, processResponse(if (resp == null) "" else resp))
    }.asNondeterministic() // the llm seam may be expensive; evaluate once
    df.withColumn("_r", f(col(idCol)))
      .withColumn("language", col("_r._1"))
      .withColumn("text", col("_r._2"))
      .drop("_r")
  }

  /** The stage contract: `numSamples` rows from an empty input (the
    * reference's _EmptyTask → DocumentBatch shape).
    */
  def generate(spark: SparkSession, prompt: String, languages: Seq[String],
               numSamples: Int, llm: String => String,
               chooseLanguage: Long => String = null): DataFrame =
    withResponses(spark.range(numSamples).toDF(), prompt, languages, llm, chooseLanguage)
}
