package graft.audio

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference audio pipeline's DataFrame-shaped stages
  * (stages/audio/): duration annotation, value-based preservation,
  * the ASR inference seam, and the AudioBatch → DocumentBatch
  * conversion (which in Spark is just column selection — batches ARE
  * DataFrames here).
  */
object AudioStages {

  /** GetAudioDurationStage (audio/common.py:44-69) over a BINARY audio
    * column: duration_key = frames / samplerate, -1.0 on parse error.
    * The reference reads a filepath via soundfile; over an Iceberg
    * table the payload is an opaque binary column (BASELINE input
    * hint), so the parse runs on the bytes directly.
    */
  def withDuration(df: DataFrame, audioCol: String = "audio",
                   durationCol: String = "duration"): DataFrame = {
    val u = udf((b: Array[Byte]) => WavIO.wavDurationSeconds(b))
    df.withColumn(durationCol, u(col(audioCol)))
  }

  /** PreserveByValueStage (audio/common.py:71-110): keep rows where
    * `input_value_key <op> target_value`, op ∈ lt/le/eq/ne/ge/gt.
    */
  def preserveByValue(df: DataFrame, inputValueCol: String, targetValue: Column,
                      operator: String = "eq"): DataFrame = {
    val c = col(inputValueCol)
    val cond = operator match {
      case "lt" => c < targetValue
      case "le" => c <= targetValue
      case "eq" => c === targetValue
      case "ne" => c =!= targetValue
      case "ge" => c >= targetValue
      case "gt" => c > targetValue
      case other => throw new IllegalArgumentException(s"unknown operator: $other")
    }
    df.filter(cond)
  }

  /** ASR inference seam (stages/audio/inference/asr_nemo.py runs a
    * NeMo GPU model batch-wise): transcription is an injected
    * `Array[Byte] => String` — the same zero-egress/model-free seam as
    * the LLM and fetch functions; a deployment wires the real model
    * via mapPartitions-style batching exactly like the text
    * classifiers. Nondeterministic-marked: external inference must not
    * be re-evaluated by the optimizer.
    */
  def withTranscription(df: DataFrame, asr: Array[Byte] => String,
                        audioCol: String = "audio",
                        predCol: String = "pred_text"): DataFrame = {
    val u = udf((b: Array[Byte]) => if (b == null) null else asr(b)).asNondeterministic()
    df.withColumn(predCol, u(col(audioCol)))
  }

  /** AudioToDocumentStage (audio/io/convert.py): AudioBatch rows →
    * document rows — in Spark, selecting the text-side columns.
    */
  def audioToDocument(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)
}
