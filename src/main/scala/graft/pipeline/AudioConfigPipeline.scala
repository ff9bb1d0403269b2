package graft.pipeline

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.audio.{AudioMetrics, AudioStages, Fleurs}

/** Runner for the reference's Hydra `processors:` audio configs
  * (tutorials/audio/fleurs/pipeline.yaml) — the second YAML dialect
  * next to [[ConfigPipeline]]'s `stages:`/`workflow:` forms: a flat
  * `_target_` processor list with `${var}` interpolation against
  * top-level keys (including nested references like
  * `output_dir: ${raw_data_dir}/result`) and `???` required
  * overrides. The network fetch and the NeMo ASR model are the usual
  * injected seams; every other processor dispatches to the ported
  * audio stages, so the reference's own config file executes
  * unchanged.
  */
object AudioConfigPipeline {

  /** Runs every processor in order and returns the final frame (also
    * written by a trailing JsonlWriter processor, if present).
    */
  def run(spark: SparkSession, yamlPath: String,
          overrides: Map[String, String],
          fetch: String => Array[Byte],
          asr: Array[Byte] => String): DataFrame = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val root = mapper.readValue(new java.io.File(yamlPath),
      classOf[java.util.Map[String, Object]]).asScala

    def scalar(v: Object): Option[String] = v match {
      case null => None
      case s: String => Some(s)
      case n: Number => Some(n.toString)
      case b: java.lang.Boolean => Some(b.toString)
      case _ => None
    }
    // top-level vars with bounded fixpoint interpolation (output_dir
    // references raw_data_dir); overrides shadow, and must fill every ???
    val vars = YamlVars.fixpoint(
      root.toMap.collect { case (k, v) if scalar(v).isDefined => k -> scalar(v).get } ++
        overrides)
    def resolve(raw: String): String = YamlVars.resolve(raw, vars)

    val all = root.get("processors") match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toVector.map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
      case _ => throw new IllegalArgumentException(s"$yamlPath has no processors: list")
    }
    // processors_to_run: "all" or a "start:stop" slice (partial reruns
    // over an existing manifest); anything else must not run silently
    val (processors, startIdx) = vars.getOrElse("processors_to_run", "all") match {
      case "all" => (all, 0)
      case s if s.matches("-?\\d*:-?\\d*") =>
        val parts = s.split(":", -1)
        def idx(p: String, default: Int) =
          if (p.isEmpty) default else if (p.toInt < 0) all.size + p.toInt else p.toInt
        val start = idx(parts(0), 0)
        (all.slice(start, idx(parts(1), all.size)), start)
      case other =>
        throw new IllegalArgumentException(s"unsupported processors_to_run: $other")
    }
    if (processors.isEmpty)
      throw new IllegalArgumentException(
        s"processors_to_run=${vars.getOrElse("processors_to_run", "all")} selects no processors")
    // A slice starting past 0 resumes from the PREVIOUS stage's manifest
    // (the reference's processors are file-chained jsonl manifests) —
    // the first selected processor must name it via input_manifest_file;
    // running it against nothing would NPE inside the stage
    val initial: DataFrame =
      if (startIdx == 0) null
      else processors.head.get("input_manifest_file").flatMap(scalar).map(resolve) match {
        case Some(manifest) => graft.io.JsonlIO.readInferred(spark, manifest)
        case None => throw new IllegalArgumentException(
          s"processors_to_run starts at $startIdx: the first selected processor " +
            "needs input_manifest_file (the prior stage's manifest) to resume from")
      }

    processors.foldLeft(initial) { (df, p) =>
      def str(k: String, default: => String = null): String =
        p.get(k).flatMap(scalar).map(resolve).getOrElse(default)
      val target = scalar(p("_target_")).get.split('.').last
      target match {
        case "CreateInitialManifestFleursStage" =>
          Fleurs.initialManifest(spark, str("lang"), str("split"),
            (url: String, out: java.io.OutputStream) => out.write(fetch(url)),
            str("raw_data_dir"))
        case "InferenceAsrNemoStage" =>
          AudioStages.withTranscription(df, asr)
        case "GetPairwiseWerStage" =>
          AudioMetrics.withWer(df, str("text_key", "text"),
            str("pred_text_key", "pred_text"), str("wer_key", "wer"))
        case "GetAudioDurationStage" =>
          AudioStages.withDuration(df, durationCol = str("duration_key", "duration"))
        case "PreserveByValueStage" =>
          // target_value is `int | str` in the reference
          // (audio/common.py:86): keep the YAML node's own type
          val target = p.getOrElse("target_value",
            throw new IllegalArgumentException("PreserveByValueStage needs target_value")) match {
            case n: Number => lit(n.doubleValue())
            case s: String => lit(resolve(s))
            case other => throw new IllegalArgumentException(s"bad target_value: $other")
          }
          AudioStages.preserveByValue(df, str("input_value_key"),
            target, str("operator", "eq"))
        case "AudioToDocumentStage" =>
          // DocumentBatch keeps the text-side fields; the binary
          // payload stays behind (audio/io/convert.py wraps the same
          // dict rows minus the in-memory audio object)
          AudioStages.audioToDocument(df, df.columns.filterNot(_ == "audio").toSeq)
        case "JsonlWriter" =>
          graft.io.JsonlIO.write(df, str("path"))
          df
        case other =>
          throw new IllegalArgumentException(s"unsupported processor _target_: $other")
      }
    }
  }
}
