package graft.app

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for config-driven runs — the reference's
  * `python -m ... --config-path` CLI shape:
  *
  *   spark-submit --class graft.app.PipelineApp graft.jar \
  *     /path/heuristic_filter_english_pipeline.yaml \
  *     input_path=/data/in output_path=/data/out
  *
  * Stage-list configs run through [[graft.pipeline.ConfigPipeline.run]];
  * `workflow:`-form configs (exact/fuzzy/semantic dedup) are detected
  * and dispatched to `runWorkflow`. Remaining args are `key=value`
  * overrides for `???` placeholders and top-level config keys.
  */
object PipelineApp {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PipelineApp <config.yaml> [key=value ...]")
    val yamlPath = args(0)
    val overrides = args.drop(1).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"override '$kv' is not key=value")
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap

    val builder = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val isWorkflow = {
      val src = java.nio.file.Files.readString(java.nio.file.Paths.get(yamlPath))
      src.linesIterator.exists(_.trim.startsWith("workflow:"))
    }
    val out =
      if (isWorkflow) graft.pipeline.ConfigPipeline.runWorkflow(spark, yamlPath, overrides)
      else graft.pipeline.ConfigPipeline.run(spark,
        graft.pipeline.ConfigPipeline.parse(yamlPath, overrides))
    println(s"[pipeline] ${out.count()} rows out")
    spark.stop()
  }
}
