package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.filters.{Cascade, HeuristicFilters}
import graft.scrub.{Modifiers, PiiScrub}
import graft.analysis.TextStats
import graft.extract.HtmlExtract

/** The flagship end-to-end curation job over a Common-Crawl-style table
  * (url, warc_ts, html, text, lang):
  *
  *   1. (optional) html → text extraction with decode fallback
  *   2. language ID (heuristic n-gram scorer; broadcastable trained model
  *      variant in [[graft.langid.CharNgramLangId]])
  *   3. 28-stage English heuristic cascade → keep / first_reject / scores
  *   4. PII scrub (emails → IPs → phones) + profanity scrub on kept rows
  *   5. quality + token-count annotations
  *
  * One single codegen'd pass: no shuffle anywhere — every step is a
  * projection or filter, so the 100 TB plan is scan → compute → write,
  * partitioned by input splits. Skew is irrelevant until the optional
  * dedup stage (which shuffles only (id, hash)).
  */
object CurationPipeline {

  /** text-based curation: input must have (url or doc_id, text). */
  def curate(df: DataFrame, textCol: String = "text"): DataFrame = {
    val langUdf = udf((t: String) => TextStats.heuristicLangId(t))
    val scrubUdf = udf((t: String) => PiiScrub.defaultScrubber.scrub(PiiScrub.scrubPii(t)))
    val qualityUdf = udf((t: String) => TextStats.qualityScore(t))
    val tokUdf = udf((t: String) => TextStats.bpeTokenCount(t))

    val scored = Cascade.score(df, HeuristicFilters.englishCascade, textCol)
    scored
      .withColumn("lang_pred", langUdf(col(textCol)))
      .withColumn("scrubbed_text",
        when(col("keep"), scrubUdf(col(textCol))).otherwise(lit(null).cast("string")))
      .withColumn("quality_score", qualityUdf(col(textCol)))
      .withColumn("token_count", tokUdf(col(textCol)))
  }

  /** html-bytes based: decode + extract first, drop rows that fail
    * extraction (reference extract.py:86-99), then curate.
    */
  def curateFromHtml(df: DataFrame, htmlCol: String = "html"): DataFrame = {
    val extractUdf = udf((b: Array[Byte]) => HtmlExtract.extractFromBytes(b).orNull)
    val extracted = df
      .withColumn("extracted_text", extractUdf(col(htmlCol)))
      .filter(col("extracted_text").isNotNull)
    curate(extracted.drop("text").withColumnRenamed("extracted_text", "text"))
  }

  /** Kept-only output with scrubbed text as the payload. */
  def keptOutput(curated: DataFrame): DataFrame =
    curated.filter(col("keep"))
      .drop("text")
      .withColumnRenamed("scrubbed_text", "text")
}
