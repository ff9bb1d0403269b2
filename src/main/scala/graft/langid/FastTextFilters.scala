package graft.langid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lm.NGramLM

/** Model-backed filters matching the reference fastText filter contracts
  * (stages/text/filters/fasttext_filter.py), built on the hashed
  * char-ngram linear model ([[CharNgramLangId]]) and the n-gram LM
  * ([[graft.lm.NGramLM]]). Models are driver-loaded once and broadcast
  * via the UDF closure — deserialized once per executor, shared by all
  * task threads.
  */
object FastTextFilters {

  /** FastTextLangId contract (fasttext_filter.py:58-92): strip text,
    * newlines → spaces, top-1 (label, prob), keep iff prob ≥ 0.3.
    * Emits a typed struct(score double, lang string) instead of the
    * reference's stringified "[score, 'EN']" (SURVEY.md §1.2).
    */
  final case class LangIdPred(score: Double, lang: String)

  def withLangId(df: DataFrame, model: CharNgramLangId,
                 textCol: String = "text", outCol: String = "langid"): DataFrame = {
    val u = udf((t: String) => {
      if (t == null) LangIdPred(0.0, "UND")
      else {
        val (lang, score) = model.predict(t)
        LangIdPred(score, lang)
      }
    })
    df.withColumn(outCol, u(col(textCol)))
  }

  def filterByLangId(df: DataFrame, model: CharNgramLangId, minScore: Double = 0.3,
                     textCol: String = "text"): DataFrame =
    withLangId(df, model, textCol).filter(col("langid.score") >= minScore)

  /** Same contract driven by a REAL fastText .bin artifact (the model
    * file a production run is handed — reference loads lid.176.bin,
    * fasttext_filter.py:69-77): "__label__xx" → "XX", newlines → spaces,
    * top-1 softmax probability. The model deserializes once per executor
    * via the closure broadcast.
    */
  def withLangIdBin(df: DataFrame, model: FastTextBin.Model,
                    textCol: String = "text", outCol: String = "langid"): DataFrame = {
    val u = udf((t: String) => {
      if (t == null) LangIdPred(0.0, "UND")
      else {
        val (label, p) = model.predict(t.trim.replace("\n", " "))
        LangIdPred(p, label.stripPrefix("__label__").toUpperCase(java.util.Locale.ROOT))
      }
    })
    df.withColumn(outCol, u(col(textCol)))
  }

  /** FastTextQualityFilter contract (fasttext_filter.py:23-55): text with
    * newlines→spaces and "__label__"→" ", P(label) (or 1-P if another
    * label wins), keep iff pareto(α=3) sample > 1 - score.
    *
    * The reference draws from one global np.random stream (seed 42) —
    * keep/drop depends on row visit order and is irreproducible under
    * distributed execution. We derive the sample from xxhash64-style
    * per-row hashing of the text (documented determinism fix,
    * SURVEY.md §7.3): same row → same draw, any partitioning.
    */
  def qualityScore(model: CharNgramLangId, hqLabel: String, text: String): Double = {
    val cleaned = text.replace("\n", " ").replace("__label__", " ")
    val (label, prob) = model.predict(cleaned)
    if (label.equalsIgnoreCase(hqLabel)) prob else 1.0 - prob
  }

  /** Deterministic per-row Pareto(α) draw in (0, ∞): inverse-CDF over a
    * uniform derived from the text hash.
    */
  def paretoSample(text: String, alpha: Double, seed: Long = 42L): Double = {
    var h = seed ^ 0x9e3779b97f4a7c15L
    var i = 0
    while (i < text.length) { h ^= text.charAt(i); h *= 0x100000001b3L; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    // uniform in (0,1) from top 53 bits
    val u = ((h >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    math.pow(1.0 - u, -1.0 / alpha) - 1.0
  }

  /** Per-doc quality score + stochastic-Pareto keep decision, UNfiltered
    * (reference fasttext_filter.py:23-55 keep rule: pareto(seed=text) >
    * 1 - score). Exposed so gate queries can assert Pareto consistency
    * over BOTH classes; [[filterByQuality]] applies the keep.
    */
  def withQuality(df: DataFrame, model: CharNgramLangId,
                  hqLabel: String = "hq", alpha: Double = 3.0,
                  textCol: String = "text"): DataFrame = {
    val u = udf((t: String) => {
      if (t == null) (0.0, false)
      else {
        val s = qualityScore(model, hqLabel, t)
        (s, paretoSample(t, alpha) > 1.0 - s)
      }
    })
    df.withColumn("_q", u(col(textCol)))
      .withColumn("fasttext_quality", col("_q._1"))
      .withColumn("fasttext_keep", col("_q._2"))
      .drop("_q")
  }

  def filterByQuality(df: DataFrame, model: CharNgramLangId,
                      hqLabel: String = "hq", alpha: Double = 3.0,
                      textCol: String = "text", retainScore: Boolean = true): DataFrame = {
    val scored = withQuality(df, model, hqLabel, alpha, textCol)
      .filter(col("fasttext_keep")).drop("fasttext_keep")
    if (retainScore) scored else scored.drop("fasttext_quality")
  }

  /** FastTextLangId as a composable DocFilter driven by a real .bin
    * artifact path (the reference's config form: model_path +
    * min_langid_score, fasttext_filter.py:58-92). Only the path
    * serializes; the model loads once per JVM via the companion cache,
    * so the filter drops into the fused cascade like any heuristic
    * filter.
    */
  final case class FastTextLangIdBinFilter(modelPath: String, minScore: Double = 0.3)
      extends graft.filters.DocFilter {
    val name = "fasttext_langid"
    // JVM-wide cache keyed by path: a transient lazy val would re-read
    // the model on EVERY task deserialization (the filter rides a UDF
    // closure); the companion cache loads once per executor
    private def model = FastTextLangIdBinFilter.load(modelPath)
    def scoreCtx(ctx: graft.filters.DocCtx): Double =
      model.predict(ctx.text.trim.replace("\n", " "))._2
    def keep(s: Double): Boolean = s >= minScore
  }

  object FastTextLangIdBinFilter {
    private val cache = new java.util.concurrent.ConcurrentHashMap[String, FastTextBin.Model]()
    private def load(path: String): FastTextBin.Model =
      cache.computeIfAbsent(path, p => FastTextBin.read(p))
  }

  /** FastTextQualityFilter contract driven by a .bin model (config form:
    * model_path/label/alpha/seed).
    */
  def filterByQualityBin(df: DataFrame, model: FastTextBin.Model,
                         hqLabel: String = "__label__hq", alpha: Double = 3.0,
                         seed: Long = 42L, textCol: String = "text"): DataFrame = {
    val u = udf((t: String) => {
      if (t == null) false
      else {
        val cleaned = t.replace("\n", " ").replace("__label__", " ")
        val (label, prob) = model.predict(cleaned)
        val s = if (label.equalsIgnoreCase(hqLabel)) prob else 1.0 - prob
        paretoSample(t, alpha, seed) > 1.0 - s
      }
    })
    df.filter(u(col(textCol)))
  }

  /** KenLM-style perplexity filter (north rule): score = word perplexity
    * under a broadcast n-gram LM, keep iff ≤ maxPerplexity — the same
    * DocumentFilter shape as the fastText quality filter.
    */
  def withPerplexity(df: DataFrame, lm: NGramLM,
                     textCol: String = "text", outCol: String = "perplexity"): DataFrame = {
    val u = udf((t: String) => if (t == null) Double.PositiveInfinity else lm.perplexity(t))
    df.withColumn(outCol, u(col(textCol)))
  }

  def filterByPerplexity(df: DataFrame, lm: NGramLM, maxPerplexity: Double,
                         textCol: String = "text"): DataFrame =
    withPerplexity(df, lm, textCol).filter(col("perplexity") <= maxPerplexity)
}
