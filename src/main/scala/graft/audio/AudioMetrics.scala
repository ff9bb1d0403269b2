package graft.audio

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ASR quality metrics from the reference's audio pipeline
  * (stages/audio/metrics/get_wer.py): pairwise word-error-rate /
  * character-error-rate between a transcript and an ASR prediction,
  * and character/word rates against an audio duration — all ×100 /
  * rounded to 2 decimals exactly as the reference computes them.
  *
  * Python-parity details: words come from `str.split()` (Unicode
  * whitespace runs — PyText.splitWhitespace), characters are CODE
  * POINTS (Python `len`/iteration), and `round(x, 2)` is decimal
  * HALF-EVEN on the exact binary double (BigDecimal, matching
  * CPython's correctly-rounded float round).
  */
object AudioMetrics {

  /** Levenshtein distance (editdistance.eval): two-row DP,
    * O(|a|·|b|) time, O(min) memory.
    */
  def editDistance[T](a: IndexedSeq[T], b: IndexedSeq[T]): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    val (s, t) = if (a.length < b.length) (a, b) else (b, a)
    var prev = Array.tabulate(s.length + 1)(identity)
    var cur = new Array[Int](s.length + 1)
    var i = 1
    while (i <= t.length) {
      cur(0) = i
      var j = 1
      while (j <= s.length) {
        val cost = if (t(i - 1) == s(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(s.length)
  }

  /** Python round(x, 2): decimal half-even on the exact binary value.
    * Non-finite inputs pass through (an empty reference transcript
    * divides by zero — the reference raises ZeroDivisionError there;
    * a NaN/∞ row is inspectable, a crashed executor is not).
    */
  def round2(x: Double): Double =
    if (java.lang.Double.isFinite(x))
      new java.math.BigDecimal(x).setScale(2, java.math.RoundingMode.HALF_EVEN).doubleValue()
    else x

  private def codePoints(s: String): IndexedSeq[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += cp
      i += Character.charCount(cp)
    }
    out.toIndexedSeq
  }

  /** get_wer: word-level edit distance / reference word count × 100. */
  def wer(text: String, predText: String): Double = {
    val tw = graft.text.PyText.splitWhitespace(text).toIndexedSeq
    val pw = graft.text.PyText.splitWhitespace(predText).toIndexedSeq
    round2(editDistance(tw, pw).toDouble / tw.length * 100.0)
  }

  /** get_cer: code-point edit distance / reference length × 100. */
  def cer(text: String, predText: String): Double =
    round2(editDistance(codePoints(text), codePoints(predText)).toDouble /
      graft.text.PyText.len(text) * 100.0)

  /** get_charrate / get_wordrate: per-second rates over the duration. */
  def charRate(text: String, duration: Double): Double =
    round2(graft.text.PyText.len(text) / duration)
  def wordRate(text: String, duration: Double): Double =
    round2(graft.text.PyText.splitWhitespace(text).length / duration)

  /** GetPairwiseWerStage (get_wer.py:60-80): wer column per row; null
    * transcript/prediction yields null (the reference's dict-access
    * KeyError contract has no per-row null path).
    */
  def withWer(df: DataFrame, textCol: String = "text",
              predCol: String = "pred_text", werCol: String = "wer"): DataFrame = {
    val u = udf((t: String, p: String) =>
      if (t == null || p == null) null else java.lang.Double.valueOf(wer(t, p)))
    df.withColumn(werCol, u(col(textCol), col(predCol)))
  }

  def withCer(df: DataFrame, textCol: String = "text",
              predCol: String = "pred_text", cerCol: String = "cer"): DataFrame = {
    val u = udf((t: String, p: String) =>
      if (t == null || p == null) null else java.lang.Double.valueOf(cer(t, p)))
    df.withColumn(cerCol, u(col(textCol), col(predCol)))
  }

  /** char/word rates against a duration column (GetAudioDuration's
    * -1.0 error sentinel propagates as null rates).
    */
  def withRates(df: DataFrame, textCol: String = "text",
                durationCol: String = "duration"): DataFrame = {
    val cru = udf((t: String, d: Double) =>
      if (t == null || d <= 0) null else java.lang.Double.valueOf(charRate(t, d)))
    val wru = udf((t: String, d: Double) =>
      if (t == null || d <= 0) null else java.lang.Double.valueOf(wordRate(t, d)))
    df.withColumn("charrate", cru(col(textCol), col(durationCol)))
      .withColumn("wordrate", wru(col(textCol), col(durationCol)))
  }
}
