package graft.filters

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Keep/drop parity vs the ACTUAL reference implementation.
  *
  * Fixtures in src/test/resources were produced by
  * tools/gen_reference_labels.py, which runs the reference's own filter
  * classes (heuristic_filter.py) in the English-pipeline order over
  * (a) the committed cc_pages fixture and (b) the shared documents
  * testdata. The north rule requires F1 ≥ 0.99; we assert that, and
  * report exact agreement.
  */
class ParityCascadeSpec extends AnyFunSuite {

  private def parity(labelsPath: String, textsPath: String, key: String): Unit = {
    val spark = SparkTestBase.spark
    val labels = spark.read.parquet(labelsPath).collect()
      .map(r => (r.get(0).toString, (r.getBoolean(1),
        Option(r.getAs[String]("first_reject")).orNull,
        r.getAs[scala.collection.Seq[Double]]("scores"))))
      .toMap
    val texts = spark.read.parquet(textsPath).select(key, "text").collect()
      .map(r => (r.get(0).toString, r.getString(1)))

    var tp = 0; var fp = 0; var fn = 0; var tn = 0
    var rejectMismatch = 0
    var scoreMismatch = 0
    for ((k, text) <- texts) {
      val (refKeep, refReject, refScores) = labels(k)
      val v = Cascade.evaluate(HeuristicFilters.englishCascade, text)
      (v.keep, refKeep) match {
        case (true, true) => tp += 1
        case (true, false) => fp += 1
        case (false, true) => fn += 1
        case (false, false) => tn += 1
      }
      if (v.keep == refKeep && !refKeep && v.firstReject != refReject) rejectMismatch += 1
      // evaluated-prefix score agreement (NaN = unevaluated on both sides).
      // The RepeatingTopNGrams filters (indices 18-20) break frequency
      // ties by Python set iteration order, which depends on
      // PYTHONHASHSEED — the reference itself is nondeterministic there —
      // so for those we require only that the keep decision at the
      // reference score matches the keep decision at ours.
      val filters = HeuristicFilters.englishCascade
      val n = math.min(v.scores.length, refScores.length)
      var i = 0
      var bad = false
      while (i < n && !bad) {
        val a = v.scores(i); val b = refScores(i)
        if (!(a.isNaN && b.isNaN) && math.abs(a - b) > 1e-9) {
          val tieAmbiguous = i >= 18 && i <= 20 &&
            !a.isNaN && !b.isNaN && filters(i).keep(a) == filters(i).keep(b)
          if (!tieAmbiguous) bad = true
        }
        i += 1
      }
      if (bad) scoreMismatch += 1
    }
    val precision = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    val f1 = if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
    info(f"$textsPath: n=${texts.length} tp=$tp fp=$fp fn=$fn tn=$tn F1=$f1%.5f " +
      f"rejectMismatch=$rejectMismatch scoreMismatch=$scoreMismatch")
    // when no doc is kept on either side F1 is trivially 1.0 — the real
    // signal there is exact disagreement counts, so always assert those
    assert(fp + fn == 0, s"keep/drop disagreement: fp=$fp fn=$fn")
    assert(f1 >= 0.99, s"keep/drop F1 $f1 below 0.99 (fp=$fp fn=$fn)")
    assert(rejectMismatch == 0, "first_reject attribution diverges (cascade_en oracle requires exact)")
    assert(scoreMismatch <= texts.length / 100, "per-filter scores diverge >1%")
  }

  test("cc_pages fixture: keep/drop F1 >= 0.99 vs reference labels") {
    parity("src/test/resources/labels_ref_cc_tiny.parquet",
      "src/test/resources/cc_pages_tiny", "url")
  }

  test("documents testdata: keep/drop F1 >= 0.99 vs reference labels") {
    parity("src/test/resources/labels_ref_documents.parquet",
      "/root/testdata/sf0.01/documents.parquet", "doc_id")
  }
}
