package graft.classify

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class AegisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("prompt bytes are verbatim format_aegis (md5 pinned against the reference's own output)") {
    val p = Aegis.formatAegis("hello world")
    assert(p.length == 9224)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5 == "c67128e7544dc7c018a3afeea89b4ea5") // hashlib.md5(format_aegis("hello world"))
    assert(Aegis.messageOf(p) == "hello world")
    intercept[IllegalArgumentException](Aegis.messageOf("not a prompt"))
  }

  test("response parsing decision table (aegis.py:316-331)") {
    assert(Aegis.parseResponse("safe") == "safe")
    assert(Aegis.parseResponse("  safe  \nextra") == "safe") // strip applies per line
    assert(Aegis.parseResponse("unsafe\nO1") == "O1")
    assert(Aegis.parseResponse("unsafe\n O13 ") == "O13")
    assert(Aegis.parseResponse("unsafe") == "unknown") // missing category line
    assert(Aegis.parseResponse("unsafe\nO14") == "unknown") // not a category
    assert(Aegis.parseResponse("unsafe\nO1,O3") == "unknown") // lists are not single labels
    assert(Aegis.parseResponse("unsafe\nsafe") == "unknown") // labels[2:] only
    assert(Aegis.parseResponse("I refuse to answer") == "unknown")
    assert(Aegis.parseResponse(null) == "unknown") // failed endpoint -> label, not an executor NPE
    assert(Aegis.Labels.length == 15 && Aegis.Labels.take(2) == Seq("unknown", "safe"))
  }

  test("instruction data guard: score + is_poisoned with >= 0.5 boundary") {
    val e = (i: Int, j: Int) => {
      val v = new Array[Float](16)
      v(i) = 0.70710677f; v(j) = 0.70710677f
      v.toSeq
    }
    val df = Seq((1L, e(0, 8)), (2L, e(1, 9)), (3L, e(0, 9))).toDF("id", "embedding")
    val out = InstructionDataGuard("src/main/resources/models/nsfw_tiny.bin").score(df)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L)._2 && out(1L)._1 > 0.99)           // both-even: poisoned
    assert(!out(2L)._2 && out(2L)._1 < 0.01)          // both-odd: clean
    assert(out(3L) == (0.5, true))                    // exact 0.5 -> >= keeps it poisoned
  }

  test("stage: max_chars before wrapping, filter_by, keep_raw_output") {
    // fixture guard flags any message CONTAINING the marker; the marker
    // sits beyond max_chars in doc 2, so truncation must hide it
    val guard: String => String = p =>
      if (Aegis.messageOf(p).contains("zunsafez")) "unsafe\nO5" else "safe"
    val docs = Seq(
      (1L, "zunsafez plus text"),
      (2L, ("x " * 3500) + "zunsafez"), // marker at ~7000 > 6000 cap
      (3L, "perfectly benign prose")
    ).toDF("doc_id", "text")

    val scored = AegisClassifier(guard)(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(scored == Map(1L -> "O5", 2L -> "safe", 3L -> "safe"))

    val kept = AegisClassifier(guard, filterBy = Seq("safe"))(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))

    val raw = AegisClassifier(guard, keepRawOutput = true)(docs)
    assert(raw.columns.contains("_aegis_raw_pred"))
    assert(raw.filter(raw("doc_id") === 1L).select("_aegis_raw_pred").head.getString(0) == "unsafe\nO5")
  }
}
