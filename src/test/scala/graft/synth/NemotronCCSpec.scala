package graft.synth

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Nemotron-CC synthetic stages: template loading, the two ported
  * post-processors (hand-computed reference behavior), the injected-llm
  * generation stage, and the multilingual sampler.
  */
class NemotronCCSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("prompt templates load with the reference structure") {
    assert(NemotronCC.prompts.keySet == Set(
      "nemotron_cc_system", "nemotron_cc_distill_system", "wikipedia_rephrasing",
      "diverse_qa", "distill", "extract_knowledge", "knowledge_list"))
    assert(NemotronCC.prompts("wikipedia_rephrasing").startsWith(
      "For the following paragraph give me a diverse paraphrase"))
    assert(NemotronCC.prompts("diverse_qa").contains("{document}"))
    assert(NemotronCC.prompts("diverse_qa").contains(
      "Tag the question with \"Question:\" and the answer with \"Answer:\"."))
    assert(NemotronCC.systemPrompt.startsWith("A chat between a curious user"))
  }

  test("knowledge-list post-processing: reference _format_text behavior") {
    // non-bullet first line drops; "- "/"  " leads strip; others keep
    assert(NemotronCC.knowledgeListPostProcess(
      "Here are the facts:\n- fact one\n  sub detail\nplain line") ==
      "fact one\nsub detail\nplain line")
    // bullet first line is NOT dropped
    assert(NemotronCC.knowledgeListPostProcess("- a\n- b") == "a\nb")
    assert(NemotronCC.knowledgeListPostProcess("") == "")
    assert(NemotronCC.knowledgeListPostProcess(null) == "")
  }

  test("diverse-QA post-processing: pair merging, prefix drop, malformed bail") {
    val prefixLine = "Here are the questions and answers based on the provided text:"
    // single pair + continuation: deterministic for ANY seed
    val gen1 = s"$prefixLine\n- Question: What is X? Answer: Y\nmore detail."
    for (seed <- Seq(0L, 42L, -7L)) {
      assert(NemotronCC.diverseQAPostProcess("doc body", gen1, seed) ==
        "doc body\n\nQuestion: What is X? Answer: Y\nmore detail.")
    }
    // NBSP-only line drops like Python str.strip (Java trim would keep
    // it, hit the merge loop before any Question:, and bail to "")
    assert(NemotronCC.diverseQAPostProcess("doc",
      s"$prefixLine\n\u00A0\n- Question: q? Answer: a", 3L) ==
      "doc\n\nQuestion: q? Answer: a")
    // null text interpolates as "" (not the literal "null"), and a
    // token-budgeted cap must not NPE on it
    assert(NemotronCC.diverseQAPostProcess(null,
      s"$prefixLine\n- Question: q? Answer: a", 3L,
      tokenCount = Some(t => t.length)) == "\n\nQuestion: q? Answer: a")
    // malformed: first content line is not a Question -> ""
    assert(NemotronCC.diverseQAPostProcess("d", "no questions here", 1L) == "")
    assert(NemotronCC.diverseQAPostProcess("d", "", 1L) == "")
    assert(NemotronCC.diverseQAPostProcess("d", null, 1L) == "")
    // multi-pair: output keeps 1..max pairs, all drawn from the input pairs
    val gen3 = s"$prefixLine\n- Question: q1 Answer: a1\n- Question: q2 Answer: a2\n- Question: q3 Answer: a3"
    val out = NemotronCC.diverseQAPostProcess("base", gen3, 42L, maxNumPairs = 2)
    assert(out.startsWith("base\n\n"))
    val kept = out.stripPrefix("base\n\n").split("\n\n")
    assert(kept.nonEmpty && kept.length <= 2)
    assert(kept.forall(p => Set("Question: q1 Answer: a1", "Question: q2 Answer: a2",
      "Question: q3 Answer: a3").contains(p)))
    // token-budgeted cap: 300-token doc with maxNumPairs=10 -> cap in [1, 20]
    val outTok = NemotronCC.diverseQAPostProcess("base", gen3, 42L, maxNumPairs = 10,
      tokenCount = Some(_ => 300))
    assert(outTok.startsWith("base\n\n"))
  }

  test("generation stage: injected llm sees (system, formatted prompt)") {
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val echo: (Option[String], String) => String =
      (sys, prompt) => s"sys=${sys.isDefined}|${prompt.linesIterator.next()}"
    val out = NemotronCC.generate(df, NemotronCC.WikipediaRephrase, echo)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(2)).forall(_.startsWith("sys=true|For the following paragraph")))
    val qa = NemotronCC.generate(df, NemotronCC.DiverseQA, echo)
    assert(qa.columns.contains("diverse_qa"))
    assert(qa.orderBy("doc_id").collect().head.getString(2).startsWith("sys=false|Task:"))
  }

  test("batched generation == per-row generation; batch sizes bounded; nulls pass through") {
    val rows = (1L to 100L).map(i => (i, if (i % 10 == 0) null else s"doc number $i")) :+ (999L, null)
    val df = rows.toDF("doc_id", "text")
    val echo: (Option[String], String) => String = (sys, p) => s"${sys.size}|$p"
    val perRow = NemotronCC.generate(df, NemotronCC.Distill, echo)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val echoBatch: (Option[String], Seq[String]) => Seq[String] = (sys, ps) => {
      batchSizes.synchronized { batchSizes += ps.size }
      ps.map(p => s"${sys.size}|$p")
    }
    val batched = NemotronCC.generateBatched(df, NemotronCC.Distill, echoBatch, batchSize = 16)
    assert(batched.columns.toSeq == Seq("doc_id", "text", "distill"))
    val got = batched.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got == perRow)
    assert(got(999L) == null && got(10L) == null)
    assert(got(1L).startsWith("1|Your task is to read and paraphrase"))
    // re-running over already-generated output REPLACES the column
    // (withColumn semantics, like generate) — no ambiguous duplicate
    val again = NemotronCC.generateBatched(batched, NemotronCC.Distill, echoBatch, batchSize = 16)
    assert(again.columns.toSeq == Seq("doc_id", "text", "distill"))
    assert(again.select("distill").count() == rows.size)
  }

  test("multilingual QA sampler: seeded languages, '*' stripped, distributed rows") {
    val tpl = "Write a question and answer in {language}."
    val llm: (Option[String], String) => String = (_, p) => s"**${p}**"
    val out = NemotronCC.qaMultilingual(spark, tpl, Seq("English", "Hindi", "German"),
      numSamples = 20, llm, seed = 7).collect().map(_.getString(0))
    assert(out.length == 20)
    assert(out.forall(s => !s.contains("*")))
    assert(out.forall(s => s.startsWith("Write a question and answer in ")))
    // seeded: both languages appear over 20 draws; identical rerun
    assert(out.toSet.size > 1)
    val again = NemotronCC.qaMultilingual(spark, tpl, Seq("English", "Hindi", "German"),
      numSamples = 20, llm, seed = 7).collect().map(_.getString(0))
    assert(out.sorted.sameElements(again.sorted))
  }
}
