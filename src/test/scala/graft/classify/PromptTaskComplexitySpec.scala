package graft.classify

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class PromptTaskComplexitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val committed = "src/main/resources/models/ptc_tiny.bin"
  import PromptTaskComplexity.{ScoreHead, pyRound}

  private def oneHot(dim: Int, hot: (Int, Float)*): Array[Float] = {
    val v = new Array[Float](dim)
    hot.foreach { case (d, x) => v(d) = x }
    v
  }

  test("artifact roundtrip preserves every head, map and divisor") {
    val tmp = java.io.File.createTempFile("gptc", ".bin").getPath
    val heads = Seq(
      ScoreHead("creativity_scope", Array(oneHot(4), oneHot(4, 0 -> 2f)), Array(0.0, 1.0), 1.0),
      ScoreHead("reasoning", Array(oneHot(4), oneHot(4, 1 -> 3f), oneHot(4, 2 -> 1f)),
        Array(0.0, 0.5, 1.0), 2.0))
    PromptTaskComplexity.write(tmp, 4, Seq("A", "B"),
      Array(oneHot(4, 0 -> 1f), oneHot(4, 1 -> 1f)), heads)
    val m = PromptTaskComplexity.read(tmp)
    assert(m.dim == 4 && m.taskTypes.toSeq == Seq("A", "B"))
    assert(m.heads.map(_.name) == Seq("creativity_scope", "reasoning"))
    assert(m.heads(1).weights.toSeq == Seq(0.0, 0.5, 1.0) && m.heads(1).divisor == 2.0)
  }

  test("task-type top-2: NA collapse under 0.1, stable index order on ties") {
    val m = PromptTaskComplexity.read(committed)
    // dominant topic 1 -> Generation with prob 0.998, runner-up NA
    val (t1, t2, p1, _, _) = m.score(oneHot(16, 1 -> 0.70710677f, 9 -> 0.70710677f).toSeq)
    assert((t1, t2, p1) == ("Generation", "NA", 0.998))
    // no task dims set -> uniform probs, stable (index) order, no NA
    val (u1, u2, up, _, _) = m.score(oneHot(16, 5 -> 0.70710677f, 9 -> 0.70710677f).toSeq)
    assert((u1, u2, up) == ("Classification", "Generation", 0.333))
  }

  test("weighted-softmax scores, few-shots floor, reference complexity sum") {
    val m = PromptTaskComplexity.read(committed)
    val (_, _, _, scores, complexity) = m.score(oneHot(16, 1 -> 0.70710677f, 9 -> 0.70710677f).toSeq)
    assert(scores == Seq(0.5, 0.9954, 0.5, 0.5, 0.5, 0.5, 0.5)) // reasoning head fired
    assert(complexity == 0.62385) // 0.5 + 0.25*(0.9954-0.5), exact 5dp

    // few-shots floor: a strongly-negative logit drives the score
    // under 0.05 and the reference clamps it to 0
    val tmp = java.io.File.createTempFile("gptc", ".bin").getPath
    val floorHeads = PromptTaskComplexity.ScoreFields.map { name =>
      ScoreHead(name, Array(oneHot(2), oneHot(2, 0 -> -8f)), Array(0.0, 1.0), 1.0)
    }
    PromptTaskComplexity.write(tmp, 2, Seq("A", "B"),
      Array(oneHot(2, 0 -> 1f), oneHot(2, 1 -> 1f)), floorHeads)
    val fm = PromptTaskComplexity.read(tmp)
    val (_, _, _, fScores, _) = fm.score(Seq(1f, 0f))
    val byName = PromptTaskComplexity.ScoreFields.zip(fScores).toMap
    assert(byName("number_of_few_shots") == 0.0) // floored
    assert(byName("reasoning") == pyRound(1.0 / (1.0 + math.exp(8.0)), 4)) // others keep the raw value
  }

  test("DataFrame stage emits all 11 output fields; regeneration byte-identical") {
    val df = Seq((1L, Seq.tabulate(16)(d => if (d == 0 || d == 10) 0.70710677f else 0f)))
      .toDF("doc_id", "embedding")
    val out = PromptTaskComplexity.score(df, committed)
    val expected = Seq("prompt_complexity_score", "task_type_1", "task_type_2",
      "task_type_prob") ++ PromptTaskComplexity.ScoreFields
    assert(expected.forall(out.columns.contains))
    val row = out.head
    assert(row.getAs[String]("task_type_1") == "Classification")
    assert(row.getAs[Double]("contextual_knowledge") == 0.9954) // dim 10 = head 2

    val tmp = java.io.File.createTempFile("gptc", ".bin").getPath
    PromptTaskComplexity.writeTinyArtifact(tmp)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tmp)),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(committed))))
  }
}
