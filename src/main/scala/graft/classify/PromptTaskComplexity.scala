package graft.classify

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prompt task & complexity classifier contract
  * (stages/text/classifiers/prompt_task_complexity.py:34-231): a
  * multi-headed model over a pooled text representation emitting 11
  * output fields — top-2 task types with probabilities (second label
  * becomes "NA" when its rounded probability < 0.1), seven weighted-
  * softmax complexity dimensions (each Σ softmax·weights / divisor,
  * Python-round-half-even to 4dp; number_of_few_shots floors values
  * < 0.05 to 0), and the prompt_complexity_score weighted sum
  * (0.35·creativity + 0.25·reasoning + 0.15·constraint + 0.15·domain
  * + 0.05·contextual + 0.05·few_shots, rounded to 5dp). The DeBERTa
  * backbone is the GPU deploy-time swap; here the heads run over an
  * embedding column, and the task-type map, per-head matrices,
  * weights_map and divisor_map all load from a committed GPTC artifact
  * — exactly where the reference keeps them (its model config).
  *
  * 100 TB posture: pure map over a broadcast-sized artifact, no
  * shuffle.
  */
object PromptTaskComplexity {

  private val Magic = 0x47505443 // "GPTC"

  /** Score-head output fields in reference OUTPUT_FIELDS order 4..10. */
  val ScoreFields: Seq[String] = Seq("creativity_scope", "reasoning",
    "contextual_knowledge", "number_of_few_shots", "domain_knowledge",
    "no_label_reason", "constraint_ct")

  final case class ScoreHead(name: String, matrix: Array[Array[Float]],
                             weights: Array[Double], divisor: Double)

  final class Model(val dim: Int, val taskTypes: Array[String],
                    val taskMatrix: Array[Array[Float]],
                    val heads: Seq[ScoreHead]) extends Serializable {

    private def logits(m: Array[Array[Float]], x: Seq[Float]): Array[Double] =
      m.map { row =>
        var s = 0.0
        val n = math.min(row.length, x.length)
        var d = 0
        while (d < n) { s += row(d).toDouble * x(d); d += 1 }
        s
      }

    private def softmax(z: Array[Double]): Array[Double] = {
      val mx = z.max
      val e = z.map(v => math.exp(v - mx))
      val sum = e.sum
      e.map(_ / sum)
    }

    /** All 11 output fields for one embedding, keyed by field name. */
    def score(x: Seq[Float]): (String, String, Double, Seq[Double], Double) = {
      // task type: top-2 by (prob desc, index asc) — torch.topk order
      val tp = softmax(logits(taskMatrix, x))
      val order = tp.indices.sortBy(i => (-tp(i), i))
      val (i1, i2) = (order(0), order(1))
      val p1 = pyRound(tp(i1), 3)
      val p2 = pyRound(tp(i2), 3)
      val t1 = taskTypes(i1)
      val t2 = if (p2 < 0.1) "NA" else taskTypes(i2)

      val scores = heads.map { h =>
        val probs = softmax(logits(h.matrix, x))
        val s = pyRound(probs.zip(h.weights).map { case (p, w) => p * w }.sum / h.divisor, 4)
        if (h.name == "number_of_few_shots" && s < 0.05) 0.0 else s
      }
      val byName = heads.map(_.name).zip(scores).toMap
      val complexity = pyRound(
        0.35 * byName("creativity_scope") + 0.25 * byName("reasoning") +
          0.15 * byName("constraint_ct") + 0.15 * byName("domain_knowledge") +
          0.05 * byName("contextual_knowledge") + 0.05 * byName("number_of_few_shots"), 5)
      (t1, t2, p1, scores, complexity)
    }
  }

  /** Python round() parity: half-even on the exact binary value. */
  def pyRound(x: Double, n: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else new java.math.BigDecimal(x).setScale(n, java.math.RoundingMode.HALF_EVEN).doubleValue()

  def write(path: String, dim: Int, taskTypes: Seq[String],
            taskMatrix: Array[Array[Float]], heads: Seq[ScoreHead]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def mat(m: Array[Array[Float]]): Unit = {
      out.writeInt(m.length)
      m.foreach { row => require(row.length == dim); row.foreach(out.writeFloat) }
    }
    out.writeInt(Magic)
    out.writeInt(dim)
    out.writeInt(taskTypes.size)
    taskTypes.foreach(out.writeUTF)
    mat(taskMatrix)
    out.writeInt(heads.size)
    heads.foreach { h =>
      out.writeUTF(h.name)
      mat(h.matrix)
      require(h.weights.length == h.matrix.length, s"head ${h.name}: weights != classes")
      h.weights.foreach(out.writeDouble)
      out.writeDouble(h.divisor)
    }
    out.close()
    Files.write(Paths.get(path), bos.toByteArray)
  }

  def read(path: String): Model = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(
      Files.readAllBytes(Paths.get(path))))
    require(in.readInt() == Magic, s"$path is not a GPTC artifact")
    val dim = in.readInt()
    def mat(): Array[Array[Float]] = Array.fill(in.readInt())(Array.fill(dim)(in.readFloat()))
    val taskTypes = Array.fill(in.readInt())(in.readUTF())
    val taskMatrix = mat()
    val heads = Seq.fill(in.readInt()) {
      val name = in.readUTF()
      val m = mat()
      val w = Array.fill(m.length)(in.readDouble())
      ScoreHead(name, m, w, in.readDouble())
    }
    new Model(dim, taskTypes, taskMatrix, heads)
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Model]()
  private def load(path: String): Model =
    cache.computeIfAbsent(path, p => read(Artifacts.resolve(p)))

  /** Append the 11 OUTPUT_FIELDS to `df` from its embedding column. */
  def score(df: DataFrame, modelPath: String,
            embeddingCol: String = "embedding"): DataFrame = {
    val path = modelPath
    val u = udf((x: Seq[Float]) => {
      val m = load(path)
      val (t1, t2, p1, scores, complexity) =
        m.score(if (x == null) Seq.fill(m.dim)(0f) else x)
      (complexity, t1, t2, p1, scores(0), scores(1), scores(2), scores(3),
        scores(4), scores(5), scores(6))
    }).asNondeterministic() // 11 output refs to one struct: keep the multi-head pass single-eval
    val named = Seq("prompt_complexity_score", "task_type_1", "task_type_2",
      "task_type_prob") ++ ScoreFields
    named.zipWithIndex.foldLeft(df.withColumn("_ptc", u(col(embeddingCol)))) {
      case (acc, (name, i)) => acc.withColumn(name, col(s"_ptc._${i + 1}"))
    }.drop("_ptc")
  }

  /** Committed tiny artifact over the 16-dim one-hot topic embeddings:
    * 3 fixture task types keyed to dims 0-2 (the real taxonomy ships
    * in the deploy artifact's task_type_map, read from the artifact
    * exactly as the reference reads its config); each complexity head
    * is a 2-class softmax whose class-1 logit reads one topic
    * dimension, weights [0, 1], divisor 1 — so every output is a
    * closed form of which topics the text mentions.
    */
  def writeTinyArtifact(path: String): Unit = {
    val dim = 16
    def row(f: Int => Float): Array[Float] = Array.tabulate(dim)(f)
    val taskMatrix = Array.tabulate(3)(c => row(d => if (d == c) 10f else 0f))
    val heads = ScoreFields.zipWithIndex.map { case (name, i) =>
      // head i's class-1 logit reads dimension 8+i (the second-topic
      // dimensions 8..12 and beyond — heads 5,6 read dims 13,14,
      // never set by the entry construction: probs stay (0.5, 0.5)).
      // Weight 7.6 makes the fired score round to 0.9954 — 4th decimal
      // EVEN, so every w·(score−0.5) complexity contribution is an
      // exact 5-decimal value and the half-even 5dp round never sits
      // on a tie (DuckDB's round_even rounds the shortest decimal
      // representation, not the exact binary, and disagrees with
      // Python round() exactly on such ties)
      ScoreHead(name, Array(row(_ => 0f), row(d => if (d == 8 + i) 7.6f else 0f)),
        Array(0.0, 1.0), 1.0)
    }
    write(path, dim, Seq("Classification", "Generation", "Summarization"), taskMatrix, heads)
  }
}
