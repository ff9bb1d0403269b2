package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class WordVecEmbedderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val committed = "src/main/resources/models/embed_tiny.bin"

  test("artifact roundtrip and mean-pool + L2-normalize semantics") {
    val tmp = java.io.File.createTempFile("gemb", ".bin").getPath
    WordVecEmbedder.write(tmp, 3, Seq(
      "alpha" -> Array(1f, 0f, 0f),
      "beta" -> Array(0f, 2f, 0f),
      "gamma" -> Array(0f, 0f, 4f)))
    val m = WordVecEmbedder.read(tmp)
    assert(m.dim == 3 && m.vectors.size == 3)

    // mean of (1,0,0) and (0,2,0) = (0.5,1,0), normalized
    val v = m.embed("alpha oovword beta")
    val norm = math.sqrt(0.25 + 1.0)
    assert(math.abs(v(0) - 0.5 / norm) < 1e-6)
    assert(math.abs(v(1) - 1.0 / norm) < 1e-6)
    assert(v(2) == 0f)

    // all-OOV and null/empty embed to the zero vector
    assert(m.embed("nothing known here").forall(_ == 0f))
    assert(m.embed(null).forall(_ == 0f))
    assert(m.embed("").forall(_ == 0f))
  }

  test("committed tiny artifact: orthogonal topics give exact pair cosines") {
    val m = WordVecEmbedder.read(committed)
    assert(m.dim == 16 && m.vectors.size == 16)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val both = cos(m.embed("ztopic0 body ztopic9"), m.embed("ztopic0 other ztopic9"))
    val one = cos(m.embed("ztopic0 body ztopic9"), m.embed("ztopic0 other ztopic10"))
    val none = cos(m.embed("ztopic0 body ztopic9"), m.embed("ztopic1 other ztopic10"))
    assert(math.abs(both - 1.0) < 1e-6)
    assert(math.abs(one - 0.5) < 1e-6)
    assert(math.abs(none) < 1e-6)
  }

  test("last_token pooling: normalized vector of the last in-vocab token") {
    val m = WordVecEmbedder.read(committed)
    // last in-vocab token wins even with trailing OOV words
    val v = m.embedLastToken("ztopic2 filler ztopic9 trailing oov words")
    assert(v(9) == 1f && v.count(_ != 0f) == 1)
    assert(m.embedLastToken("all oov text").forall(_ == 0f))
    assert(m.embedLastToken(null).forall(_ == 0f))

    val df = Seq((1L, "ztopic0 ztopic5")).toDF("doc_id", "text")
    val out = WordVecEmbedder.withEmbedding(df, committed, pooling = "last_token")
      .select("embeddings").head.getSeq[Float](0)
    assert(out(5) == 1f && out.count(_ != 0f) == 1)
    intercept[IllegalArgumentException](
      WordVecEmbedder.withEmbedding(df, committed, pooling = "cls"))
  }

  test("regenerating the committed artifact is byte-identical") {
    val tmp = java.io.File.createTempFile("gemb", ".bin").getPath
    WordVecEmbedder.writeTinyArtifact(tmp)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tmp)),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(committed))))
  }

  test("withEmbedding appends the contract column and resolves via classpath fallback") {
    val ghost = s"/nonexistent/deploy/root/$committed"
    val df = Seq((1L, "ztopic2 some body ztopic11"), (2L, "all oov text"))
      .toDF("doc_id", "text")
    val out = WordVecEmbedder.withEmbedding(df, ghost).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out(1L).count(_ != 0f) == 2)
    assert(out(2L).forall(_ == 0f))
  }
}
