package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** Stage-level resume for semantic dedup (the reference's cache_path
  * contract): embeddings + kmeans tier persisted; a rerun resumes from
  * the cache instead of re-running inference and the fit.
  */
class SemanticCheckpointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // near-dup pair (1,2), distinct (3), plus seeded-random 8-d filler
  // (random directions — pairwise cosines stay far below the 0.99 gate)
  private def docs = {
    def unit(seed: Long) = {
      val rng = new java.util.Random(seed)
      val v = Array.fill(8)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val filler = (10 to 40).map(i => (i.toLong, unit(i)))
    (Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Seq(0.999f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Seq(0f, 1.0f, 0f, 0f, 0f, 0f, 0f, 0f))
    ) ++ filler).toDF("vec_id", "embedding")
  }

  test("checkpointed ranked removal equals direct; all-cached rerun ignores the input") {
    val cache = Files.createTempDirectory("sem_ckpt").toString
    val expected = SemanticDedup.removalIdsRanked(docs, k = 4, eps = 0.01)
      .as[Long].collect().toSet

    val r1 = SemanticCheckpoint.removalIdsRanked(docs, k = 4, eps = 0.01, cache)
      .as[Long].collect().toSet
    assert(r1 == expected)
    assert(r1.size == 1 && (r1 == Set(1L) || r1 == Set(2L)), s"one of the near pair removed: $r1")
    assert(Files.exists(Paths.get(s"$cache/kmeans_manifest.jsonl")))

    // empty input: the kmeans tier must come from the cache
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val r2 = SemanticCheckpoint.removalIdsRanked(empty, k = 4, eps = 0.01, cache)
      .as[Long].collect().toSet
    assert(r2 == expected)
  }

  test("embeddedInput persists the embedding pass once and replays it") {
    val cache = Files.createTempDirectory("sem_ckpt2").toString
    val first = SemanticCheckpoint.embeddedInput(docs, cache)
    assert(first.count() == docs.count())

    // a different frame presented on rerun is ignored in favor of the cache
    val other = Seq((99L, Seq(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val replay = SemanticCheckpoint.embeddedInput(other, cache)
    assert(replay.count() == docs.count())
    assert(!replay.select("vec_id").as[Long].collect().contains(99L))
  }
}
