package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Scale calibration of the semantic pairwise tier: k grows with the
  * corpus and a hot cell is sub-split at the hard cap, so within-cell
  * pairwise work is bounded regardless of skew.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("autoK grows with corpus size, never shrinks the caller's k") {
    assert(SemanticDedup.autoK(500, 8) == 8)
    assert(SemanticDedup.autoK(5000, 8, targetCellSize = 512) == 10)
    assert(SemanticDedup.autoK(300L * 1000 * 1000, 8, targetCellSize = 512) == 585938)
    assert(SemanticDedup.autoK(0, 8) == 8)
  }

  test("hard cap: a planted one-cluster skew sub-splits; no block beats the cap by more than hash variance") {
    // 3000 near-identical vectors: KMeans cannot separate them, so they
    // all land in one cell — the adversarial boilerplate-embedding case
    val rnd = new scala.util.Random(7)
    val docs = (0L until 3000L)
      .map(i => (i, Seq.fill(8)(1.0f + rnd.nextFloat() * 1e-4f)))
      .toDF("vec_id", "embedding")
    val cap = 256
    val blocks = SemanticDedup.withBlocks(docs, k = 4, maxCellSize = cap)
      .groupBy("_block").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(blocks.length >= 3000 / cap, s"expected >= ${3000 / cap} sub-blocks, got ${blocks.length}")
    assert(blocks.max <= cap * 1.3, s"block of ${blocks.max} rows exceeds cap $cap + hash variance")
    assert(blocks.sum == 3000)
  }

  test("multi-probe blocking recovers a boundary-straddling near-dup pair") {
    // two tight groups plus a NEAR-DUP pair placed midway between the
    // group directions: single-probe assignment can split it; probes=2
    // guarantees the pair shares a block (each point carries both cells)
    val g1 = (0L until 20L).map(i => (i, Seq(1.0f, 0.001f * i, 0.0f)))
    val g2 = (100L until 120L).map(i => (i, Seq(0.0f, 0.001f * i, 1.0f)))
    val boundary = Seq(
      (500L, Seq(0.7071f, 0.0011f, 0.7071f)),
      (501L, Seq(0.7070f, 0.0010f, 0.7072f)))
    val docs = (g1 ++ g2 ++ boundary).toDF("vec_id", "embedding")
    val p2 = SemanticDedup.nearDupPairs(docs, k = 2, eps = 0.001, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2.contains((500L, 501L)), s"boundary pair missed with probes=2: $p2")
    // multi-probe never duplicates a pair in the output
    val all = SemanticDedup.nearDupPairs(docs, k = 2, eps = 0.5, probes = 2)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length == all.toSet.size, "duplicate pairs in multi-probe output")
  }

  test("no-op below the cap: _block == cluster and ranked removals unchanged") {
    val docs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.999f, 0.01f, 0.0f)),   // near pair
      (3L, Seq(0.0f, 1.0f, 0.0f)), (4L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val blocks = SemanticDedup.withBlocks(docs, k = 2)
      .select(col("_block"), col("cluster").cast("string")).collect()
    blocks.foreach(r => assert(r.getString(0) == r.getString(1) + "_0")) // single sub-bucket
    val removed = SemanticDedup.removalIdsRanked(docs, k = 2, eps = 0.01)
      .collect().map(_.getLong(0)).toSet
    assert(removed.size == 1 && removed.subsetOf(Set(1L, 2L)), s"got $removed")
  }
}
