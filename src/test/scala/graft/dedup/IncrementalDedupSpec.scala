package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import java.nio.file.Files

/** Incremental (cross-snapshot) dedup: a new batch against a persisted
  * corpus index — direct hits, transitive anchoring, intra-batch
  * keep-first, and index persistence round-trips.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // disjoint vocabularies per group (shared prefixes would make groups
  // genuine near-dups of each other — see FuzzyCheckpointSpec note)
  private val baseA = (1 to 40).map(i => s"token$i word$i").mkString(" ")
  private val baseB = (1 to 40).map(i => s"gamma$i delta$i").mkString(" ")
  private val uniqC = (1 to 40).map(i => s"other$i thing$i").mkString(" ")
  private val uniqD = (1 to 40).map(i => s"unrelated$i stuff$i").mkString(" ")

  private def corpus = Seq((1L, baseA), (2L, uniqC)).toDF("doc_id", "text")

  // 10 = exact copy of corpus 1 (direct hit), 11 = near-dup of corpus 1
  // (appended word, direct hit), 20/21 = intra-batch near-dup pair with
  // no corpus counterpart (keep 20, remove 21), 30 = unique (kept)
  private def batch = Seq(
    (10L, baseA), (11L, baseA + " extra"),
    (20L, baseB), (21L, baseB + " tail"),
    (30L, uniqD)
  ).toDF("doc_id", "text")

  test("fuzzy: direct hits removed, unanchored pair keeps min, uniques kept") {
    val idx = IncrementalDedup.fuzzyIndex(corpus)
    val removed = IncrementalDedup.fuzzyRemovalIds(batch, idx)
      .as[Long].collect().toSet
    assert(removed === Set(10L, 11L, 21L))
    val kept = IncrementalDedup.fuzzyRemoveDuplicates(batch, idx)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(20L, 30L))
  }

  test("fuzzy: anchored component propagates removal to non-hit members") {
    // synthetic band tables give direct control over bucket collisions:
    // batch docs 10 and 11 share bucket (0, 99); 11 alone shares
    // (1, 77) with the corpus. 10 has NO corpus collision but sits in
    // 11's component -> removed transitively (one pass over corpus ∪
    // batch would put 10, 11 and the corpus doc in one component).
    val b = Seq((0, 99L, 10L), (0, 99L, 11L), (1, 77L, 11L), (2, 55L, 30L))
      .toDF("band", "band_hash", "doc_id")
    val idx = Seq((1, 77L, 900L)).toDF("band", "band_hash", "doc_id")
    val removed = IncrementalDedup.removalsFromBands(b, idx, "doc_id")
      .as[Long].collect().toSet
    assert(removed === Set(10L, 11L))
  }

  test("fuzzy: empty index degenerates to plain intra-batch removalIds") {
    val idx = IncrementalDedup.fuzzyIndex(corpus.limit(0))
    val inc = IncrementalDedup.fuzzyRemovalIds(batch, idx).as[Long].collect().toSet
    val plain = MinHashLSH.removalIds(batch).as[Long].collect().toSet
    assert(inc === plain)
  }

  test("fuzzy index round-trips through parquet write/append/load") {
    val dir = Files.createTempDirectory("inc_idx_").toString
    val path = s"$dir/fuzzy"
    IncrementalDedup.writeFuzzyIndex(corpus.filter($"doc_id" === 1L), path)
    IncrementalDedup.appendFuzzyIndex(corpus.filter($"doc_id" === 2L), path)
    val loaded = IncrementalDedup.loadFuzzyIndex(spark, path)
    assert(loaded.count() === IncrementalDedup.fuzzyIndex(corpus).count())
    val removed = IncrementalDedup.fuzzyRemovalIds(batch, loaded)
      .as[Long].collect().toSet
    assert(removed === Set(10L, 11L, 21L))
  }

  test("snapshot index: bootstrap, cross-snapshot removal, idempotent rerun") {
    val root = Files.createTempDirectory("inc_snap_").toString
    // snapshot 1 on an empty root: plain self-dedup (corpus is unique)
    assert(IncrementalDedup.fuzzySnapshotRemovalIds(corpus, root, "s1").count() === 0)
    assert(IncrementalDedup.committedSnapshotBands(spark, root, "_none_").count() === 40)
    // snapshot 2: same removals as the flat-index case...
    def run2() = IncrementalDedup.fuzzySnapshotRemovalIds(batch, root, "s2")
      .as[Long].collect().toSet
    assert(run2() === Set(10L, 11L, 21L))
    // ...and RERUNNING it after its own index write landed gives the
    // SAME removals (its own subtable is excluded from the read; a flat
    // append index would classify the whole batch as dups of itself)
    assert(run2() === Set(10L, 11L, 21L))
    // index holds s1's 2 docs + s2's 2 KEPT docs (20, 30), overwritten
    // not appended on the rerun
    assert(IncrementalDedup.committedSnapshotBands(spark, root, "_none_").count() === 80)
  }

  test("exact snapshot index: same rerun-idempotency contract") {
    val root = Files.createTempDirectory("inc_snap_").toString
    val c = Seq((1L, "page one"), (2L, "page two")).toDF("doc_id", "text")
    val nb = Seq((10L, "page one"), (11L, "brand new")).toDF("doc_id", "text")
    assert(IncrementalDedup.exactSnapshotRemovalIds(c, root, "s1").count() === 0)
    def run2() = IncrementalDedup.exactSnapshotRemovalIds(nb, root, "s2")
      .as[Long].collect().toSet
    assert(run2() === Set(10L))
    assert(run2() === Set(10L))
    assert(IncrementalDedup.committedSnapshotHashes(spark, root, "_none_").count() === 3)
  }

  test("exact: indexed texts removed, intra-batch keep-first, uniques kept") {
    val c = Seq((1L, "page one"), (2L, "page two")).toDF("doc_id", "text")
    val nb = Seq(
      (10L, "page one"),   // indexed -> removed
      (20L, "fresh page"), (21L, "fresh page"), // intra-batch: keep 20
      (30L, "brand new")   // kept
    ).toDF("doc_id", "text")
    val idx = IncrementalDedup.exactIndex(c)
    val removed = IncrementalDedup.exactRemovalIds(nb, idx).as[Long].collect().toSet
    assert(removed === Set(10L, 21L))
    val kept = IncrementalDedup.exactRemoveDuplicates(nb, idx)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(20L, 30L))
  }

  test("exact: an intra-batch group that is ALSO indexed loses every member") {
    val c = Seq((1L, "dup text")).toDF("doc_id", "text")
    val nb = Seq((10L, "dup text"), (11L, "dup text")).toDF("doc_id", "text")
    val removed = IncrementalDedup
      .exactRemovalIds(nb, IncrementalDedup.exactIndex(c)).as[Long].collect().toSet
    assert(removed === Set(10L, 11L))
  }

  test("exact index round-trips through parquet write/append") {
    val dir = Files.createTempDirectory("inc_idx_").toString
    val path = s"$dir/exact"
    val c1 = Seq((1L, "page one")).toDF("doc_id", "text")
    val c2 = Seq((2L, "page two")).toDF("doc_id", "text")
    IncrementalDedup.writeExactIndex(c1, path)
    IncrementalDedup.appendExactIndex(c2, path)
    val idx = spark.read.parquet(path)
    val nb = Seq((10L, "page one"), (11L, "page two"), (12L, "page three"))
      .toDF("doc_id", "text")
    val removed = IncrementalDedup.exactRemovalIds(nb, idx).as[Long].collect().toSet
    assert(removed === Set(10L, 11L))
  }
}
