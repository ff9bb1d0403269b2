package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** Stage-level resume for fuzzy dedup (the reference's cache_path
  * contract): minhashes/edges/components land in the cache once; a
  * rerun resumes from the last committed stage instead of recomputing.
  */
class FuzzyCheckpointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val p = MinHashLSH.Params()

  // two duplicate groups with fully DISJOINT vocabularies (a shared
  // long prefix would make the groups genuine near-dups of each other
  // at J≈0.95 and merge them — that is correct MinHash behavior, not a
  // bug, so the fixture must not share text across groups) + 2 uniques
  private def corpus = {
    val baseA = (1 to 40).map(i => s"token$i word$i").mkString(" ")
    val baseB = (1 to 40).map(i => s"gamma$i delta$i").mkString(" ")
    Seq(
      (10L, baseA + " alpha"), (11L, baseA + " alpha"), (12L, baseA + " alpha"),
      (20L, baseB + " beta"), (21L, baseB + " beta"),
      (30L, (1 to 40).map(i => s"other$i thing$i").mkString(" ")),
      (31L, (1 to 40).map(i => s"unrelated$i stuff$i").mkString(" "))
    ).toDF("doc_id", "text")
  }

  test("checkpointed removal ids equal single-pass; all-cached rerun never touches the input") {
    val cache = Files.createTempDirectory("fuzzy_ckpt").toString
    val expected = MinHashLSH.removalIds(corpus, p).as[Long].collect().toSet

    val r1 = FuzzyCheckpoint.removalIds(corpus, p, cache).as[Long].collect().toSet
    assert(r1 == expected)
    assert(r1 == Set(11L, 12L, 21L)) // keep-min-id per duplicate group
    for (t <- Seq("minhashes", "edges", "components"))
      assert(Files.exists(Paths.get(s"$cache/${t}_manifest.jsonl")), s"$t not committed")

    // rerun with an EMPTY input: every stage must come from the cache,
    // so the result is unchanged — proof no stage recomputed from input
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r2 = FuzzyCheckpoint.removalIds(empty, p, cache).as[Long].collect().toSet
    assert(r2 == expected)
  }

  test("crash after the edges stage: rerun resumes from cached edges, not the input") {
    val cache = Files.createTempDirectory("fuzzy_ckpt2").toString
    FuzzyCheckpoint.removalIds(corpus, p, cache)

    // simulate a crash before the components commit landed
    Files.delete(Paths.get(s"$cache/components_manifest.jsonl"))
    val emptyInput = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = FuzzyCheckpoint.removalIds(emptyInput, p, cache).as[Long].collect().toSet
    assert(r == Set(11L, 12L, 21L), "components must be rebuilt from the cached edges")
  }

  test("stableInput persists the id assignment once and replays it") {
    val cache = Files.createTempDirectory("fuzzy_ckpt3").toString
    val in1 = corpus.withColumn("id", monotonically_increasing_id())
    val persisted = FuzzyCheckpoint.stableInput(in1, cache)
    val ids1 = persisted.select("id", "doc_id").as[(Long, Long)].collect().toMap

    // a rerun presenting a DIFFERENT assignment still reads the original
    val in2 = corpus.repartition(7).withColumn("id", monotonically_increasing_id())
    val ids2 = FuzzyCheckpoint.stableInput(in2, cache)
      .select("id", "doc_id").as[(Long, Long)].collect().toMap
    assert(ids2 == ids1)
  }
}
