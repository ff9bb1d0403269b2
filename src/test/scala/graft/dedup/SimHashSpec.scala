package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Clique-collapsed candidate generation in SimHash.verifiedNearDupPairs:
  * identical-(fingerprint, text) groups band ONE representative, so a
  * planted identical clique contributes zero candidate pairs — the
  * quadratic cost moves entirely to the (inherently quadratic) output
  * expansion, never the band self-join.
  */
class SimHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and that is how stories " +
    "have always started with people who walk through rain for reasons of their own choosing"
  private val near = base + " again"   // hamming(base, near) = 5
  private val far = "tables indexes shuffles partitions optimizers executors stages tasks " +
    "plans codegen exchange broadcast hash join sort merge aggregate scan filter project limit"

  test("planted 1000-doc identical clique: zero banded candidates, output-bound expansion only") {
    val clique = (0L until 1000L).map(i => (i, base))
    val docs = (clique :+ (2000L, near) :+ (3000L, far)).toDF("doc_id", "text")

    // the candidate stage sees one representative for the whole clique
    val groups = docs
      .select(col("doc_id"), md5(to_binary(col("text"), lit("utf-8"))).as("_th"),
        udf((t: String) => SimHash.simhash64(t)).apply(col("text")).as("simhash"))
      .groupBy("simhash", "_th").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    assert(groups.count() == 3) // clique + near + far

    val candidates = SimHash.bandedCandidates(
      groups.select(col("ids").getItem(0).as("id"), col("simhash")), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the rep-vs-near candidate survives banding; 1000 identical
    // docs contribute NOTHING to the self-join (old path: ~499,500 pairs
    // x 5 bands before distinct)
    assert(candidates == Set((0L, 2000L)), s"unexpected candidates: $candidates")

    val pairs = SimHash.verifiedNearDupPairs(docs, maxHamming = 6, minJaccard = 0.5)
    // 1000*999/2 intra-clique pairs at J=1.0, plus clique-member x near
    // expansion (1000 pairs) if the verify passes
    val counts = pairs.groupBy("jaccard").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(counts(1.0) == 1000L * 999 / 2)
    assert(counts.filter(_._1 < 1.0).values.sum == 1000L) // rep-jaccard inherited by every member
    // far doc never appears
    assert(pairs.filter(col("src") === 3000L || col("dst") === 3000L).count() == 0)
  }

  test("public nearDupPairs on a planted 1000-doc clique: quadratic only at output, exact hammings") {
    val clique = (0L until 1000L).map(i => (i, base))
    val docs = (clique :+ (2000L, near) :+ (3000L, far)).toDF("doc_id", "text")
    // the rep self-join input is 3 rows (one per distinct fingerprint,
    // asserted in the test above); the public API's output keeps the
    // full pairs contract
    val pairs = SimHash.nearDupPairs(docs, maxHamming = 6)
    val byHam = pairs.groupBy("hamming").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byHam(0) == 1000L * 999 / 2) // intra-clique
    assert(byHam(5) == 1000L) // every member x the near doc at hamming 5
    assert(byHam.values.sum == 1000L * 999 / 2 + 1000L)
    assert(pairs.filter(col("src") >= col("dst")).count() == 0)
    assert(pairs.filter(col("src") === 3000L || col("dst") === 3000L).count() == 0)
  }

  test("collapsed path output == per-member banding output on a mixed corpus") {
    val docs = Seq(
      1L -> base, 2L -> base, 3L -> base,          // 3-clique (identical)
      4L -> near, 5L -> near,                      // 2-clique near the first
      6L -> far,                                   // unrelated
      7L -> (far + " tail")                        // near-dup of far, distinct text
    ).toDF("doc_id", "text")

    val collapsed = SimHash.verifiedNearDupPairs(docs, maxHamming = 6, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
    val perMember = MinHashLSH.verifyEdges(
      SimHash.nearDupPairs(docs, maxHamming = 6).select(col("src"), col("dst")),
      docs, ngram = 3, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
    assert(collapsed == perMember, s"collapsed=$collapsed vs perMember=$perMember")
    assert(collapsed.exists(p => p._1 == 6L && p._2 == 7L)) // distinct-text near pair survives
    assert(collapsed.count(p => p._3 == 1000000L) == 3 + 1) // 3-clique pairs + (4,5)
  }

  test("null-text docs never pair (no bogus J=1.0 clique from the null md5 group)") {
    val docs = Seq(
      1L -> Option.empty[String], 2L -> Option.empty[String], 3L -> Some(base),
      4L -> Some(base), 5L -> Option.empty[String]
    ).toDF("doc_id", "text")
    val sim = SimHash.verifiedNearDupPairs(docs, maxHamming = 4, minJaccard = 0.5)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim == Set((3L, 4L)), s"got $sim")
    val mh = MinHashLSH.verifiedPairs(docs, minJaccard = 0.5)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == Set((3L, 4L)), s"got $mh")
  }
}
