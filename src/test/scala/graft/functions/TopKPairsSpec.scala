package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sim.Knn

/** The bounded top-k aggregate must reproduce the exact window-rank
  * semantics ((sim desc, id asc), rank 1..k) it replaced in
  * Knn.bruteForceTopK — checked against a driver-side recompute.
  */
class TopKPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bruteForceTopK equals the naive driver-side top-k on a random corpus") {
    val rnd = new scala.util.Random(3)
    val corpus = (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = corpus.toDF("vec_id", "embedding").repartition(7) // multiple partials per group
    val queries = df.filter(col("vec_id") % 60 === 0)
    val got = Knn.bruteForceTopK(df, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), math.round(r.getDouble(2) * 1e9)))
      .toMap

    val byId = corpus.toMap
    queries.select("vec_id").collect().map(_.getLong(0)).foreach { qid =>
      val expected = corpus.filter(_._1 != qid)
        .map { case (id, v) => (id, Knn.cosine(v, byId(qid))) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5)
      expected.zipWithIndex.foreach { case ((id, s), i) =>
        val (gid, gs) = got((qid, i + 1))
        assert(gid == id && gs == math.round(s * 1e9), s"query $qid rank ${i + 1}")
      }
    }
  }

  test("partial buffers cap at k: a 10k-row group aggregates without unbounded lists") {
    val df = (0L until 10000L).map(i => (1L, i.toDouble / 10000, i)).toDF("g", "negsim", "id")
    val t = struct(col("negsim"), col("id").as("neighbor_id")).as("_t")
    val topk = org.apache.spark.sql.GraftSqlBridge.column(
      TopKPairs(org.apache.spark.sql.GraftSqlBridge.expression(col("_t")), 3).toAggregateExpression())
    val out = df.select(col("g"), t).groupBy("g").agg(topk.as("_top"))
      .select(explode(col("_top")).as("t")).select(col("t.neighbor_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 1L, 2L)) // smallest negsim first
  }
}
