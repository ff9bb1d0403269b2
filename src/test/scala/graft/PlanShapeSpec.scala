package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Physical-plan regression guards for the scale disciplines PLANS.md
  * documents: these FAIL if a future change reintroduces a wide shuffle,
  * a global sort, or an un-broadcast join on the hot paths. (Plan
  * inspection happens pre-AQE on the initial executedPlan, which is
  * where the static shape is decided.)
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("planshape").toString
    spark.range(0, 200)
      .selectExpr("id AS doc_id", "concat('some text of doc ', id, ' with words') AS text")
      .write.mode("overwrite").parquet(dir)
    dir
  }
  private def docs = spark.read.parquet(docsPath)

  private lazy val embPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("planshape_emb").toString
    spark.range(0, 100)
      .selectExpr("id AS vec_id",
        "cast(array(rand(1), rand(2), rand(3), rand(4)) AS array<float>) AS embedding")
      .write.mode("overwrite").parquet(dir)
    dir
  }
  private def emb = spark.read.parquet(embPath)

  /** AQE wraps the plan in AdaptiveSparkPlanExec whose inner plan is a
    * field, not a child — collect() must traverse the initial plan.
    */
  private def unwrap(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
    case p => p
  }

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] =
    unwrap(df).collect { case e: ShuffleExchangeExec => e }

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("curation pipeline has ZERO exchanges (pure narrow map work)") {
    val curated = graft.pipeline.CurationPipeline.keptOutput(
      graft.pipeline.CurationPipeline.curate(docs))
    assert(shuffles(curated).isEmpty, planString(curated))
  }

  test("exact dedup shuffles carry only thin columns, never the text") {
    val removal = graft.dedup.ExactDedup.removalIds(docs)
    val wide = shuffles(removal).filter(_.child.output.exists(_.name == "text"))
    assert(wide.isEmpty, s"text column entered a shuffle:\n${planString(removal)}")
  }

  test("minhash LSH shuffles never carry text or full signatures") {
    val edges = graft.dedup.MinHashLSH.candidateEdges(docs)
    val bad = shuffles(edges).filter(_.child.output.exists(a =>
      a.name == "text" || a.name == "sig"))
    assert(bad.isEmpty, s"wide column entered a shuffle:\n${planString(edges)}")
  }

  test("LSH chain edges build from a window sort, not an object-hash list aggregate") {
    // the round-6 rewrite: consecutive-pair edges come from one Tungsten
    // sort + lag() window per bucket. An ObjectHashAggregate here means
    // someone reintroduced collect_list-per-bucket — the allocation
    // pattern that kept the stage from scaling past 8 threads.
    val edges = graft.dedup.MinHashLSH.candidateEdges(docs)
    val plan = planString(edges)
    assert(plan.contains("Window"), s"expected a window over the band table:\n$plan")
    assert(!plan.contains("ObjectHashAggregate"),
      s"boxed list aggregate reappeared in the edge builder:\n$plan")
  }

  test("lshTopK candidate dedup shuffles two ids only; vectors re-attach later") {
    val out = graft.sim.Knn.lshTopK(emb, emb.filter($"vec_id" % 20 === 0), 3, dim = 4,
      tables = 4, bits = 4)
    val vecShuffles = shuffles(out).filter(_.child.output.exists(a =>
      a.name == "_cv" || a.name == "_qv" || a.name == "embedding"))
    // the only acceptable vector movement is the final per-query window
    // rank over the already-thinned candidate set
    assert(vecShuffles.size <= 1, planString(out))
    val idOnly = shuffles(out).filter(e =>
      e.child.output.map(_.name).toSet == Set("query_id", "neighbor_id"))
    assert(idOnly.nonEmpty, s"expected an id-only dedup exchange:\n${planString(out)}")
  }

  test("q2_join broadcasts both dimension tables (no sort-merge join)") {
    val q = SparkEntry.queries("q2_join")(spark, "/root/testdata/sf0.001")
    val plan = planString(q)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q3_topk compiles to TakeOrderedAndProject, no unpartitioned window warning path") {
    val q = SparkEntry.queries("q3_topk")(spark, "/root/testdata/sf0.001")
    val plan = planString(q)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // no WindowExec at all: a constant partitionBy key constant-folds
    // into the EMPTY partition spec (the single-partition scale-killer),
    // so rn must come from the broadcast self-rank instead
    val windows = unwrap(q).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, plan)
  }

  test("knn_brute is a bounded top-k aggregate — no WindowExec over the cross product") {
    val q = SparkEntry.queries("knn_brute")(spark, "/root/testdata/sf0.001")
    val windows = unwrap(q).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, planString(q))
    val plan = planString(q)
    // partial_top_k_pairs before the exchange = map-side buffers cap at
    // k, so the shuffle carries k rows per query per mapper
    assert(plan.contains("partial_top_k_pairs"), plan)
    assert(plan.contains("top_k_pairs"), plan)
  }

  test("semantic pairwise tier joins on the capped _block key, never a cartesian") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = graft.dedup.SemanticDedup.nearDupPairs(emb, k = 4, eps = 0.1)
    val plan = planString(pairs)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("classifier + embedder + scoring-head tiers are ZERO-exchange pure maps") {
    // quality/domain/content-type/fineweb/idg + the artifact embedder
    // and the image heads: all broadcast-model per-row scoring —
    // a shuffle appearing here would be a 100 TB regression
    val chain = {
      val emb = graft.sim.WordVecEmbedder.withEmbedding(docs,
        "src/main/resources/models/embed_tiny.bin", outCol = "embedding")
      val scored = graft.classify.InstructionDataGuard(
        "src/main/resources/models/nsfw_tiny.bin").score(
        graft.multimodal.ImageNsfwFilter("src/main/resources/models/nsfw_tiny.bin").score(
          graft.multimodal.ImageAestheticFilter(
            "src/main/resources/models/aesthetic_tiny.bin").score(emb)))
      graft.classify.ContentTypeClassifier("src/main/resources/models/content_tiny.bin")(
        graft.classify.DomainClassifier("src/main/resources/models/domain_tiny.bin",
          filterBy = Seq("Games", "Sports"))(
          graft.classify.QualityClassifier("src/main/resources/models/quality_tiny.bin")(scored)))
    }
    assert(shuffles(chain).isEmpty, planString(chain))
  }

  test("prompt_task_complexity and video motion filter stay zero-exchange") {
    val ptc = graft.classify.PromptTaskComplexity.score(
      graft.sim.WordVecEmbedder.withEmbedding(docs,
        "src/main/resources/models/embed_tiny.bin", outCol = "embedding"),
      "src/main/resources/models/ptc_tiny.bin")
    assert(shuffles(ptc).isEmpty, planString(ptc))

    val clips = docs.select($"doc_id",
      array(array(lit(0.1f), lit(0f))).as("decoded_motion_data"))
    val motion = graft.video.MotionFilter.filterClips(clips, h = 1, w = 1)
    assert(shuffles(motion).isEmpty, planString(motion))
  }

  test("round-5 video stages stay zero-exchange; semantic gate joins are equi only") {
    // frame extraction + fixed-stride clipping: pure per-row maps —
    // an exchange here would serialize the 100 TB decode planning
    val ts = docs.select($"doc_id",
      expr("transform(sequence(0, 12), i -> CAST(i / 10.0D AS FLOAT))").as("frame_timestamps"))
    val frames = graft.video.FrameExtraction.withExtractedFrames(ts)
    assert(shuffles(frames).isEmpty, planString(frames))

    val vids = docs.select($"doc_id", concat(lit("v"), $"doc_id").as("video_name"),
      lit(100).cast("int").as("num_frames"), lit(10.0).as("framerate"))
    val stride = graft.video.SceneClips.fixedStrideClips(vids, 4.0, 3.0, 2.0)
    assert(shuffles(stride).isEmpty, planString(stride))

    // the rebuilt semantic_dedup_ids gate: blocked equi-joins only —
    // the old all-pairs non-equi join must never come back
    val gate = graft.SparkEntry.queries("semantic_dedup_ids")(spark, "/root/testdata/sf0.001")
    val plan = planString(gate)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("webdataset shard scan keeps one task per shard (ArchiveIO parallel grain)") {
    val dir = java.nio.file.Files.createTempDirectory("wds_plan").toString
    (0 until 3).foreach { i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/s$i.tar"),
        graft.multimodal.WebDataset.buildShard(Seq(
          (f"k$i%03d", Map("jpg" -> s"p$i".getBytes)))))
    }
    val ds = graft.multimodal.WebDataset.read(spark, s"$dir/*.tar")
    assert(ds.rdd.getNumPartitions == 3, "expected one task per shard")
    assert(ds.count() == 3)
  }

  test("filter pushdown and column pruning reach the parquet scan") {
    val q = docs.filter($"doc_id" > 100).select("doc_id")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]"), scan)
    assert(scan.contains("ReadSchema: struct<doc_id:bigint>"), scan)
  }

  test("cascade UDF is evaluated once per row (no re-evaluation under pushed filters)") {
    val scored = graft.filters.Cascade.score(docs).filter($"keep").select("doc_id")
    val plan = planString(scored)
    val udfCount = "UDF".r.findAllIn(plan).length
    assert(udfCount <= 2, s"cascade UDF appears $udfCount times:\n$plan")
  }
}
