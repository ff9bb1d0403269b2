package graft.video

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.SparkTestBase

class ClipWriterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("deterministic layout helpers match the reference's path shapes") {
    assert(ClipWriter.pathClips("/out/") == "/out/clips")
    assert(ClipWriter.pathClips("/out", filtered = true) == "/out/filtered_clips")
    assert(ClipWriter.pathMetas("/out") == "/out/metas/v0")
    assert(ClipWriter.pathPreviews("/out") == "/out/previews")
    assert(ClipWriter.pathProcessedVideos("/out") == "/out/processed_videos")
    assert(ClipWriter.pathProcessedClipChunks("/out") == "/out/processed_clip_chunks")
    assert(ClipWriter.pathCe1EmbdParquet("/out") == "/out/ce1_embd_parquet")
    assert(ClipWriter.windowUri("/out/previews", "u-1", 0, 64, "webp") ==
      "/out/previews/u-1/0_64.webp")
    assert(ClipWriter.clipUri("/out/clips", "u-1", "mp4") == "/out/clips/u-1.mp4")
    assert(ClipWriter.videoUri("/out", "/in", "/in/a/b.mp4") ==
      "/out/processed_videos/a/b.mp4.json")
    assert(ClipWriter.clipChunkUri("/out", "/in", "/in/a/b.mp4", 3) ==
      "/out/processed_clip_chunks/a/b.mp4_3.json")
    intercept[IllegalArgumentException] {
      ClipWriter.videoUri("/out", "/in", "/elsewhere/b.mp4")
    }
    // uuid5-named per-chunk embedding parquet (NAMESPACE_URL over
    // "{input_path}_{chunk}")
    val u = graft.dedup.IdGenerator.uuid5("/in/a/b.mp4_0")
    assert(ClipWriter.embeddingParquetUri("/out", "/in/a/b.mp4", 0) ==
      s"/out/ce1_embd_parquet/$u.parquet")
    assert(ClipWriter.embeddingParquetUri("/out", "/in/a/b.mp4", 0, "internvideo2") ==
      s"/out/iv2_embd_parquet/$u.parquet")
    assert(ClipWriter.sha256("abc".getBytes) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("pyJson bytes match Python json.dumps(indent=4)") {
    val data = Seq[(String, Any)](
      "span_uuid" -> "abc-def",
      "source_video" -> "/in/v ideo\n.mp4",
      "duration_span" -> Seq(0.0, 2.5),
      "width_source" -> null,
      "motion_score" -> Seq[(String, Any)]("global_mean" -> 0.5, "per_patch_min_256" -> null),
      "errors" -> Seq.empty[String],
      "windows" -> Seq(Seq[(String, Any)](
        "start_frame" -> 0, "end_frame" -> 64, "qwen_caption" -> "café")),
      "valid" -> true,
      "empty" -> ClipWriter.EmptyObj)
    val expected =
      """{
        |    "span_uuid": "abc-def",
        |    "source_video": "/in/v ideo\n.mp4",
        |    "duration_span": [
        |        0.0,
        |        2.5
        |    ],
        |    "width_source": null,
        |    "motion_score": {
        |        "global_mean": 0.5,
        |        "per_patch_min_256": null
        |    },
        |    "errors": [],
        |    "windows": [
        |        {
        |            "start_frame": 0,
        |            "end_frame": 64,
        |            "qwen_caption": "caf@BS@u00e9"
        |        }
        |    ],
        |    "valid": true,
        |    "empty": {}
        |}""".stripMargin.replace("@BS@", "\\")
    assert(ClipWriter.pyJson(data) == expected)
    // json.dumps uses the SHORT escapes for backspace/formfeed and the
    // bare NaN/Infinity tokens (allow_nan default) — not \u00XX / inf
    assert(ClipWriter.pyJson("a\bb\fc") == "\"a\\bb\\fc\"")
    assert(ClipWriter.pyJson(Double.NaN) == "NaN")
    assert(ClipWriter.pyJson(Double.PositiveInfinity) == "Infinity")
    assert(ClipWriter.pyJson(Double.NegativeInfinity) == "-Infinity")
    assert(ClipWriter.pyJson(Float.NaN) == "NaN")
  }

  private def clipsDf() = {
    val windowType = ArrayType(StructType(Seq(
      StructField("start_frame", IntegerType), StructField("end_frame", IntegerType),
      StructField("webp", BinaryType),
      StructField("captions", MapType(StringType, StringType)),
      StructField("enhanced_captions", MapType(StringType, StringType)))))
    val schema = StructType(Seq(
      StructField("source_video", StringType), StructField("clip_chunk_index", IntegerType),
      StructField("clip_uuid", StringType),
      StructField("span_start", DoubleType), StructField("span_end", DoubleType),
      StructField("buffer", BinaryType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("motion_global_mean", DoubleType),
      StructField("motion_per_patch_min_256", DoubleType),
      StructField("aesthetic_score", DoubleType),
      StructField("errors", ArrayType(StringType)),
      StructField("filtered", BooleanType),
      StructField("filter_reason", StringType),
      StructField("windows", windowType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("framerate", DoubleType), StructField("num_frames", IntegerType),
      StructField("duration", DoubleType), StructField("video_codec", StringType),
      StructField("num_total_clips", IntegerType), StructField("num_clip_chunks", IntegerType)))
    val win = Row(0, 64, "webpbytes".getBytes, Map("qwen" -> "a cat"), Map.empty[String, String])
    val rows = Seq(
      Row("/in/a.mp4", 0, "clip-a0", 0.0, 2.0, "mp4a0".getBytes, Seq(1.0f, 0.0f),
        0.8, 0.4, 5.5, Seq.empty[String], false, null, Seq(win),
        1920, 1080, 30.0, 300, 10.0, "avc1", 3, 1),
      Row("/in/a.mp4", 0, "clip-a1", 2.0, 5.5, "mp4a1".getBytes, null,
        null, null, null, Seq.empty[String], false, null, Seq.empty[Row],
        1920, 1080, 30.0, 300, 10.0, "avc1", 3, 1),
      Row("/in/a.mp4", 0, "clip-a2", 5.5, 6.0, "mp4a2".getBytes, null,
        null, null, 2.0, Seq.empty[String], true, "aesthetic", Seq.empty[Row],
        1920, 1080, 30.0, 300, 10.0, "avc1", 3, 1),
      Row("/in/b.mp4", 1, "clip-b0", 1.0, 2.0, "mp4b0".getBytes, Seq(0.0f, 1.0f),
        null, null, null, Seq("decode warn"), false, null, Seq.empty[Row],
        640, 480, 25.0, 50, 2.0, "hevc", 4, 2))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("distributed write: layout, filtered rule, chunk jsons, byte-stable across runs") {
    val out1 = java.nio.file.Files.createTempDirectory("clipw1").toString
    val stats = ClipWriter.write(clipsDf(), out1, "/in")

    // kept clips under clips/, the filtered one under filtered_clips/
    assert(new java.io.File(s"$out1/clips/clip-a0.mp4").exists())
    assert(new java.io.File(s"$out1/clips/clip-a1.mp4").exists())
    assert(new java.io.File(s"$out1/filtered_clips/clip-a2.mp4").exists())
    assert(!new java.io.File(s"$out1/clips/clip-a2.mp4").exists())
    // previews only for kept clips' windows
    assert(new java.io.File(s"$out1/previews/clip-a0/0_64.webp").exists())
    // every clip (filtered too) gets a v0 metadata json
    for (u <- Seq("clip-a0", "clip-a1", "clip-a2", "clip-b0"))
      assert(new java.io.File(s"$out1/metas/v0/$u.json").exists())
    // chunk jsons; the video-level json only for chunk 0
    assert(new java.io.File(s"$out1/processed_clip_chunks/a.mp4_0.json").exists())
    assert(new java.io.File(s"$out1/processed_clip_chunks/b.mp4_1.json").exists())
    assert(new java.io.File(s"$out1/processed_videos/a.mp4.json").exists())
    assert(!new java.io.File(s"$out1/processed_videos/b.mp4.json").exists())

    // metadata content: clip_location points at the filtered dir, valid
    // rule = buffer && windows
    val metaA2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out1/metas/v0/clip-a2.json")), "UTF-8")
    assert(metaA2.contains(s""""clip_location": "$out1/filtered_clips/clip-a2.mp4""""))
    assert(metaA2.contains(""""valid": false"""))
    assert(metaA2.contains(""""aesthetic_score": 2.0"""))
    val metaA0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out1/metas/v0/clip-a0.json")), "UTF-8")
    assert(metaA0.contains(""""valid": true"""))
    assert(metaA0.contains(""""qwen_caption": "a cat""""))
    assert(metaA0.contains(""""global_mean": 0.8"""))
    assert(metaA0.contains(""""num_bytes": 5"""))

    // filter_reason flows into the chunk-stats counters
    val chunkA = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out1/processed_clip_chunks/a.mp4_0.json")), "UTF-8")
    assert(chunkA.contains(""""num_clips_filtered_by_aesthetic": 1"""))
    assert(chunkA.contains(""""num_clips_filtered_by_motion": 0"""))

    // per-chunk embedding parquet named by uuid5 and readable by Spark
    val embFile = ClipWriter.embeddingParquetUri(out1, "/in/a.mp4", 0)
    assert(new java.io.File(embFile).exists())
    val emb = spark.read.parquet(embFile)
    assert(emb.count() == 1) // only clip-a0 carried an embedding in chunk (a,0)
    assert(emb.columns.sorted.sameElements(Array("embedding", "id")))
    // ... and the per-clip numpy pickle twin, kept clips only
    assert(new java.io.File(s"$out1/ce1_embd/clip-a0.pickle").exists())
    assert(!new java.io.File(s"$out1/ce1_embd/clip-a2.pickle").exists())

    // stats frame: chunk (a,0) passed 2 (filtered one excluded),
    // transcoded 3, durations include the filtered clip
    val sa = stats.filter(col("source_video") === "/in/a.mp4").head
    assert(sa.getAs[Long]("num_clips_passed") == 2)
    assert(sa.getAs[Long]("num_clips_transcoded") == 3)
    assert(sa.getAs[Long]("num_clips_with_embeddings") == 1)
    assert(sa.getAs[Long]("num_clips_with_caption") == 1)
    assert(sa.getAs[Long]("num_clips_with_webp") == 1)
    assert(math.abs(sa.getAs[Double]("total_clip_duration") - 6.0) < 1e-9)
    assert(math.abs(sa.getAs[Double]("max_clip_duration") - 3.5) < 1e-9)

    // second run into a fresh dir — with DIFFERENT input partitioning
    // (the writer's repartition-by-chunk makes layout independent of
    // the upstream partition count): identical relative layout and
    // identical json/mp4 bytes (modulo the embedded absolute root)
    val out2 = java.nio.file.Files.createTempDirectory("clipw2").toString
    ClipWriter.write(clipsDf().repartition(7), out2, "/in")
    def listing(root: String) = {
      val base = java.nio.file.Paths.get(root)
      val s = java.nio.file.Files.walk(base)
      try s.filter(java.nio.file.Files.isRegularFile(_)).map[String](p => base.relativize(p).toString)
        .sorted().toArray.map(_.toString).toSeq
      finally s.close()
    }
    assert(listing(out2) == listing(out1))
    for (rel <- listing(out1) if rel.endsWith(".json")) {
      val b1 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out1/$rel")), "UTF-8").replace(out1, "OUT")
      val b2 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out2/$rel")), "UTF-8").replace(out2, "OUT")
      assert(b1 == b2, s"json $rel differs across runs")
    }
  }

  test("file://-scheme output root writes the same layout through the Hadoop FS path") {
    val local = java.nio.file.Files.createTempDirectory("clipw_fs").toString
    val out = s"file://$local"
    ClipWriter.write(clipsDf(), out, "/in")
    // payloads + jsons + embedding parquet all landed behind the scheme,
    // with no LocalFileSystem .crc sidecars polluting the layout
    for (rel <- Seq("clips/clip-a0.mp4", "filtered_clips/clip-a2.mp4",
        "previews/clip-a0/0_64.webp", "metas/v0/clip-b0.json",
        "processed_clip_chunks/a.mp4_0.json", "processed_videos/a.mp4.json",
        "ce1_embd/clip-a0.pickle"))
      assert(new java.io.File(s"$local/$rel").exists(), s"missing $rel")
    val crcs = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(local))
      try s.filter(p => p.toString.endsWith(".crc")).count() finally s.close()
    }
    assert(crcs == 0)
    val emb = spark.read.parquet(ClipWriter.embeddingParquetUri(out, "/in/a.mp4", 0))
    assert(emb.count() == 1)
    // json bytes identical to an unschemed-root run modulo the embedded root
    val plain = java.nio.file.Files.createTempDirectory("clipw_fs2").toString
    ClipWriter.write(clipsDf(), plain, "/in")
    def read(p: String, root: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8").replace(root, "OUT")
    assert(read(s"$local/metas/v0/clip-a0.json", out) ==
      read(s"$plain/metas/v0/clip-a0.json", plain))
  }

  test("embedding pickles unpickle into real numpy arrays (env-gated on python3+numpy)") {
    val python = Seq("python3", "/usr/bin/python3", "/usr/local/bin/python3").find { p =>
      try new ProcessBuilder(p, "-c", "import numpy").start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    }
    assume(python.isDefined, "no python3 with numpy available")
    val dir = java.nio.file.Files.createTempDirectory("nppkl").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/e.pickle"),
      graft.tools.NumpyPickle.float32(Seq(2, 3), Array(1f, 2f, 3f, 4.5f, -0.25f, 6f)))
    val script =
      s"""
try:
    import numpy as np
except ImportError:
    print("NO_NUMPY"); raise SystemExit(0)
import pickle
a = pickle.load(open("$dir/e.pickle", "rb"))
assert a.dtype == np.float32 and a.shape == (2, 3), (a.dtype, a.shape)
assert a.tolist() == [[1.0, 2.0, 3.0], [4.5, -0.25, 6.0]], a.tolist()
print("ok")
"""
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/check.py"),
      script.getBytes("UTF-8"))
    val proc = new ProcessBuilder(python.get, s"$dir/check.py").redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assume(!out.contains("NO_NUMPY"), "numpy not available")
    assert(proc.waitFor() == 0 && out.contains("ok"), s"numpy unpickle failed: $out")
  }

  test("dry run writes only the chunk/video jsons (reference gates payloads only)") {
    val out = java.nio.file.Files.createTempDirectory("clipw_dry").toString
    val stats = ClipWriter.write(clipsDf(), out, "/in", dryRun = true)
    assert(stats.count() == 2)
    val files = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      try st.filter(java.nio.file.Files.isRegularFile(_))
        .map[String](_.getFileName.toString).sorted().toArray.map(_.toString).toSeq
      finally st.close()
    }
    // stats/metadata jsons survive a dry run (clip_writer.py:427-482
    // has no dry_run gate); every payload write is suppressed
    assert(files == Seq("a.mp4.json", "a.mp4_0.json", "b.mp4_1.json"))
  }
}
