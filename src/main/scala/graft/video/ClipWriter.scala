package graft.video

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import graft.io.ByteSink

/** Accumulated per-chunk clip statistics — ClipStats
  * (tasks/video.py:165-199) with the reference's combine semantics.
  */
final case class ClipStats(
    numFilteredByMotion: Long = 0,
    numFilteredByAesthetic: Long = 0,
    numPassed: Long = 0,
    numTranscoded: Long = 0,
    numWithEmbeddings: Long = 0,
    numWithCaption: Long = 0,
    numWithWebp: Long = 0,
    totalClipDuration: Double = 0.0,
    maxClipDuration: Double = 0.0) {
  def combine(o: ClipStats): ClipStats = ClipStats(
    numFilteredByMotion + o.numFilteredByMotion,
    numFilteredByAesthetic + o.numFilteredByAesthetic,
    numPassed + o.numPassed,
    numTranscoded + o.numTranscoded,
    numWithEmbeddings + o.numWithEmbeddings,
    numWithCaption + o.numWithCaption,
    numWithWebp + o.numWithWebp,
    totalClipDuration + o.totalClipDuration,
    math.max(maxClipDuration, o.maxClipDuration))
}

/** ClipWriterStage's deterministic output contract
  * (stages/video/io/clip_writer.py:33-482), Spark-shaped: one task per
  * (source_video, clip_chunk_index) group writes that chunk's clip
  * mp4s, preview webps, per-clip v0 metadata jsons, the per-chunk
  * embedding parquet, the chunk-stats json and (for chunk 0) the
  * video-level json — executor-side, no driver byte collection (the
  * ImageWriter pattern). The layout, naming and json shapes are ported
  * 1:1, including the per-clip numpy .pickle embedding twin (emitted
  * via [[graft.tools.NumpyPickle]] — genuinely unpicklable by
  * CPython+numpy).
  *
  * JSON bytes match Python's `json.dumps(indent=4)` (writer_utils
  * .py:154): insertion-ordered keys, 4-space indent, ensure_ascii
  * escaping, and CPython float repr via [[graft.text.PyFloat]]
  * (positional/scientific thresholds included).
  */
object ClipWriter {

  // ---- deterministic layout (clip_writer.py:74-120) ----

  private def join(root: String, extra: String): String =
    root.replaceAll("/+$", "") + "/" + extra.replaceAll("^/+|/+$", "")

  def pathProcessedVideos(root: String): String = join(root, "processed_videos")
  def pathProcessedClipChunks(root: String): String = join(root, "processed_clip_chunks")
  def pathClips(root: String, filtered: Boolean = false): String =
    join(root, if (filtered) "filtered_clips" else "clips")
  def pathPreviews(root: String): String = join(root, "previews")
  def pathMetas(root: String, version: String = "v0"): String = join(root, s"metas/$version")
  def pathIv2Embd(root: String): String = join(root, "iv2_embd")
  def pathIv2EmbdParquet(root: String): String = join(root, "iv2_embd_parquet")
  def pathCe1Embd(root: String): String = join(root, "ce1_embd")
  def pathCe1EmbdParquet(root: String): String = join(root, "ce1_embd_parquet")

  def sha256(buffer: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(buffer).map("%02x".format(_)).mkString

  /** previews/{clip_uuid}/{start}_{end}.{type} (clip_writer.py:259-268). */
  def windowUri(prefix: String, clipUuid: String, startFrame: Int, endFrame: Int,
                fileType: String): String =
    s"$prefix/$clipUuid/${startFrame}_$endFrame.$fileType"

  /** {prefix}/{clip_uuid}.{type} (clip_writer.py:270-277). */
  def clipUri(prefix: String, clipUuid: String, fileType: String): String =
    s"$prefix/$clipUuid.$fileType"

  /** processed_videos/{relpath}.json; the input path MUST live under
    * inputRoot (clip_writer.py:279-286).
    */
  def videoUri(outputRoot: String, inputRoot: String, inputVideoPath: String): String = {
    require(inputVideoPath.startsWith(inputRoot),
      s"Input video path $inputVideoPath does not start with $inputRoot")
    val rel = inputVideoPath.substring(inputRoot.length).replaceAll("^/+", "")
    join(pathProcessedVideos(outputRoot), rel + ".json")
  }

  /** processed_clip_chunks/{relpath}_{idx}.json (clip_writer.py:288-295). */
  def clipChunkUri(outputRoot: String, inputRoot: String, inputVideoPath: String,
                   idx: Int): String = {
    require(inputVideoPath.startsWith(inputRoot),
      s"Input video path $inputVideoPath does not start with $inputRoot")
    val rel = inputVideoPath.substring(inputRoot.length).replaceAll("^/+", "")
    join(pathProcessedClipChunks(outputRoot), rel + s"_$idx.json")
  }

  /** The per-chunk embedding parquet name: uuid5(NAMESPACE_URL,
    * "{input_path}_{chunk_index}") (clip_writer.py:229-233).
    */
  def embeddingParquetUri(root: String, inputVideoPath: String, chunkIndex: Int,
                          algorithm: String = "cosmos-embed1"): String = {
    val prefix =
      if (algorithm == "internvideo2") pathIv2EmbdParquet(root) else pathCe1EmbdParquet(root)
    clipUri(prefix, graft.dedup.IdGenerator.uuid5(s"${inputVideoPath}_$chunkIndex"), "parquet")
  }

  // ---- Python-parity JSON (json.dumps(indent=4), ensure_ascii) ----

  /** Objects are Seq[(String, Any)] (insertion order = Python dict
    * order); values: String, Boolean, Int/Long, Double, Seq, null.
    */
  def pyJson(v: Any, level: Int = 0): String = {
    val pad = "    " * (level + 1)
    val close = "    " * level
    v match {
      case null => "null"
      case b: Boolean => if (b) "true" else "false"
      case i: Int => i.toString
      case l: Long => l.toString
      case d: Double =>
        // json.dumps(allow_nan=True, the default) emits the bare tokens
        // NaN / Infinity / -Infinity, not float repr's nan/inf
        if (d.isNaN) "NaN"
        else if (d == Double.PositiveInfinity) "Infinity"
        else if (d == Double.NegativeInfinity) "-Infinity"
        else graft.text.PyFloat.repr(d)
      case f: Float => pyJson(f.toDouble, level)
      case s: String =>
        val sb = new StringBuilder("\"")
        s.foreach {
          case '"' => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case '\b' => sb.append("\\b") // json.dumps short escapes, not \u0008
          case '\f' => sb.append("\\f")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
          case c => sb.append(c)
        }
        sb.append("\"").toString
      case obj: Seq[_] if obj.nonEmpty && obj.head.isInstanceOf[(_, _)] =>
        val fields = obj.asInstanceOf[Seq[(String, Any)]]
        fields.map { case (k, fv) => s"$pad${pyJson(k)}: ${pyJson(fv, level + 1)}" }
          .mkString("{\n", ",\n", s"\n$close}")
      case xs: Seq[_] =>
        if (xs.isEmpty) "[]"
        else xs.map(x => pad + pyJson(x, level + 1)).mkString("[\n", ",\n", s"\n$close]")
      case EmptyObj => "{}"
      case other => pyJson(other.toString, level)
    }
  }

  /** Marker for an empty JSON object (an empty Seq would render as []). */
  case object EmptyObj

  // ---- per-clip v0 metadata (clip_writer.py:374-426) ----

  /** One clip row of the distributed writer's input. */
  final case class ClipRow(
      clipUuid: String, sourceVideo: String, spanStart: Double, spanEnd: Double,
      buffer: Array[Byte], embedding: Array[Float],
      motionGlobalMean: Option[Double], motionPerPatchMin256: Option[Double],
      aestheticScore: Option[Double], errors: Seq[String], filtered: Boolean,
      filterReason: Option[String], windows: Seq[WindowRow])

  final case class WindowRow(startFrame: Int, endFrame: Int, webp: Array[Byte],
                             captions: Map[String, String],
                             enhancedCaptions: Map[String, String])

  /** The v0 metadata dict in the reference's exact key order; clip-level
    * probe fields come from Mp4Probe (the ffprobe analogue the clip's
    * extract_metadata calls, tasks/video.py:105-128).
    */
  def clipMetadata(clip: ClipRow, videoWidth: Option[Int], videoHeight: Option[Int],
                   videoFramerate: Option[Double], outputRoot: String,
                   captionModels: Seq[String], enhancedCaptionModels: Seq[String]): Seq[(String, Any)] = {
    val base = Seq[(String, Any)](
      "span_uuid" -> clip.clipUuid,
      "source_video" -> clip.sourceVideo,
      "duration_span" -> Seq(clip.spanStart, clip.spanEnd),
      "width_source" -> videoWidth.orNull,
      "height_source" -> videoHeight.orNull,
      "framerate_source" -> videoFramerate.orNull,
      "clip_location" -> clipUri(pathClips(outputRoot, clip.filtered), clip.clipUuid, "mp4"))
    val probed =
      if (clip.buffer == null) Nil
      else {
        val m = Mp4Probe.probe(clip.buffer)
        Seq[(String, Any)](
          "width" -> m.width.orNull, "height" -> m.height.orNull,
          "framerate" -> m.framerate.orNull, "num_frames" -> m.numFrames.orNull,
          "video_codec" -> m.videoCodec.orNull, "num_bytes" -> clip.buffer.length)
      }
    val motion = clip.motionGlobalMean.toSeq.map(g =>
      "motion_score" -> Seq[(String, Any)](
        "global_mean" -> g,
        "per_patch_min_256" -> clip.motionPerPatchMin256.orNull))
    val aes = clip.aestheticScore.toSeq.map("aesthetic_score" -> _)
    val errs = if (clip.errors.nonEmpty) Seq("errors" -> clip.errors) else Nil
    val windows = Seq("windows" -> clip.windows.map { w =>
      Seq[(String, Any)]("start_frame" -> w.startFrame, "end_frame" -> w.endFrame) ++
        captionModels.filter(w.captions.contains).map(m => s"${m}_caption" -> w.captions(m)) ++
        enhancedCaptionModels.filter(w.enhancedCaptions.contains)
          .map(m => s"${m}_enhanced_caption" -> w.enhancedCaptions(m))
    })
    val valid = Seq("valid" ->
      (clip.buffer != null && clip.buffer.nonEmpty && clip.windows.nonEmpty))
    base ++ probed ++ motion ++ aes ++ errs ++ windows ++ valid
  }

  // ---- the distributed stage ----

  /** Writes one (source_video, clip_chunk_index) group per task:
    * clips/{uuid}.mp4 (or filtered_clips/ — filtered clips get mp4 +
    * metadata only, and do NOT count as passed: clip_writer.py:160-171,
    * 320-336), previews/{uuid}/{s}_{e}.webp, metas/v0/{uuid}.json, the
    * chunk's embedding parquet, processed_clip_chunks/..._{i}.json and
    * (chunk 0 only) processed_videos/....json. Required input columns:
    * source_video, clip_chunk_index, clip_uuid, span_start, span_end,
    * filtered. Optional per-clip: buffer, embedding,
    * motion_global_mean, motion_per_patch_min_256, aesthetic_score,
    * errors, filter_reason ("motion"/"aesthetic" → the chunk-stats
    * counters), windows. Optional video-level (repeat per row): width,
    * height, framerate, num_frames, duration, video_codec,
    * pixel_format, audio_codec, num_total_clips, num_clip_chunks.
    * Returns the per-chunk stats as a DataFrame.
    */
  def write(df: DataFrame, outputRoot: String, inputRoot: String,
            uploadClips: Boolean = true, dryRun: Boolean = false,
            embeddingAlgorithm: String = "cosmos-embed1",
            captionModels: Seq[String] = Seq("qwen"),
            enhancedCaptionModels: Seq[String] = Seq("qwen_lm")): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sconf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val statRows = df
      .repartition(col("source_video"), col("clip_chunk_index"))
      .sortWithinPartitions("source_video", "clip_chunk_index", "clip_uuid")
      .rdd.mapPartitions { rows =>
        // consecutive same-(video, chunk) runs after the sort
        val grouped = new Iterator[Seq[Row]] {
          val buf = rows.buffered
          def hasNext = buf.hasNext
          def next(): Seq[Row] = {
            val key = (buf.head.getAs[String]("source_video"),
              buf.head.getAs[Int]("clip_chunk_index"))
            val out = scala.collection.mutable.ArrayBuffer.empty[Row]
            while (buf.hasNext && (buf.head.getAs[String]("source_video"),
              buf.head.getAs[Int]("clip_chunk_index")) == key) out += buf.next()
            out.toSeq
          }
        }
        grouped.map { chunkRows =>
          writeChunk(chunkRows, outputRoot, inputRoot, uploadClips, dryRun,
            embeddingAlgorithm, captionModels, enhancedCaptionModels, sconf.value)
        }
      }.collect()
    statRows.toSeq.toDF(
      "source_video", "clip_chunk_index", "num_clips_passed", "num_clips_transcoded",
      "num_clips_with_embeddings", "num_clips_with_caption", "num_clips_with_webp",
      "total_clip_duration", "max_clip_duration")
  }

  private def optCol[T](r: Row, c: String): Option[T] =
    if (!r.schema.fieldNames.contains(c) || r.isNullAt(r.fieldIndex(c))) None
    else Some(r.getAs[T](c))

  private def optStr(r: Row, c: String): String = optCol[String](r, c).orNull
  private def getOptD(r: Row, c: String): Option[Double] = optCol[Double](r, c)
  private def getOptI(r: Row, c: String): Option[Int] = optCol[Int](r, c)

  private def rowToClip(r: Row): ClipRow = ClipRow(
    r.getAs[String]("clip_uuid"), r.getAs[String]("source_video"),
    r.getAs[Double]("span_start"), r.getAs[Double]("span_end"),
    optCol[Array[Byte]](r, "buffer").orNull,
    optCol[scala.collection.Seq[Float]](r, "embedding").map(_.toArray).orNull,
    getOptD(r, "motion_global_mean"), getOptD(r, "motion_per_patch_min_256"),
    getOptD(r, "aesthetic_score"),
    optCol[scala.collection.Seq[String]](r, "errors").map(_.toSeq).getOrElse(Nil),
    r.getAs[Boolean]("filtered"),
    optCol[String](r, "filter_reason"),
    optCol[scala.collection.Seq[Row]](r, "windows").map(_.toSeq).getOrElse(Nil).map { w =>
      WindowRow(w.getAs[Int]("start_frame"), w.getAs[Int]("end_frame"),
        optCol[Array[Byte]](w, "webp").orNull,
        optCol[Map[String, String]](w, "captions").getOrElse(Map.empty),
        optCol[Map[String, String]](w, "enhanced_captions").getOrElse(Map.empty))
    })

  /** Payload bytes go through the Hadoop FileSystem resolved from the
    * destination scheme (ByteSink) — `s3a://`/`hdfs://` output roots
    * work exactly like the parquet sidecars' HadoopOutputFile path; the
    * reference routes the same writes through fsspec's storage client.
    */
  private def writeBytes(dest: String, bytes: Array[Byte], conf: Configuration): Unit =
    ByteSink.write(dest, bytes, conf)

  private def writeChunk(chunkRows: Seq[Row], outputRoot: String, inputRoot: String,
                         uploadClips: Boolean, dryRun: Boolean, embeddingAlgorithm: String,
                         captionModels: Seq[String], enhancedCaptionModels: Seq[String],
                         conf: Configuration):
      (String, Int, Long, Long, Long, Long, Long, Double, Double) = {
    val head = chunkRows.head
    val video = head.getAs[String]("source_video")
    val chunkIdx = head.getAs[Int]("clip_chunk_index")
    val vw = getOptI(head, "width"); val vh = getOptI(head, "height")
    val vfr = getOptD(head, "framerate")
    val clips = chunkRows.map(rowToClip)
    val (filteredClips, keptClips) = clips.partition(_.filtered)
    var stats = ClipStats()

    def writeClipFiles(clip: ClipRow): Unit = {
      // mp4 (kept AND filtered clips carry their buffer; num_passed
      // counts kept clips only — the filter-failed-clips rule)
      var s = ClipStats()
      if (clip.buffer != null && clip.buffer.nonEmpty) {
        if (uploadClips && !dryRun)
          writeBytes(clipUri(pathClips(outputRoot, clip.filtered), clip.clipUuid, "mp4"),
            clip.buffer, conf)
        s = s.copy(numTranscoded = 1)
      }
      if (!clip.filtered) s = s.copy(numPassed = 1)
      if (!clip.filtered) {
        // previews + embeddings are kept-clip outputs only
        val hasWebp = clip.windows.exists(w => w.webp != null && w.webp.nonEmpty)
        if (!dryRun) clip.windows.foreach { w =>
          if (w.webp != null && w.webp.nonEmpty)
            writeBytes(windowUri(pathPreviews(outputRoot), clip.clipUuid,
              w.startFrame, w.endFrame, "webp"), w.webp, conf)
        }
        if (hasWebp) s = s.copy(numWithWebp = 1)
        if (clip.embedding != null) {
          s = s.copy(numWithEmbeddings = 1)
          // the reference also pickles each kept clip's embedding
          // (clip_writer.py:337-353) — real numpy-unpicklable bytes
          if (!dryRun) {
            val embDir = if (embeddingAlgorithm == "internvideo2") pathIv2Embd(outputRoot)
              else pathCe1Embd(outputRoot)
            writeBytes(clipUri(embDir, clip.clipUuid, "pickle"),
              graft.tools.NumpyPickle.float32(Seq(clip.embedding.length), clip.embedding), conf)
          }
        }
      }
      val meta = clipMetadata(clip, vw, vh, vfr, outputRoot, captionModels, enhancedCaptionModels)
      if (!dryRun)
        writeBytes(clipUri(pathMetas(outputRoot, "v0"), clip.clipUuid, "json"),
          pyJson(meta).getBytes("UTF-8"), conf)
      // metadata (and its caption count) runs for filtered clips too
      // (clip_writer.py:162-171 submits _write_clip_metadata for both)
      val hasCaption = clip.windows.exists(w => captionModels.exists(w.captions.contains))
      if (hasCaption) s = s.copy(numWithCaption = 1)
      val dur = clip.spanEnd - clip.spanStart
      s = s.copy(totalClipDuration = dur, maxClipDuration = dur)
      stats = stats.combine(s)
    }

    keptClips.foreach(writeClipFiles)
    filteredClips.foreach(writeClipFiles)
    // the upstream filter stages' counters (motion_filter.py:153,
    // clip_aesthetic_filter.py:97 via video.clip_stats) ride in on the
    // optional filter_reason column of filtered rows
    stats = stats.copy(
      numFilteredByMotion = filteredClips.count(_.filterReason.contains("motion")),
      numFilteredByAesthetic = filteredClips.count(_.filterReason.contains("aesthetic")))

    // per-chunk embedding parquet (kept clips with embeddings, clip order)
    val withEmb = keptClips.filter(_.embedding != null)
    if (withEmb.nonEmpty && !dryRun) {
      val dest = embeddingParquetUri(outputRoot, video, chunkIdx, embeddingAlgorithm)
      writeEmbeddingParquet(dest, withEmb.map(c => (c.clipUuid, c.embedding)), conf)
    }

    // chunk stats json + (chunk 0) the video-level json — written even
    // on dry runs: the reference gates only the payload writes, and
    // downstream resume checks key on these jsons
    // (clip_writer.py:427-482 has no dry_run gate)
    {
      if (chunkIdx == 0) {
        val vmeta = Seq[(String, Any)](
          "video" -> video, "height" -> vh.orNull, "width" -> vw.orNull,
          "framerate" -> vfr.orNull,
          "num_frames" -> getOptI(head, "num_frames").orNull,
          "duration" -> getOptD(head, "duration").orNull,
          "video_codec" -> optStr(head, "video_codec"),
          "pixel_format" -> optStr(head, "pixel_format"),
          "audio_format" -> optStr(head, "audio_codec"),
          "num_total_clips" -> getOptI(head, "num_total_clips").getOrElse(clips.size),
          "num_clip_chunks" -> getOptI(head, "num_clip_chunks").getOrElse(1))
        writeBytes(videoUri(outputRoot, inputRoot, video), pyJson(vmeta).getBytes("UTF-8"), conf)
      }
      def windowKey(w: WindowRow) = s"${w.startFrame}_${w.endFrame}"
      val allWindows = keptClips.map { c =>
        c.clipUuid -> (c.windows.flatMap { w =>
          captionModels.collectFirst {
            case m if w.captions.contains(m) => windowKey(w) -> (w.captions(m): Any)
          }
        } match { case Nil => EmptyObj: Any; case xs => xs: Any })
      }
      val allEnhanced = keptClips.map { c =>
        c.clipUuid -> (c.windows.flatMap { w =>
          enhancedCaptionModels.collectFirst {
            case m if w.enhancedCaptions.contains(m) => windowKey(w) -> (w.enhancedCaptions(m): Any)
          }
        } match { case Nil => EmptyObj: Any; case xs => xs: Any })
      }
      val chunkMeta = Seq[(String, Any)](
        "video" -> video, "clip_chunk_index" -> chunkIdx,
        "num_clips_filtered_by_motion" -> stats.numFilteredByMotion,
        "num_clips_filtered_by_aesthetic" -> stats.numFilteredByAesthetic,
        "num_clips_passed" -> stats.numPassed,
        "num_clips_transcoded" -> stats.numTranscoded,
        "num_clips_with_embeddings" -> stats.numWithEmbeddings,
        "num_clips_with_caption" -> stats.numWithCaption,
        "num_clips_with_webp" -> stats.numWithWebp,
        "total_clip_duration" -> stats.totalClipDuration,
        "max_clip_duration" -> stats.maxClipDuration,
        "clips" -> keptClips.map(_.clipUuid),
        "filtered_clips" -> filteredClips.map(_.clipUuid),
        "all_windows" -> (if (allWindows.isEmpty) EmptyObj: Any else allWindows: Any),
        "all_windows_enhanced_caption" ->
          (if (allEnhanced.isEmpty) EmptyObj: Any else allEnhanced: Any))
      writeBytes(clipChunkUri(outputRoot, inputRoot, video, chunkIdx),
        pyJson(chunkMeta).getBytes("UTF-8"), conf)
    }
    (video, chunkIdx, stats.numPassed, stats.numTranscoded, stats.numWithEmbeddings,
      stats.numWithCaption, stats.numWithWebp, stats.totalClipDuration, stats.maxClipDuration)
  }

  /** id (UTF8) + repeated float embedding per row — Spark reads it back
    * as array<float> (the pandas list column of write_parquet).
    */
  private def writeEmbeddingParquet(path: String, rows: Seq[(String, Array[Float])],
                                    jobConf: Configuration): Unit = {
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message embedding {
           required binary id (UTF8);
           repeated float embedding;
         }""")
    // copy: GroupWriteSupport.setSchema mutates the conf it is given.
    // Local (file:/no-scheme) destinations resolve to the RAW local fs —
    // no .crc checksum twins next to the sidecars (ByteSink's posture);
    // cache disabled so the raw impl override actually takes effect.
    val conf = new Configuration(jobConf)
    conf.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    conf.setBoolean("fs.file.impl.disable.cache", true)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf))
      .withConf(conf)
      .build()
    try {
      val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      rows.foreach { case (id, emb) =>
        val g = factory.newGroup().append("id", id)
        emb.foreach(g.append("embedding", _))
        writer.write(g)
      }
    } finally writer.close()
  }
}
