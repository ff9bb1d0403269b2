package graft.multimodal

import org.apache.hadoop.conf.Configuration
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import graft.io.ByteSink

/** WebDataset shard WRITER — the ImageWriterStage contract
  * (stages/image/io/image_writer.py:33-210): pack images into tar
  * archives of at most `imagesPerTar` members plus one parquet
  * metadata sidecar PER TAR sharing its base name
  * ({image_id, tar_file, member_name, original_path, metadata}),
  * deterministic shard names via sha256 over the sorted member inputs
  * + a seed, truncated to 12 hex chars, suffixed with the 6-digit
  * chunk index (image_writer.py:58-71).
  *
  * JPEG encoding (PIL in the reference) is codec-bound and stays
  * upstream of this stage offline: the payload column carries
  * already-encoded bytes and members get the reference's ".jpg"
  * extension. Spark shape: one task per partition writes its shards
  * and sidecars directly (the MegatronWriter pattern — no driver
  * byte collection), and the sidecars read back as one DataFrame.
  *
  * All byte output is routed through the Hadoop FileSystem resolved
  * from the destination scheme ([[graft.io.ByteSink]]) so `s3a://` /
  * `hdfs://` output roots work like local ones — the posture of the
  * reference's fsspec storage client. Temp shard names embed the task
  * ATTEMPT id: with speculation or a zombie original attempt after a
  * retry, each attempt streams into its own temp tar and the final
  * rename is last-writer-wins on identical deterministic content,
  * never an interleaving of two open streams.
  */
object ImageWriter {

  /** get_deterministic_hash (image_writer.py:61-64). */
  def deterministicHash(inputs: Seq[String], seed: String): String = {
    val combined = inputs.sorted.mkString("|") + "|" + seed
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(combined.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
  }

  /** One shard pair: `{base}.tar` with (memberName, payload) entries +
    * `{base}.parquet` sidecar rows. Returns (tarPath, parquetPath).
    */
  def writeShard(outputDir: String, baseName: String,
                 members: Seq[(String, Array[Byte])],
                 meta: Seq[(String, String, String, String)]): (String, String) = {
    val conf = new Configuration()
    val tarPath = s"$outputDir/$baseName.tar"
    val tos = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.io.BufferedOutputStream(ByteSink.create(tarPath, conf)))
    // member names over 100 bytes (path-derived ids) need PAX headers —
    // the default mode throws; Python tarfile (the reference) defaults
    // to PAX-capable GNU/POSIX formats
    tos.setLongFileMode(
      org.apache.commons.compress.archivers.tar.TarArchiveOutputStream.LONGFILE_POSIX)
    try {
      members.foreach { case (name, payload) =>
        val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(name)
        e.setSize(payload.length)
        tos.putArchiveEntry(e); tos.write(payload); tos.closeArchiveEntry()
      }
    } finally tos.close()

    val pqPath = s"$outputDir/$baseName.parquet"
    writeSidecar(pqPath, tarPath, meta, conf)
    (tarPath, pqPath)
  }

  /** One parquet sidecar at `pqPath` for the shard at `tarPath`. */
  private def writeSidecar(pqPath: String, tarPath: String,
                           meta: Seq[(String, String, String, String)],
                           jobConf: Configuration): Unit = {
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message meta {
           required binary image_id (UTF8);
           required binary tar_file (UTF8);
           required binary member_name (UTF8);
           optional binary original_path (UTF8);
           optional binary metadata (UTF8);
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
        new org.apache.hadoop.fs.Path(pqPath), conf))
      .withConf(conf)
      .build()
    try {
      val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      meta.foreach { case (id, member, orig, metadata) =>
        val g = factory.newGroup()
          .append("image_id", id)
          .append("tar_file", tarPath)
          .append("member_name", member)
        if (orig != null) g.append("original_path", orig)
        if (metadata != null) g.append("metadata", metadata)
        writer.write(g)
      }
    } finally writer.close()
  }

  /** Distributed write: `df(idCol, payloadCol[, pathCol, metaCol])` →
    * tar shards + sidecars under `outputDir`, one writer task per
    * partition (sortWithinPartitions upstream makes names fully
    * deterministic). Returns the sidecar metadata as a DataFrame.
    */
  def write(df: DataFrame, outputDir: String, imagesPerTar: Int = 1000,
            idCol: String = "image_id", payloadCol: String = "jpg",
            pathCol: Option[String] = None, metaCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val cols = Seq(col(idCol).cast("string").as("_id"), col(payloadCol).as("_payload")) ++
      pathCol.map(c => col(c).cast("string").as("_orig")).toSeq ++
      metaCol.map(c => col(c).cast("string").as("_meta")).toSeq
    val hasOrig = pathCol.isDefined
    val hasMeta = metaCol.isDefined
    val out = outputDir
    val perTar = imagesPerTar
    val sconf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    // an all-filtered input must yield an EMPTY metadata frame, not a
    // path error (the reference logs and writes empty metadata)
    ByteSink.mkdirs(outputDir, spark.sparkContext.hadoopConfiguration)
    // Streaming shard write: each payload is written to its chunk's tar
    // as it arrives (one payload in executor memory at a time); only the
    // hash-input strings and sidecar metadata rows — small strings —
    // are buffered for the whole partition. The batch prefix hashes the
    // partition's original PATHS when pathCol is given (ids as the
    // fallback), seeded by the partition id — the Spark analogue of the
    // reference's `image_path`s + task_id (image_writer.py:61-70); tars
    // stream to an attempt-scoped temp name and are renamed once the
    // prefix is known.
    val pqPaths = df.select(cols: _*).rdd.mapPartitionsWithIndex { (pid, rows) =>
      val conf = sconf.value
      val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
      def tmpTar(ci: Int) = f"$out/.part-$pid-$attempt-$ci%06d.tmp.tar"
      val hashInputs = scala.collection.mutable.ArrayBuffer.empty[String]
      val chunkMeta = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(String, String, String, String)]]
      var tos: org.apache.commons.compress.archivers.tar.TarArchiveOutputStream = null
      var inChunk = 0
      rows.foreach { r =>
        val id = r.getString(0)
        val payload = r.getAs[Array[Byte]](1)
        val orig = if (hasOrig) r.getString(2) else null
        val meta = if (hasMeta) r.getString(if (hasOrig) 3 else 2) else null
        hashInputs += (if (orig != null) orig else id)
        if (inChunk == 0) {
          tos = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
            new java.io.BufferedOutputStream(ByteSink.create(tmpTar(chunkMeta.size), conf)))
          tos.setLongFileMode(
            org.apache.commons.compress.archivers.tar.TarArchiveOutputStream.LONGFILE_POSIX)
          chunkMeta += scala.collection.mutable.ArrayBuffer.empty
        }
        val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(s"$id.jpg")
        e.setSize(payload.length)
        tos.putArchiveEntry(e); tos.write(payload); tos.closeArchiveEntry()
        chunkMeta.last += ((id, s"$id.jpg", orig, meta))
        inChunk += 1
        if (inChunk == perTar) { tos.close(); tos = null; inChunk = 0 }
      }
      if (tos != null) tos.close()
      val prefix = s"images-${deterministicHash(hashInputs.toSeq, pid.toString)}"
      chunkMeta.zipWithIndex.map { case (meta, ci) =>
        val base = f"$prefix-$ci%06d"
        val tarPath = s"$out/$base.tar"
        ByteSink.rename(tmpTar(ci), tarPath, conf)
        val pqPath = s"$out/$base.parquet"
        writeSidecar(pqPath, tarPath, meta.toSeq, conf)
        pqPath
      }.iterator
    }.collect()
    // only THIS run's sidecars — a reuse of a non-empty outputDir must
    // not surface earlier runs' rows (the reference returns the task's
    // own files only)
    if (pqPaths.isEmpty) emptyMetadata(spark)
    else spark.read.parquet(pqPaths.toIndexedSeq: _*)
  }

  /** All sidecar rows under `dir` as one DataFrame (empty when no
    * shard was written).
    */
  def readMetadata(spark: SparkSession, dir: String): DataFrame = {
    val sidecars =
      ByteSink.list(dir, "*.parquet", spark.sparkContext.hadoopConfiguration)
    if (sidecars.nonEmpty) spark.read.parquet(s"$dir/*.parquet")
    else emptyMetadata(spark)
  }

  private def emptyMetadata(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        Seq("image_id", "tar_file", "member_name", "original_path", "metadata").map(
          org.apache.spark.sql.types.StructField(_, org.apache.spark.sql.types.StringType))))
}
