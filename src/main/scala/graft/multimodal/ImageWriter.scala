package graft.multimodal

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    Files.createDirectories(Paths.get(outputDir))
    val tarPath = s"$outputDir/$baseName.tar"
    val tos = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.io.BufferedOutputStream(Files.newOutputStream(Paths.get(tarPath))))
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
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message meta {
           required binary image_id (UTF8);
           required binary tar_file (UTF8);
           required binary member_name (UTF8);
           optional binary original_path (UTF8);
           optional binary metadata (UTF8);
         }""")
    val conf = new org.apache.hadoop.conf.Configuration()
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
    (tarPath, pqPath)
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
    // an all-filtered input must yield an EMPTY metadata frame, not a
    // path error (the reference logs and writes empty metadata)
    Files.createDirectories(Paths.get(outputDir))
    df.select(cols: _*).foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val all = rows.map { r =>
        (r.getString(0), r.getAs[Array[Byte]](1),
          if (hasOrig) r.getString(2) else null,
          if (hasMeta) r.getString(if (hasOrig) 3 else 2) else null)
      }.toVector
      if (all.nonEmpty) {
        val pid = Option(org.apache.spark.TaskContext.get()).map(_.partitionId()).getOrElse(0)
        // batch-level prefix from ALL the partition's member inputs +
        // the partition id as the actor/task seed (image_writer.py:66-70)
        val prefix = s"images-${deterministicHash(all.map(_._1), pid.toString)}"
        all.grouped(perTar).zipWithIndex.foreach { case (chunk, ci) =>
          val base = f"$prefix-$ci%06d"
          writeShard(out, base,
            chunk.map { case (id, payload, _, _) => (s"$id.jpg", payload) },
            chunk.map { case (id, _, orig, meta) => (id, s"$id.jpg", orig, meta) })
        }
      }
    }
    readMetadata(spark, outputDir)
  }

  /** All sidecar rows under `dir` as one DataFrame (empty when no
    * shard was written).
    */
  def readMetadata(spark: SparkSession, dir: String): DataFrame = {
    val hasSidecars = Option(new java.io.File(dir).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    if (hasSidecars) spark.read.parquet(s"$dir/*.parquet")
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        Seq("image_id", "tar_file", "member_name", "original_path", "metadata").map(
          org.apache.spark.sql.types.StructField(_, org.apache.spark.sql.types.StringType))))
  }
}
