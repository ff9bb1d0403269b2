package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ImageWriterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("deterministic base names: sorted inputs + seed, 12 hex chars") {
    val h = ImageWriter.deterministicHash(Seq("b", "a", "c"), "seed1")
    assert(h.length == 12 && h.matches("[0-9a-f]{12}"))
    assert(h == ImageWriter.deterministicHash(Seq("c", "a", "b"), "seed1")) // order-insensitive
    assert(h != ImageWriter.deterministicHash(Seq("a", "b", "c"), "seed2"))
  }

  test("shards chunk at images_per_tar with sidecar parquet per tar; WebDataset reads them back") {
    val dir = java.nio.file.Files.createTempDirectory("imgw").toString
    val df = spark.range(0, 10)
      .select(format_string("img%03d", col("id")).as("image_id"),
        concat(lit("payload-"), col("id").cast("string")).cast("binary").as("jpg"),
        concat(lit("/src/"), col("id").cast("string")).as("original_path"),
        lit("""{"k":1}""").as("meta"))
      .repartition(1).sortWithinPartitions("image_id")

    val metaDf = ImageWriter.write(df, dir, imagesPerTar = 4,
      pathCol = Some("original_path"), metaCol = Some("meta"))

    // 10 images / 4 per tar -> 3 shards, each with its same-basename sidecar
    val tars = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).map(_.getName).sorted
    val pqs = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    assert(tars.length == 3 && pqs.length == 3)
    assert(tars.map(_.stripSuffix(".tar")).sameElements(pqs.map(_.stripSuffix(".parquet"))))
    assert(tars.forall(_.matches("images-[0-9a-f]{12}-\\d{6}\\.tar")))
    assert(tars.map(_.replaceAll("-\\d{6}\\.tar$", "")).distinct.length == 1) // shared batch prefix

    // the sibling READER consumes the written shards
    val back = WebDataset.read(spark, s"$dir/*.tar")
    assert(back.count() == 10)
    assert(back.select("key").as[String].collect().sorted.head == "img000")
    assert(new String(back.filter(col("key") === "img007").select("jpg").head.getAs[Array[Byte]](0),
      "UTF-8") == "payload-7")

    // sidecar metadata: one row per image with the reference's columns
    assert(metaDf.columns.toSeq ==
      Seq("image_id", "tar_file", "member_name", "original_path", "metadata"))
    assert(metaDf.count() == 10)
    val r = metaDf.filter(col("image_id") === "img003").head
    assert(r.getAs[String]("member_name") == "img003.jpg")
    assert(r.getAs[String]("original_path") == "/src/3")
    assert(r.getAs[String]("tar_file").endsWith("-000000.tar")) // img003 in chunk 0

    // a second identical run reproduces identical shard names
    val dir2 = java.nio.file.Files.createTempDirectory("imgw2").toString
    ImageWriter.write(df, dir2, imagesPerTar = 4,
      pathCol = Some("original_path"), metaCol = Some("meta"))
    val tars2 = new java.io.File(dir2).listFiles().filter(_.getName.endsWith(".tar")).map(_.getName).sorted
    assert(tars2.sameElements(tars))
  }

  test("empty input returns an empty metadata frame; >100-byte member names write via PAX") {
    val dir = java.nio.file.Files.createTempDirectory("imgw_empty").toString
    val empty = Seq.empty[(String, Array[Byte])].toDF("image_id", "jpg")
    val meta = ImageWriter.write(empty, dir)
    assert(meta.count() == 0)
    assert(meta.columns.toSeq ==
      Seq("image_id", "tar_file", "member_name", "original_path", "metadata"))

    val longId = "p" * 140 // member name 144 bytes > the 100-byte ustar limit
    val dir2 = java.nio.file.Files.createTempDirectory("imgw_long").toString
    ImageWriter.write(Seq((longId, "x".getBytes)).toDF("image_id", "jpg"), dir2)
    val back = WebDataset.read(spark, s"$dir2/*.tar")
    assert(back.select("key").head.getString(0) == longId)
  }

  test("second write into a non-empty outputDir returns only its own run's rows") {
    val dir = java.nio.file.Files.createTempDirectory("imgw_reuse").toString
    ImageWriter.write(Seq(("a", "x".getBytes)).toDF("image_id", "jpg"), dir)
    val meta2 = ImageWriter.write(
      Seq(("b", "y".getBytes), ("c", "z".getBytes)).toDF("image_id", "jpg"), dir)
    assert(meta2.select("image_id").as[String].collect().sorted.sameElements(Array("b", "c")))
    // the directory-level reader still sees both runs
    assert(ImageWriter.readMetadata(spark, dir).count() == 3)
    // no temp tars left behind
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp.tar")))
  }

  test("file://-scheme output root routes through the Hadoop FileSystem path") {
    val local = java.nio.file.Files.createTempDirectory("imgw_fs").toString
    val dir = s"file://$local"
    val df = spark.range(0, 6)
      .select(format_string("img%03d", col("id")).as("image_id"),
        concat(lit("payload-"), col("id").cast("string")).cast("binary").as("jpg"))
      .repartition(1).sortWithinPartitions("image_id")
    val meta = ImageWriter.write(df, dir, imagesPerTar = 4)
    assert(meta.count() == 6)
    // payloads landed at the local path behind the scheme, atomically
    // renamed (no temp tars, no .crc checksum sidecars from LocalFileSystem)
    val names = new java.io.File(local).listFiles().map(_.getName)
    assert(names.count(_.endsWith(".tar")) == 2)
    assert(!names.exists(_.endsWith(".tmp.tar")) && !names.exists(_.endsWith(".crc")))
    // identical input at an unschemed root produces the same shard names
    val plain = java.nio.file.Files.createTempDirectory("imgw_fs2").toString
    ImageWriter.write(df, plain, imagesPerTar = 4)
    assert(new java.io.File(plain).listFiles().map(_.getName).filter(_.endsWith(".tar")).sorted
      .sameElements(names.filter(_.endsWith(".tar")).sorted))
    assert(ImageWriter.readMetadata(spark, dir).count() == 6)
  }

  test("optional columns absent: minimal (id, payload) input still writes valid sidecars") {
    val dir = java.nio.file.Files.createTempDirectory("imgw3").toString
    val df = Seq(("a", "x".getBytes), ("b", "y".getBytes)).toDF("image_id", "jpg")
    val meta = ImageWriter.write(df.repartition(1).sortWithinPartitions("image_id"), dir, imagesPerTar = 10)
    assert(meta.count() == 2)
    assert(meta.filter(col("original_path").isNull).count() == 2)
    assert(WebDataset.read(spark, s"$dir/*.tar").count() == 2)
  }
}
