package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Download stage semantics from the reference DocumentDownloader /
  * DocumentDownloadStage (download/base/download.py:28-176 +
  * common_crawl/download.py:45-47): per-URL output filename derived from
  * the URL path (`/`→`-`), skip when the final file already exists
  * non-empty (resume), fetch into a `.tmp` sibling, ATOMIC rename into
  * place on success, drop the URL on failure.
  *
  * The byte transfer itself is an injected
  * `fetchTo: (url, OutputStream) => Unit` (this sandbox has zero
  * egress; a deployment passes an http/s3 fetcher — same injection
  * seam as [[CCUrls]]). STREAMING by contract: a real CC WARC shard is
  * ~1 GiB, so the fetcher copies network → temp file in chunks and the
  * executor never holds a shard in memory (the whole-`Array[Byte]`
  * constructor remains for small fixture payloads). The Spark shape is
  * a `mapPartitions` over a URL dataset so downloads scale with
  * executors and the per-partition concurrency bounds network fan-out
  * (the reference's num_workers_per_node knob = partition count here).
  */
final class WarcDownloader(downloadDir: String,
                           fetchTo: (String, java.io.OutputStream) => Unit) extends Serializable {

  /** In-memory fetcher adapter — fixture/test payloads only. */
  def this(downloadDir: String, fetch: String => Array[Byte]) =
    this(downloadDir, (url: String, out: java.io.OutputStream) => out.write(fetch(url)))

  /** common_crawl/download.py:45-47 — `urlparse(url).path[1:]` with
    * '/' replaced by '-'.
    */
  def outputFilename(url: String): String = {
    val path = java.net.URI.create(url).getPath
    (if (path != null && path.startsWith("/")) path.substring(1) else String.valueOf(path))
      .replace("/", "-")
  }

  /** Download one URL; Some(localPath) on success or prior existence,
    * None on fetch failure (temp file cleaned up).
    */
  def download(url: String): Option[String] = {
    Files.createDirectories(Paths.get(downloadDir))
    val out: Path = Paths.get(downloadDir, outputFilename(url))
    if (Files.exists(out) && Files.size(out) > 0) return Some(out.toString)
    val tmp = Paths.get(out.toString + ".tmp")
    try {
      val os = new java.io.BufferedOutputStream(Files.newOutputStream(tmp))
      try fetchTo(url, os) finally os.close()
      Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE)
      Some(out.toString)
    } catch {
      case _: Exception =>
        Files.deleteIfExists(tmp)
        None
    }
  }

  /** Distributed stage: url column in, local path column out (failed
    * urls dropped — reference process() collects successes only).
    */
  def downloadAll(urls: DataFrame, urlCol: String = "url"): DataFrame = {
    // side-effecting (network + filesystem): MUST be nondeterministic
    // so the optimizer never duplicates or reorders the download per
    // row (a pushed isnotnull(u(url)) filter would run it twice)
    val u = udf((url: String) => download(url).orNull).asNondeterministic()
    urls.withColumn("local_path", u(col(urlCol)))
      .filter(col("local_path").isNotNull)
  }
}

object WarcDownloader {
  /** URL dataset from a generated list (driver-side) sized so each
    * partition's sequential downloads bound per-node network fan-out.
    */
  def urlDataset(spark: SparkSession, urls: Seq[String], partitions: Int): DataFrame = {
    import spark.implicits._
    urls.toDF("url").repartition(partitions)
  }
}
