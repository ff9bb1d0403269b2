package graft.audio

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{ArchiveIO, WarcDownloader}

/** FLEURS dataset acquisition
  * (stages/audio/datasets/fleurs/create_initial_manifest.py): URL pair
  * per (lang, split) — transcript TSV + audio tar.gz — then a manifest
  * of (audio_filepath, text). Download/extract ride the same injected
  * fetch seam as the other sources (zero egress here; the reference
  * calls download_file/extract_archive).
  */
object Fleurs {

  /** get_fleurs_url_list: [transcript tsv, audio tar.gz]. */
  def urlList(lang: String, split: String): Seq[String] = {
    val base = s"https://huggingface.co/datasets/google/fleurs/resolve/main/data/$lang"
    Seq(s"$base/$split.tsv", s"$base/audio/$split.tar.gz")
  }

  /** process_transcript: TSV lines → (file name, transcript); lines
    * with < 3 tab-separated fields skip (the reference indexes
    * parts[1] and parts[2]: id, file name, raw transcription).
    */
  def parseTsv(tsv: String): Seq[(String, String)] =
    tsv.split("\n", -1).toIndexedSeq
      .map(graft.text.PyText.strip)
      .map(_.split("\t", -1))
      .collect { case parts if parts.length >= 3 => (parts(1), parts(2)) }

  /** Manifest DataFrame: transcript rows joined with audio payloads
    * extracted from the split's tar.gz. Output:
    * (audio_filepath, text, audio) — filepath is the tar member name
    * (the reference writes absolute extracted paths; over a table the
    * payload column replaces the file on disk).
    *
    * STREAMING by contract: a FLEURS audio split is GB-scale per
    * (lang, split), so the tar.gz goes network → `downloadDir` through
    * the chunked `fetchTo` seam (atomic rename + skip-if-exists resume,
    * the [[graft.sources.WarcDownloader]] contract) and is then
    * extracted EXECUTOR-side through [[graft.sources.ArchiveIO]]'s lazy
    * per-file scan — the driver never holds the archive or its payloads
    * in memory. Only the transcript TSV (KB-scale) is read driver-side.
    */
  def initialManifest(spark: SparkSession, lang: String, split: String,
                      fetchTo: (String, java.io.OutputStream) => Unit,
                      downloadDir: String): DataFrame = {
    import spark.implicits._
    val Seq(tsvUrl, tarUrl) = urlList(lang, split)
    val tsvBos = new java.io.ByteArrayOutputStream()
    fetchTo(tsvUrl, tsvBos)
    val transcripts =
      spark.sparkContext.broadcast(parseTsv(new String(tsvBos.toByteArray, "UTF-8")).toMap)
    val localTar = new WarcDownloader(downloadDir, fetchTo).download(tarUrl)
      .getOrElse(throw new java.io.IOException(s"FLEURS audio fetch failed: $tarUrl"))
    ArchiveIO.perFile(spark, localTar) { (_, in) =>
      val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
        new java.util.zip.GZIPInputStream(in))
      Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
        .filter(e => !e.isDirectory)
        .flatMap { e =>
          val name = e.getName.split('/').last
          transcripts.value.get(name).map { text =>
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = tin.read(buf)
            while (n > 0) { bos.write(buf, 0, n); n = tin.read(buf) }
            (name, text, bos.toByteArray)
          }
        }
    }.toDF("audio_filepath", "text", "audio")
  }

  /** In-memory fixture adapter (tests): whole-payload fetch, spooled to
    * a temp dir and read back through the same streaming path.
    */
  def initialManifest(spark: SparkSession, lang: String, split: String,
                      fetch: String => Array[Byte]): DataFrame =
    initialManifest(spark, lang, split,
      (url: String, out: java.io.OutputStream) => out.write(fetch(url)),
      java.nio.file.Files.createTempDirectory("fleurs").toString)
}
