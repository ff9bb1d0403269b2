package graft.audio

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * extracted from the split's tar.gz (gzip-tar streamed through
    * commons-compress, same as the ArXiv source). `fetch` is injected.
    * Output: (audio_filepath, text, audio) — filepath is the tar
    * member name (the reference writes absolute extracted paths; over
    * a table the payload column replaces the file on disk).
    */
  def initialManifest(spark: SparkSession, lang: String, split: String,
                      fetch: String => Array[Byte]): DataFrame = {
    import spark.implicits._
    val Seq(tsvUrl, tarUrl) = urlList(lang, split)
    val transcripts = parseTsv(new String(fetch(tsvUrl), "UTF-8")).toMap
    val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
      new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(fetch(tarUrl))))
    val rows = Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
      .filter(e => !e.isDirectory)
      .flatMap { e =>
        val name = e.getName.split('/').last
        transcripts.get(name).map { text =>
          (name, text, {
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = tin.read(buf)
            while (n > 0) { bos.write(buf, 0, n); n = tin.read(buf) }
            bos.toByteArray
          })
        }
      }.toSeq
    rows.toDF("audio_filepath", "text", "audio")
  }
}
