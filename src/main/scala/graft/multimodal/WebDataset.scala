package graft.multimodal

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WebDataset shard reader — the format behind the reference's image
  * pipeline (stages/image/io/image_reader.py reads webdataset tars
  * through a DALI GPU pipeline; the FORMAT is tar shards whose members
  * group by key stem: `000001.jpg` + `000001.json` + `000001.txt` =
  * one sample). The GPU decode is out of scope offline (BinaryOps
  * posture); the FORMAT reader is pure tar logic: members with one
  * stem collapse into one row of (id, per-extension payloads), tar
  * order preserved, one streaming task per shard
  * ([[graft.sources.ArchiveIO]] — no whole-shard byte array).
  *
  * Output schema: (key: string, shard: string, jpg: binary,
  * json: string, txt: string) — absent members null; extensions
  * beyond the requested set ignored (webdataset semantics).
  */
object WebDataset {

  /** Lazy per-shard sample iterator over a tar STREAM. WebDataset
    * guarantees same-key members are contiguous; a key change closes
    * the current sample.
    */
  def iterateStream(in: java.io.InputStream): Iterator[(String, Map[String, Array[Byte]])] = {
    val tin = new TarArchiveInputStream(in)
    new Iterator[(String, Map[String, Array[Byte]])] {
      private var pendingKey: String = null
      private var pendingParts = Map.empty[String, Array[Byte]]
      private var done = false
      private var out: (String, Map[String, Array[Byte]]) = null

      private def advance(): Unit = {
        while (out == null && !done) {
          val e = tin.getNextEntry
          if (e == null) {
            done = true
            if (pendingKey != null) { out = (pendingKey, pendingParts); pendingKey = null }
          } else if (!e.isDirectory) {
            // webdataset key = the full member path up to the FIRST dot
            // of the basename (dotted extensions like `.metadata.json`
            // are part of the EXTENSION, and members in different
            // directories are different samples); such compound
            // extensions simply don't match the jpg/json/txt columns
            val full = e.getName
            val slash = full.lastIndexOf('/')
            val base = full.substring(slash + 1)
            val dot = base.indexOf('.')
            val (key, ext) =
              if (dot <= 0) (full, "")
              else (full.substring(0, slash + 1 + dot), base.substring(dot + 1).toLowerCase)
            val body = {
              val bos = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var n = tin.read(buf)
              while (n > 0) { bos.write(buf, 0, n); n = tin.read(buf) }
              bos.toByteArray
            }
            if (pendingKey == null) { pendingKey = key; pendingParts = Map(ext -> body) }
            else if (key == pendingKey) pendingParts += (ext -> body)
            else {
              out = (pendingKey, pendingParts)
              pendingKey = key
              pendingParts = Map(ext -> body)
            }
          }
        }
      }

      def hasNext: Boolean = { advance(); out != null }
      def next(): (String, Map[String, Array[Byte]]) = {
        advance()
        if (out == null) throw new NoSuchElementException("end of shard")
        val r = out; out = null; r
      }
    }
  }

  /** Directory/glob of `.tar` shards → sample rows (key, shard, jpg,
    * json, txt) — one streaming task per shard.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    graft.sources.ArchiveIO.perFile(spark, path) { (p, in) =>
      val shard = p.split('/').last
      iterateStream(in).map { case (key, parts) =>
        (key, shard, parts.getOrElse("jpg", null),
          parts.get("json").map(new String(_, "UTF-8")).orNull,
          parts.get("txt").map(new String(_, "UTF-8")).orNull)
      }
    }.toDF("key", "shard", "jpg", "json", "txt")
  }

  /** Fixture shard builder (tests — the sibling of WarcParser.buildWarc). */
  def buildShard(samples: Seq[(String, Map[String, Array[Byte]])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val tos = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(bos)
    for ((key, parts) <- samples; (ext, body) <- parts.toSeq.sortBy(_._1)) {
      val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(s"$key.$ext")
      e.setSize(body.length)
      tos.putArchiveEntry(e); tos.write(body); tos.closeArchiveEntry()
    }
    tos.close()
    bos.toByteArray
  }
}
