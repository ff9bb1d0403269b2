package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Hadoop-FileSystem-routed byte output for the multimodal sinks.
  *
  * The reference writes every payload (clip mp4s, previews, tar shards,
  * per-clip jsons) through fsspec's storage client so `s3://` and local
  * roots behave identically (ray-curator storage_client usage in
  * clip_writer.py / image_writer.py). The Spark analogue is the Hadoop
  * `FileSystem` API: resolve the scheme from the destination path and
  * the job's Hadoop configuration, so `s3a://`, `hdfs://` and plain
  * local roots all work unchanged — the same routing the parquet
  * sidecars already use via `HadoopOutputFile`.
  *
  * Scheme-less and `file:` destinations resolve to the RAW local
  * filesystem (no `.crc` checksum sidecars, no shared-cache mutation),
  * preserving the byte-level output layout the parity specs lock.
  */
object ByteSink {

  /** FileSystem for `p`, raw-local for local paths. */
  def fsFor(p: Path, conf: Configuration): FileSystem = {
    val scheme = Option(p.toUri.getScheme).getOrElse(
      FileSystem.getDefaultUri(conf).getScheme)
    if (scheme == null || scheme == "file")
      FileSystem.getLocal(conf).getRaw
    else p.getFileSystem(conf)
  }

  /** Write `bytes` to `dest`, creating parent directories. Overwrites. */
  def write(dest: String, bytes: Array[Byte], conf: Configuration): Unit = {
    val out = create(dest, conf)
    try out.write(bytes) finally out.close()
  }

  /** Open an overwriting output stream at `dest`, creating parents. */
  def create(dest: String, conf: Configuration): java.io.OutputStream = {
    val p = new Path(dest)
    fsFor(p, conf).create(p, true)
  }

  /** Rename `src` → `dest` (delete-then-rename when `dest` exists:
    * Hadoop rename, unlike nio REPLACE_EXISTING, fails on a live
    * target on most filesystems).
    */
  def rename(src: String, dest: String, conf: Configuration): Unit = {
    val sp = new Path(src); val dp = new Path(dest)
    val fs = fsFor(dp, conf)
    if (fs.exists(dp)) fs.delete(dp, false)
    if (!fs.rename(sp, dp))
      throw new java.io.IOException(s"rename $src -> $dest failed")
  }

  def mkdirs(dir: String, conf: Configuration): Unit =
    fsFor(new Path(dir), conf).mkdirs(new Path(dir))

  def delete(path: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val fs = fsFor(p, conf)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Paths under `dir` matching `glob` (empty when `dir` is absent). */
  def list(dir: String, glob: String, conf: Configuration): Seq[String] = {
    val d = new Path(dir)
    val fs = fsFor(d, conf)
    if (!fs.exists(d)) Nil
    else fs.globStatus(new Path(d, glob)).toSeq.map(_.getPath.toString)
  }
}
