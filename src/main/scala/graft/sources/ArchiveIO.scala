package graft.sources

import java.io.InputStream

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** One-task-per-archive STREAMING scan shared by the acquisition
  * sources (ArXiv monthly tars, Wikipedia dump parts).
  *
  * `binaryFile` with a `content` column materializes each archive as a
  * single row — hard 2 GB ceiling and a whole-file heap copy per task.
  * Instead: list the file paths driver-side (pure metadata, one row per
  * archive — same scale as the download URL list), then open each file
  * executor-side through its Hadoop FileSystem and feed a LAZY per-file
  * record iterator, so an arbitrarily large archive streams through a
  * fixed-size buffer. One task per archive via repartition(nFiles) —
  * the same parallel grain the binaryFile scan had.
  */
private[graft] object ArchiveIO {

  /** Stream every file under `path` (glob/dir) through `open`, which
    * maps (file path, buffered stream) to a lazy record iterator. The
    * stream closes on exhaustion and on task completion (early
    * termination under limit()).
    */
  def perFile[T](spark: SparkSession, path: String)
                (open: (String, InputStream) => Iterator[T])
                (implicit enc: Encoder[T]): Dataset[T] = {
    import spark.implicits._
    val paths = spark.read.format("binaryFile").load(path)
      .select("path").as[String].collect().toSeq
    val bc = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
    spark.createDataset(paths)
      .repartition(math.max(1, paths.size))
      .flatMap { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        val in = new java.io.BufferedInputStream(hp.getFileSystem(bc.value.value).open(hp))
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        val it = open(p, in)
        new Iterator[T] {
          def hasNext: Boolean = {
            val h = !closed && it.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): T = it.next()
        }
      }
  }
}
