package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import java.nio.file.Files

/** Regression for the live-drill finding: a zombie driver sharing the
  * output root with a rerun double-committed 10/64 units and tore an
  * Overwrite ("Unable to clear output directory … _temporary still
  * exists"). runCheckpointed now claims each unit via an atomic lock
  * file; concurrent drivers partition the units, dead-pid locks are
  * broken (exact SIGKILL resume), live/foreign locks are skipped and
  * reported.
  */
class ConcurrentDriversSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def lockDir(root: String) = java.nio.file.Paths.get(s"$root/out/_unit_locks")

  test("two concurrent drivers on one root: every unit committed exactly once, no torn writes") {
    val root = Files.createTempDirectory("tableio_conc").toString
    val df = spark.range(0, 2000).withColumn("unit", (col("id") % 16).cast("string"))
    def process(d: org.apache.spark.sql.DataFrame) = {
      Thread.sleep(30) // widen the overlap window
      d.withColumn("doubled", col("id") * 2)
    }

    // two "drivers" = two threads sharing one pid: each other's locks are
    // held by a LIVE pid, so the loser must skip, never double-commit
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() =>
        try new ManifestParquetIO(root).runCheckpointed(df, "unit", "out")(process)
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"driver thread failed: ${Option(errs.peek()).map(_.toString)}")

    val manifest = Files.readAllLines(java.nio.file.Paths.get(s"$root/out_manifest.jsonl"))
    val units = scala.jdk.CollectionConverters.ListHasAsScala(manifest).asScala
      .map(l => """"unit":"([^"]+)"""".r.findFirstMatchIn(l).get.group(1))
    assert(units.size == 16, s"expected 16 commits, got ${units.size}: $units")
    assert(units.toSet.size == 16, s"double-committed units: ${units.groupBy(identity).filter(_._2.size > 1).keys}")

    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 2000)
    assert(out.agg(sum("doubled")).head.getLong(0) == (0L until 2000L).map(_ * 2).sum)
    // all locks released
    assert(!Files.exists(lockDir(root)) || !Files.list(lockDir(root)).findAny().isPresent)
  }

  test("stale lock from a dead pid on this host is broken: SIGKILL resume stays exact") {
    val root = Files.createTempDirectory("tableio_stale").toString
    val io = new ManifestParquetIO(root)
    val df = spark.range(0, 100).withColumn("unit", (col("id") % 4).cast("string"))

    // fabricate a crashed driver: unit 2's lock held by a pid that no longer exists
    val host = java.net.InetAddress.getLocalHost.getHostName
    val deadPid = Iterator.iterate(4000000L)(_ + 1).find(p => ProcessHandle.of(p).isEmpty).get
    Files.createDirectories(lockDir(root))
    Files.writeString(lockDir(root).resolve("2.lock"), s"$deadPid@$host")

    val leftover = io.runCheckpointed(df, "unit", "out")(d => d)
    assert(leftover.isEmpty)
    assert(io.committedUnits("out") == Set("0", "1", "2", "3"))
    assert(spark.read.parquet(s"$root/out").count() == 100)
  }

  test("lock held by an unverifiable owner (other host) is skipped and reported, not raced") {
    val root = Files.createTempDirectory("tableio_foreign").toString
    val io = new ManifestParquetIO(root)
    val df = spark.range(0, 100).withColumn("unit", (col("id") % 4).cast("string"))

    Files.createDirectories(lockDir(root))
    Files.writeString(lockDir(root).resolve("1.lock"), "12345@some-other-host")

    val leftover = io.runCheckpointed(df, "unit", "out")(d => d)
    assert(leftover == Seq("1"))
    assert(io.committedUnits("out") == Set("0", "2", "3"))

    // once the foreign lock clears, a rerun completes exactly the remainder
    Files.delete(lockDir(root).resolve("1.lock"))
    assert(io.runCheckpointed(df, "unit", "out")(d => d).isEmpty)
    assert(io.committedUnits("out") == Set("0", "1", "2", "3"))
    assert(spark.read.parquet(s"$root/out").count() == 100)
  }

  test("opt-in lease breaks an expired foreign-host lock (crashed driver on another node)") {
    val root = Files.createTempDirectory("tableio_lease").toString
    val io = new ManifestParquetIO(root)
    val df = spark.range(0, 100).withColumn("unit", (col("id") % 4).cast("string"))

    Files.createDirectories(lockDir(root))
    val lock = lockDir(root).resolve("3.lock")
    Files.writeString(lock, "777@crashed-remote-node")
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))

    // without the lease: blocked and reported
    assert(io.runCheckpointed(df, "unit", "out")(d => d) == Seq("3"))

    // with a 10s lease: the 60s-old lock is expired — broken and completed
    System.setProperty("graft.resume.lockLeaseMs", "10000")
    try assert(io.runCheckpointed(df, "unit", "out")(d => d).isEmpty)
    finally System.clearProperty("graft.resume.lockLeaseMs")
    assert(io.committedUnits("out") == Set("0", "1", "2", "3"))
    assert(spark.read.parquet(s"$root/out").count() == 100)

    // a FRESH foreign lock is respected even with the lease on
    val root2 = Files.createTempDirectory("tableio_lease2").toString
    val io2 = new ManifestParquetIO(root2)
    Files.createDirectories(java.nio.file.Paths.get(s"$root2/out/_unit_locks"))
    Files.writeString(java.nio.file.Paths.get(s"$root2/out/_unit_locks/0.lock"), "777@live-remote-node")
    System.setProperty("graft.resume.lockLeaseMs", "600000")
    try assert(io2.runCheckpointed(df, "unit", "out")(d => d) == Seq("0"))
    finally System.clearProperty("graft.resume.lockLeaseMs")
  }
}
