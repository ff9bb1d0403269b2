package graft.app

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** End-to-end acquisition flow with the zero-egress fixture fetcher:
  * listings → download (resume) → WARC parse → extract → curate →
  * parquet. Deterministic counts: the fixture serves 4 shards × 250
  * CCPages rows.
  */
class CommonCrawlAppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("snapshot window → curated parquet, deterministic and resumable") {
    val dl = java.nio.file.Files.createTempDirectory("cc_dl").toString
    val out = java.nio.file.Files.createTempDirectory("cc_out").toString
    val fetch = CommonCrawlApp.fixtureFetch(spark)

    val curated = CommonCrawlApp.run(spark, "2023-14", "2023-14", dl, out, fetch)
    val kept = curated.count()
    assert(kept > 0, "nothing survived the cascade")
    assert(curated.columns.contains("url") && curated.columns.contains("text")
      && curated.columns.contains("language") && curated.columns.contains("quality_score"))
    // only the in-window snapshot's shards downloaded: 4 warc files
    assert(new java.io.File(dl).listFiles().count(_.getName.endsWith(".warc.gz")) == 4)
    // every kept row is a real extraction (language gated to a stop-listed lang)
    assert(curated.filter(col("language").isNull || col("text") === "").count() == 0)

    // resume: second run re-downloads nothing (skip-if-exists) and
    // produces the identical output — even with a STALE warc from some
    // other run sharing the download dir (curation scopes to exactly
    // the files THIS run's url list resolves to)
    val mtimes = new java.io.File(dl).listFiles().map(f => f.getName -> f.lastModified()).toMap
    val stale = new java.io.File(dl, "stale-other-snapshot.warc.gz")
    java.nio.file.Files.write(stale.toPath, graft.sources.WarcParser.buildWarc(
      Seq(("http://stale.example.com/x", "<html><body>stale leftover page</body></html>".getBytes("UTF-8")))))
    val again = CommonCrawlApp.run(spark, "2023-14", "2023-14", dl, out, fetch)
    assert(again.count() == kept)
    assert(again.filter(col("url") === "http://stale.example.com/x").count() == 0,
      "stale warc from a prior run leaked into the curated output")
    new java.io.File(dl).listFiles().filter(_.getName != stale.getName).foreach(f =>
      assert(f.lastModified() == mtimes(f.getName), s"${f.getName} was re-downloaded"))
  }
}
