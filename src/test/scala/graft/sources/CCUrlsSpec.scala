package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

class CCUrlsSpec extends AnyFunSuite {

  private val today = LocalDate.of(2024, 6, 1) // pinned — no wall clock

  test("main snapshot parsing: ISO week Monday") {
    assert(CCUrls.parseMainSnapshot("2023-14") == LocalDate.of(2023, 4, 3))
    assert(CCUrls.parseMainSnapshot("2020-50") == LocalDate.of(2020, 12, 7))
    intercept[IllegalArgumentException](CCUrls.parseMainSnapshot("2023-99"))
    intercept[Exception](CCUrls.parseMainSnapshot("garbage"))
  }

  test("news snapshot parsing: month window") {
    assert(CCUrls.parseNewsSnapshot("2021-02", forStart = true) == LocalDate.of(2021, 2, 1))
    assert(CCUrls.parseNewsSnapshot("2021-02", forStart = false) == LocalDate.of(2021, 2, 28))
    assert(CCUrls.parseNewsSnapshot("2021-12", forStart = false) == LocalDate.of(2021, 12, 31))
    intercept[IllegalArgumentException](CCUrls.parseNewsSnapshot("2021-13", forStart = true))
  }

  test("main path urls: index filtering, old snapshots skipped, window respected") {
    val ids = Seq("CC-MAIN-2023-06", "CC-MAIN-2023-14", "CC-MAIN-2023-23",
      "CC-MAIN-2009-2010", "CC-MAIN-garbage", null, "CC-NEWS-2023-14")
    val urls = CCUrls.mainPathUrls("2023-10", "2023-20", ids, today)
    assert(urls == Seq("https://data.commoncrawl.org/crawl-data/CC-MAIN-2023-14/warc.paths.gz"))
    // wider window picks all three valid ids
    assert(CCUrls.mainPathUrls("2023-01", "2023-52", ids, today).size == 3)
  }

  test("future end snapshots clamp to today") {
    val ids = Seq("CC-MAIN-2024-20", "CC-MAIN-2024-26", "CC-MAIN-2024-33")
    // today = 2024-06-01; week 26 starts 2024-06-24 (future), week 33 later
    val urls = CCUrls.mainPathUrls("2024-01", "2024-52", ids, today)
    assert(urls == Seq("https://data.commoncrawl.org/crawl-data/CC-MAIN-2024-20/warc.paths.gz"))
  }

  test("news path urls: monthly sequence, pre-2016-08 clamped") {
    val urls = CCUrls.newsPathUrls("2016-06", "2016-10", today)
    assert(urls == Seq(
      "https://data.commoncrawl.org/crawl-data/CC-NEWS/2016/08/warc.paths.gz",
      "https://data.commoncrawl.org/crawl-data/CC-NEWS/2016/09/warc.paths.gz",
      "https://data.commoncrawl.org/crawl-data/CC-NEWS/2016/10/warc.paths.gz"))
    // year rollover
    val roll = CCUrls.newsPathUrls("2019-11", "2020-02", today)
    assert(roll.size == 4 && roll.last.contains("/2020/02/"))
  }

  test("data url expansion: gzip listing -> absolute urls, limit, bad listing skipped") {
    def gz(lines: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(lines.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val listings = Map(
      "u1" -> gz("crawl-data/CC-MAIN-2023-14/segments/1/warc/a.warc.gz\ncrawl-data/CC-MAIN-2023-14/segments/1/warc/b.warc.gz\n"),
      "u2" -> gz("crawl-data/CC-MAIN-2023-14/segments/2/warc/c.warc.gz\n"))
    val fetch: String => Array[Byte] =
      u => listings.getOrElse(u, throw new RuntimeException("404"))
    val urls = CCUrls.generateDataUrls(Seq("u1", "broken", "u2"), fetch)
    assert(urls == Seq(
      "https://data.commoncrawl.org/crawl-data/CC-MAIN-2023-14/segments/1/warc/a.warc.gz",
      "https://data.commoncrawl.org/crawl-data/CC-MAIN-2023-14/segments/1/warc/b.warc.gz",
      "https://data.commoncrawl.org/crawl-data/CC-MAIN-2023-14/segments/2/warc/c.warc.gz"))
    assert(CCUrls.generateDataUrls(Seq("u1", "u2"), fetch, limit = Some(2)).size == 2)
  }

  test("collinfo id extraction") {
    val json = """[{"id":"CC-MAIN-2023-14","name":"x"},{"id":"CC-MAIN-2023-06"}]"""
    assert(CCUrls.parseCollinfoIds(json) == Seq("CC-MAIN-2023-14", "CC-MAIN-2023-06"))
  }

  test("downloader: filename derivation, skip-if-exists, atomic temp rename, failure drop") {
    val dir = java.nio.file.Files.createTempDirectory("warcdl").toString
    var fetches = 0
    val fetch: String => Array[Byte] = {
      case u if u.contains("bad") => throw new RuntimeException("boom")
      case u => fetches += 1; s"bytes-of-$u".getBytes("UTF-8")
    }
    val dl = new WarcDownloader(dir, fetch)
    assert(dl.outputFilename("https://data.commoncrawl.org/crawl-data/CC-MAIN-2023-14/seg/warc/a.warc.gz")
      == "crawl-data-CC-MAIN-2023-14-seg-warc-a.warc.gz")
    val url = "https://h/x/y/file.warc.gz"
    val Some(p1) = dl.download(url)
    assert(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p1))) == s"bytes-of-$url")
    // second call: resume path, no new fetch
    assert(dl.download(url).contains(p1) && fetches == 1)
    // failure: None, no tmp residue
    assert(dl.download("https://h/bad.warc.gz").isEmpty)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")))
  }

  test("downloader: distributed stage keeps successes only") {
    val spark = graft.SparkTestBase.spark
    val dir = java.nio.file.Files.createTempDirectory("warcdl2").toString
    val fetch: String => Array[Byte] = {
      case u if u.contains("bad") => throw new RuntimeException("boom")
      case u => u.getBytes("UTF-8")
    }
    val urls = WarcDownloader.urlDataset(spark,
      Seq("https://h/a.gz", "https://h/bad.gz", "https://h/b.gz"), partitions = 2)
    val out = new WarcDownloader(dir, fetch).downloadAll(urls).collect()
    assert(out.length == 2)
    assert(out.forall(r => new java.io.File(r.getAs[String]("local_path")).exists()))
  }

  test("no-egress fetcher fails loudly") {
    val ex = intercept[IllegalStateException](CCUrls.noEgressFetcher("http://x"))
    assert(ex.getMessage.contains("no egress"))
  }
}
