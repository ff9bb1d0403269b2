package graft.sources

import java.time.{LocalDate, ZoneOffset}
import java.time.temporal.WeekFields

/** Common Crawl WARC URL generation — a port of the reference's
  * url_generation.py (MainCommonCrawlUrlGenerator YYYY-WW ISO-week
  * snapshots over the collinfo.json index; NewsCommonCrawlUrlGenerator
  * YYYY-MM monthly paths). The two network touchpoints (the collinfo
  * index and the warc.paths.gz listings) are INJECTED as a fetcher
  * function — this sandbox has zero egress, so tests inject fixtures
  * and a deployment passes an http/s3 fetcher; everything else
  * (snapshot parsing, date-window filtering, path construction,
  * listing expansion, limit) is the reference logic.
  *
  * Reference: download/common_crawl/url_generation.py:29-250.
  */
object CCUrls {

  val DataPrefix = "https://data.commoncrawl.org"

  /** ISO-week Monday for a "YYYY-WW" snapshot string
    * (url_generation.py:129-140 datetime.fromisocalendar(year, week, 1)).
    */
  def parseMainSnapshot(s: String): LocalDate = {
    val parts = s.split("-")
    require(parts.length == 2, s"Invalid Main CC snapshot format. Use YYYY-WW: '$s'")
    val (year, week) = (parts(0).toInt, parts(1).toInt)
    require(week >= 1 && week <= 53, s"Week number must be between 1 and 53: '$s'")
    LocalDate.ofYearDay(year, 4) // Jan 4 is always in ISO week 1
      .`with`(WeekFields.ISO.weekOfWeekBasedYear(), week.toLong)
      .`with`(WeekFields.ISO.dayOfWeek(), 1L)
  }

  /** Month window for a "YYYY-MM" news snapshot: first day (start) or
    * last day (end) — url_generation.py:186-209.
    */
  def parseNewsSnapshot(s: String, forStart: Boolean): LocalDate = {
    val parts = s.split("-")
    require(parts.length == 2, s"Invalid News CC snapshot format. Use YYYY-MM: '$s'")
    val (year, month) = (parts(0).toInt, parts(1).toInt)
    require(month >= 1 && month <= 12, s"Month must be between 1 and 12: '$s'")
    val first = LocalDate.of(year, month, 1)
    if (forStart) first else first.plusMonths(1).minusDays(1)
  }

  private def window(start: LocalDate, end: LocalDate, today: LocalDate): (LocalDate, LocalDate) = {
    require(!start.isAfter(end), s"Start snapshot is after end snapshot")
    (start, if (end.isAfter(today)) today else end)
  }

  /** warc.paths.gz URLs for main crawl snapshots in [start, end],
    * filtered against the crawl index (collinfo.json id list, e.g.
    * "CC-MAIN-2023-14") — url_generation.py:152-186.
    */
  def mainPathUrls(startSnapshot: String, endSnapshot: String,
                   snapshotIds: Seq[String],
                   today: LocalDate = LocalDate.now(ZoneOffset.UTC)): Seq[String] = {
    var (startDate, endDate) = window(
      parseMainSnapshot(startSnapshot), parseMainSnapshot(endSnapshot), today)
    if (startDate.getYear < 2013) startDate = LocalDate.of(2013, 1, 1)
    val oldSnapshots = Set("CC-MAIN-2009-2010", "CC-MAIN-2008-2009")
    snapshotIds.filterNot(id => id == null || oldSnapshots.contains(id)).flatMap { id =>
      val parts = id.split("-")
      if (parts.length == 4 && parts(0) == "CC" && parts(1) == "MAIN") {
        try {
          val (year, week) = (parts(2).toInt, parts(3).toInt)
          val dt = parseMainSnapshot(f"$year-$week")
          if (!dt.isBefore(startDate) && !dt.isAfter(endDate))
            Some(f"$DataPrefix/crawl-data/CC-MAIN-$year%04d-$week%02d/warc.paths.gz")
          else None
        } catch { case _: Exception => None }
      } else None
    }
  }

  /** Monthly CC-NEWS warc.paths.gz URLs for [start, end]
    * (url_generation.py:211-250; earliest news data 2016-08).
    */
  def newsPathUrls(startSnapshot: String, endSnapshot: String,
                   today: LocalDate = LocalDate.now(ZoneOffset.UTC)): Seq[String] = {
    var (startDate, endDate) = window(
      parseNewsSnapshot(startSnapshot, forStart = true),
      parseNewsSnapshot(endSnapshot, forStart = false), today)
    val minNews = LocalDate.of(2016, 8, 1)
    if (startDate.isBefore(minNews)) startDate = minNews
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var y = startDate.getYear
    var m = startDate.getMonthValue
    while (LocalDate.of(y, m, 1).isBefore(endDate.plusDays(1)) &&
           (y < endDate.getYear || (y == endDate.getYear && m <= endDate.getMonthValue))) {
      out += f"$DataPrefix/crawl-data/CC-NEWS/$y%04d/$m%02d/warc.paths.gz"
      if (m == 12) { m = 1; y += 1 } else m += 1
    }
    out.toSeq
  }

  /** Expand warc.paths.gz listings into individual WARC data URLs
    * (url_generation.py:76-117): fetch each listing (gzip bytes via the
    * injected fetcher), split lines, join onto the data prefix, apply
    * the optional limit. Fetch failures skip that listing (the
    * reference logs and continues).
    */
  def generateDataUrls(pathUrls: Seq[String], fetch: String => Array[Byte],
                       limit: Option[Int] = None): Seq[String] = {
    val all = pathUrls.flatMap { url =>
      try {
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(fetch(url)))
        val text = new String(in.readAllBytes(), "UTF-8")
        text.split("\n").map(_.trim).filter(_.nonEmpty).map(rel => s"$DataPrefix/$rel")
      } catch { case _: Exception => Nil }
    }
    limit.fold(all)(all.take)
  }

  /** Parse the crawl ids out of a collinfo.json payload (the only field
    * the reference uses is "id").
    */
  def parseCollinfoIds(json: String): Seq[String] =
    """"id"\s*:\s*"([^"]+)"""".r.findAllMatchIn(json).map(_.group(1)).toSeq

  /** No-egress default fetcher: fails loudly with the reason. */
  val noEgressFetcher: String => Array[Byte] =
    url => throw new IllegalStateException(
      s"network fetch of $url requested but this environment has no egress — inject a fetcher")
}
