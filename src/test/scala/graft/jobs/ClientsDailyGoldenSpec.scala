package graft.jobs

import graft.SparkSpec
import graft.jobs.clientsdaily.Rollup
import MainSummaryFixture._
import org.apache.spark.sql.Row

/** Golden-value test: the reference asserts exact aggregate values over a
  * 1,123-row anonymized main_summary blob (tests/test_clientsdaily.py:38-151;
  * the blob is absent from the checkout, so per FIXTURES.md we synthesize a
  * deterministic equivalent with independently computed expected values).
  * 35+ aggregate output columns are asserted per sampled client, spanning
  * every aggregator family in Fields (sum, mean, max, first(ignoreNulls),
  * derived-expression sums, countDistinct, date math).
  */
class ClientsDailyGoldenSpec extends SparkSpec {

  private val NumRows = 1123
  private val NumClients = 37

  // deterministic synthetic corpus: client c_i gets rows i, i+37, i+74, …
  private def rowFor(i: Int): Map[String, Any] = {
    val c = i % NumClients
    Map(
      "client_id" -> s"c$c",
      "document_id" -> s"doc-$i",
      "active_ticks" -> (i % 100).toLong,
      "subsession_length" -> (300 + i % 600).toLong,
      "subsession_counter" -> (if (i % 5 == 0) 1L else 2L),
      "scalar_parent_browser_engagement_max_concurrent_tab_count" ->
        (i % 17).toLong,
      "scalar_parent_browser_engagement_max_concurrent_window_count" ->
        (i % 7).toLong,
      "scalar_parent_browser_engagement_tab_open_event_count" -> (i % 9).toLong,
      "scalar_parent_browser_engagement_total_uri_count" -> (i % 23).toLong,
      "scalar_parent_browser_engagement_unique_domains_count" -> (i % 17).toLong,
      "aborts_content" -> (i % 3).toLong,
      "crashes_detected_content" -> (if (i % 50 == 0) 1L else 0L),
      "first_paint" -> (1000 + i).toLong,
      "active_addons_count" -> (i % 5).toLong,
      "places_bookmarks_count" -> (i % 13).toLong,
      "session_restored" -> (i % 20).toLong,
      "devtools_toolbox_opened_count" -> (i % 2).toLong,
      "plugin_hangs" -> (i % 4).toLong,
      "push_api_notify" -> (i % 6).toLong,
      "sync_count_desktop" -> (i % 2).toLong,
      "sync_count_mobile" -> (i % 3).toLong,
      "shutdown_kill" -> (if (i % 10 == 0) 1L else 0L),
      "total_time" -> (i % 700).toLong,
      "ssl_handshake_result_success" -> (i % 8).toLong,
      "ssl_handshake_result_failure" -> (i % 2).toLong,
      "web_notification_shown" -> (i % 5).toLong,
      "profile_creation_date" -> (16000L + c),
      "memory_mb" -> (4096L + c),
      "timezone_offset" -> 60L,
      "city" -> s"city$c",
      "country" -> "DE",
      "locale" -> s"loc${c % 5}",
      "vendor" -> "Mozilla",
      "is_default_browser" -> (c % 2 == 0),
      // nulls except every 5th row: exercises first(ignoreNulls=true)
      // (tests/test_clientsdaily.py:139-151)
      "sync_configured" -> (if (i % 5 == 0) true else null),
      "search_counts" -> (
        if (i % 11 == 0) null
        else Seq(searchCount("google", "urlbar", (i % 7).toLong),
          searchCount("bing", "newtab", 1L))))
  }

  private lazy val rows = (0 until NumRows).map(rowFor)

  // independently computed expectations (plain Scala folds, no Spark)
  private case class Expected(
      pings: Long, searches: Long, urlbar: Long, newtab: Long,
      activeHours: Double, subsessionHours: Double, totalHours: Double,
      sessions: Long, maxTabs: Long, maxWindows: Long,
      sums: Map[String, Long], means: Map[String, Double],
      uniqueDomainsMax: Long, uniqueDomainsMean: Double,
      profileAge: Long, profileCreation: String)

  private def expectedFor(client: Int): Expected = {
    val mine = rows.filter(_("client_id") == s"c$client")
    def longs(k: String): Seq[Long] = mine.map(_(k).asInstanceOf[Long])
    def sum(k: String): Long = longs(k).sum
    def mean(k: String): Double = longs(k).sum.toDouble / mine.size
    val searchRows = mine.flatMap { r =>
      Option(r("search_counts"))
        .map(_.asInstanceOf[Seq[Row]]).getOrElse(Seq.empty)
    }
    val sumKeys = Seq("aborts_content", "crashes_detected_content",
      "devtools_toolbox_opened_count", "plugin_hangs", "push_api_notify",
      "sync_count_desktop", "sync_count_mobile", "shutdown_kill",
      "ssl_handshake_result_success", "ssl_handshake_result_failure",
      "web_notification_shown",
      "scalar_parent_browser_engagement_tab_open_event_count",
      "scalar_parent_browser_engagement_total_uri_count")
    val meanKeys = Seq("first_paint", "active_addons_count",
      "places_bookmarks_count", "session_restored")
    val pcd = 16000L + client
    Expected(
      pings = mine.size.toLong,
      searches = searchRows.map(_.getLong(2)).sum,
      urlbar = searchRows.filter(_.getString(1) == "urlbar")
        .map(_.getLong(2)).sum,
      newtab = searchRows.filter(_.getString(1) == "newtab")
        .map(_.getLong(2)).sum,
      activeHours = longs("active_ticks").sum / 720.0,
      subsessionHours = longs("subsession_length").sum / 3600.0,
      totalHours = longs("total_time").sum / 3600.0,
      sessions = mine.count(_("subsession_counter") == 1L).toLong,
      maxTabs = longs(
        "scalar_parent_browser_engagement_max_concurrent_tab_count").max,
      maxWindows = longs(
        "scalar_parent_browser_engagement_max_concurrent_window_count").max,
      sums = sumKeys.map(k => k -> sum(k)).toMap,
      means = meanKeys.map(k => k -> mean(k)).toMap,
      uniqueDomainsMax = longs(
        "scalar_parent_browser_engagement_unique_domains_count").max,
      uniqueDomainsMean = mean(
        "scalar_parent_browser_engagement_unique_domains_count"),
      profileAge = java.time.LocalDate.parse("2017-01-01").toEpochDay - pcd,
      profileCreation =
        java.time.LocalDate.ofEpochDay(pcd).toString + " 00:00:00")
  }

  private def dec(row: Row, name: String): Double =
    row.getAs[java.math.BigDecimal](name).doubleValue

  it should "reproduce exact golden aggregates over 1123 synthesized rows" in {
    val df = makeDF(schema, base, rows)
    val out = Rollup.toProfileDayAggregates(Rollup.extractSearchCounts(df))
      .collect().map(r => r.getAs[String]("client_id") -> r).toMap
    out.size shouldBe NumClients
    for (client <- Seq(0, 7, 13, 36)) {
      val e = expectedFor(client)
      val row = out(s"c$client")
      withClue(s"client c$client: ") {
        // counts / derived-expression sums
        row.getAs[Long]("pings_aggregated_by_this_row") shouldBe e.pings
        row.getAs[Long]("search_count_all_sum") shouldBe e.searches
        row.getAs[Long]("search_count_urlbar_sum") shouldBe e.urlbar
        row.getAs[Long]("search_count_newtab_sum") shouldBe e.newtab
        row.getAs[Long]("sessions_started_on_this_day") shouldBe e.sessions
        dec(row, "active_hours_sum") shouldBe e.activeHours +- 1e-3
        dec(row, "subsession_hours_sum") shouldBe e.subsessionHours +- 1e-3
        dec(row, "total_hours_sum") shouldBe e.totalHours +- 1e-3
        // plain sums
        e.sums.foreach { case (k, v) =>
          withClue(s"${k}_sum: ") { row.getAs[Long](s"${k}_sum") shouldBe v }
        }
        // means
        e.means.foreach { case (k, v) =>
          withClue(s"${k}_mean: ") {
            row.getAs[Double](s"${k}_mean") shouldBe v +- 1e-9
          }
        }
        // maxes
        row.getAs[Long](
          "scalar_parent_browser_engagement_max_concurrent_tab_count_max")
          .shouldBe(e.maxTabs)
        row.getAs[Long](
          "scalar_parent_browser_engagement_max_concurrent_window_count_max")
          .shouldBe(e.maxWindows)
        row.getAs[Long](
          "scalar_parent_browser_engagement_unique_domains_count_max")
          .shouldBe(e.uniqueDomainsMax)
        row.getAs[Double](
          "scalar_parent_browser_engagement_unique_domains_count_mean")
          .shouldBe(e.uniqueDomainsMean +- 1e-9)
        // first(ignoreNulls) strings / booleans / longs
        row.getAs[String]("city") shouldBe s"city$client"
        row.getAs[String]("country") shouldBe "DE"
        row.getAs[String]("locale") shouldBe s"loc${client % 5}"
        row.getAs[String]("vendor") shouldBe "Mozilla"
        row.getAs[String]("os") shouldBe "windows"
        row.getAs[String]("app_version") shouldBe "54.0.1"
        row.getAs[String]("channel") shouldBe "release"
        row.getAs[String]("sample_id") shouldBe "42"
        row.getAs[String]("default_search_engine") shouldBe "google"
        row.getAs[Long]("memory_mb") shouldBe 4096L + client
        row.getAs[Long]("timezone_offset") shouldBe 60L
        row.getAs[Boolean]("is_default_browser") shouldBe (client % 2 == 0)
        // first(ignoreNulls) skips the 4-of-5 null rows
        row.getAs[Boolean]("sync_configured") shouldBe true
        // date math (UTC-pinned session)
        row.getAs[String]("profile_creation_date") shouldBe e.profileCreation
        row.getAs[Integer]("profile_age_in_days").toLong shouldBe e.profileAge
        row.getAs[String]("activity_date") shouldBe "2017-01-01"
      }
    }
    // corpus-wide invariant: total pings across clients == input rows
    out.values.map(_.getAs[Long]("pings_aggregated_by_this_row")).sum shouldBe
      NumRows.toLong
  }
}
