package graft.jobs

import graft.SparkSpec
import graft.jobs.clientsdaily.Rollup
import MainSummaryFixture._

class ClientsDailySpec extends SparkSpec {

  private def df(snippets: Map[String, Any]*) =
    makeDF(schema, base, snippets)

  behavior of "Rollup.extractSearchCounts"

  it should "sum valid search counts per access point" in {
    val in = df(Map(
      "document_id" -> "d1",
      "search_counts" -> Seq(
        searchCount("google", "urlbar", 3L),
        searchCount("bing", "urlbar", 2L),
        searchCount("google", "newtab", 1L))))
    val out = Rollup.extractSearchCounts(in)
    rowsOf(out, "did", "search_count_all", "search_count_urlbar",
      "search_count_newtab", "search_count_abouthome") shouldBe
      Set(Seq("d1", 6L, 5L, 1L, 0L))
  }

  it should "emit zeros for NULL search_counts" in {
    val in = df(Map("document_id" -> "d2", "search_counts" -> null))
    val out = Rollup.extractSearchCounts(in)
    rowsOf(out, "did", "search_count_all", "search_count_urlbar") shouldBe
      Set(Seq("d2", 0L, 0L))
  }

  it should "drop rows whose search_counts are all invalid (inner-join semantics)" in {
    val in = df(
      Map("document_id" -> "d3", "search_counts" -> Seq(
        searchCount("google", "invalid-source", 5L),
        searchCount("google", "urlbar", -5L))),
      Map("document_id" -> "d4"))
    val out = Rollup.extractSearchCounts(in)
    out.select("did").collect().map(_.getString(0)).toSet shouldBe Set("d4")
  }

  behavior of "Rollup.toProfileDayAggregates"

  it should "aggregate per client and activity date with unit conversions" in {
    val in = df(
      Map("document_id" -> "p1", "active_ticks" -> 360L,
        "subsession_length" -> 3600L, "subsession_counter" -> 1L),
      Map("document_id" -> "p2", "active_ticks" -> 720L,
        "subsession_length" -> 1800L, "subsession_counter" -> 2L),
      Map("document_id" -> "p3", "client_id" -> "b",
        "subsession_start_date" -> "2017-01-02 09:00"))
    val out = Rollup.toProfileDayAggregates(Rollup.extractSearchCounts(in))
    val a = out.filter(out("client_id") === "a").collect().head
    a.getAs[String]("activity_date") shouldBe "2017-01-01"
    // active_hours_sum = (360 + 720) / 720.0; SQL literal 3600.0 is a
    // DECIMAL, so the aggregate is exact decimal (same as the reference)
    a.getAs[java.math.BigDecimal]("active_hours_sum").doubleValue shouldBe 1.5
    a.getAs[java.math.BigDecimal]("subsession_hours_sum").doubleValue shouldBe 1.5
    a.getAs[Long]("sessions_started_on_this_day") shouldBe 1L
    a.getAs[Long]("pings_aggregated_by_this_row") shouldBe 2L
    a.getAs[Long]("search_count_all_sum") shouldBe 8L
    val b = out.filter(out("client_id") === "b").collect().head
    b.getAs[String]("activity_date") shouldBe "2017-01-02"
  }

  it should "take first ignoring nulls for profile fields" in {
    val in = df(
      Map("document_id" -> "p1", "app_build_id" -> null,
        "subsession_counter" -> 1L),
      Map("document_id" -> "p2", "app_build_id" -> "build-2"))
    val out = Rollup.toProfileDayAggregates(Rollup.extractSearchCounts(in))
    out.collect().head.getAs[String]("app_build_id") shouldBe "build-2"
  }

  it should "gate city on a valid country (first WITHOUT ignoreNulls)" in {
    val in = df(
      Map("document_id" -> "p1", "country" -> "??", "city" -> "Hidden"),
      Map("document_id" -> "p2", "country" -> "DE", "city" -> "Berlin"))
    val out = Rollup.toProfileDayAggregates(Rollup.extractSearchCounts(in))
    // first row's gate evaluates to NULL and plain first() keeps it
    out.collect().head.getAs[String]("city") shouldBe null
  }

  behavior of "Rollup.extractSubmissionWindowForActivityDay"

  it should "keep the activity day within the submission lag window" in {
    val in = df(
      Map("document_id" -> "p1", "submission_date_s3" -> "20170105",
        "subsession_start_date" -> "2017-01-01 10:00"),
      Map("document_id" -> "p2", "submission_date_s3" -> "20170105",
        "subsession_start_date" -> "2017-01-03 10:00"),
      Map("document_id" -> "p3", "submission_date_s3" -> "20170120",
        "subsession_start_date" -> "2017-01-01 10:00"))
    val (win, start) =
      Rollup.extractSubmissionWindowForActivityDay(in, "2017-01-11", 10)
    start shouldBe "2017-01-01"
    win.select("document_id").collect().map(_.getString(0)).toSet shouldBe
      Set("p1")
  }
}
