package graft.jobs

import graft.SparkSpec
import graft.jobs.search.SearchAggregates
import MainSummaryFixture._
import org.apache.spark.sql.functions.col

class SearchAggregatesSpec extends SparkSpec {

  private def df(snippets: Map[String, Any]*) =
    makeDF(schema, base, snippets)

  behavior of "explodeSearchCounts"

  it should "explode one row per search count entry" in {
    val in = df(Map("search_counts" -> Seq(
      searchCount("google", "urlbar", 3L),
      searchCount("bing", "searchbar", 2L))))
    val out = SearchAggregates.explodeSearchCounts(in)
    rowsOf(out, "engine", "source", "count") shouldBe Set(
      Seq("google", "urlbar", 3L), Seq("bing", "searchbar", 2L))
  }

  it should "cap outlier counts at 10000" in {
    val in = df(Map("search_counts" -> Seq(
      searchCount("google", "urlbar", 10000L),
      searchCount("bing", "urlbar", 9999L))))
    val out = SearchAggregates.explodeSearchCounts(in)
    rowsOf(out, "engine", "count") shouldBe Set(Seq("bing", 9999L))
  }

  it should "shape ad-click map entries like search counts" in {
    val in = df(Map(
      "search_counts" -> Seq(searchCount("google", "urlbar", 1L)),
      "scalar_parent_browser_search_ad_clicks" -> Map("google" -> 7L)))
    val out = SearchAggregates.explodeSearchCounts(in)
    rowsOf(out, "engine", "source", "count") shouldBe Set(
      Seq("google", "urlbar", 1L), Seq("google", "ad-click:", 7L))
  }

  it should "emit a zero row for NULL search_counts" in {
    val in = df(Map("search_counts" -> null))
    val out = SearchAggregates.explodeSearchCounts(in)
    rowsOf(out, "engine", "source", "count") shouldBe
      Set(Seq(null, null, 0L))
  }

  behavior of "addDerivedColumns"

  it should "classify search types and extract the followon addon version" in {
    val in = df(
      Map("document_id" -> "d1", "search_counts" -> Seq(
        searchCount("g", "urlbar", 1L),
        searchCount("g", "sap:urlbar:SomeCodeHere", 1L),
        searchCount("g", "follow-on:urlbar:SomeCodeHere", 1L),
        searchCount("g", "in-content:sap:foo", 1L),
        searchCount("g", "in-content:sap-follow-on:foo", 1L),
        searchCount("g", "in-content:organic:none", 1L),
        searchCount("g", "follow-on:bar", 1L),
        searchCount("g", "mystery", 1L))))
    val out = SearchAggregates.addDerivedColumns(
      SearchAggregates.explodeSearchCounts(in))
    // the reference's full exploded_data_for_derived_cols pattern set
    // (tests/test_search_aggregates.py:240-272)
    rowsOf(out, "source", "type") shouldBe Set(
      Seq("urlbar", "sap"),
      Seq("sap:urlbar:SomeCodeHere", "tagged-sap"),
      Seq("follow-on:urlbar:SomeCodeHere", "tagged-follow-on"),
      Seq("in-content:sap:foo", "tagged-sap"),
      Seq("in-content:sap-follow-on:foo", "tagged-follow-on"),
      Seq("in-content:organic:none", "organic"),
      Seq("follow-on:bar", "tagged-follow-on"),
      Seq("mystery", "unknown"))
    out.select("addon_version").distinct().collect()
      .map(_.getString(0)).toSet shouldBe Set("0.9.5")
  }

  behavior of "searchClientsDaily"

  it should "pivot search types into columns per (client, day, engine, source)" in {
    val in = df(
      Map("document_id" -> "d1", "search_counts" -> Seq(
        searchCount("google", "urlbar", 3L),
        searchCount("google", "urlbar", 2L))),
      Map("document_id" -> "d2", "client_id" -> "b",
        "search_counts" -> Seq(
          searchCount("bing", "in-content:organic:x", 5L))))
    val out = SearchAggregates.searchClientsDaily(in)
    val a = out.filter(col("client_id") === "a").collect().head
    a.getAs[Long]("sap") shouldBe 5L
    a.getAs[String]("engine") shouldBe "google"
    // aggregation is over EXPLODED rows (2 entries → 2 rows), matching the
    // reference's per-exploded-row sums (aggregates.py:96-104)
    a.getAs[Long]("sessions_started_on_this_day") shouldBe 2L
    a.getAs[Double]("active_hours_sum") shouldBe 1.0 +- 1e-9
    val b = out.filter(col("client_id") === "b").collect().head
    b.getAs[Long]("organic") shouldBe 5L
    assert(b.isNullAt(b.fieldIndex("sap")))
  }

  behavior of "searchAggregates"

  it should "drop null-engine rows and keep dimensional rollups" in {
    val in = df(
      Map("document_id" -> "d1"),
      Map("document_id" -> "d2", "search_counts" -> null))
    val out = SearchAggregates.searchAggregates(in)
    out.select("engine").collect().map(_.getString(0)).toSet shouldBe
      Set("google")
    out.collect().head.getAs[Long]("sap") shouldBe 4L
  }
}
