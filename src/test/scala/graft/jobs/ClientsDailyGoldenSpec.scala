package graft.jobs

import graft.SparkSpec
import graft.jobs.clientsdaily.Rollup
import MainSummaryFixture._
import org.apache.spark.sql.functions.col

/** Golden-value test: the reference asserts exact aggregate values over a
  * 1,123-row anonymized main_summary blob (tests/test_clientsdaily.py:38-151;
  * the blob is absent from the checkout, so per FIXTURES.md we synthesize a
  * deterministic equivalent with independently computed expected values).
  */
class ClientsDailyGoldenSpec extends SparkSpec {

  private val NumRows = 1123
  private val NumClients = 37

  // deterministic synthetic corpus: client c_i gets rows i, i+37, i+74, …
  private def rowFor(i: Int): Map[String, Any] = Map(
    "client_id" -> s"c${i % NumClients}",
    "document_id" -> s"doc-$i",
    "active_ticks" -> (i % 100).toLong,
    "subsession_length" -> (300 + i % 600).toLong,
    "subsession_counter" -> (if (i % 5 == 0) 1L else 2L),
    "scalar_parent_browser_engagement_max_concurrent_tab_count" ->
      (i % 17).toLong,
    "search_counts" -> (
      if (i % 11 == 0) null
      else Seq(searchCount("google", "urlbar", (i % 7).toLong),
        searchCount("bing", "newtab", 1L))))

  private lazy val rows = (0 until NumRows).map(rowFor)

  // independently computed expectations (plain Scala, no Spark)
  private def expectedFor(client: Int) = {
    val mine = rows.zipWithIndex.collect {
      case (r, i) if r("client_id") == s"c$client" => (r, i)
    }
    val searches = mine.map { case (r, _) =>
      if (r("search_counts") == null) 0L
      else r("search_counts").asInstanceOf[Seq[org.apache.spark.sql.Row]]
        .map(_.getLong(2)).sum
    }.sum
    val activeHours = mine.map(_._1("active_ticks").asInstanceOf[Long]).sum / 720.0
    val sessions = mine.count(_._1("subsession_counter") == 1L)
    val maxTabs = mine.map { case (r, _) =>
      r("scalar_parent_browser_engagement_max_concurrent_tab_count")
        .asInstanceOf[Long]
    }.max
    (mine.size.toLong, searches, activeHours, sessions.toLong, maxTabs)
  }

  it should "reproduce exact golden aggregates over 1123 synthesized rows" in {
    val df = makeDF(schema, base, rows)
    val out = Rollup.toProfileDayAggregates(Rollup.extractSearchCounts(df))
      .collect().map(r => r.getAs[String]("client_id") -> r).toMap
    out.size shouldBe NumClients
    for (client <- Seq(0, 7, 13, 36)) {
      val (pings, searches, activeHours, sessions, maxTabs) =
        expectedFor(client)
      val row = out(s"c$client")
      withClue(s"client c$client: ") {
        row.getAs[Long]("pings_aggregated_by_this_row") shouldBe pings
        row.getAs[Long]("search_count_all_sum") shouldBe searches
        row.getAs[java.math.BigDecimal]("active_hours_sum")
          .doubleValue shouldBe activeHours +- 1e-9
        row.getAs[Long]("sessions_started_on_this_day") shouldBe sessions
        val gotMaxTabs = row.getAs[Long](
          "scalar_parent_browser_engagement_max_concurrent_tab_count_max")
        gotMaxTabs shouldBe maxTabs
      }
    }
    // corpus-wide invariant: total pings across clients == input rows
    out.values.map(_.getAs[Long]("pings_aggregated_by_this_row")).sum shouldBe
      NumRows.toLong
  }
}
