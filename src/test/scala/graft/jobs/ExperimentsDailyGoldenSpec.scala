package graft.jobs

import graft.SparkSpec
import graft.jobs.clientsdaily.Rollup
import graft.jobs.experiments.ExperimentsDaily
import MainSummaryFixture._
import org.apache.spark.sql.functions.col

/** Golden-value test for the experiments_daily rollup, mirroring the
  * reference's 190-row experiments-summary fixture test
  * (tests/test_experimentsdaily.py): the clients_daily aggregator list
  * keyed additionally by experiment_id, with the screenshots experiment
  * excluded at load (experimentsdaily/rollup.py loadFilter).
  */
class ExperimentsDailyGoldenSpec extends SparkSpec {

  private val NumRows = 190
  private val Experiments = Seq(
    "pref-flip-searchcomp1", "taar-study", ExperimentsDaily.ExcludedId)

  private def rowFor(i: Int): Map[String, Any] = Map(
    "client_id" -> s"c${i % 19}",
    "document_id" -> s"doc-$i",
    "experiment_id" -> Experiments(i % 3),
    "experiment_branch" -> (if (i % 2 == 0) "control" else "treatment"),
    "active_ticks" -> (i % 50).toLong,
    "subsession_counter" -> (if (i % 4 == 0) 1L else 2L),
    "search_counts" -> (
      if (i % 7 == 0) null
      else Seq(searchCount("google", "urlbar", (i % 5).toLong))))

  private lazy val rows = (0 until NumRows).map(rowFor)

  it should "roll up per (experiment, client, day) with the excluded id dropped" in {
    val df = ExperimentsDaily.loadFilter(makeDF(schema, base, rows))
    // a third of the corpus carries the excluded experiment
    df.count() shouldBe rows.count(_("experiment_id") != ExperimentsDaily.ExcludedId)
    val out = ExperimentsDaily.toExperimentProfileDayAggregates(
      Rollup.extractSearchCounts(df))

    // independently computed expectations per (experiment, client)
    val kept = rows.filter(_("experiment_id") != ExperimentsDaily.ExcludedId)
    val expected = kept.groupBy(r => (r("experiment_id"), r("client_id")))
      .map { case (k, rs) =>
        val searches = rs.map(r => Option(r("search_counts"))
          .map(_.asInstanceOf[Seq[org.apache.spark.sql.Row]]
            .map(_.getLong(2)).sum).getOrElse(0L)).sum
        k -> (rs.size.toLong, searches,
          rs.count(_("subsession_counter") == 1L).toLong)
      }
    out.count() shouldBe expected.size

    val got = out.collect().map { r =>
      (r.getAs[String]("experiment_id"), r.getAs[String]("client_id")) ->
        ((r.getAs[Long]("pings_aggregated_by_this_row"),
          r.getAs[Long]("search_count_all_sum"),
          r.getAs[Long]("sessions_started_on_this_day")))
    }.toMap
    expected.foreach { case ((exp, cid), e) =>
      withClue(s"($exp, $cid): ") { got((exp.toString, cid.toString)) shouldBe e }
    }

    // experiment branch is carried as a first() aggregate (fields.py:216-218
    // inserts experiment_branch into the aggregator list)
    out.columns should contain("experiment_branch")
    // the excluded experiment never reaches the output
    out.filter(col("experiment_id") === ExperimentsDaily.ExcludedId)
      .count() shouldBe 0
  }
}
