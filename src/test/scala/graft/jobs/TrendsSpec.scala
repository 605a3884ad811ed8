package graft.jobs

import graft.SparkSpec
import graft.jobs.graphics.Trends
import graft.jobs.graphics.Trends.{DataPoint, TrendSeries}
import java.time.LocalDate

class TrendsSpec extends SparkSpec {

  private def d(s: String) = LocalDate.parse(s)

  it should "find the most recent Sunday" in {
    Trends.mostRecentSunday(d("2017-01-15")) shouldBe d("2017-01-15") // a Sunday
    Trends.mostRecentSunday(d("2017-01-18")) shouldBe d("2017-01-15") // Wednesday
    Trends.mostRecentSunday(d("2017-01-21")) shouldBe d("2017-01-15") // Saturday
  }

  it should "drop a trailing incomplete week and resume before it" in {
    val s = TrendSeries("t", Vector(
      DataPoint(d("2017-01-01"), d("2017-01-08"), Map("x" -> 1.0)),
      DataPoint(d("2017-01-08"), d("2017-01-12"), Map("x" -> 2.0)))) // 4 days
    val (cleaned, resume) = Trends.resumePoint(s)
    cleaned.points.map(_.start) shouldBe Vector(d("2017-01-01"))
    resume shouldBe Some(d("2017-01-01"))
  }

  it should "backfill weeks backwards until caught up" in {
    var queried = Vector.empty[(LocalDate, LocalDate)]
    val existing = TrendSeries("t", Vector(
      DataPoint(d("2017-01-01"), d("2017-01-08"), Map("x" -> 1.0))))
    val out = Trends.update(existing, today = d("2017-01-18"),
      firstValidDate = d("2016-12-01"),
      queryWeek = (s, e) => { queried :+= (s, e); Some(Map("x" -> 9.0)) })
    // most recent Sunday = 01-15; weeks queried: 01-08..01-15 then stop at
    // the cached full week 01-01
    queried shouldBe Vector((d("2017-01-08"), d("2017-01-15")))
    out.points.map(_.start) shouldBe Vector(d("2017-01-01"), d("2017-01-08"))
  }

  it should "recompute an incomplete trailing week during backfill" in {
    val existing = TrendSeries("t", Vector(
      DataPoint(d("2017-01-01"), d("2017-01-08"), Map("x" -> 1.0)),
      DataPoint(d("2017-01-08"), d("2017-01-10"), Map("x" -> 0.5))))
    val out = Trends.update(existing, today = d("2017-01-18"),
      firstValidDate = d("2016-12-01"),
      queryWeek = (s, e) => Some(Map("x" -> 7.0)))
    // incomplete 01-08 point was dropped and recomputed with full data
    out.points.map(p => (p.start, p.values("x"))) shouldBe Vector(
      (d("2017-01-01"), 1.0), (d("2017-01-08"), 7.0))
  }

  it should "register graft SQL functions on a live session" in {
    graft.core.GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_polyhash('ab') AS h").collect().head
    r.getLong(0) shouldBe 3105L
  }
}
