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

  it should "backfill the registered trend family over weekly ping slices" in {
    import spark.implicits._
    import DashboardSpec._
    // two weeks of pings: week of 01-08 shifts d3d11-available share and
    // introduces a new Firefox version
    val d3dOk = Features("d3d11",
      D3d11("available", "11.1", false, null, null),
      D2d("available", "1.1"), StatusOnly(null), StatusOnly(null))
    val week1 = Seq(
      Ping(FxVersion = "54", features = d3dOk),
      Ping(FxVersion = "54", features = d3dOk.copy(
        d3d11 = D3d11("blocked", null, false, null, null))),
      Ping(FxVersion = "54", OSName = "Darwin", OS = "Darwin-17"))
    val week2 = Seq(
      Ping(FxVersion = "55", features = d3dOk),
      Ping(FxVersion = "54", features = d3dOk, OSVersion = "5.1.0"), // XP
      Ping(FxVersion = "55", features = d3dOk, vendorID = "0x1002"))
    val weeks = Map(
      d("2017-01-01") -> week1.toDS().toDF()
        .withColumn("adapters", org.apache.spark.sql.functions.expr(
          "array(named_struct('vendorID', vendorID, 'deviceID', 'gen1dev', " +
            "'driverVersion', '1.1', 'driverVendor', CAST(NULL AS STRING)))")),
      d("2017-01-08") -> week2.toDS().toDF()
        .withColumn("adapters", org.apache.spark.sql.functions.expr(
          "array(named_struct('vendorID', vendorID, 'deviceID', 'gen2dev', " +
            "'driverVersion', '1.1', 'driverVendor', CAST(NULL AS STRING)))")))
    val out = Trends.updateAll(
      series = Map.empty,
      today = d("2017-01-18"), // most recent Sunday: 01-15
      firstValidDate = d("2017-01-01"),
      pingsForWeek = (s, _) => weeks(s),
      deviceMaps = Map("0x10de" -> Map("gen1dev" -> "kepler",
        "gen2dev" -> "pascal")))
    out.size shouldBe 10
    // trend-firefox: both weeks, ascending order
    val fx = out("trend-firefox").points
    fx.map(_.start) shouldBe Vector(d("2017-01-01"), d("2017-01-08"))
    fx(0).values shouldBe Map("54" -> 3.0)
    fx(1).values shouldBe Map("55" -> 2.0, "54" -> 1.0)
    // trend-windows-d3d11: Vista+ slice excludes Darwin and XP
    val d3d = out("trend-windows-d3d11").points
    d3d(0).values shouldBe Map("11.1" -> 1.0, "blocked" -> 1.0)
    d3d(1).values shouldBe Map("11.1" -> 2.0)
    // trend-windows-vendors
    out("trend-windows-vendors").points(1).values shouldBe
      Map("0x10de" -> 2.0, "0x1002" -> 1.0)
    // device-generation trend resolves through the vendor's device map
    val gen = out("trend-windows-device-gen-nvidia").points
    gen(0).values shouldBe Map("kepler" -> 2.0)
    gen(1).values shouldBe Map("pascal" -> 2.0)
    // amd has no mapped devices → unknown bucket (week 2 only)
    out("trend-windows-device-gen-amd").points.last.values shouldBe
      Map("unknown" -> 1.0)
  }

  it should "respect per-trend ship dates in updateAll" in {
    import spark.implicits._
    import DashboardSpec._
    val pings = Seq(Ping(features = null)).toDS().toDF()
      .withColumn("adapters", org.apache.spark.sql.functions.expr(
        "array(named_struct('vendorID', vendorID, 'deviceID', 'd', " +
          "'driverVersion', '1', 'driverVendor', CAST(NULL AS STRING)))"))
    val out = Trends.updateAll(Map.empty,
      today = LocalDate.of(2015, 11, 29),
      firstValidDate = LocalDate.of(2015, 11, 1),
      pingsForWeek = (_, _) => pings)
    // compositor trend starts at its Firefox 43 ship date (2015-11-15),
    // not the global first valid date
    out("trend-windows-compositors").points.map(_.start) shouldBe
      Vector(d("2015-11-15"), d("2015-11-22"))
    out("trend-windows-versions").points.map(_.start) shouldBe
      Vector(d("2015-11-01"), d("2015-11-08"), d("2015-11-15"), d("2015-11-22"))
  }

  it should "register graft SQL functions on a live session" in {
    graft.core.GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_polyhash('ab') AS h").collect().head
    r.getLong(0) shouldBe 3105L
  }
}
