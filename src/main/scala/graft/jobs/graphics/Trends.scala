package graft.jobs.graphics

import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graphics telemetry trends: incremental weekly backfill of append-only
  * trend series, ported from mozetl/graphics/graphics_telemetry_trends.py
  * (TrendBase/Trend/do_update, lines 233-463).
  *
  * The distinctive semantics preserved:
  *  - analysis slices are Sunday-aligned weeks, walked BACKWARDS from the
  *    most recent Sunday until every trend reports caught-up;
  *  - a cached series stops at its last FULL week; a trailing incomplete
  *    data point is discarded and recomputed (trends.py:364-383);
  *  - each week's result is appended driver-side (the series is small;
  *    the per-week query itself is a Spark aggregation supplied by the
  *    caller).
  */
object Trends {

  case class DataPoint(start: LocalDate, end: LocalDate, values: Map[String, Double])

  case class TrendSeries(name: String, points: Vector[DataPoint]) {
    def sorted: TrendSeries = copy(points = points.sortBy(_.start.toEpochDay))
  }

  /** trends.py:391-399: drop a trailing incomplete week; return the
    * cleaned series and the last full week start (the resume point).
    */
  def resumePoint(series: TrendSeries): (TrendSeries, Option[LocalDate]) = {
    val s = series.sorted
    s.points.lastOption match {
      case Some(last) if last.end.toEpochDay - last.start.toEpochDay < 7 =>
        (s.copy(points = s.points.dropRight(1)),
          Some(last.start.minusDays(7)))
      case Some(last) => (s, Some(last.start))
      case None => (s, None)
    }
  }

  /** trends.py:288-294. */
  def mostRecentSunday(today: LocalDate): LocalDate =
    if (today.getDayOfWeek == DayOfWeek.SUNDAY) today
    else today.minusDays(today.getDayOfWeek.getValue.toLong) // Mon=1..Sat=6

  /** trends.py:256-285 do_update: walk Sunday-aligned weeks backwards,
    * querying each (start, end) window until the series is caught up or
    * `firstValidDate` is reached. `queryWeek` runs the actual (Spark)
    * aggregation for one window; returning None stops the walk (no data).
    */
  def update(series: TrendSeries, today: LocalDate,
      firstValidDate: LocalDate,
      queryWeek: (LocalDate, LocalDate) => Option[Map[String, Double]])
      : TrendSeries = {
    val (cleaned, lastFullWeek) = resumePoint(series)
    val latest = mostRecentSunday(today)
    var end = latest
    var acc = Vector.empty[DataPoint]
    var continue = true
    while (continue) {
      val start = end.minusDays(7)
      val willUpdate = !start.isBefore(firstValidDate) &&
        lastFullWeek.forall(lfw => start.isAfter(lfw))
      if (!willUpdate) continue = false
      else queryWeek(start, end) match {
        case Some(values) =>
          acc = DataPoint(start, end, values) +: acc
          end = start
        case None => continue = false
      }
    }
    cleaned.copy(points = (cleaned.points ++ acc)
      .sortBy(_.start.toEpochDay)).sorted
  }

  // ---------------------------------------------------------------------
  // The trend query family (graphics_telemetry_trends.py:470-589)
  // ---------------------------------------------------------------------

  /** One trend kind: a ping-frame slice, a classifier column whose
    * frequency map is the week's data point, and an optional first ship
    * date (will_update gates, trends.py:493-497 etc). Queries consume
    * the `Dashboard.normalize`d ping frame (raw `adapters` preserved).
    */
  case class TrendQuery(
      name: String,
      slice: DataFrame => DataFrame,
      key: Column,
      firstValid: Option[LocalDate] = None)

  /** WindowsGroup (trends.py:476-482). */
  val windowsSlice: DataFrame => DataFrame =
    _.filter(col("OSName") === "Windows")

  /** WindowsVistaPlusGroup (trends.py:508-516): drops XP (5.1.x). */
  val vistaPlusSlice: DataFrame => DataFrame =
    df => windowsSlice(df).filter(!col("OSVersion").startsWith("5.1"))

  /** get_vendor (trends.py:164-170): first adapter's vendor with the
    * Intel OSTC merge, "unknown" when absent.
    */
  def vendorTrendCol: Column = {
    val v = try_element_at(col("adapters"), lit(1)).getField("vendorID")
    when(v.isNull, "unknown")
      .when(v === "Intel Open Source Technology Center", "0x8086")
      .otherwise(v)
  }

  /** get_compositor (trends.py:220-224) — unlike the dashboard's
    * classifier, no OMTC/advanced-layers rewriting.
    */
  def compositorTrendCol: Column =
    when(col("features").isNull, "none")
      .otherwise(coalesce(col("features").getField("compositor"), lit("none")))

  /** Compositor/d3d11/d2d ship date (Firefox 43 — trends.py:493-497,
    * 521-526, 536-540).
    */
  val FeatureMetricsShipDate: LocalDate = LocalDate.of(2015, 11, 15)

  /** get_gen (trends.py:183-188): vendor-filtered device→generation
    * lookup against the gfxdevices.json map (supplied as a local
    * fixture — the reference fetches it from GitHub at prepare time).
    */
  def deviceGenTrend(vendorId: String, vendorName: String,
      deviceToGen: Map[String, String]): TrendQuery = {
    val rawDevice = coalesce(
      try_element_at(col("adapters"), lit(1)).getField("deviceID"),
      lit("unknown"))
    val genCol =
      if (deviceToGen.isEmpty) lit("unknown")
      else coalesce(try_element_at(typedLit(deviceToGen), rawDevice),
        lit("unknown"))
    TrendQuery(s"trend-windows-device-gen-$vendorName",
      df => windowsSlice(df).filter(vendorTrendCol === vendorId),
      genCol)
  }

  /** The registered trend set (trends.py:614-630): FirefoxTrend plus the
    * Windows group, with the Vista+ subgroup and three device-generation
    * trends. `deviceMaps` is keyed by PCI vendor id.
    */
  def allTrends(deviceMaps: Map[String, Map[String, String]] = Map.empty)
      : Seq[TrendQuery] = Seq(
    TrendQuery("trend-firefox", identity,
      coalesce(col("FxVersion"), lit("unknown"))),
    TrendQuery("trend-windows-versions", windowsSlice, col("OSVersion")),
    TrendQuery("trend-windows-compositors", windowsSlice, compositorTrendCol,
      Some(FeatureMetricsShipDate)),
    TrendQuery("trend-windows-arch", windowsSlice, Dashboard.osBitsCol),
    TrendQuery("trend-windows-vendors", windowsSlice, vendorTrendCol),
    TrendQuery("trend-windows-d2d", vistaPlusSlice, Dashboard.d2dStatusCol,
      Some(FeatureMetricsShipDate)),
    TrendQuery("trend-windows-d3d11", vistaPlusSlice, Dashboard.d3d11StatusCol,
      Some(FeatureMetricsShipDate)),
    deviceGenTrend("0x8086", "intel", deviceMaps.getOrElse("0x8086", Map.empty)),
    deviceGenTrend("0x10de", "nvidia", deviceMaps.getOrElse("0x10de", Map.empty)),
    deviceGenTrend("0x1002", "amd", deviceMaps.getOrElse("0x1002", Map.empty)))

  /** One week's data point for one trend: the classifier frequency map
    * (Trend.query's countByKey as a grouped aggregation), None when the
    * slice is empty (Trend.update's no-pings early-out, trends.py:389-394).
    */
  def queryWeek(weekPings: DataFrame, tq: TrendQuery)
      : Option[Map[String, Double]] = {
    val sliced = tq.slice(weekPings)
    val counts = graft.jobs.analytics.Analytics.frequencyMap(sliced, tq.key)
    if (counts.isEmpty) None
    else Some(counts.map { case (k, v) => k -> v.toDouble })
  }

  /** Backfill every registered trend over date-partitioned pings:
    * `pingsForWeek(start, end)` supplies the week's normalized frame
    * (partition-pruned scan at scale). Respects each trend's ship date
    * on top of the global `firstValidDate`.
    */
  def updateAll(series: Map[String, TrendSeries], today: LocalDate,
      firstValidDate: LocalDate,
      pingsForWeek: (LocalDate, LocalDate) => DataFrame,
      deviceMaps: Map[String, Map[String, String]] = Map.empty)
      : Map[String, TrendSeries] =
    allTrends(deviceMaps).map { tq =>
      val existing = series.getOrElse(tq.name, TrendSeries(tq.name, Vector.empty))
      val firstValid = tq.firstValid.filter(_.isAfter(firstValidDate))
        .getOrElse(firstValidDate)
      tq.name -> update(existing, today, firstValid,
        (s, e) => queryWeek(pingsForWeek(s, e), tq))
    }.toMap
}
