package graft.jobs.graphics

import java.time.{DayOfWeek, LocalDate}

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
}
