package graft.jobs.graphics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.jobs.analytics.Analytics

/** Graphics hardware dashboard statistics, ported from
  * mozetl/graphics/graphics_telemetry_dashboard.py:398-437
  * (get_general_statistics and its per-Firefox-version breakdown).
  *
  * Spark-first: the reference runs ~30 RDD countByKey passes, one per
  * panel, re-filtering + repartitioning per Firefox version
  * (dashboard.py:426-433). Here each panel family is ONE grouped
  * aggregation: the per-version breakdown comes from grouping by
  * (FxVersion, dimension) instead of a driver loop over filtered RDDs —
  * one shuffle for all versions instead of one job per version.
  */
object Dashboard {

  /** General panel: device and driver frequency maps
    * (dashboard.py:419-421).
    */
  def generalStatistics(pings: DataFrame): Map[String, Map[String, Long]] =
    Map(
      "devices" -> Analytics.frequencyMap(pings, "deviceID"),
      "drivers" -> Analytics.frequencyMap(pings, "driverVersion"))

  /** Per-subset panel: OS share, Windows-version share, vendor share
    * (dashboard.py:405-415).
    */
  def subsetStatistics(subset: DataFrame): Map[String, Map[String, Long]] = {
    val windows = subset.filter(col("OSName") === "Windows")
    Map(
      "os" -> Analytics.frequencyMap(subset, "OSName"),
      "windows" -> Analytics.frequencyMap(windows, "OSVersion"),
      "vendors" -> Analytics.frequencyMap(subset, "vendorID"))
  }

  /** The byFx breakdown (dashboard.py:423-433) as single grouped passes:
    * one (FxVersion × dimension) aggregation per panel, driver assembles
    * the nested map.
    */
  def statisticsByFxVersion(pings: DataFrame)
      : Map[String, Map[String, Map[String, Long]]] = {
    def nested(df: DataFrame, dim: String) =
      Analytics.nestedFrequency(df, "FxVersion", dim).toMap
    val os = nested(pings, "OSName")
    val vendors = nested(pings, "vendorID")
    val windows = nested(pings.filter(col("OSName") === "Windows"), "OSVersion")
    (os.keySet ++ vendors.keySet).map { fx =>
      fx -> Map(
        "os" -> os.getOrElse(fx, Map.empty),
        "windows" -> windows.getOrElse(fx, Map.empty),
        "vendors" -> vendors.getOrElse(fx, Map.empty))
    }.toMap
  }
}
