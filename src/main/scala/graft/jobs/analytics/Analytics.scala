package graft.jobs.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared analytics operators for the graphics dashboard / trends jobs
  * (mozetl/graphics/graphics_telemetry_dashboard.py,
  * graphics_telemetry_trends.py).
  *
  * The reference leans on RDD `countByKey` / dict-merging `reduceByKey`
  * (dashboard.py:256-270 map_x_to_count/combiner) — driver-side histogram
  * materialization. Spark-first these are one `groupBy.count` (map-side
  * combined, scales with executors), with the driver touching only the
  * final small map.
  */
object Analytics {

  /** A9 map_x_to_count (dashboard.py:266-270): frequency map of a column. */
  def frequencyMap(df: DataFrame, keyCol: String): Map[String, Long] =
    frequencyMap(df, col(keyCol))

  /** Frequency map of an arbitrary expression (the dashboard's many
    * `pings.map(lambda p: (classify(p),)).countByKey()` passes — the
    * classifier becomes a codegen'd column, the histogram one grouped
    * aggregation).
    */
  def frequencyMap(df: DataFrame, key: Column): Map[String, Long] =
    df.groupBy(key.cast("string").as("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** mozetl/main.py:28-30 transform_pings: OS share over DISTINCT
    * (client, os) rows — the duplicate-ping dedup happens before the
    * histogram (mirrored by tests/test_main.py's duplicate_rdd case).
    */
  def osShare(pings: DataFrame, clientCol: String = "client_id",
      osCol: String = "os"): Map[String, Long] =
    frequencyMap(pings.select(clientCol, osCol).distinct(), osCol)

  /** Per-key share of total (the dashboard's percentage panels). */
  def shareMap(df: DataFrame, keyCol: String): Map[String, Double] = {
    val counts = frequencyMap(df, keyCol)
    val total = counts.values.sum.toDouble
    counts.map { case (k, v) => k -> v / total }
  }

  /** Two-level frequency: superkey → (variable → count), the shape fed to
    * coalesce_to_n_items (dashboard.py:272-292). One shuffle, not an RDD
    * dict-combiner.
    */
  def nestedFrequency(df: DataFrame, superCol: String,
      varCol: String): Seq[(String, Map[String, Long])] =
    df.groupBy(col(superCol).cast("string").as("sk"),
      col(varCol).cast("string").as("vk"))
      .count().collect()
      .groupBy(_.getString(0))
      .map { case (sk, rows) =>
        sk -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }.toSeq

  /** O5 coalesce_to_n_items (dashboard.py:278-292): keep the top
    * `maxItems` per superkey, fold the tail into "Other".
    */
  def coalesceToNItems(agg: Seq[(String, Map[String, Long])],
      maxItems: Int): Seq[(String, Map[String, Long])] =
    agg.map { case (superkey, breakdown) =>
      if (breakdown.size <= maxItems) superkey -> breakdown
      else {
        val sorted = breakdown.toSeq.sortBy { case (k, v) => (-v, k) }
        val kept = sorted.take(maxItems).toMap
        val tail = sorted.drop(maxItems).map(_._2).sum
        superkey -> (if (tail > 0)
          kept + ("Other" -> (kept.getOrElse("Other", 0L) + tail))
        else kept)
      }
    }

  /** Weekly tumbling chunks of a date range (trends do_update /
    * summarize_json.py:601-640): [start, start+7), … until end.
    */
  def weeklyChunks(startDate: java.time.LocalDate,
      endDate: java.time.LocalDate): Seq[(java.time.LocalDate, java.time.LocalDate)] =
    Iterator.iterate(startDate)(_.plusDays(7))
      .takeWhile(_.isBefore(endDate))
      .map(s => s -> Seq(s.plusDays(7), endDate).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay)))
      .toSeq

  /** Trend point: per-week share of rows matching a predicate — the
    * Trend.query/update cycle (graphics_telemetry_trends.py:337-463) as a
    * single grouped aggregation over the whole range instead of a
    * driver-side weekly loop. `weekCol` should be a yyyy-MM-dd week-start
    * string column.
    */
  def weeklyShares(df: DataFrame, weekCol: Column,
      predicate: Column): DataFrame =
    df.groupBy(weekCol.as("week"))
      .agg(count(lit(1)).as("total"),
        sum(when(predicate, 1L).otherwise(0L)).as("matching"))
      .withColumn("share", col("matching").cast("double") / col("total"))
      .orderBy("week")
}
