package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification (resample + gap fill): bucket events by a
  * calendar unit, emit one row per key per bucket across the key's whole
  * observed range, and carry the last observed value forward through the
  * empty buckets — the standard "resample().ffill()" shape dashboards and
  * feature pipelines need, expressed as three narrow Spark stages.
  *
  * Plan shape: one grouped aggregation (events → buckets), one tiny
  * per-key range aggregation, a `sequence` explode to build the grid
  * (never a cross join against a calendar table), a left join back, and
  * one window for the carry-forward. Everything shuffles on the key: at
  * 100 TB the grid is |keys| × |buckets| rows regardless of event count,
  * and the window partitions by key, so skew follows the keyset exactly
  * like any grouped aggregate (AQE applies).
  */
object GapFill {

  private val Units = Set("minute", "hour", "day", "week")

  /** One row per (key, bucket) over each key's [min, max] bucket range:
    * `n_events` (0 in gaps), `value_sum` (exact DECIMAL(18,2) sum of
    * `valueCol`, exposed as double, carried forward through gaps — null
    * until the key's first observation), and `gap` ∈ {0,1}.
    */
  def carryForwardResample(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, unit: String = "hour"): DataFrame = {
    require(Units.contains(unit),
      s"unit must be one of ${Units.mkString(", ")} (got '$unit')")
    val agg = df
      .select(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"),
        col(valueCol))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("vs"))
    val grid = agg.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col(keyCol),
        explode(expr(s"sequence(lo, hi, interval 1 $unit)")).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("vs"), ignoreNulls = true).over(w).as("value_sum"),
        (coalesce(col("n_events"), lit(0L)) === 0).cast("int").as("gap"))
  }
}
