package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per key — the smoothing step
  * after resample+ffill in a feature pipeline. s_i = α·v_i + (1-α)·s_{i-1}
  * with s_0 = v_0 over the key's ordered series.
  *
  * Expressed as an ordered higher-order fold (collect → array_sort →
  * aggregate), NOT a UDF and NOT an unordered float aggregate: the fold
  * order is pinned by the sort, every op is exact-per-op IEEE, so the
  * result is bit-identical on any engine/partitioning. The recursion
  * makes EWMA inexpressible as a plain window function; the fold is the
  * declarative alternative.
  *
  * Scale note: the per-key series materializes in one aggregation buffer
  * (like any collect_list analytic) — right for bounded series (per-key
  * bucket counts after resampling). For unbounded series, checkpoint the
  * level periodically and fold per chunk: s carries across chunks by the
  * same recurrence.
  */
object Ewma {

  /** One row per key: the series length and the final smoothed level.
    * `ordCol` must be unique per key (it pins the fold order). Null
    * observations are SKIPPED before the fold — a single null would
    * otherwise poison the whole key's result (null seed or null step
    * propagates through every remaining iteration); `n_points` counts the
    * observations actually folded.
    */
  def latest(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val sorted = array_sort(
      collect_list(struct(col(ordCol).as("o"), col(valueCol).as("v"))))
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sorted.as("__s"))
      .select(col(keyCol),
        size(col("__s")).cast("long").as("n_points"),
        aggregate(
          slice(col("__s"), lit(2), greatest(size(col("__s")) - 1, lit(0))),
          element_at(col("__s"), 1).getField("v"),
          (acc, x) => lit(alpha) * x.getField("v") + lit(1.0 - alpha) * acc)
          .as("ewma"))
  }
}
