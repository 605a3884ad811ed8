package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Holt's linear (double exponential) smoothing per key — the trend rung
  * above X23's EWMA: level AND slope evolve together,
  *   l_i = α·v_i + (1−α)·(l_{i−1} + b_{i−1})
  *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}
  * seeded l_0 = v_0, b_0 = 0, so "where is this metric heading" gets an
  * h-step forecast l + h·b instead of a flat carry-forward — the weekly
  * trends the reference's graphics dashboard extrapolates
  * (`graphics/trends.py`), done as an operator.
  *
  * Same determinism contract as Ewma.latest: an ordered higher-order
  * fold (collect → array_sort → aggregate) whose op sequence is pinned
  * by the sort; the coupled recurrence carries a (level, trend) STRUCT
  * accumulator — still fold-expressible, still engine-portable (DuckDB
  * replays it with a struct-element list_reduce whose head seed is
  * COALESCE-normalized to the same l_0/b_0). l_i appears in both update
  * equations; both engines compute the identical expression twice,
  * which is bit-stable where factoring it through a temporary would
  * invite re-association.
  *
  * Scale: one aggregation buffer per key, like any collect_list
  * analytic — for unbounded series, chunk with carried (l, b) exactly
  * as Ewma.latestChunked carries its level (the recurrence is affine in
  * (l, b), so the chunk seed is the previous chunk's final pair).
  */
object Holt {

  /** One row per key: (keyCol, n_points, level, trend,
    * forecast = level + horizon·trend). Null observations are skipped
    * before the fold (the Ewma convention); single-point keys get
    * level = v_0, trend = 0.
    */
  def latest(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, alpha: Double, beta: Double,
      horizon: Int = 1): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0, 1], got $beta")
    require(horizon >= 0, s"horizon must be >= 0, got $horizon")
    val sorted = array_sort(
      collect_list(struct(col(ordCol).as("o"), col(valueCol).as("v"))))
    def newLevel(acc: Column, x: Column): Column =
      lit(alpha) * x.getField("v") +
        lit(1.0 - alpha) * (acc.getField("l") + acc.getField("b"))
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sorted.as("__s"))
      .select(col(keyCol),
        size(col("__s")).cast("long").as("n_points"),
        aggregate(
          slice(col("__s"), lit(2), greatest(size(col("__s")) - 1, lit(0))),
          struct(element_at(col("__s"), 1).getField("v").as("l"),
            lit(0.0).as("b")),
          (acc, x) => struct(
            newLevel(acc, x).as("l"),
            (lit(beta) * (newLevel(acc, x) - acc.getField("l")) +
              lit(1.0 - beta) * acc.getField("b")).as("b")))
          .as("__r"))
      .select(col(keyCol), col("n_points"),
        col("__r.l").as("level"), col("__r.b").as("trend"),
        (col("__r.l") + lit(horizon.toDouble) * col("__r.b"))
          .as("forecast"))
  }
}
