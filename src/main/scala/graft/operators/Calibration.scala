package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score calibration — the reliability curve of a classifier score
  * against binary outcomes, plus its isotonic (monotone) fit: the QA
  * step between "the quality model emits scores" and "we threshold
  * those scores to keep/drop petabytes" (a miscalibrated threshold
  * silently shifts the kept-data distribution; X37's pruning and t19's
  * buckets both assume score order means something).
  *
  * Binning: exact integer equal-width bins over [lo, hi] of the
  * long-castable score — the PSI formula (`Divergence.psi`), so bin
  * assignment replays bitwise in any engine. Per occupied bin: n,
  * n_pos, rate = n_pos/n (ONE double division of exact integers).
  *
  * Isotonic fit WITHOUT a driver-side PAV loop: the minimax
  * characterization fitted(k) = max_{i ≤ k} min_{j ≥ k} avg(i..j),
  * where avg(i..j) is the pooled positive rate of bins i..j off
  * cumulative sums. That is an O(B²) interval frame — B is the bin
  * count (≤ 1000), NOT the data size, so the whole fit rides DataFrame
  * ops: one cumulative window over B rows, one bin-pair join, one
  * suffix-min window per left endpoint, one grouped max. Every
  * interval average is the same double division of the same exact
  * integers in any engine, and min/max over identical doubles are
  * identical — the fit is bit-portable, which a sequential PAV pooling
  * (whose pool averages are DIFFERENT integer pairs) would not
  * guarantee.
  *
  * Input rows with NULL score or label are excluded; any non-zero
  * label counts as positive.
  */
object Calibration {

  /** Per occupied bin, ordered: (bin, n, n_pos, rate, fitted) with
    * `fitted` the isotonic (nondecreasing in bin) calibrated rate.
    */
  def isotonicCurve(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000]: $bins")
    val v = df
      .select(col(scoreCol).cast("long").as("v"),
        col(labelCol).cast("long").as("y"))
      .filter(col("v").isNotNull && col("y").isNotNull)
    val bounds = v.agg(min("v").as("lo"), max("v").as("hi"))
    val g = v.crossJoin(broadcast(bounds))
      .select(
        when(col("hi") > col("lo"),
          expr(s"((v - lo) * $bins) div (hi - lo + 1)"))
          .otherwise(lit(0L)).as("bin"),
        when(col("y") =!= 0L, 1L).otherwise(0L).as("pos"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
    // everything below operates on ≤ `bins` rows — the single-partition
    // cumulative window is bounded by construction, not by the data
    val cum = g.select(col("bin"), col("n"), col("n_pos"),
      sum("n").over(Window.orderBy("bin")).as("cn"),
      sum("n_pos").over(Window.orderBy("bin")).as("cp"))
    val left = cum.select(col("bin").as("bi"),
      (col("cn") - col("n")).as("cn0"), (col("cp") - col("n_pos")).as("cp0"))
    val right = cum.select(col("bin").as("bj"),
      col("cn").as("cn1"), col("cp").as("cp1"))
    val intervals = left.join(right, col("bi") <= col("bj"))
      .select(col("bi"), col("bj"),
        ((col("cp1") - col("cp0")).cast("double") /
          (col("cn1") - col("cn0")).cast("double")).as("a"))
    val suffixMin = intervals.select(col("bi"), col("bj"),
      min("a").over(Window.partitionBy("bi").orderBy(col("bj").desc))
        .as("mmin"))
    val fit = suffixMin
      .select(col("bj").as("bin"), col("mmin"))
      .groupBy("bin").agg(max("mmin").as("fitted"))
    g.join(fit, "bin")
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("rate"),
        col("fitted"))
  }
}
