package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing-window anomaly detection: z-score each point against the
  * preceding `lookback` points of its key (the point itself excluded, so
  * an outlier can't mask itself), flag |z| > threshold.
  *
  * Engine-portable by construction: the window sums (Σx, Σx²) run in
  * DECIMAL — exact and summation-order-free, unlike float window sums —
  * and only convert to double for the closing mean/variance/ratio, a
  * fixed sequence of correctly-rounded IEEE ops. x² at DECIMAL(18,2)
  * squares into scale 4 exactly; both engines' decimal→double conversion
  * of these ≤15-digit sums is the single correctly-rounded step the dsum
  * gates already rely on.
  *
  * One window partition per key (single exchange), sorted by the caller's
  * unique ordering columns.
  */
object Anomaly {

  /** Adds `n_window`, `z` (null until `minN` points precede, or when the
    * window variance is 0) and `is_anomaly` ∈ {0,1}.
    */
  def trailingZScore(df: DataFrame, keyCol: String, ordCols: Seq[String],
      valueCol: String, lookback: Int = 24, minN: Int = 8,
      threshold: Double = 3.0): DataFrame = {
    require(lookback >= 2 && minN >= 2 && minN <= lookback,
      "need 2 <= minN <= lookback")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(ordCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    val xDec = col(valueCol).cast(DecimalType(18, 2))
    // count the VALUE column, not rows: the Σx/Σx² sums skip NULLs, so a
    // row count would deflate mean/variance (divide by too-large n) and
    // bias z toward 0, silently suppressing anomalies after gaps
    val n = count(xDec).over(w)
    val sx = sum(xDec).over(w)
    val sx2 = sum(xDec * xDec).over(w)
    val nD = col("__n").cast("double")
    val mean = col("__sx").cast("double") / nD
    val variance = (col("__sx2").cast("double") / nD - mean * mean) *
      (nD / (nD - lit(1.0)))
    val z = when(col("__n") >= minN && variance > 0,
      (col(valueCol) - mean) / sqrt(variance))
    df.withColumn("__n", n).withColumn("__sx", sx).withColumn("__sx2", sx2)
      .withColumn("n_window", col("__n"))
      .withColumn("z", z)
      .withColumn("is_anomaly",
        (coalesce(abs(col("z")), lit(0.0)) > threshold).cast("int"))
      .drop("__n", "__sx", "__sx2")
  }

  /** Φ⁻¹(3/4): scales MAD to estimate σ for Gaussian data, making
    * robust_z comparable with an ordinary z-score.
    */
  val MadScale: Double = 0.6745

  /** Robust per-group z-scores: median/MAD instead of mean/σ, so up to
    * half the group can be wild without distorting the score of the
    * rest (mean/σ z-scores suffer masking: one huge outlier inflates σ
    * and hides every other one).
    *
    * robust_z = MadScale · (x − median) / MAD, NULL when MAD = 0 (at
    * least half the group sits exactly on the median — no scale to
    * judge against).
    *
    * Two exact interpolated percentile aggregations (the q38 oracle
    * contract) + two joins of the ≤|groups|-row stats back onto rows —
    * AQE broadcasts them below the threshold. Same scale caveat as
    * q38: exact percentile holds a per-group value map; for
    * billion-distinct-value groups switch to approx_percentile and
    * lose the oracle, not the API.
    */
  def robustZ(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "robustZ needs at least one key column")
    val g = keyCols.map(col)
    val med = df.groupBy(g: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val dev = df.join(med, keyCols)
    val mad = dev.groupBy(g: _*)
      .agg(expr(s"percentile(abs($valueCol - __med), 0.5)").as("__mad"))
    dev.join(mad, keyCols)
      .withColumn("robust_z",
        when(col("__mad") > 0,
          lit(MadScale) * (col(valueCol) - col("__med")) / col("__mad")))
      .withColumnRenamed("__med", "grp_median")
      .withColumnRenamed("__mad", "grp_mad")
  }
}
