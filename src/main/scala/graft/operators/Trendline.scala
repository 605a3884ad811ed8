package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group least-squares trend line — the "is this metric drifting,
  * and how fast" answer as a NUMBER (slope per unit of x) where X23's
  * EWMA gives a smoothed level and X107's CUSUM a change location. The
  * reference's graphics trends job extrapolates weekly series by eye;
  * this is the fitted version: slope, intercept, and R² per key, from
  * one moments pass.
  *
  * Same exactness machinery as CUPED (X104): x and y quantize at
  * `quantScale` (micro default; MILLI when products × n would cross
  * the 2⁵³ cross-engine cast bound — see Cuped.adjustedMeans), the
  * five moments are DECIMAL sums of exact longs, and
  * slope = cov/var(x), intercept = ȳ − slope·x̄, R² = cov²/(varx·vary)
  * are fixed IEEE shapes over them. NULL slope/intercept when var(x)
  * is 0 (vertical or single-point groups); R² additionally needs
  * var(y) > 0.
  *
  * Scale: ONE map-side-combined moments aggregation — rows never
  * shuffle, only |groups| sufficient-statistic cells.
  */
object Trendline {

  def fit(df: DataFrame, groupCol: String, xCol: String, yCol: String,
      quantScale: Double = 1000000.0): DataFrame = {
    val x = Quant.fixedPoint(col(xCol), quantScale)
    val y = Quant.fixedPoint(col(yCol), quantScale)
    val m = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    def d(name: String): Column = col(name).cast("double")
    val n = d("n")
    val covN = d("sxy") - d("sx") * d("sy") / n
    val varXN = d("sxx") - d("sx") * d("sx") / n
    val varYN = d("syy") - d("sy") * d("sy") / n
    val slope = when(varXN > 0.0, covN / varXN)
    // slope is dimensionless in the quantized space (scale cancels);
    // intercept returns to y units
    val intercept = when(varXN > 0.0,
      (d("sy") / n - (covN / varXN) * (d("sx") / n)) / lit(quantScale))
    val r2 = when(varXN > 0.0 && varYN > 0.0,
      covN * covN / (varXN * varYN))
    m.select(col(groupCol), col("n"), slope.as("slope"),
      intercept.as("intercept"), r2.as("r2"))
  }
}
