package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUPED — variance-reduced experiment readout (Deng, Xu, Kohavi &
  * Walker, WSDM 2013: "Improving the Sensitivity of Online Controlled
  * Experiments by Utilizing Pre-Experiment Data"). The reference's
  * experiment jobs (`experimentsdaily/`) produce per-branch frames; the
  * production question on top of them — "did the branch move the
  * metric, with the pre-period explaining away user-level variance?" —
  * is this operator. y' = y − θ(x − x̄) with θ = cov(x,y)/var(x) pooled
  * across variants removes the between-user variance the covariate
  * predicts, shrinking CIs by 1 − ρ² with zero bias (θ is the same
  * constant for every variant).
  *
  * Exactness discipline (the welchT convention): unit-level metric and
  * covariate quantize to integer micro-units; all five moments
  * (n, Σx, Σy, Σxy, Σx², Σy²) are DECIMAL sums of exact longs —
  * order-free where double accumulation is partitioning-dependent. θ,
  * ρ², and the adjusted means are a fixed IEEE op sequence over those
  * exact integers, so the readout replays bit-identically in any
  * engine.
  *
  * Scale: ONE map-side-combined moments aggregation per variant (rows
  * never shuffle — only |variants| sufficient-statistic cells move);
  * the pooled 1-row frame broadcast-crosses back onto the
  * |variants|-row frame. No windows, no sorts, no unit-level joins.
  *
  * Output: (variantCol, n, mean_x, mean_y, theta, rho2, adj_mean).
  * theta/rho2 are the POOLED estimates (identical on every row — kept
  * per-row so the readout is self-contained); adj_mean is NULL only
  * when var(x) = 0 (no covariate signal → CUPED degenerates to the raw
  * mean, which mean_y still carries).
  */
object Cuped {

  /** `quantScale` — quantization granularity (10⁶ = micro-units, the
    * welchT default). BIT-replay across engines additionally requires
    * the pooled product moments Σ(x·y·scale²) to stay below 2⁵³:
    * integers past that round when cast to double, and engines
    * disagree on the rounding (DuckDB's HUGEINT→DOUBLE cast is not
    * correctly rounded — observed 1-ulp-of-2⁵³-scale drift at ~4·10²⁰).
    * For unit metrics in the thousands over 10²+ units, pass 10³
    * (milli-units): the 0.001 rounding is deterministic and the
    * moments stay exactly representable.
    */
  def adjustedMeans(units: DataFrame, variantCol: String,
      covariateCol: String, metricCol: String,
      quantScale: Double = 1000000.0): DataFrame = {
    val x = Quant.fixedPoint(col(covariateCol), quantScale)
    val y = Quant.fixedPoint(col(metricCol), quantScale)
    val perVariant = units
      .filter(col(covariateCol).isNotNull && col(metricCol).isNotNull)
      .groupBy(col(variantCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val pooled = perVariant.agg(
      sum("n").as("gn"), sum("sx").as("gsx"), sum("sy").as("gsy"),
      sum("sxy").as("gsxy"), sum("sxx").as("gsxx"), sum("syy").as("gsyy"))

    // fixed IEEE op sequence over exact integers — mirrored in oracles
    def d(name: String): Column = col(name).cast("double")
    val gn = d("gn")
    val covN = d("gsxy") - d("gsx") * d("gsy") / gn
    val varXN = d("gsxx") - d("gsx") * d("gsx") / gn
    val varYN = d("gsyy") - d("gsy") * d("gsy") / gn
    val theta = when(varXN > 0.0, covN / varXN)
    val rho2 = when(varXN > 0.0 && varYN > 0.0,
      covN * covN / (varXN * varYN))
    val meanX = d("sx") / d("n") / lit(quantScale)
    val meanY = d("sy") / d("n") / lit(quantScale)
    val adj = meanY -
      theta * (d("sx") / d("n") - d("gsx") / gn) / lit(quantScale)
    perVariant.crossJoin(broadcast(
        pooled.select(col("gn"), col("gsx"), col("gsy"), col("gsxy"),
          col("gsxx"), col("gsyy"))))
      .select(col(variantCol), col("n"),
        meanX.as("mean_x"), meanY.as("mean_y"),
        theta.as("theta"), rho2.as("rho2"), adj.as("adj_mean"))
  }
}
