package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (JASA 1958) — "how long do users
  * stay / documents survive curation / sessions last" with CENSORING
  * handled correctly: a subject still alive at the observation edge is
  * not a death, and dropping or death-counting them (what a naive
  * duration histogram does) biases lifetime estimates the way every
  * retention dashboard quietly discovers. X25's cohort retention is the
  * calendar-bucketed special case; KM is the general estimator.
  *
  * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event times, with nᵢ
  * the at-risk count (duration ≥ tᵢ) and dᵢ the deaths at tᵢ.
  *
  * Determinism: the product becomes a SUM in log space — each factor is
  * ln((nᵢ−dᵢ)/nᵢ) over EXACT integer counts, quantized to micro-nats
  * (the UnigramLm ln discipline), and the cumulative sum runs over the
  * ORDERED distinct-time table, so `ls_micro` is exact and `survival` is
  * one exp(double) per row. When a time's deaths exhaust its risk set
  * (the last subject dies), S hits exactly 0 and ls_micro is NULL from
  * there on (−∞ has no integer encoding; survival is emitted as 0.0).
  *
  * Scale: one aggregation compresses subjects to per-duration (deaths,
  * censored) counts; everything after — the at-risk prefix, the log
  * terms, the cumulative sum — is windows over the |distinct durations|
  * table. Subjects never shuffle twice, and the curve table is
  * distribution-sized, not subject-sized.
  */
object Survival {

  /** KM curve per `groupCols` stratum (empty = one curve). Input: one
    * row per subject with `durationCol` (non-negative, integral or
    * fractional) and `eventCol` (1 = event observed, 0 = censored).
    * Output rows at each distinct time with ≥ 1 death:
    * (groupCols*, t, n_risk, n_events, ls_micro, survival).
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    val gcols = groupCols.map(col)
    val perT = df.filter(col(durationCol).isNotNull)
      .groupBy((gcols :+ col(durationCol).as("t")): _*)
      .agg(count(lit(1)).as("__all"),
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("n_events"))
    val w0 = if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(gcols: _*)
    val byT = w0.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = sum("__all").over(w0
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    // at risk at t: everyone whose duration >= t
    val atRisk = total - (sum("__all").over(byT) - col("__all"))
    val term = when(col("n_events") < col("n_risk"),
      floor(log((col("n_risk") - col("n_events")).cast("double") /
          col("n_risk").cast("double")) * lit(1000000.0) + lit(0.5))
        .cast("long"))
    perT
      .withColumn("n_risk", atRisk)
      .filter(col("n_events") > 0)
      .withColumn("__term", term)
      // a NULL term (deaths exhausted the risk set — necessarily the
      // last death time) must pin THIS row to S = 0; the windowed sum
      // skips NULLs, so guard explicitly rather than let the row
      // inherit the previous step's survival
      .withColumn("__ls", sum("__term").over(byT))
      .select((gcols :+ col("t") :+ col("n_risk") :+ col("n_events") :+
        when(col("__term").isNotNull, col("__ls")).as("ls_micro") :+
        // exp, like ln, is ±1 ulp across libms — quantize the emitted
        // probability to nano-units so both sides of an oracle agree
        when(col("__term").isNotNull,
          floor(exp(col("__ls").cast("double") / lit(1000000.0)) *
            lit(1.0e9) + lit(0.5)) / lit(1.0e9))
          .otherwise(lit(0.0)).as("survival")): _*)
  }
}
