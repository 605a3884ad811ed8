package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ROC-AUC as a distributed aggregation — the evaluation half of a
  * model-based filtering pipeline (a quality classifier like t26's is
  * only trustworthy with a measured ranking quality; AUC is the
  * standard threshold-free metric).
  *
  * Formulation: AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)
  * (Mann–Whitney U). Instead of the textbook global rank — a
  * single-partition sort bottleneck at scale — scores are first
  * COMPRESSED to per-score (positives, negatives) counts by one grouped
  * aggregation (map-side combined: the shuffle carries distinct scores,
  * not rows), then one cumulative window over that compressed table
  * accumulates the negatives below each score. For quantized scores
  * (micro-nat longs, calibrated permilles) the window input is tiny; a
  * continuous double score degrades gracefully to ≤ one row per
  * distinct value.
  *
  * Tie handling is exact rational arithmetic: the numerator is kept in
  * HALF-units (u2 = Σ_s p(s)·(2·cumNeg(s) + n(s)), a long), so ties
  * contribute exactly ½ each and the only float op is the final
  * division — the whole metric replays bitwise in SQL (gate q52).
  *
  * Degenerate groups (no positives or no negatives) yield auc = NULL
  * with the counts still reported.
  */
object Auc {

  /** Per-group AUC. `labelCol` must be boolean or 0/1-numeric (true/1 =
    * positive). Output: groupCols ++ (n_pos, n_neg, u2, auc).
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    val isPos = col(labelCol).cast("boolean")
    val g = groupCols.map(col)
    val perScore = df
      .groupBy(g :+ col(scoreCol).as("__s"): _*)
      .agg(sum(when(isPos, 1L).otherwise(0L)).as("p"),
        sum(when(isPos, 0L).otherwise(1L)).as("n"))
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(g: _*))
      .orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = perScore
      .withColumn("__cumn", coalesce(sum(col("n")).over(w), lit(0L)))
    val totals =
      (if (groupCols.isEmpty) withCum.groupBy()
       else withCum.groupBy(g: _*))
        .agg(sum("p").as("n_pos"), sum("n").as("n_neg"),
          sum(col("p") * (lit(2L) * col("__cumn") + col("n"))).as("u2"))
    totals.select(g ++ Seq(col("n_pos"), col("n_neg"), col("u2"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        col("u2").cast("double")
          / (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc")): _*)
  }

  /** Average precision (area under the precision–recall curve, the
    * step/sklearn formulation: AP = Σ_thresholds Δrecall·precision) —
    * the metric that matters when positives are rare and ROC-AUC is
    * optimistically flat.
    *
    * Same compressed shape as [[auc]]: per-score counts, cumulative
    * window over distinct scores DESCENDING. Precision at each
    * threshold is quantized to integer MICRO-units
    * (prec_micro = cumP·10⁶ div (cumP+cumN) — exact long arithmetic,
    * the micro-nat house pattern), so each threshold's contribution
    * p·prec_micro is a long, the total is an order-free exact sum
    * (Decimal(38,0)), and the single closing division replays bitwise
    * (gate q56). The quantization moves AP by < 10⁻⁶ — far below any
    * decision threshold; a perfect ranking still scores exactly 1.0.
    * Safe to ~9·10¹² rows per group (p·prec_micro < 2⁶³).
    *
    * Output: groupCols ++ (n_pos, n_neg, ap); ap is NULL when the
    * group has no positives.
    */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    val isPos = col(labelCol).cast("boolean")
    val g = groupCols.map(col)
    val perScore = df
      .groupBy(g :+ col(scoreCol).as("__s"): _*)
      .agg(sum(when(isPos, 1L).otherwise(0L)).as("p"),
        sum(when(isPos, 0L).otherwise(1L)).as("n"))
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(g: _*))
      .orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = perScore
      .withColumn("__cump", sum(col("p")).over(w))
      .withColumn("__cumn", sum(col("n")).over(w))
      .withColumn("__prec",
        expr("(__cump * 1000000L) div (__cump + __cumn)"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val totals =
      (if (groupCols.isEmpty) withCum.groupBy()
       else withCum.groupBy(g: _*))
        .agg(sum("p").as("n_pos"), sum("n").as("n_neg"),
          sum((col("p") * col("__prec")).cast(dec)).as("__apsum"))
    totals.select(g ++ Seq(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0,
        col("__apsum").cast("double")
          / (lit(1000000.0) * col("n_pos").cast("double")))
        .as("ap")): _*)
  }
}
