package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spearman rank correlation as a distributed aggregation — "do two
  * scoring methods rank the corpus the same way?" (comparing a new
  * quality model against the incumbent is a routine gate decision in a
  * filtering pipeline, and Pearson on raw scores is distorted by their
  * arbitrary scales; Spearman compares the induced ORDERINGS).
  *
  * No global row sort: each variable's average ranks come from its
  * COMPRESSED per-value counts — one map-side-combined groupBy(value),
  * one cumulative window over the distinct-value table — and join back
  * to rows by value. Ties get textbook average ranks kept exact in
  * HALF-units: rank2 = 2·(#values below) + (#ties) + 1, a long.
  *
  * All moment sums run in Decimal(38,0) — exact and summation-order-
  * free where a double SUM is neither. Because Σrank2 is the constant
  * n·(n+1) (ties preserve the total), the centered moments need no
  * sum-times-sum products: num = Sxy − n·(n+1)², and every intermediate
  * stays within 38 digits for n up to ~2·10¹² rows. The final ρ is a
  * handful of IEEE ops over exactly-computed integers, so the whole
  * statistic replays bitwise in SQL (gate q54).
  *
  * Degenerate groups (either variable constant ⇒ zero variance) yield
  * rho = NULL with n still reported.
  */
object RankCorr {

  private val Dec = DecimalType(38, 0)

  /** (groupCols..., `valueCol`, rank2) for each distinct value. */
  private def rank2Table(df: DataFrame, valueCol: String,
      groupCols: Seq[String], out: String): DataFrame = {
    val g = groupCols.map(col)
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(g: _*))
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.groupBy(g :+ col(valueCol): _*).agg(count(lit(1)).as("__c"))
      .withColumn("__below", coalesce(sum(col("__c")).over(w), lit(0L)))
      .select(g :+ col(valueCol) :+
        (lit(2L) * col("__below") + col("__c") + 1L).as(out): _*)
  }

  /** Per-group Spearman ρ of `xCol` vs `yCol`.
    * Output: groupCols ++ (n, rho).
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    val g = groupCols.map(col)
    val rx = rank2Table(df, xCol, groupCols, "__rx2")
    val ry = rank2Table(df, yCol, groupCols, "__ry2")
    val ranked = df
      .join(rx, groupCols :+ xCol)
      .join(ry, groupCols :+ yCol)
      .select(g :+ col("__rx2").cast(Dec).as("rx") :+
        col("__ry2").cast(Dec).as("ry"): _*)
    val sums =
      (if (groupCols.isEmpty) ranked.groupBy() else ranked.groupBy(g: _*))
        .agg(count(lit(1)).as("n"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"),
          sum(col("rx") * col("ry")).as("sxy"))
    // centered moments: Σrank2 = n·(n+1) exactly, so center = n·(n+1)²
    val center = (col("n").cast(Dec)
      * (col("n") + 1L).cast(Dec) * (col("n") + 1L).cast(Dec))
    val num = (col("sxy") - center).cast("double")
    val vx = (col("sxx") - center).cast("double")
    val vy = (col("syy") - center).cast("double")
    sums.select(g :+ col("n") :+
      when(col("sxx") =!= center && col("syy") =!= center,
        num / (sqrt(vx) * sqrt(vy))).as("rho"): _*)
  }
}
