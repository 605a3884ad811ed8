package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini coefficient — corpus-balance diagnostics: how unequally are
  * tokens/bytes/documents spread over sources, domains, or shards?
  * A training mix with Gini → 1 is one domain wearing a trench coat
  * (and a shard layout with Gini → 1 is a skew problem X-salting
  * should have fixed); the temperature/budget mixers (X18/X28/X31) are
  * the knobs, this is the gauge they're tuned against.
  *
  * G = (2·Σᵢ i·x₍ᵢ₎) / (n·Σx) − (n+1)/n over ascending-sorted values —
  * computed WITHOUT sorting rows: values compress to per-value counts,
  * and a run of c equal values v after p predecessors contributes rank
  * mass v·(c·p + c(c+1)/2) — exact integer arithmetic off ONE window
  * over the |distinct values| table (the X95 compressed-rank
  * discipline). The final statistic is a fixed-shape expression of
  * exact longs; values must be non-negative integers (token counts,
  * bytes — quantize upstream if fractional).
  *
  * Output: (groupCols*, n, total, rank_mass, gini) with
  * gini = (2·rank_mass)/(n·total) − (n+1)/n, NULL when total = 0.
  */
object Inequality {

  def gini(df: DataFrame, valueCol: String,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    val gcols = groupCols.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((gcols :+ col(valueCol).cast("long").as("v")): _*)
      .agg(count(lit(1)).as("c"))
    val w0 = if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(gcols: _*)
    val byV = w0.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withP = counts.withColumn("p", sum("c").over(byV) - col("c"))
    // integral div (c(c+1) is even — exact), not `/` (double division)
    val mass = col("v") *
      (col("c") * col("p") + expr("c * (c + 1L) div 2L"))
    val agg = withP
      .groupBy(gcols: _*)
      .agg(sum("c").as("n"), sum(col("v") * col("c")).as("total"),
        sum(mass).as("rank_mass"))
    agg.select((gcols :+ col("n") :+ col("total") :+ col("rank_mass") :+
      when(col("total") > 0L,
        (lit(2L) * col("rank_mass")).cast("double") /
          (col("n") * col("total")).cast("double") -
          (col("n") + 1L).cast("double") / col("n").cast("double"))
        .as("gini")): _*)
  }
}
