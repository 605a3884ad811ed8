package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Percentile-rank (CDF) transform — mapping a metric column onto [0,1]
  * by its empirical distribution, the feature-engineering step before
  * thresholding or mixing incomparable scores (X37 prunes on absolute
  * scores; the rank transform makes "keep the top 30%" mean the same
  * thing across sources with different score scales).
  *
  * The mid-rank convention: pct = (count_below + ½·count_equal) / N,
  * computed as ONE division of exact longs (2·lt + eq) / 2N — ties get
  * the same value, the result is symmetric (mean = ½ over any data),
  * and the arithmetic replays bitwise.
  *
  * Scale — the point of the formulation: rows are NEVER globally
  * sorted. percent_rank() over a 100 TB column is a global sort; here
  * the distribution compresses to per-VALUE counts (one
  * map-side-combined aggregation), a window over the compressed value
  * table (|distinct values| rows) computes the exclusive prefix, and
  * the per-value ranks broadcast back onto the unshuffled scan — the
  * X59 ROC-AUC / X60 Spearman compressed-rank discipline applied as a
  * row transform.
  */
object CdfTransform {

  /** Append `pct_rank` for `valueCol` within each `partitionCols` group
    * (empty = one global distribution). NULL values get NULL rank.
    * `broadcastRanks` (default true) fits discretized/repetitive
    * columns, where compression is massive; for near-unique values the
    * compressed table approaches row count — pass false and the rank
    * attach becomes a plain hash join instead of a driver-sized
    * broadcast.
    */
  def percentileRank(df: DataFrame, valueCol: String,
      partitionCols: Seq[String] = Seq.empty,
      broadcastRanks: Boolean = true): DataFrame = {
    val pcols = partitionCols.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((pcols :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__eq"))
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(pcols: _*)
    val w = w0.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = counts
      .withColumn("__lt", sum("__eq").over(w) - col("__eq"))
      .withColumn("__n", sum("__eq").over(w0
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select((pcols :+ col(valueCol) :+
        ((lit(2L) * col("__lt") + col("__eq")).cast("double") /
          (lit(2L) * col("__n")).cast("double")).as("pct_rank")): _*)
    val attach = if (broadcastRanks) broadcast(ranked) else ranked
    df.join(attach, partitionCols :+ valueCol, "left")
  }

  /** Equal-frequency discretization — append `bin` ∈ [0, k) for
    * `valueCol`, the feature-bucketization step before crossing,
    * hashing, or monotonic-model fitting. NTILE(k) is NOT reproducible
    * on ties (it splits equal values across bins by physical row
    * position); here every tie run lands in ONE bin via the mid-rank:
    * bin = min(k−1, ⌊k·(2·lt+eq)/(2n)⌋) — pure integer arithmetic over
    * exact longs, deterministic under any partitioning.
    *
    * Same scale shape as [[percentileRank]]: one map-side-combined
    * per-value count aggregation, one window over the compressed table,
    * ranks broadcast (or hash-joined) back — no global sort.
    */
  def quantileBins(df: DataFrame, valueCol: String, k: Int,
      partitionCols: Seq[String] = Seq.empty,
      broadcastRanks: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pcols = partitionCols.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((pcols :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__eq"))
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(pcols: _*)
    val w = w0.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = counts
      .withColumn("__lt", sum("__eq").over(w) - col("__eq"))
      .withColumn("__n", sum("__eq").over(w0
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select((pcols :+ col(valueCol) :+
        least(lit(k - 1L),
          expr(s"(2*__lt + __eq) * ${k}L div (2*__n)")).as("bin")): _*)
    val attach = if (broadcastRanks) broadcast(binned) else binned
    df.join(attach, partitionCols :+ valueCol, "left")
  }

  /** Winsorization — clamp `valueCol` into its [pLo, pHi] empirical
    * quantile range per group, the outlier-capping step before any
    * moment-based statistic (means, CUPED, Welch) that a heavy tail
    * would otherwise own. Caps are exact order statistics — the
    * smallest value with cum_count ≥ ⌈p·n⌉ (the X109 sketch's exact
    * rule) — computed from per-value counts with no global sort, then
    * broadcast back as two scalars per group.
    *
    * Appends `<valueCol>_capped` plus `clipped` ∈ {-1, 0, 1} marking
    * which side (if any) clamped the row. NULL values pass through.
    */
  def winsorize(df: DataFrame, valueCol: String, pLo: Double,
      pHi: Double, partitionCols: Seq[String] = Seq.empty): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val pcols = partitionCols.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((pcols :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__eq"))
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(pcols: _*)
    val wc = w0.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = counts
      .withColumn("__cum", sum("__eq").over(wc))
      .withColumn("__n", sum("__eq").over(w0
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    def capAt(p: Double): Column =
      min(when(col("__cum") >=
        greatest(lit(1L), ceil(lit(p) * col("__n")).cast("long")),
        col(valueCol)))
    val caps = ranked.groupBy(pcols: _*)
      .agg(capAt(pLo).as("__lo"), capAt(pHi).as("__hi"))
    val joined =
      if (partitionCols.isEmpty) df.crossJoin(broadcast(caps))
      else df.join(broadcast(caps), partitionCols)
    joined
      .withColumn(s"${valueCol}_capped",
        when(col(valueCol).isNull, col(valueCol))
          .when(col(valueCol) < col("__lo"), col("__lo"))
          .when(col(valueCol) > col("__hi"), col("__hi"))
          .otherwise(col(valueCol)))
      .withColumn("clipped",
        when(col(valueCol).isNull, lit(null).cast("int"))
          .when(col(valueCol) < col("__lo"), lit(-1))
          .when(col(valueCol) > col("__hi"), lit(1))
          .otherwise(lit(0)))
      .drop("__lo", "__hi")
  }

  /** Weighted quantiles — order statistics where each row carries an
    * integral weight (quantity, tokens, bytes): "the median PRICE by
    * traded volume" weights every unit, not every row. The unweighted
    * percentile machinery (X17) is this with weight 1.
    *
    * Fully integer-exact target selection: the p-th weighted percentile
    * is the smallest value whose cumulative weight satisfies
    * 100·cumW ≥ p·W — an integer comparison, so there is no ⌈⌉/epsilon
    * ambiguity for any p and both engines pick the identical value.
    * Percentiles are integers in [0, 100].
    *
    * Same scale shape as the family: one map-side-combined per-value
    * weight aggregation, one window over the compressed table, one
    * closing aggregation. No row sort.
    */
  def weightedQuantiles(df: DataFrame, valueCol: String,
      weightCol: String, percentiles: Seq[Int],
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 0 && p <= 100),
      s"percentiles must be in [0, 100]: $percentiles")
    val gcols = groupCols.map(col)
    val counts = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .groupBy((gcols :+ col(valueCol)): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val w0 = if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(gcols: _*)
    val ranked = counts
      .withColumn("__cum", sum("__w").over(w0.orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum("__w").over(w0
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qcols = percentiles.map(p =>
      min(when(col("__cum") * 100L >= lit(p.toLong) * col("__tot"),
        col(valueCol))).as(s"p$p"))
    ranked.groupBy(gcols: _*)
      .agg(max("__tot").as("w_total"), qcols: _*)
  }
}
