package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score-based corpus pruning — "keep the best X‰ per stratum": the
  * selection step pipelines run after quality scoring (DCLM/FineWeb keep
  * the top slice by classifier or LM score; CCNet buckets by perplexity).
  * Composes with any score column — UnigramLm.scoreDocs (t17 gate),
  * QualityRules metrics, or an external model score.
  *
  * The cut is exact integer arithmetic: within each stratum, rows ranked
  * by (score, id) keep rank ≤ (n·permille) div 1000 — no float
  * thresholding, so the survivor set replays bitwise wherever the score
  * itself does. One hash exchange on the stratum (rank and count share
  * the partitioning); strata are independent, so the plan is
  * embarrassingly parallel and skew follows the stratum sizes, which AQE
  * rebalances.
  */
object QualityPrune {

  /** Keeps the `permille` best rows per stratum; `ascending = true` means
    * lower scores are better (NLL, perplexity), false means higher are
    * better (classifier confidence). Ties break by `idCol` so the cut is
    * deterministic. Strata smaller than 1000/permille rows keep zero rows
    * (floor semantics — the cut never over-keeps).
    */
  def keepTopPermille(df: DataFrame, idCol: String, scoreCol: String,
      strataCol: String, permille: Int,
      ascending: Boolean = true): DataFrame = {
    require(permille >= 0 && permille <= 1000,
      s"permille out of range: $permille")
    Seq("__rn", "__n").foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column (reserved by keepTopPermille)"))
    val order =
      if (ascending) col(scoreCol).asc else col(scoreCol).desc
    val byStratum = Window.partitionBy(strataCol)
    df.withColumn("__rn",
        row_number().over(byStratum.orderBy(order, col(idCol).asc)))
      .withColumn("__n", count(lit(1)).over(byStratum))
      .filter(expr(s"__rn <= (__n * $permille) div 1000"))
      .drop("__rn", "__n")
  }

  /** CCNet-style score buckets (Wenzek et al. 2019 §4.3: split each
    * language by perplexity tertiles into head/middle/tail, then sample
    * per bucket): adds `bucket` ∈ [1, nBuckets], 1 = best. Standard SQL
    * NTILE distribution (the first n mod b buckets take one extra row),
    * identical integer logic in every engine, tie-broken by `idCol` —
    * so the assignment replays bitwise wherever the score does.
    */
  def scoreBuckets(df: DataFrame, idCol: String, scoreCol: String,
      strataCol: String, nBuckets: Int = 3,
      ascending: Boolean = true): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    val order = if (ascending) col(scoreCol).asc else col(scoreCol).desc
    df.withColumn("bucket",
      ntile(nBuckets).over(Window.partitionBy(strataCol)
        .orderBy(order, col(idCol).asc)))
  }
}
