package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Log-likelihood keyness (Dunning 1993's G² / Rayson & Garside 2000)
  * — which terms are OVER-represented in a focus corpus relative to a
  * reference corpus? The corpus-comparison readout behind domain
  * labeling, contamination triage ("what vocabulary did this source
  * inject"), and prompt/response drift analysis; χ² feature selection
  * (X61) answers the same question against a label, this answers it
  * between two corpora, and G² stays calibrated at the low expected
  * counts where χ² breaks (Dunning's point).
  *
  * G² = 2·(a·ln(a/E_a) + b·ln(b/E_b)), E taken from the pooled margin.
  * Exactness: counts are exact longs; each log factor quantizes to an
  * integer MICRO-NAT (the UnigramLm/Bm25 convention — absorbs ln's
  * ±1 ulp libm slack), so g2_micro = 2(a·la + b·lb) is an exact long
  * and the emitted g2 one exact division. Zero-count sides contribute
  * 0 (the x·ln x → 0 limit), keeping every term finite.
  *
  * Scale: one tokenize pass, one (term, side) count aggregation
  * (map-side combined), a 1-row totals frame broadcast-crossed onto
  * the vocabulary-sized term table. Documents never shuffle.
  */
object Keyness {

  /** Per-term keyness of `focus` (predicate on the document row)
    * against the rest of the corpus. Terms below `minCount` pooled
    * occurrences are dropped (low-frequency keyness is noise — and the
    * cut also bounds the report size).
    *
    * Output: (term, n_focus, n_ref, g2_micro, g2, overused —
    * 'focus' when the focus rate exceeds the reference rate).
    */
  def g2(df: DataFrame, textCol: String, focus: Column,
      minCount: Long = 5L): DataFrame = {
    val occ = df
      .select(focus.cast("boolean").as("f"),
        tokens(lower(col(textCol))).as("__toks"))
      .select(col("f"), explode(col("__toks")).as("term"))
    val counts = occ.groupBy("term").agg(
      sum(when(col("f"), 1L).otherwise(0L)).as("a"),
      sum(when(col("f"), 0L).otherwise(1L)).as("b"))
      .filter(col("a") + col("b") >= minCount)
    val totals = occ.agg(
      sum(when(col("f"), 1L).otherwise(0L)).as("na"),
      sum(when(col("f"), 0L).otherwise(1L)).as("nb"))

    def dbl(c: Column): Column = c.cast("double")
    val n = col("na") + col("nb")
    // micro-nat log factors; ln args are exact-long ratios evaluated
    // in one fixed double shape
    val la = floor(log(dbl(col("a")) * dbl(n) /
      (dbl(col("na")) * dbl(col("a") + col("b")))) * lit(1000000.0) +
      lit(0.5)).cast("long")
    val lb = floor(log(dbl(col("b")) * dbl(n) /
      (dbl(col("nb")) * dbl(col("a") + col("b")))) * lit(1000000.0) +
      lit(0.5)).cast("long")
    val g2Micro = lit(2L) *
      (when(col("a") > 0L, col("a") * la).otherwise(0L) +
        when(col("b") > 0L, col("b") * lb).otherwise(0L))
    counts.crossJoin(broadcast(totals))
      .select(col("term"), col("a").as("n_focus"), col("b").as("n_ref"),
        g2Micro.as("g2_micro"),
        (g2Micro.cast("double") / lit(1000000.0)).as("g2"),
        when(dbl(col("a")) * dbl(col("nb")) >
          dbl(col("b")) * dbl(col("na")), lit("focus"))
          .otherwise(lit("reference")).as("overused"))
  }
}
