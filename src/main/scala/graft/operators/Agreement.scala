package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-rater agreement — Cohen's κ between two categorical columns
  * (two annotators, or a classifier's prediction vs gold labels: the
  * labeling-pipeline QA gate a training-data operation runs on every
  * annotation batch).
  *
  * κ = (p_o − p_e) / (1 − p_e), computed here entirely in EXACT integer
  * arithmetic until one final double division:
  *   κ = (n·Σ_k c_kk − Σ_k rowA_k·colB_k) / (n² − Σ_k rowA_k·colB_k)
  * so the result is bit-identical across engines and partitionings
  * (float accumulation order never enters).
  *
  * Scale shape: one exchange builds the (a, b) contingency — at most
  * |labels|² rows whatever the input size — and everything after rides
  * that tiny frame (two label-marginal aggregations, one label-equality
  * join, 1-row combine). Input rows are never shuffled wholesale; only
  * their label pair travels.
  */
object Agreement {

  /** One row: (n_items, n_agree, kappa). Rows where either column is
    * NULL are excluded (an unlabeled item carries no agreement signal).
    * kappa is NULL when the expected-agreement denominator is zero
    * (both raters constant and identical — agreement is undefined, not
    * perfect).
    */
  def kappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val c = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("c"))
    val totals = c.agg(
      sum("c").as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L))
        .as("n_agree"))
    val ra = c.groupBy("a").agg(sum("c").as("ra"))
    val cb = c.groupBy("b").agg(sum("c").as("cb"))
    val pe = ra.join(cb, ra("a") === cb("b"))
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0L)).as("pe_num"))
    totals.crossJoin(pe)
      .select(
        col("n").as("n_items"),
        col("n_agree"),
        when(col("n") * col("n") - col("pe_num") =!= 0L,
          (col("n") * col("n_agree") - col("pe_num")).cast("double") /
            (col("n") * col("n") - col("pe_num")).cast("double"))
          .as("kappa"))
  }
}
