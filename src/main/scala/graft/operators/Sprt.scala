package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SPRT — Wald's sequential probability ratio test (1945) over a
  * Bernoulli outcome stream: the always-valid monitoring companion to
  * the fixed-horizon readouts (X74 Welch, X103 Mann-Whitney, X104
  * CUPED). A fixed-horizon test peeked at daily is statistically
  * invalid; SPRT's log-likelihood ratio random walk with Wald
  * boundaries ln((1−β)/α) / ln(β/(1−α)) is DESIGNED to be read after
  * every observation, and the first boundary crossing is the decision.
  *
  * For Bernoulli H0: p=p0 vs H1: p=p1 the LLR after k outcomes is
  * LINEAR in the conversion count — a·conv + b·(k−conv) with
  * a = ln(p1/p0), b = ln((1−p1)/(1−p0)) — so the whole walk is one
  * running-sum window over the ordered outcomes, no fold needed. The
  * log constants quantize to integer micro-nats (the house ln
  * convention) making every LLR value an exact long; crossing
  * detection is integer comparison.
  *
  * Scale: one window pass per key (ordered by ordCol with a unique
  * tiebreak in it), one closing aggregation. Emits the walk's END
  * state plus the FIRST crossing (decision + where), per key.
  */
object Sprt {

  /** Micro-nat LLR constants for (p0, p1) — shared verbatim with
    * replaying oracles.
    */
  def llrA(p0: Double, p1: Double): Long =
    math.floor(math.log(p1 / p0) * 1e6 + 0.5).toLong
  def llrB(p0: Double, p1: Double): Long =
    math.floor(math.log((1 - p1) / (1 - p0)) * 1e6 + 0.5).toLong

  /** Micro-nat Wald boundaries for error rates (alpha, beta). */
  def upperBound(alpha: Double, beta: Double): Long =
    math.floor(math.log((1 - beta) / alpha) * 1e6 + 0.5).toLong
  def lowerBound(alpha: Double, beta: Double): Long =
    math.floor(math.log(beta / (1 - alpha)) * 1e6 + 0.5).toLong

  /** One row per key: (keyCol, n_obs, n_conv, llr_final_micro,
    * decision — 'accept_h1' | 'accept_h0' | 'continue', decided_at —
    * the ordCol value of the FIRST boundary crossing, NULL while
    * `continue`). `outcomeCol` is 0/1 (or boolean); `ordCol` must give
    * a total order per key.
    */
  def bernoulli(df: DataFrame, keyCol: String, ordCol: String,
      outcomeCol: String, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"need distinct p0, p1 in (0,1): $p0, $p1")
    require(alpha > 0 && alpha < 0.5 && beta > 0 && beta < 0.5,
      s"need alpha, beta in (0, 0.5): $alpha, $beta")
    val (a, b) = (llrA(p0, p1), llrB(p0, p1))
    val (up, lo) = (upperBound(alpha, beta), lowerBound(alpha, beta))
    val x = col(outcomeCol).cast("long")
    val run = Window.partitionBy(keyCol).orderBy(ordCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = df.filter(col(outcomeCol).isNotNull)
      .withColumn("__k", row_number().over(
        Window.partitionBy(keyCol).orderBy(ordCol)).cast("long"))
      .withColumn("__conv", sum(x).over(run))
      .withColumn("__llr",
        lit(a) * col("__conv") + lit(b) * (col("__k") - col("__conv")))
    walked.groupBy(col(keyCol))
      .agg(max("__k").as("n_obs"), max("__conv").as("n_conv"),
        max(struct(col("__k"), col("__llr"))).getField("__llr")
          .as("llr_final_micro"),
        min(when(col("__llr") >= up, col(ordCol))).as("__up_at"),
        min(when(col("__llr") <= lo, col(ordCol))).as("__lo_at"))
      .select(col(keyCol), col("n_obs"), col("n_conv"),
        col("llr_final_micro"),
        when(col("__up_at").isNotNull &&
          (col("__lo_at").isNull || col("__up_at") <= col("__lo_at")),
          lit("accept_h1"))
          .when(col("__lo_at").isNotNull, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"),
        when(col("__up_at").isNotNull &&
          (col("__lo_at").isNull || col("__up_at") <= col("__lo_at")),
          col("__up_at"))
          .otherwise(col("__lo_at")).as("decided_at"))
  }
}
