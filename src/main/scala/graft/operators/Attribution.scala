package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — distributing each conversion's value over
  * the touch events that preceded it in a horizon. X1's as-of join is
  * last-touch; this operator is the fractional family (linear split),
  * the analytics shape behind "which channel earned this purchase".
  *
  * Exactness contract: value quantizes to integer micro-units, each
  * touch receives value div n, and the division REMAINDER goes to the
  * most recent touch — so per conversion the credits sum to EXACTLY the
  * conversion's micro-value (conservation is an invariant the gate can
  * assert, not an approximation), and every sum downstream is an
  * order-free long. The same fixed-point-remainder discipline as
  * PageRank's rank mass and the monitor's SCD counters.
  *
  * Scale: one banded equi+range join on the user key (pairs bounded by
  * the horizon — the d24/X1 shape), one per-conversion window (count +
  * recency rank, single partitioning), then a map-side-combined sum per
  * touch. Values and touches never fan out beyond their in-horizon
  * pairs.
  */
object Attribution {

  /** Linear credit: every in-horizon touch of a conversion shares its
    * value equally (remainder to the most recent touch; recency ties
    * break on the greater touch id). Conversions with NO in-horizon
    * touch are dropped (no one to credit — count them upstream via the
    * X24 funnel if needed).
    *
    * Output: (touchIdCol, n_conversions, credit_micro, credit) — one
    * row per touch that earned any credit.
    */
  def linearCredit(conversions: DataFrame, touches: DataFrame,
      keyCol: String, convIdCol: String, convTsCol: String,
      valueCol: String, touchIdCol: String, touchTsCol: String,
      horizonSec: Long): DataFrame = {
    require(horizonSec > 0, "horizonSec must be positive")
    val conv = conversions.select(
      col(keyCol).as("__k"), col(convIdCol).as("__cid"),
      col(convTsCol).cast("timestamp").as("__cts"),
      floor(col(valueCol).cast("double") * lit(1000000.0) + lit(0.5))
        .cast("long").as("__v"))
    val touch = touches.select(
      col(keyCol).as("__k"), col(touchIdCol).as("__tid"),
      col(touchTsCol).cast("timestamp").as("__tts"))
    val pairs = conv.join(touch, Seq("__k"))
      .filter(col("__tts") <= col("__cts") &&
        col("__tts") >= col("__cts") - expr(s"INTERVAL $horizonSec SECONDS"))
    val byConv = Window.partitionBy("__cid")
    val recency = row_number().over(
      byConv.orderBy(col("__tts").desc, col("__tid").desc))
    val credited = pairs
      .withColumn("__n", count(lit(1)).over(byConv))
      .withColumn("__rn", recency)
      .withColumn("__credit",
        expr("__v div __n") +
          when(col("__rn") === 1, col("__v") - col("__n") *
            expr("__v div __n")).otherwise(lit(0L)))
    credited.groupBy(col("__tid").as(touchIdCol))
      .agg(count(lit(1)).as("n_conversions"),
        sum("__credit").as("credit_micro"))
      .withColumn("credit",
        col("credit_micro").cast("double") / lit(1000000.0))
  }
}
