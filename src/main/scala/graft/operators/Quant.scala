package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared fixed-point quantizer for the moments-based operators (CUPED,
  * Welch t, trend line): floor(x·scale + 0.5) as an exact long carried in
  * DECIMAL(18,0), so the product of two quantized values stays exact
  * (DECIMAL(37,0)) and every moment sum is order-free.
  *
  * Guarded: a value whose scaled magnitude leaves the DECIMAL(18,0) range
  * previously saturated at the double→long cast and then overflowed the
  * decimal cast to NULL under non-ANSI mode — silently dropping the row
  * from every moment sum. Out-of-range input now raises instead, because a
  * silently wrong experiment readout is worse than a failed job. (The
  * cross-engine replay bound is tighter still: keep product moments × n
  * below 2⁵³ by passing a smaller scale — see Cuped.adjustedMeans.)
  */
object Quant {

  /** Largest scaled magnitude that fits DECIMAL(18,0) (and the exact-long
    * double→long cast, which bounds at 2⁶³ ≈ 9.2·10¹⁸ > 10¹⁸).
    */
  val MaxScaledMagnitude: Double = 1.0e18

  def fixedPoint(c: Column, quantScale: Double): Column = {
    val scaled = c.cast("double") * lit(quantScale)
    when(abs(scaled) < lit(MaxScaledMagnitude),
      floor(scaled + lit(0.5)).cast("long").cast(DecimalType(18, 0)))
      .otherwise(raise_error(concat(
        lit("quantized magnitude exceeds the exact DECIMAL(18,0) range " +
          s"at scale $quantScale: "), c.cast("string"))))
  }
}
