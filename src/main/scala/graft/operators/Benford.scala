package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit audit — the forensic data-quality screen
  * (Nigrini's fraud test, and just as useful on pipelines: synthetic or
  * truncated metric columns fail it): naturally-occurring multiplicative
  * quantities put digit d first with probability log10(1 + 1/d), and a
  * column that departs hard from that either lies or was generated.
  * Companion to X77's declarative expectations — this one needs no
  * declared bounds, the law IS the expectation.
  *
  * Determinism: first digits via string arithmetic on the absolute
  * value (no float log in the hot path); expected probabilities are
  * driver-precomputed micro-unit literals (the X89 discount-table
  * pattern — ln's libm slack never enters the plan); the χ² statistic
  * is the fixed-shape IEEE sum over 9 cells of exact longs. One
  * map-side-combined aggregation; the result frame is 9 rows.
  */
object Benford {

  /** Micro-unit Benford probabilities for digits 1..9:
    * round(10⁶·log10(1 + 1/d)).
    */
  val ProbMicro: Seq[Long] = (1 to 9).map(d =>
    math.round(1e6 * math.log10(1.0 + 1.0 / d)))

  /** Per-digit observed vs expected over `valueCol` (non-zero, non-NULL
    * values; sign ignored). Output: (digit, n_observed, expected_micro —
    * n_total·p_micro, the exact expected count in micro-rows, chi2_term
    * — (obs − exp)²/exp in doubles of exact inputs), one row per digit
    * 1..9 (absent digits count 0).
    */
  def firstDigitReport(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digit = substring(regexp_replace(
      abs(col(valueCol)).cast("string"), "[^1-9]*", ""), 1, 1)
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) =!= 0)
      .select(digit.cast("int").as("digit"))
      .filter(col("digit").isNotNull)
      .groupBy("digit").agg(count(lit(1)).as("n_observed"))
    val digits = (1 to 9).map(d => (d, ProbMicro(d - 1)))
      .toDF("digit", "p_micro")
    val total = counts.agg(sum("n_observed").as("n_total"))
    digits.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n_observed"), lit(0L)).as("n_observed"),
        (col("n_total") * col("p_micro")).as("expected_micro"),
        // fixed IEEE shape over exact integers (x·x, not libm pow):
        // e = n·p/1e6; term = (obs − e)² / e
        {
          val e = (col("n_total") * col("p_micro")).cast("double") / 1.0e6
          val d0 = coalesce(col("n_observed"), lit(0L)).cast("double") - e
          (d0 * d0 / e).as("chi2_term")
        })
  }
}
