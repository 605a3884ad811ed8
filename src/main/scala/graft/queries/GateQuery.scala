package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-gated query: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Contract (builder prompt + Verify.scala): column names must match between
  * the Spark result and the oracle result; the driver sorts columns by name
  * and hashes values. Discipline applied throughout:
  *   - Every aggregate / computed column is aliased identically on both sides.
  *   - Money/metric sums go through DECIMAL(18,2) so both engines aggregate
  *     exactly, then CAST to DOUBLE for a bit-identical final value
  *     (double summation order would otherwise diverge between engines).
  *   - Timestamps are never emitted raw (parquet ns vs µs truncation
  *     hazards); they are formatted to strings or diffed to integers.
  *   - Every query ends in a total ORDER BY (unique key included) so the
  *     comparison is deterministic whether or not the driver re-sorts.
  */
final case class GateQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object GateQuery {
  /** Exact-aggregation cast: DECIMAL(18,2) fits every money/metric column in
    * the testdata (max ~500k with 2 decimals).
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum re-exposed as a deterministic double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), read as long nanos (see
    // Graft.configure). Normalize to a µs timestamp — integer div, because
    // a ns epoch (~1.7e18) does not fit double precision. DuckDB's own µs
    // truncation of the same values matches this exactly.
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
