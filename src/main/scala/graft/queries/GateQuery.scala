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

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.core.Graft.normalizeTable(
      spark.read.parquet(s"$sfDir/$name.parquet"), name)

  /** Normalize a timestamp column regardless of its parquet physical
    * encoding — a 100 TB lake holds mixed-vintage files, so the reader
    * branches on the LOADED schema instead of assuming one writer:
    *   - LongType: parquet TIMESTAMP(NANOS) surfaced as long nanos via
    *     spark.sql.legacy.parquet.nanosAsLong (Graft.configure). Integer
    *     div to µs — a ns epoch (~1.7e18) does not fit double precision.
    *   - TimestampNTZType: parquet TIMESTAMP(MICROS, isAdjustedToUTC=0).
    *     Cast to session-tz timestamp; the session is pinned to UTC
    *     (Graft.configure) so the instant is unchanged and unix_micros /
    *     window arithmetic downstream behave identically.
    *   - TimestampType: already the canonical form.
    * DuckDB's oracle side reads the same file natively (epoch_us(ts)), so
    * every branch lands on the same integer microseconds.
    */
  def normalizeTs(df: DataFrame, colName: String): Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType         => expr(s"timestamp_micros($colName div 1000)")
      case TimestampNTZType => col(colName).cast(TimestampType)
      case TimestampType    => col(colName)
      case other => throw new IllegalStateException(
        s"unsupported physical type for timestamp column '$colName': $other")
    }
  }
}
