package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the release gate a pipeline
  * runs before publishing a snapshot (the Deequ/Great-Expectations
  * shape). The reference does this ad hoc all over: dataset existence
  * asserts (`sync/bookmark_validation.py` row-count guards), accepted
  * value checks on channel/os enums, and the schema-defensive
  * `if col not in columns` pattern (`clientsdaily/rollup.py:111-122`).
  * Here the checks are data, not code: a list of constraints compiled
  * into ONE aggregation pass over the table.
  *
  * Scale: every row-local check (not-null / range / set / regex) becomes
  * a conditional count inside a single map-side-combined aggregate — the
  * table is scanned ONCE no matter how many checks are declared, and the
  * result frame is |checks| rows. `Unique` adds distinct counts to the
  * same aggregation (Catalyst plans multi-distinct via one Expand — still
  * one scan). Referential checks are the exception that needs a second
  * relation: a broadcast LEFT ANTI count against the (small) dimension's
  * distinct keys.
  */
object Expectations {

  sealed trait Check { def name: String }
  /** `column` must never be NULL. */
  final case class NotNull(column: String) extends Check {
    def name = s"not_null($column)"
  }
  /** The tuple `columns` must be unique across rows (NULL-free keys). */
  final case class Unique(columns: Seq[String]) extends Check {
    def name = s"unique(${columns.mkString(",")})"
  }
  /** Non-NULL values of `column` must fall in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    def name = s"in_range($column)"
  }
  /** Non-NULL values of `column` must be one of `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    def name = s"in_set($column)"
  }
  /** Non-NULL values of `column` must match `regex` (full-string). */
  final case class Matches(column: String, regex: String) extends Check {
    def name = s"matches($column)"
  }
  /** Table must have between `lo` and `hi` rows (inclusive). */
  final case class RowCountBetween(lo: Long, hi: Long) extends Check {
    def name = "row_count"
  }

  private def violations(c: Check): Column = c match {
    case NotNull(col0) =>
      sum(when(col(col0).isNull, 1L).otherwise(0L))
    case Unique(cols) =>
      count(lit(1)) - countDistinct(col(cols.head), cols.tail.map(col): _*)
    case InRange(col0, lo, hi) =>
      sum(when(col(col0).isNotNull &&
        (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L))
    case InSet(col0, vs) =>
      sum(when(col(col0).isNotNull &&
        !col(col0).isin(vs.map(v => v: Any): _*), 1L).otherwise(0L))
    case Matches(col0, re) =>
      sum(when(col(col0).isNotNull &&
        !col(col0).rlike(re), 1L).otherwise(0L))
    case RowCountBetween(lo, hi) =>
      when(count(lit(1)).between(lo, hi), 0L).otherwise(1L)
  }

  /** Run every check in one aggregation pass.
    * Returns (check: String, violations: Long, passed: Int), one row per
    * check, in the caller's declaration order position available via
    * ORDER BY check.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "declare at least one check")
    val cells = checks.map(c =>
      struct(lit(c.name).as("check"),
        coalesce(violations(c), lit(0L)).cast("long").as("violations")))
    df.agg(array(cells: _*).as("cells"))
      .select(explode(col("cells")).as("cell"))
      .select(col("cell.check").as("check"),
        col("cell.violations").as("violations"),
        (col("cell.violations") === 0L).cast("int").as("passed"))
  }

  /** Referential-integrity check: rows of `df` whose `column` has no
    * match in `dim.dimColumn` (NULLs are not violations — declare
    * NotNull separately). The dimension's distinct keys broadcast; the
    * fact table never shuffles. Same report schema as `validate`.
    */
  def subsetOf(df: DataFrame, column: String, dim: DataFrame,
      dimColumn: String): DataFrame = {
    val keys = broadcast(dim.select(col(dimColumn).as(column)).distinct())
    df.select(column).filter(col(column).isNotNull)
      .join(keys, Seq(column), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(s"subset_of($column)").as("check"),
        col("violations"),
        (col("violations") === 0L).cast("int").as("passed"))
  }
}
