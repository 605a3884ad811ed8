package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity auditing — the privacy release gate a dataset publisher
  * runs before sharing: every combination of quasi-identifier columns
  * must describe at least k rows, or the rows it describes are
  * re-identifiable (Sweeney 2002). The reference ships the OTHER half of
  * this toolkit — Laplace noise for differentially-private counts
  * (`taar_locale.py`'s noised aggregates, ported as M6) — but checks
  * group sizes ad hoc; here the audit is a first-class operator, the
  * aggregate-privacy companion to the row-level `text/Redact` PII
  * scrubber.
  *
  * Scale: ONE map-side-combined aggregation on the quasi-identifier
  * tuple — the same shape as any groupBy count, so skewed QI combos
  * benefit from the usual AQE/salting machinery; the report frame is
  * |distinct QI combos| rows and the violating subset is what a
  * publisher acts on. No row-level data ever leaves the aggregation.
  */
object Privacy {

  /** Per-QI-combination audit: (qiCols*, group_size, at_risk) where
    * at_risk = group_size < k. NULL is a value — a NULL QI cell groups
    * like any other (an absent zip code is itself identifying when rare).
    */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String], k: Int)
      : DataFrame = {
    require(qiCols.nonEmpty, "qiCols must be non-empty")
    require(k >= 2, "k must be >= 2 to be an anonymity constraint")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", (col("group_size") < k).cast("int"))
  }

  /** The rows a publisher must suppress or generalize: those whose QI
    * combination has fewer than k occurrences. Implemented as the report
    * joined back on the QI tuple — the violating side is the small one,
    * so the join broadcasts; the table itself never shuffles.
    */
  def violatingRows(df: DataFrame, qiCols: Seq[String], k: Int)
      : DataFrame = {
    val bad = kAnonymityReport(df, qiCols, k)
      .filter(col("at_risk") === 1)
      .select(qiCols.map(c => col(c).as(s"__qi_$c")): _*)
    // null-safe equality: a NULL QI cell must match its own group (a
    // plain equi-join would silently exempt NULL-keyed rows from the
    // audit)
    val cond = qiCols.map(c => df(c) <=> bad(s"__qi_$c")).reduce(_ && _)
    df.join(broadcast(bad), cond, "left_semi")
  }

  /** l-diversity audit (Machanavajjhala et al., ICDE 2006) — the
    * refinement k-anonymity misses: a group of k rows that all share
    * the SAME sensitive value still discloses it (the homogeneity
    * attack), so every QI group must also contain at least l DISTINCT
    * sensitive values. One aggregation with a distinct count riding the
    * same QI tuple — still a single scan.
    *
    * Output: (qiCols*, group_size, distinct_sensitive, at_risk) where
    * at_risk = distinct_sensitive < l. NULL sensitive values count as
    * one value (an absent diagnosis is itself a disclosure).
    */
  def lDiversityReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "qiCols must be non-empty")
    require(!qiCols.contains(sensitiveCol),
      "the sensitive column cannot be a quasi-identifier")
    require(l >= 2, "l must be >= 2 to be a diversity constraint")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        (countDistinct(col(sensitiveCol)) +
          max(when(col(sensitiveCol).isNull, 1L).otherwise(0L)))
          .as("distinct_sensitive"))
      .withColumn("at_risk", (col("distinct_sensitive") < l).cast("int"))
  }

  /** One-row summary for a release-gate dashboard: total groups,
    * violating groups, rows at risk, and the smallest group size (the
    * dataset's achieved k). Rides the report — still one table scan.
    */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String], k: Int)
      : DataFrame =
    kAnonymityReport(df, qiCols, k).agg(
      count(lit(1)).as("n_groups"),
      sum(col("at_risk").cast("long")).as("n_violating_groups"),
      sum(when(col("at_risk") === 1, col("group_size"))
        .otherwise(lit(0L))).as("rows_at_risk"),
      min("group_size").as("achieved_k"))
}
