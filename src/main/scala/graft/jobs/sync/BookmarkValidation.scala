package graft.jobs.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sync bookmark validation: flatten sync_summary's nested engines /
  * validation problems (double LATERAL VIEW, the null-preserving OUTER
  * variant) and aggregate totals. Ported from
  * mozetl/sync/bookmark_validation.py:31-83.
  *
  * The reference formats sync_day with 'YYYYMMdd' (week-based year — a
  * latent bug near year boundaries); we use 'yyyyMMdd' and note the
  * divergence deliberately.
  */
object BookmarkValidation {

  /** bookmark_validation.py:33-57 — run against a registered
    * `sync_summary` view. `when` is quoted: it is a column name here.
    */
  def engineValidations(spark: SparkSession): DataFrame = spark.sql("""
    SELECT s.app_build_id,
           s.app_version,
           s.app_display_version,
           s.app_name,
           s.app_channel,
           s.uid,
           s.device_id AS device_id,
           s.submission_date_s3 AS submission_day,
           date_format(from_unixtime(s.`when` / 1000), 'yyyyMMdd') AS sync_day,
           s.`when`,
           s.status,
           e.name AS engine_name,
           e.status AS engine_status,
           e.failure_reason AS engine_failure_reason,
           e.validation.problems IS NOT NULL AS engine_has_problems,
           e.validation.version AS engine_validation_version,
           e.validation.checked AS engine_validation_checked,
           e.validation.took AS engine_validation_took,
           p.name AS engine_validation_problem_name,
           p.count AS engine_validation_problem_count
    FROM sync_summary s
    LATERAL VIEW explode(s.engines) AS e
    LATERAL VIEW OUTER explode(e.validation.problems) AS p
    WHERE s.failure_reason IS NULL
    """)

  def bookmarkValidations(engineValidations: DataFrame): DataFrame =
    engineValidations.where(
      col("engine_name").isin("bookmarks", "bookmarks-buffered"))

  def bookmarkValidationProblems(bookmarkValidations: DataFrame): DataFrame =
    bookmarkValidations.where(col("engine_has_problems"))

  /** bookmark_validation.py:69-80: per-day totals with the multi-column
    * countDistinct (SURVEY §2.5 A4).
    */
  def bookmarkAggregates(bookmarkValidations: DataFrame): DataFrame =
    bookmarkValidations
      .where(col("engine_validation_checked").isNotNull)
      .groupBy("submission_day")
      .agg(
        countDistinct(col("uid"), col("device_id"), col("when"))
          .as("total_bookmark_validations"),
        countDistinct(col("uid")).as("total_validated_users"),
        sum("engine_validation_checked").as("total_bookmarks_checked"))

  /** Full transform: (problems, per-day aggregates). */
  def transform(spark: SparkSession): (DataFrame, DataFrame) = {
    val ev = engineValidations(spark)
    val bv = bookmarkValidations(ev)
    (bookmarkValidationProblems(bv), bookmarkAggregates(bv))
  }
}
