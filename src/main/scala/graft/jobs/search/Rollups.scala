package graft.jobs.search

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The search dashboard rollup harness, ported from
  * mozetl/search/aggregates.py:325-390: read one submission-date
  * partition, apply a transform, optionally order, write versioned
  * partitioned output with a configurable save mode (default
  * error-if-exists, the reference's idempotency guard).
  */
object Rollups {

  val SearchAggregatesVersion = 7
  val SearchClientsDailyVersion = 7
  val DefaultSaveMode = "error"

  def sourcePath(inputBase: String, submissionDate: String): String =
    s"$inputBase/submission_date_s3=$submissionDate"

  def outputPath(outputBase: String, version: Int,
      submissionDate: String): String =
    s"$outputBase/v$version/submission_date_s3=$submissionDate"

  def generateRollups(spark: SparkSession, submissionDate: String,
      inputBase: String, outputBase: String, version: Int,
      transform: DataFrame => DataFrame,
      saveMode: String = DefaultSaveMode,
      orderBy: Seq[String] = Seq.empty): String = {
    val mainSummary = spark.read.parquet(sourcePath(inputBase, submissionDate))
    val transformed = transform(mainSummary)
    val ordered =
      if (orderBy.nonEmpty) transformed.orderBy(orderBy.head, orderBy.tail: _*)
      else transformed
    val out = outputPath(outputBase, version, submissionDate)
    ordered.write.mode(saveMode).parquet(out)
    out
  }

  /** aggregates.py:369-390 — the two concrete ETL jobs. */
  def searchAggregatesEtl(spark: SparkSession, submissionDate: String,
      inputBase: String, outputBase: String,
      saveMode: String = DefaultSaveMode): String =
    generateRollups(spark, submissionDate, inputBase, outputBase,
      SearchAggregatesVersion, SearchAggregates.searchAggregates, saveMode)

  def searchClientsDailyEtl(spark: SparkSession, submissionDate: String,
      inputBase: String, outputBase: String,
      saveMode: String = DefaultSaveMode): String =
    generateRollups(spark, submissionDate, inputBase, outputBase,
      SearchClientsDailyVersion, SearchAggregates.searchClientsDaily,
      saveMode, orderBy = Seq("sample_id"))
}
