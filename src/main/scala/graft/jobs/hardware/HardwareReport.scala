package graft.jobs.hardware

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hardware-survey report core, ported from
  * mozetl/hardware_report/summarize_json.py.
  *
  * The reference walks longitudinal rows in Python (latest valid ping per
  * client, 157-287), accumulates dimension counts with a custom
  * `aggregate` dict combiner (315-348), collapses rare buckets (351-418)
  * and validates broken/inactive ratios (660-692). Spark-first: latest-
  * valid selection is a window; dimension counting is one
  * explode+groupBy.count; collapse/validate run on the small aggregated
  * result.
  */
object HardwareReport {

  val ReasonBrokenData = "broken"
  val ReasonInactive = "inactive"

  /** Latest valid row per client in [startDate, endDate), with per-row
    * broken/inactive classification retained for ratio validation
    * (get_latest_valid_per_client, summarize_json.py:157-287 re-keyed as
    * a window over per-ping rows).
    */
  def latestValidPerClient(pings: DataFrame, startDate: String,
      endDate: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("client_id").orderBy(desc("activity_date"))
    val classified = pings.withColumn("reason",
      when(col("os_name").isNull || col("os_version").isNull ||
        col("build_id").isNull, ReasonBrokenData)
        .when(col("activity_date") < startDate ||
          col("activity_date") >= endDate, ReasonInactive))
    classified.filter(col("reason").isNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "reason")
  }

  /** Broken/inactive ratios; the job bails out when either ≥ 0.9
    * (summarize_json.py:676-692).
    */
  def validateRatios(pings: DataFrame, startDate: String,
      endDate: String): (Double, Double) = {
    val total = pings.count().toDouble
    val broken = pings.filter(col("os_name").isNull ||
      col("os_version").isNull || col("build_id").isNull).count()
    val inactive = pings.filter(col("activity_date") < startDate ||
      col("activity_date") >= endDate).count()
    val (br, ir) = (broken / total, inactive / total)
    require(br < 0.9 && ir < 0.9,
      f"Unexpected ratio of broken pings or inactive clients. " +
        f"Broken ratio: $br%.3f, inactive ratio: $ir%.3f")
    (br, ir)
  }

  /** A10 dimension counting: one row per client with a map of dimension →
    * value; counts per (dimension, value) via explode + groupBy — the
    * distributed form of the reference's aggregate() dict combiner
    * (summarize_json.py:315-348).
    */
  def aggregateDimensions(clients: DataFrame,
      dimensionsCol: String = "dimensions"): DataFrame =
    clients.select(explode(col(dimensionsCol)).as(Seq("dimension", "value")))
      .groupBy("dimension", "value").count()

  /** collapse_buckets (summarize_json.py:351-418): within each dimension,
    * fold values below `countThreshold` into "Other".
    */
  def collapseBuckets(aggregated: DataFrame, countThreshold: Long): DataFrame =
    aggregated
      .withColumn("value",
        when(col("count") < countThreshold, lit("Other"))
          .otherwise(col("value")))
      .groupBy("dimension", "value").agg(sum("count").as("count"))

  /** finalize_data (summarize_json.py:420-485): counts → shares of the
    * sample.
    */
  def finalizeData(collapsed: DataFrame, sampleCount: Long): DataFrame =
    collapsed.withColumn("share", col("count").cast("double") / sampleCount)

  /** End-to-end report assembly (main's collect_aggregated_data →
    * finalize_data → json, summarize_json.py:620-658): prepare (naming /
    * unit conversions via Dimensions) → dimension counts → rare-bucket
    * collapse → shares, returned as the report dict plus the sample
    * count.
    */
  def assembleReport(clients: DataFrame, deviceMap: DataFrame,
      countThreshold: Long = 1): (Long, Map[String, Map[String, Double]]) = {
    val prepared = Dimensions.prepareData(clients, deviceMap)
    val sampleCount = prepared.count()
    val shares = finalizeData(
      collapseBuckets(
        aggregateDimensions(Dimensions.toDimensionsMap(prepared)),
        countThreshold),
      sampleCount)
    val report = shares.collect()
      .groupBy(_.getAs[String]("dimension"))
      .map { case (dim, rows) =>
        dim -> rows.map(r =>
          r.getAs[String]("value") -> r.getAs[Double]("share")).toMap
      }
    (sampleCount, report)
  }
}
