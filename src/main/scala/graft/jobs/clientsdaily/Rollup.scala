package graft.jobs.clientsdaily

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** clients_daily: per-(client, activity day) profile rollup, ported from
  * mozetl/clientsdaily/rollup.py.
  *
  * Spark-first redesign of `extract_search_counts` (rollup.py:26-99): the
  * reference explodes search_counts, re-aggregates by document_id, unions a
  * null branch and joins the result back — two shuffles and a join on a
  * 14 GB/day input. The identical per-row semantics are expressible as
  * higher-order array functions (filter + aggregate over the struct array),
  * which is a pure map: zero shuffles, stays in WholeStageCodegen, and at
  * 100 TB removes the job's largest exchange. Observable semantics kept
  * bit-for-bit, including the subtle inner-join row drop:
  *   - search_counts NULL        → all seven columns are 0
  *   - all elements filtered out → the row is DROPPED (inner join misses;
  *     rollup.py:98 — preserved deliberately)
  *   - otherwise per-source sums over elements with count > -1 and source
  *     in the six GUI access points.
  */
object Rollup {

  /** rollup.py:7-14. */
  val SearchAccessPoints: Seq[String] =
    Seq("abouthome", "contextmenu", "newtab", "searchbar", "system", "urlbar")

  def searchAccessColumn(sap: String): String = s"search_count_$sap"

  def extractSearchCounts(frame: DataFrame): DataFrame = {
    val sapList = SearchAccessPoints.map(s => s"'$s'").mkString(", ")
    val valid = expr(
      s"filter(search_counts, s -> s.count > -1 AND s.source IN ($sapList))")
    val validCol = col("__valid_searches")
    def sumCounts(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0L), (acc, s) => acc + s.getField("count"))
    val withValid = frame.withColumn("__valid_searches", valid)
      // inner-join semantics of rollup.py:98: a row survives iff
      // search_counts is NULL (null branch) or ≥1 element passed the filter
      .filter(col("search_counts").isNull || size(validCol) > 0)
    val sapCols = SearchAccessPoints.map { sap =>
      when(col("search_counts").isNull, lit(0L))
        .otherwise(sumCounts(expr(
          s"filter(__valid_searches, s -> s.source = '$sap')")))
        .as(searchAccessColumn(sap))
    }
    val allCol = when(col("search_counts").isNull, lit(0L))
      .otherwise(sumCounts(validCol)).as("search_count_all")
    withValid
      .withColumn("did", col("document_id"))
      .select(col("*") +: allCol +: sapCols: _*)
      .drop("__valid_searches")
  }

  /** rollup.py:102-124: defensive column adds + the big mixed aggregate. */
  def toProfileDayAggregates(frameWithExtracts: DataFrame): DataFrame = {
    var f = frameWithExtracts
    if (!f.columns.contains("activity_date"))
      f = f.select(col("*"), Fields.activityDateColumn)
    for (c <- Seq("geo_subdivision1", "geo_subdivision2"))
      if (!f.columns.contains(c))
        f = f.withColumn(c, Fields.nullStringColumn)
    f.groupBy("client_id", "activity_date")
      .agg(Fields.mainSummaryFieldAggregators.head,
        Fields.mainSummaryFieldAggregators.tail: _*)
  }

  /** utils.py:131-160: activity-day batch watermark — rows whose
    * activity_date equals `date` minus lagDays, submitted within the lag
    * window. Returns (filtered frame, activity date ISO string).
    */
  def extractSubmissionWindowForActivityDay(frame: DataFrame, date: String,
      lagDays: Int = 10): (DataFrame, String) = {
    val end = java.time.LocalDate.parse(date)
    val start = end.minusDays(lagDays.toLong)
    val fmt = java.time.format.DateTimeFormatter.BASIC_ISO_DATE
    val f = frame.select(col("*"), Fields.activityDateColumn)
      .where(col("submission_date_s3") >= lit(start.format(fmt)))
      .where(col("submission_date_s3") <= lit(end.format(fmt)))
      .where(col("activity_date") === lit(start.toString))
    (f, start.toString)
  }

  /** rollup.py:136-146: output partition sizing heuristic (256 MB–1 GB
    * target parquet partitions).
    */
  def partitionCountForWriting(isSampled: Boolean): Int =
    if (isSampled) 1 else 25
}
