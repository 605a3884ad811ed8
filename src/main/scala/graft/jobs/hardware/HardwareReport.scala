package graft.jobs.hardware

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Dimensions never collapsed into "Other" (summarize_json.py:20
    * EXCLUSION_LIST) — their full value range is not privacy-sensitive.
    */
  val ExclusionList: Seq[String] = Seq("has_flash", "browser_arch", "os_arch")

  /** collapse_buckets (summarize_json.py:351-418), full reference
    * semantics as two grouped passes:
    *
    *  - a bucket survives only with count STRICTLY ABOVE the threshold
    *    (`v > count_threshold`), except the `ExclusionList` dimensions
    *    which always survive;
    *  - resolution "0x0" (bug 1324014) goes straight to "Other";
    *  - rare resolutions regroup to "~WxH" with both sides rounded to the
    *    nearest hundred — bround (half-even) replicates Python 3's
    *    round(int, -2) banker's rounding exactly;
    *  - rare os values regroup to "<osname>-Other" (split on the FIRST
    *    dash, like .split("-", 1));
    *  - a SECOND pass re-checks the regrouped buckets ("~WxH"/"os-Other")
    *    and folds any still at-or-under the threshold into plain "Other".
    */
  def collapseBuckets(aggregated: DataFrame, countThreshold: Long): DataFrame = {
    val excluded = col("dimension").isin(ExclusionList: _*)
    def roundHundred(c: Column): Column =
      (bround(c.cast("double") / 100.0, 0) * 100).cast("int").cast("string")
    val res = split(col("value"), "x")
    val roundedRes = concat(lit("~"), roundHundred(res.getItem(0)),
      lit("x"), roundHundred(res.getItem(1)))
    val osOther = concat(split(col("value"), "-").getItem(0), lit("-Other"))
    val pass1Value =
      when(col("dimension") === "resolution" && col("value") === "0x0",
        lit("Other"))
        .when(col("count") > countThreshold || excluded, col("value"))
        .when(col("dimension") === "resolution", roundedRes)
        .when(col("dimension") === "os", osOther)
        .otherwise(lit("Other"))
    val pass1 = aggregated.withColumn("value", pass1Value)
      .groupBy("dimension", "value").agg(sum("count").as("count"))
    val keep2 = (col("count") > countThreshold && col("value") =!= "Other") ||
      excluded
    pass1.withColumn("value",
        when(keep2, col("value")).otherwise(lit("Other")))
      .groupBy("dimension", "value").agg(sum("count").as("count"))
  }

  /** finalize_data (summarize_json.py:420-485): counts → shares of the
    * sample.
    */
  def finalizeData(collapsed: DataFrame, sampleCount: Long): DataFrame =
    collapsed.withColumn("share", col("count").cast("double") / sampleCount)

  /** finalize_data's human-friendly key prefixes
    * (summarize_json.py:447-460).
    */
  val KeysTranslation: Map[String, String] = Map(
    "browser_arch" -> "browserArch_",
    "cpu_cores" -> "cpuCores_",
    "cpu_cores_speed" -> "cpuCoresSpeed_",
    "cpu_vendor" -> "cpuVendor_",
    "cpu_speed" -> "cpuSpeed_",
    "gfx0_vendor_name" -> "gpuVendor_",
    "gfx0_model" -> "gpuModel_",
    "resolution" -> "resolution_",
    "memory_gb" -> "ram_",
    "os" -> "osName_",
    "os_arch" -> "osArch_",
    "has_flash" -> "hasFlash_")

  /** The flat weekly report entry finalize_data emits
    * (summarize_json.py:420-470): "<camelProp>_<value>" → share, plus
    * the week date and discard ratios.
    */
  case class FinalizedReport(date: String, broken: Double,
      inactive: Double, shares: Map[String, Double])

  /** Rename the per-dimension shares into the report's flat
    * human-friendly keys (summarize_json.py:462-468).
    */
  def finalizeReport(report: Map[String, Map[String, Double]], date: String,
      brokenRatio: Double, inactiveRatio: Double): FinalizedReport =
    FinalizedReport(date, brokenRatio, inactiveRatio,
      for {
        (dim, values) <- report
        (value, share) <- values
      } yield KeysTranslation(dim) + value -> share)

  /** validate_finalized_data (summarize_json.py:472-525): every property
    * family's shares must sum to ~1.0, and no flat key may belong to an
    * unknown property.
    */
  def validateFinalizedData(f: FinalizedReport,
      tolerance: Double = 0.05): Boolean = {
    val props = KeysTranslation.values.map(_.stripSuffix("_")).toSet
    val acc = scala.collection.mutable.Map(props.toSeq.map(_ -> 0.0): _*)
    val allKnown = f.shares.forall { case (key, value) =>
      val prop = key.split("_")(0)
      acc.get(prop) match {
        case Some(v) => acc(prop) = v + value; true
        case None => false
      }
    }
    allKnown && acc.values.forall(v => math.abs(1.0 - v) <= tolerance)
  }

  /** get_longitudinal_version (summarize_json.py:585-588): the catalog
    * table name for the week containing `date` — snap back to the
    * week's Sunday, name by its Saturday.
    */
  def longitudinalVersion(date: java.time.LocalDate): String = {
    val sunday =
      if (date.getDayOfWeek == java.time.DayOfWeek.SUNDAY) date
      else date.minusDays(date.getDayOfWeek.getValue.toLong)
    "longitudinal_v" + sunday.plusDays(6)
      .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
  }

  /** One flagged week-over-week change (check_output.py:31-53). */
  case class Change(key: String, change: Double, oldValue: Double,
      newValue: Double)

  /** _check_most_recent_change (hardware_report/check_output.py:31-53):
    * compare the two most recent weekly snapshots (date → metric →
    * share); flag metrics whose relative change exceeds `minChange`,
    * ignoring metrics whose old share was below `minValue`; absent
    * metrics count as `missingVal` so appearing/disappearing keys are
    * flagged too.
    */
  def checkMostRecentChange(values: Map[Int, Map[String, Double]],
      minChange: Double = 0.05, minValue: Double = 0.01,
      missingVal: Double = 0.01): Map[String, Change] = {
    require(missingVal > 0, "missing_val must be positive")
    val recent = values.keys.max
    val second = (values.keySet - recent).max
    val (base, compare) = (values(second), values(recent))
    (base.keySet ++ compare.keySet).flatMap { k =>
      val o = base.getOrElse(k, missingVal)
      val n = compare.getOrElse(k, missingVal)
      val c = n / o - 1
      if (math.abs(c) > minChange && o >= minValue)
        Some(k -> Change(k, c, o, n))
      else None
    }.toMap
  }

  /** Weekly series consolidation (hardware_dashboard.py:50-64): append
    * new weekly entries to the existing series, new data winning on date
    * collisions (reruns overwrite), ordered by date.
    */
  def consolidateWeekly(existing: Seq[(String, Map[String, Double])],
      fresh: Seq[(String, Map[String, Double])])
      : Seq[(String, Map[String, Double])] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]
    (fresh ++ existing).foreach { case (date, data) =>
      if (!seen.contains(date)) seen(date) = data
    }
    seen.toSeq.sortBy(_._1)
  }

  /** End-to-end report assembly (main's collect_aggregated_data →
    * finalize_data → json, summarize_json.py:620-658): prepare (naming /
    * unit conversions via Dimensions) → dimension counts → rare-bucket
    * collapse → shares, returned as the report dict plus the sample
    * count.
    */
  def assembleReport(clients: DataFrame, deviceMap: DataFrame,
      countThreshold: Long = -1): (Long, Map[String, Map[String, Double]]) = {
    val prepared = Dimensions.prepareData(clients, deviceMap)
    val sampleCount = prepared.count()
    // negative → the reference's default: 1% of the valid sample
    // (summarize_json.py:706 threshold_to_collapse)
    val threshold =
      if (countThreshold < 0) (sampleCount * 0.01).toLong else countThreshold
    val shares = finalizeData(
      collapseBuckets(
        aggregateDimensions(Dimensions.toDimensionsMap(prepared)),
        threshold),
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
