package graft.jobs.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Firefox search-count datasets (search_aggregates / search_clients_daily),
  * ported from mozetl/search/aggregates.py.
  *
  * Spark-first: every Python UDF in the reference is replaced by a native
  * expression (no Python workers / no UDF at all):
  *  - get_ad_click_count / get_search_with_ads_count (aggregates.py:190-205)
  *    → explode(transform(map_entries(m), …)) — SURVEY §2.9 E3.
  *  - get_search_addon_version (aggregates.py:182-187, positional a[5]/a[0])
  *    → filter(active_addons, …)[0].version with named fields.
  */
object SearchAggregates {

  /** constants.py:5-15. */
  val SearchSourceWhitelist: Seq[String] = Seq(
    "searchbar", "urlbar", "abouthome", "newtab", "contextmenu", "system",
    "activitystream", "webextension", "alias")

  /** aggregates.py:42. */
  val MaxClientSearchCount = 10000L

  private val sourceColumns = Seq(
    "search_counts",
    "scalar_parent_browser_search_ad_clicks",
    "scalar_parent_browser_search_with_ads")

  /** Base column list of the exploded frame: every main_summary column
    * except the three search sources, then engine/source/count — union
    * branches are positional (aggregates.py:253-284), so the order is
    * pinned here once.
    */
  private def baseColumns(ms: DataFrame): Seq[String] =
    ms.columns.toSeq.filterNot(sourceColumns.contains)

  /** aggregates.py:208-284: one row per (ping, search-count entry), plus
    * ad-click and search-with-ads map entries shaped like search counts,
    * plus a zero row per ping with NULL search_counts.
    */
  def explodeSearchCounts(ms: DataFrame): DataFrame = {
    val base = baseColumns(ms)

    def shaped(df: DataFrame, engine: Column, source: Column,
        count: Column): DataFrame =
      df.select(base.map(col) ++ Seq(engine.as("engine"),
        source.as("source"), count.as("count")): _*)

    // main branch: explode search_counts, outlier cap (aggregates.py:226-228)
    val exploded = ms
      .withColumn("single_search_count", explode(col("search_counts")))
      .filter(col("single_search_count.count") < MaxClientSearchCount)
    val searches = shaped(exploded,
      col("single_search_count.engine"),
      col("single_search_count.source"),
      col("single_search_count.count"))

    // ad-click / search-with-ads: map<engine,count> → search-count-shaped
    // rows (native E3 rewrite of the reference UDFs). Tolerate absent
    // columns like the reference's AnalysisException fallback
    // (aggregates.py:270-273).
    def mapBranch(column: String, sourceTag: String): Option[DataFrame] =
      if (!ms.columns.contains(column)) None
      else Some {
        val entries = ms.withColumn("__e",
          explode(transform(map_entries(col(column)),
            e => struct(e.getField("key").as("engine"),
              lit(sourceTag).as("source"),
              e.getField("value").as("count")))))
        shaped(entries, col("__e.engine"), col("__e.source"),
          col("__e.count").cast("long"))
      }

    val withAds = Seq(
      mapBranch("scalar_parent_browser_search_ad_clicks", "ad-click:"),
      mapBranch("scalar_parent_browser_search_with_ads", "search-with-ads:"))
      .flatten.foldLeft(searches)(_ union _)

    // zero-search branch (aggregates.py:275-284): count 0, not NULL, to
    // keep per-user averages easy downstream.
    val zeros = shaped(ms.where(col("search_counts").isNull),
      lit(null).cast("string"), lit(null).cast("string"), lit(0L))

    withAds.union(zeros)
  }

  /** aggregates.py:287-322: search type classification + addon version. */
  def addDerivedColumns(exploded: DataFrame): DataFrame = {
    val sourceMappings = Seq(
      "in-content:sap:" -> "tagged-sap",
      "in-content:sap-follow-on:" -> "tagged-follow-on",
      "in-content:organic:" -> "organic",
      "sap:" -> "tagged-sap",
      "follow-on:" -> "tagged-follow-on",
      "ad-click:" -> "ad-click",
      "search-with-ads:" -> "search-with-ads")
    val prefixChain = sourceMappings.foldRight(lit("unknown"): Column) {
      case ((prefix, tag), acc) =>
        when(col("source").startsWith(prefix), tag).otherwise(acc)
    }
    val typeExpr =
      when(col("source").isin(SearchSourceWhitelist: _*), "sap")
        .otherwise(when(col("source").isNull, "sap").otherwise(prefixChain))

    // native replacement for the positional-access UDF (aggregates.py:182-187)
    val followon = expr(
      "filter(active_addons, a -> a.addon_id = 'followonsearch@mozilla.com')")
    val addonVersion = when(col("active_addons").isNotNull &&
      size(followon) > 0, element_at(followon, 1).getField("version"))

    exploded.withColumn("type", typeExpr)
      .withColumn("addon_version", addonVersion)
  }

  /** aggregates.py:129-179: aggregate + pivot on search type. */
  def aggSearchData(ms: DataFrame, groupingCols: Seq[String],
      aggFunctions: Seq[Column]): DataFrame = {
    val augmented = addDerivedColumns(explodeSearchCounts(ms))
    val aggregated = augmented.groupBy((groupingCols :+ "type").map(col): _*)
      .agg((aggFunctions :+ sum("count").as("count")).head,
        (aggFunctions :+ sum("count").as("count")).tail: _*)
    val pivotGroup = aggregated.columns.filterNot(Seq("type", "count").contains)
    aggregated.groupBy(pivotGroup.map(col): _*)
      .pivot("type", Seq("organic", "tagged-sap", "tagged-follow-on", "sap",
        "unknown", "ad-click", "search-with-ads"))
      .sum("count")
      .withColumn("tagged_sap", col("tagged-sap"))
      .withColumn("tagged_follow_on", col("tagged-follow-on"))
      .withColumn("ad_click", col("ad-click"))
      .withColumn("search_with_ads", col("search-with-ads"))
  }

  private def aggFirstNamed(c: String): Column = first(col(c)).as(c)

  /** aggregates.py:55-105: per-(client, day, engine, source) rollup. */
  def searchClientsDaily(ms: DataFrame): DataFrame =
    aggSearchData(ms,
      Seq("client_id", "submission_date", "engine", "source"),
      Seq("country", "app_version", "distribution_id", "locale",
        "user_pref_browser_search_region", "search_cohort", "addon_version",
        "os", "os_version", "channel", "profile_creation_date",
        "default_search_engine", "default_search_engine_data_load_path",
        "default_search_engine_data_submission_url", "sample_id")
        .map(aggFirstNamed) ++
        Seq(
          count(when(col("subsession_counter") === 1, 1))
            .as("sessions_started_on_this_day"),
          first(datediff(col("subsession_start_date"),
            from_unixtime(col("profile_creation_date") * 24 * 60 * 60)))
            .as("profile_age_in_days"),
          sum(col("subsession_length") / 3600.0).as("subsession_hours_sum"),
          avg(size(col("active_addons"))).as("active_addons_count_mean"),
          max(col("scalar_parent_browser_engagement_max_concurrent_tab_count"))
            .as("max_concurrent_tab_count_max"),
          sum(col("scalar_parent_browser_engagement_tab_open_event_count"))
            .as("tab_open_event_count_sum"),
          sum(col("active_ticks") * 5 / 3600.0).as("active_hours_sum")))

  /** aggregates.py:108-126: executive dashboard rollup. */
  def searchAggregates(ms: DataFrame): DataFrame =
    aggSearchData(ms,
      Seq("addon_version", "app_version", "country", "distribution_id",
        "engine", "locale", "os", "os_version", "search_cohort", "source",
        "submission_date", "default_search_engine"),
      Seq.empty)
      .where(col("engine").isNotNull)
}
