package graft.jobs.clientsdaily

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The clients_daily aggregator list — the ~100-expression mixed aggregate
  * (SURVEY §2.5 A1) ported from the reference's field table
  * (mozetl/clientsdaily/fields.py:35-206).
  *
  * Faithful semantics notes:
  *  - `aggFirst` is first(ignoreNulls = true) (fields.py:26-27); the
  *    city/geo/country conditionals use first WITHOUT ignoreNulls
  *    (fields.py:60-76), exactly as the reference does.
  *  - Unit conversions (active_ticks → hours etc.) keep the reference's
  *    exact arithmetic (fields.py:43-47,186-201).
  */
object Fields {

  def aggSum(field: String, alias: String = null, expression: Column = null): Column = {
    val a = if (alias != null) alias else s"${field}_sum"
    val e = if (expression != null) expression else col(field)
    sum(e).as(a)
  }

  def aggMean(field: String, alias: String = null): Column = {
    val a = if (alias != null) alias else s"${field}_mean"
    avg(col(field)).as(a)
  }

  def aggFirst(field: String): Column =
    first(col(field), ignoreNulls = true).as(field)

  def aggMax(field: String, alias: String = null): Column = {
    val a = if (alias != null) alias else s"${field}_max"
    max(col(field)).as(a)
  }

  /** Country-gated geo cleanup (fields.py:56-76): city/subdivisions only
    * count when country is well-formed; note first() here keeps nulls.
    */
  private def geoFirst(inner: String, alias: String): Column =
    first(expr(
      s"IF(country IS NOT NULL AND country != '??'," +
        s" IF($inner IS NOT NULL, $inner, '??'), NULL)")).as(alias)

  private val fieldAggregators: Vector[Column] = Vector(
    aggSum("aborts_content"),
    aggSum("aborts_gmplugin"),
    aggSum("aborts_plugin"),
    aggMean("active_addons_count"),
    // MAIN_SUMMARY_FIELD_AGGREGATORS inserts active_experiment_* here (idx 4)
    aggSum("active_ticks", alias = "active_hours_sum",
      expression = expr("active_ticks/(3600.0/5)")),
    aggFirst("addon_compatibility_check_enabled"),
    aggFirst("app_build_id"),
    aggFirst("app_display_version"),
    aggFirst("app_name"),
    aggFirst("app_version"),
    aggFirst("blocklist_enabled"),
    aggFirst("channel"),
    geoFirst("city", "city"),
    geoFirst("geo_subdivision1", "geo_subdivision1"),
    geoFirst("geo_subdivision2", "geo_subdivision2"),
    // EXPERIMENT_FIELD_AGGREGATORS inserts experiment_branch here (idx 15)
    first(expr("IF(country IS NOT NULL AND country != '??', country, NULL)"))
      .as("country"),
    aggSum("crashes_detected_content"),
    aggSum("crashes_detected_gmplugin"),
    aggSum("crashes_detected_plugin"),
    aggSum("crash_submit_attempt_content"),
    aggSum("crash_submit_attempt_main"),
    aggSum("crash_submit_attempt_plugin"),
    aggSum("crash_submit_success_content"),
    aggSum("crash_submit_success_main"),
    aggSum("crash_submit_success_plugin"),
    aggFirst("default_search_engine"),
    aggFirst("default_search_engine_data_load_path"),
    aggFirst("default_search_engine_data_name"),
    aggFirst("default_search_engine_data_origin"),
    aggFirst("default_search_engine_data_submission_url"),
    aggSum("devtools_toolbox_opened_count"),
    aggFirst("distribution_id"),
    aggFirst("e10s_enabled"),
    aggFirst("env_build_arch"),
    aggFirst("env_build_id"),
    aggFirst("env_build_version"),
    aggMean("first_paint"),
    aggFirst("flash_version"),
    aggFirst("install_year"),
    aggFirst("is_default_browser"),
    aggFirst("is_wow64"),
    aggFirst("locale"),
    aggFirst("memory_mb"),
    aggFirst("os"),
    aggFirst("os_service_pack_major"),
    aggFirst("os_service_pack_minor"),
    aggFirst("os_version"),
    aggFirst("normalized_channel"),
    countDistinct(col("document_id")).as("pings_aggregated_by_this_row"),
    aggMean("places_bookmarks_count"),
    aggMean("places_pages_count"),
    aggSum("plugin_hangs"),
    aggSum("plugins_infobar_allow"),
    aggSum("plugins_infobar_block"),
    aggSum("plugins_infobar_shown"),
    aggSum("plugins_notification_shown"),
    first(expr(
      "datediff(subsession_start_date, " +
        "from_unixtime(profile_creation_date*24*60*60))"))
      .as("profile_age_in_days"),
    first(expr("from_unixtime(profile_creation_date*24*60*60)"))
      .as("profile_creation_date"),
    aggSum("push_api_notify"),
    aggFirst("sample_id"),
    aggFirst("scalar_parent_aushelper_websense_reg_version"),
    aggMax("scalar_parent_browser_engagement_max_concurrent_tab_count"),
    aggMax("scalar_parent_browser_engagement_max_concurrent_window_count"),
    aggSum("scalar_parent_browser_engagement_tab_open_event_count"),
    aggSum("scalar_parent_browser_engagement_total_uri_count"),
    aggSum("scalar_parent_browser_engagement_unfiltered_uri_count"),
    aggMax("scalar_parent_browser_engagement_unique_domains_count"),
    aggMean("scalar_parent_browser_engagement_unique_domains_count"),
    aggSum("scalar_parent_browser_engagement_window_open_event_count"),
    aggSum("scalar_parent_devtools_copy_full_css_selector_opened"),
    aggSum("scalar_parent_devtools_copy_unique_css_selector_opened"),
    aggSum("scalar_parent_devtools_toolbar_eyedropper_opened"),
    aggSum("scalar_parent_dom_contentprocess_troubled_due_to_memory"),
    aggSum("scalar_parent_navigator_storage_estimate_count"),
    aggSum("scalar_parent_navigator_storage_persist_count"),
    aggFirst("scalar_parent_services_sync_fxa_verification_method"),
    aggSum("scalar_parent_storage_sync_api_usage_extensions_using"),
    aggFirst("scalar_parent_telemetry_os_shutting_down"),
    aggSum("scalar_parent_webrtc_nicer_stun_retransmits"),
    aggSum("scalar_parent_webrtc_nicer_turn_401s"),
    aggSum("scalar_parent_webrtc_nicer_turn_403s"),
    aggSum("scalar_parent_webrtc_nicer_turn_438s"),
    aggFirst("search_cohort"),
    aggSum("search_count_all"),
    aggSum("search_count_abouthome"),
    aggSum("search_count_contextmenu"),
    aggSum("search_count_newtab"),
    aggSum("search_count_searchbar"),
    aggSum("search_count_system"),
    aggSum("search_count_urlbar"),
    aggMean("session_restored"),
    aggSum("subsession_counter", alias = "sessions_started_on_this_day",
      expression = expr("IF(subsession_counter = 1, 1, 0)")),
    aggSum("shutdown_kill"),
    aggSum("subsession_length", alias = "subsession_hours_sum",
      expression = expr("subsession_length/3600.0")),
    aggSum("ssl_handshake_result_failure"),
    aggSum("ssl_handshake_result_success"),
    aggFirst("sync_configured"),
    aggSum("sync_count_desktop"),
    aggSum("sync_count_mobile"),
    aggFirst("telemetry_enabled"),
    aggFirst("timezone_offset"),
    aggSum("total_time", alias = "total_hours_sum",
      expression = expr("total_time/3600.0")),
    aggFirst("vendor"),
    aggSum("web_notification_shown"),
    aggFirst("windows_build_number"),
    aggFirst("windows_ubr")
  )

  /** fields.py:208-213: clients_daily inserts active_experiment_* at 4. */
  val mainSummaryFieldAggregators: Seq[Column] =
    fieldAggregators.take(4) ++
      Seq(aggFirst("active_experiment_branch"),
        aggFirst("active_experiment_id")) ++
      fieldAggregators.drop(4)

  /** fields.py:216-218: experiments_daily inserts experiment_branch at 15. */
  val experimentFieldAggregators: Seq[Column] =
    fieldAggregators.take(15) ++
      Seq(aggFirst("experiment_branch")) ++
      fieldAggregators.drop(15)

  /** fields.py:221-223. */
  val activityDateColumn: Column =
    expr("substr(subsession_start_date, 1, 10)").as("activity_date")

  val nullStringColumn: Column = expr("STRING(NULL)")
}
