package graft.jobs

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Mini main_summary schema + defaults for job specs — the reference test
  * suite's field-tuple pattern (tests/test_search_aggregates.py:26-160,
  * FIXTURES.md §1/§2).
  */
object MainSummaryFixture {

  /** active_addons element — field order matters in the reference (its UDF
    * used positional access); we keep the order for schema parity.
    */
  val addonType: StructType = StructType(Seq(
    StructField("addon_id", StringType),
    StructField("blocklisted", BooleanType),
    StructField("name", StringType),
    StructField("user_disabled", BooleanType),
    StructField("app_disabled", BooleanType),
    StructField("version", StringType),
    StructField("scope", LongType),
    StructField("type", StringType),
    StructField("foreign_install", BooleanType),
    StructField("has_binary_components", BooleanType),
    StructField("install_day", LongType),
    StructField("update_day", LongType),
    StructField("signed_state", LongType),
    StructField("is_system", BooleanType),
    StructField("is_web_extension", BooleanType),
    StructField("multiprocess_compatible", BooleanType)))

  def addon(id: String, version: String = "1.0", isSystem: Boolean = false,
      foreignInstall: Boolean = false, isWebExtension: Boolean = false,
      installDay: Long = 16000L): Row =
    Row(id, false, s"name-$id", false, false, version, 1L, "extension",
      foreignInstall, false, installDay, 16001L, 2L, isSystem,
      isWebExtension, true)

  val searchCountType: StructType = StructType(Seq(
    StructField("engine", StringType),
    StructField("source", StringType),
    StructField("count", LongType)))

  def searchCount(engine: String = "google", source: String = "urlbar",
      count: Long = 4L): Row = Row(engine, source, count)

  private val longSumFields = Seq(
    "aborts_content", "aborts_gmplugin", "aborts_plugin", "active_ticks",
    "crashes_detected_content", "crashes_detected_gmplugin",
    "crashes_detected_plugin", "crash_submit_attempt_content",
    "crash_submit_attempt_main", "crash_submit_attempt_plugin",
    "crash_submit_success_content", "crash_submit_success_main",
    "crash_submit_success_plugin", "devtools_toolbox_opened_count",
    "plugin_hangs", "plugins_infobar_allow", "plugins_infobar_block",
    "plugins_infobar_shown", "plugins_notification_shown", "push_api_notify",
    "scalar_parent_browser_engagement_max_concurrent_tab_count",
    "scalar_parent_browser_engagement_max_concurrent_window_count",
    "scalar_parent_browser_engagement_tab_open_event_count",
    "scalar_parent_browser_engagement_total_uri_count",
    "scalar_parent_browser_engagement_unfiltered_uri_count",
    "scalar_parent_browser_engagement_unique_domains_count",
    "scalar_parent_browser_engagement_window_open_event_count",
    "scalar_parent_devtools_copy_full_css_selector_opened",
    "scalar_parent_devtools_copy_unique_css_selector_opened",
    "scalar_parent_devtools_toolbar_eyedropper_opened",
    "scalar_parent_dom_contentprocess_troubled_due_to_memory",
    "scalar_parent_navigator_storage_estimate_count",
    "scalar_parent_navigator_storage_persist_count",
    "scalar_parent_storage_sync_api_usage_extensions_using",
    "scalar_parent_webrtc_nicer_stun_retransmits",
    "scalar_parent_webrtc_nicer_turn_401s",
    "scalar_parent_webrtc_nicer_turn_403s",
    "scalar_parent_webrtc_nicer_turn_438s", "subsession_counter",
    "shutdown_kill", "subsession_length", "ssl_handshake_result_failure",
    "ssl_handshake_result_success", "sync_count_desktop",
    "sync_count_mobile", "total_time", "web_notification_shown",
    "active_addons_count", "first_paint", "places_bookmarks_count",
    "places_pages_count", "session_restored", "install_year", "memory_mb",
    "os_service_pack_major", "os_service_pack_minor", "timezone_offset",
    "windows_build_number", "windows_ubr", "profile_creation_date")

  private val stringFields = Seq(
    "client_id", "document_id", "sample_id", "submission_date",
    "submission_date_s3", "subsession_start_date", "app_build_id",
    "app_display_version", "app_name", "app_version", "channel", "city",
    "geo_subdivision1", "geo_subdivision2", "country",
    "default_search_engine", "default_search_engine_data_load_path",
    "default_search_engine_data_name", "default_search_engine_data_origin",
    "default_search_engine_data_submission_url", "distribution_id",
    "env_build_arch", "env_build_id", "env_build_version", "flash_version",
    "locale", "os", "os_version", "normalized_channel",
    "scalar_parent_aushelper_websense_reg_version",
    "scalar_parent_services_sync_fxa_verification_method", "search_cohort",
    "vendor", "active_experiment_branch", "active_experiment_id",
    "experiment_id", "experiment_branch",
    "user_pref_browser_search_region")

  private val boolFields = Seq(
    "addon_compatibility_check_enabled", "blocklist_enabled", "e10s_enabled",
    "is_default_browser", "is_wow64", "sync_configured", "telemetry_enabled",
    "scalar_parent_telemetry_os_shutting_down")

  /** active_theme shares the addon struct (main_summary.v4.schema.json).
    */
  val activeThemeType: StructType = addonType

  /** events element (main_summary.v4.schema.json `events`). */
  val eventType: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("category", StringType),
    StructField("method", StringType),
    StructField("object", StringType),
    StructField("string_value", StringType),
    StructField("map_values", MapType(StringType, StringType))))

  val attributionType: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("medium", StringType),
    StructField("campaign", StringType),
    StructField("content", StringType)))

  val userPrefsType: StructType = StructType(Seq(
    StructField("dom_ipc_process_count", LongType),
    StructField("extensions_allow_non_mpc_extensions", BooleanType)))

  val loopActivityType: StructType = StructType(
    Seq("open_panel", "open_conversation", "room_open", "room_share",
      "room_delete").map(StructField(_, LongType)))

  val pluginsNotificationType: StructType = StructType(
    Seq("allow_now", "allow_always", "block").map(StructField(_, LongType)))

  /** popup_notification_stats map value struct (22 counters). */
  val popupNotificationType: StructType = StructType(
    (Seq("offered", "action_1", "action_2", "action_3", "action_last",
      "dismissal_click_elsewhere", "dismissal_leave_page",
      "dismissal_close_button", "dismissal_not_now", "open_submenu",
      "learn_more") ++
      Seq("offered", "action_1", "action_2", "action_3", "action_last",
        "dismissal_click_elsewhere", "dismissal_leave_page",
        "dismissal_close_button", "dismissal_not_now", "open_submenu",
        "learn_more").map("reopen_" + _)).map(StructField(_, LongType)))

  /** The five per-source navigation scalars plus the other
    * map<string,int> histogram columns.
    */
  val intMapFields: Seq[String] = Seq(
    "ssl_handshake_result",
    "scalar_parent_browser_engagement_navigation_about_home",
    "scalar_parent_browser_engagement_navigation_about_newtab",
    "scalar_parent_browser_engagement_navigation_contextmenu",
    "scalar_parent_browser_engagement_navigation_searchbar",
    "scalar_parent_browser_engagement_navigation_urlbar",
    "scalar_parent_storage_sync_api_usage_items_stored",
    "scalar_parent_storage_sync_api_usage_storage_consumed",
    "scalar_parent_browser_search_ad_clicks",
    "scalar_parent_browser_search_with_ads")

  /** Remaining simple main_summary v4 columns (the non-aggregated tail:
    * timestamps, per-subsession histogram totals, etc.) — closes the
    * fixture to the full 135-column surface.
    */
  private val extraLongFields = Seq(
    "timestamp", "push_api_notification_received", "main",
    "max_concurrent_tab_count", "tab_open_event_count",
    "max_concurrent_window_count", "window_open_event_count",
    "total_uri_count", "unfiltered_uri_count", "unique_domains_count",
    "scalar_parent_browser_usage_graphite", "profile_subsession_counter")

  private val extraStringFields = Seq("reason", "client_submission_date")

  val schema: StructType = StructType(
    stringFields.map(StructField(_, StringType)) ++
      extraStringFields.map(StructField(_, StringType)) ++
      longSumFields.map(StructField(_, LongType)) ++
      extraLongFields.map(StructField(_, LongType)) ++
      boolFields.map(StructField(_, BooleanType)) ++
      intMapFields.map(StructField(_, MapType(StringType, LongType))) ++ Seq(
      StructField("search_counts", ArrayType(searchCountType)),
      StructField("active_addons", ArrayType(addonType)),
      StructField("events", ArrayType(eventType)),
      StructField("active_theme", activeThemeType),
      StructField("attribution", attributionType),
      StructField("user_prefs", userPrefsType),
      StructField("loop_activity_counter", loopActivityType),
      StructField("plugins_notification_user_action", pluginsNotificationType),
      StructField("popup_notification_stats",
        MapType(StringType, popupNotificationType)),
      StructField("experiments", MapType(StringType, StringType))))

  /** Base document (tests/test_search_aggregates.py defaults). */
  val base: Map[String, Any] = Map(
    "client_id" -> "a",
    "document_id" -> "doc-a-1",
    "sample_id" -> "42",
    "submission_date" -> "20170101",
    "submission_date_s3" -> "20170101",
    "subsession_start_date" -> "2017-01-01 10:00",
    "app_version" -> "54.0.1",
    "os" -> "windows",
    "os_version" -> "10.0",
    "channel" -> "release",
    "country" -> "DE",
    "city" -> "Berlin",
    "locale" -> "de",
    "user_pref_browser_search_region" -> "DE",
    "default_search_engine" -> "google",
    "subsession_counter" -> 1L,
    "subsession_length" -> 3600L,
    "active_ticks" -> 360L,
    "profile_creation_date" -> 16801L,
    "scalar_parent_browser_engagement_tab_open_event_count" -> 5L,
    "scalar_parent_browser_engagement_max_concurrent_tab_count" -> 10L,
    "search_counts" -> Seq(searchCount()),
    "active_addons" -> Seq(
      addon("followonsearch@mozilla.com", version = "0.9.5"),
      addon("some@addon")),
    "ssl_handshake_result" -> Map("0" -> 10L, "1" -> 1L),
    "experiments" -> Map("exp-1" -> "control"),
    "active_theme" -> addon("theme@mozilla.org", version = "1.2"),
    "attribution" -> Row("google", "organic", null, null),
    "events" -> Seq(
      Row(1000L, "navigation", "search", "urlbar", null,
        Map("engine" -> "google"))))
}
