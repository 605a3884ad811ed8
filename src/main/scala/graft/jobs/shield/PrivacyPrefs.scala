package graft.jobs.shield

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.jobs.basic.Transform
import graft.jobs.basic.Transform.{ColumnConfig, FrameConfig}

/** Shield privacy-prefs study ETL (mozetl/shield/privacy_prefs.py:21-92).
  *
  * Raw `shield-study` pings (a JSON-string column, the fixture stand-in
  * for the moztelemetry source per SURVEY S5) are projected twice — state
  * pings key the study name under `payload/study_name`, event pings under
  * `payload/study` (the bug the reference documents at :18-19) — filtered
  * to the privacy study, unioned, and written as one parquet partition
  * per submission date.
  */
object PrivacyPrefs {

  val ShieldAddonId = "@shield-study-privacy"

  private val commonColumns = Seq(
    ColumnConfig("client_id", "clientId"),
    ColumnConfig("branch", "payload/branch"),
    ColumnConfig("study_state", "payload/study_state"),
    ColumnConfig("event", "payload/event"),
    ColumnConfig("originDomain", "payload/originDomain"),
    ColumnConfig("breakage", "payload/breakage"),
    ColumnConfig("notes", "payload/notes"))

  /** STUDY_STATE_DATAFRAME_COLUMN_CONFIGS + include_state_pings (:31-62). */
  val stateConfig: FrameConfig = FrameConfig(
    commonColumns :+ ColumnConfig("study", "payload/study_name"),
    col("study") === ShieldAddonId)

  /** STUDY_EVENT_DATAFRAME_COLUMN_CONFIGS + include_event_pings (:35-59). */
  val eventConfig: FrameConfig = FrameConfig(
    commonColumns :+ ColumnConfig("study", "payload/study"),
    col("study") === ShieldAddonId)

  def transformStatePings(pings: DataFrame): DataFrame =
    Transform.convertPings(pings, stateConfig)

  def transformEventPings(pings: DataFrame): DataFrame =
    Transform.convertPings(pings, eventConfig)

  /** etl_job (:65-92): event ∪ state, one output file per date partition. */
  def transform(pings: DataFrame): DataFrame =
    transformEventPings(pings).union(transformStatePings(pings))

  def write(transformed: DataFrame, outPath: String,
      submissionDate: String): String = {
    val path = s"$outPath/submission_date=$submissionDate"
    transformed.coalesce(1).write.mode("overwrite").parquet(path)
    path
  }
}
