package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the other product-analytics staple next to the
  * funnel: group entities by their first-activity period (the cohort),
  * then count how many are still active N periods later.
  *
  * Plan shape: one grouped min (first activity per entity), a broadcast-
  * or hash-join back onto the entity's activity periods, a distinct on
  * (cohort, offset, entity) — dedup BEFORE the count so a chatty entity
  * counts once per period — and the final count. Every stage keys on the
  * entity or the (cohort, offset) pair; nothing is driver-side and no
  * stage carries event payloads past the first projection.
  */
object Retention {

  /** (cohort_period, period_offset, n_active) — entities first seen in
    * `cohort_period` that were active `period_offset` periods later
    * (offset 0 = the cohort size itself). Periods are day-based:
    * `periodDays` = 7 for weekly cohorts, 30 for monthly-ish.
    */
  def cohorts(df: DataFrame, entityCol: String, tsCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays > 0, "periodDays must be positive")
    // integer period index from the epoch day — engine-portable exact
    // arithmetic (no calendar months, whose lengths engines disagree on)
    val period = floor(datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))) / periodDays).cast("long")
    val activity = df.select(col(entityCol).as("entity"),
      period.as("period")).distinct()
    val firstSeen = activity.groupBy("entity")
      .agg(min("period").as("cohort_period"))
    // activity is already distinct on (entity, period) and cohort_period
    // is functionally dependent on entity, so the triple is unique — no
    // second distinct (it would cost a full extra exchange)
    activity.join(firstSeen, Seq("entity"))
      .select(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"),
        col("entity"))
      .groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("n_active"))
  }
}
