package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling distinct actives (DAU/WAU/MAU) — "how many distinct users
  * were active in the trailing k days, for every day" — the engagement
  * series under the reference's clients-daily rollups
  * (`clientsdaily/` builds the per-user-day frame; this is the curve
  * computed from it). Exact sliding DISTINCT is the trap here: a
  * windowed countDistinct over raw events re-scans every window, and
  * sketch approaches (HLL) surrender exactness.
  *
  * The presence-smear formulation keeps it exact in ONE linear pass:
  * a user active on day d is by definition "active in the trailing k
  * days" of report days d .. d+k−1, so per-user-day presence rows
  * explode into ≤ k report-day contributions, collapse through a
  * distinct, and ONE count per report day remains. Cost is a bounded
  * ×k fanout of the (user, day) presence table (already deduped, far
  * smaller than events), not ×k window re-scans of the event log —
  * and every step is an exact integer count.
  *
  * Report days are clipped to the observed [min, max] day range;
  * leading days carry partial windows by construction (standard DAU
  * curve semantics).
  */
object Engagement {

  /** (day, n_active) for every day in the observed range whose trailing
    * window saw ≥1 active user, where n_active = distinct `userCol`
    * values with ≥1 row in [day − windowDays + 1, day]. The series is
    * SPARSE: an activity gap longer than `windowDays` yields missing
    * rows, not n_active = 0 (join a `sequence(d_min, d_max)` day spine
    * downstream if dense zeros are needed). `dayCol` must be integral
    * (epoch days).
    */
  def rollingActives(df: DataFrame, userCol: String, dayCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val presence = df
      .filter(col(userCol).isNotNull && col(dayCol).isNotNull)
      .select(col(userCol).as("u"), col(dayCol).cast("long").as("d"))
      .distinct()
    val bounds = presence.agg(min("d").as("d_min"), max("d").as("d_max"))
    val smeared = presence
      .select(col("u"),
        explode(sequence(col("d"),
          col("d") + lit(windowDays.toLong - 1L))).as("day"))
      .distinct()
    smeared
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("d_max"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"))
  }
}
