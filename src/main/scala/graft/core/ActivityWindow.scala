package graft.core

import java.time.LocalDate
import java.time.format.DateTimeFormatter.BASIC_ISO_DATE

/** Activity/submission window arithmetic shared by the DAU/MAU-style jobs
  * (mozetl/utils.py:16,34-43): an activity window of `daysBack` days
  * ending at `endDate` (inclusive), with submissions accepted up to
  * ACTIVITY_SUBMISSION_LAG after the end — the batch watermark the
  * streaming module expresses as `withWatermark`.
  */
object ActivityWindow {

  /** utils.py:16 ACTIVITY_SUBMISSION_LAG (10 days of late submissions). */
  val ActivitySubmissionLagDays: Long = 10L

  /** utils.py:34-43 output: ISO activity bounds (max exclusive, hence
    * end+1) and yyyyMMdd submission bounds (max = end + lag).
    */
  final case class FilterParameters(
      minActivityIso: String,
      maxActivityIso: String,
      minSubmissionString: String,
      maxSubmissionString: String)

  def generateFilterParameters(endDate: LocalDate,
      daysBack: Int): FilterParameters = {
    val minActivity = endDate.minusDays(daysBack.toLong)
    FilterParameters(
      minActivityIso = minActivity.toString,
      maxActivityIso = endDate.plusDays(1L).toString,
      minSubmissionString = minActivity.format(BASIC_ISO_DATE),
      maxSubmissionString =
        endDate.plusDays(ActivitySubmissionLagDays).format(BASIC_ISO_DATE))
  }
}
