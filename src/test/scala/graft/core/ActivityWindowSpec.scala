package graft.core

import java.time.LocalDate
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** tests/test_utils.py:39-60 — the two meaningful cases: DAU (0 days back)
  * and MAU (28 days back), expected values copied verbatim.
  */
class ActivityWindowSpec extends AnyFlatSpec with Matchers {

  it should "compute the DAU window (0 days back)" in {
    ActivityWindow.generateFilterParameters(LocalDate.of(2017, 1, 31), 0) shouldBe
      ActivityWindow.FilterParameters(
        minActivityIso = "2017-01-31",
        maxActivityIso = "2017-02-01",
        minSubmissionString = "20170131",
        maxSubmissionString = "20170210")
  }

  it should "compute the MAU window (28 days back)" in {
    ActivityWindow.generateFilterParameters(LocalDate.of(2017, 1, 31), 28) shouldBe
      ActivityWindow.FilterParameters(
        minActivityIso = "2017-01-03",
        maxActivityIso = "2017-02-01",
        minSubmissionString = "20170103",
        maxSubmissionString = "20170210")
  }
}
