package graft.jobs

import graft.SparkSpec
import graft.jobs.shield.PrivacyPrefs

/** Port of tests/test_shield_privacy_prefs.py:32-145: state pings key the
  * study under payload.study_name, event pings under payload.study (the
  * field-name inconsistency the reference documents), and the ETL is
  * their union. Raw pings arrive as one JSON-string column.
  */
class PrivacyPrefsSpec extends SparkSpec {
  import spark.implicits._

  private val outCols = Seq("client_id", "branch", "event", "originDomain",
    "breakage", "notes", "study", "study_state")

  private def pings(payloads: String*) =
    payloads.map(p =>
      s"""{"clientId": "aa", "other-ignored-field": "who cares",
           "payload": $p}""").toDF("raw")

  private val statePayload =
    """{"study_name": "@shield-study-privacy",
        "branch": "firstPartyIsolationOpenerAccess",
        "study_state": "running", "study_version": "0.0.4",
        "about": {"_src": "shield", "_v": 2}}"""

  private def eventPayload(event: String, breakage: String = null,
      notes: String = null): String = {
    def q(s: String) = if (s == null) "null" else s""""$s""""
    s"""{"study": "@shield-study-privacy",
         "branch": "thirdPartyCookiesOnlyFromVisited",
         "originDomain": "www.paypal.com", "event": ${q(event)},
         "breakage": ${q(breakage)}, "notes": ${q(notes)},
         "study_version": "0.0.1", "about": {"_src": "addon", "_v": 2}}"""
  }

  it should "project state pings with study_state and study_name" in {
    val out = PrivacyPrefs.transformStatePings(pings(statePayload))
    rowsOf(out, outCols: _*) shouldBe Set(Seq("aa",
      "firstPartyIsolationOpenerAccess", null, null, null, null,
      "@shield-study-privacy", "running"))
  }

  it should "project event pings: page-problem, breakage, and notes" in {
    val out = PrivacyPrefs.transformEventPings(pings(
      eventPayload("page-problem"),
      eventPayload("breakage", breakage = "other"),
      eventPayload("notes", breakage = "other",
        notes = "Paypal prompted me for Reader Mode. WTF?")))
    rowsOf(out, "event", "originDomain", "breakage", "notes") shouldBe Set(
      Seq("page-problem", "www.paypal.com", null, null),
      Seq("breakage", "www.paypal.com", "other", null),
      Seq("notes", "www.paypal.com", "other",
        "Paypal prompted me for Reader Mode. WTF?"))
  }

  it should "union state and event pings and drop other studies" in {
    val out = PrivacyPrefs.transform(pings(
      statePayload,
      eventPayload("disable"),
      """{"study": "@some-other-study", "branch": "b", "event": "disable"}"""))
    out.count() shouldBe 2
    rowsOf(out, "study", "event", "study_state") shouldBe Set(
      Seq("@shield-study-privacy", null, "running"),
      Seq("@shield-study-privacy", "disable", null))
  }
}
