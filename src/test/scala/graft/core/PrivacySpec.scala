package graft.core

import graft.SparkSpec

/** k-anonymity audit: group sizing, NULL-as-value grouping, violating-row
  * extraction, summary counters.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI = (zip, age_band); the ("94110", "30s") combo has 3 rows, the
  // ("94110", "40s") combo 1 row, the (NULL, "30s") combo 2 rows
  private val people = Seq(
    (1L, Some("94110"), "30s"),
    (2L, Some("94110"), "30s"),
    (3L, Some("94110"), "30s"),
    (4L, Some("94110"), "40s"),
    (5L, None: Option[String], "30s"),
    (6L, None: Option[String], "30s")
  ).toDF("id", "zip", "age_band")

  "kAnonymityReport" should "size every QI combination and flag below k" in {
    val rows = Privacy.kAnonymityReport(people, Seq("zip", "age_band"), 3)
      .orderBy("zip", "age_band")
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2),
        r.getInt(3)))
    rows shouldBe Array(
      (None, "30s", 2L, 1),
      (Some("94110"), "30s", 3L, 0),
      (Some("94110"), "40s", 1L, 1))
  }

  it should "treat NULL as an identifying value, not drop it" in {
    val atRisk = Privacy.kAnonymityReport(people, Seq("zip", "age_band"), 3)
      .where("at_risk = 1").count()
    atRisk shouldBe 2L
  }

  it should "reject a trivial k" in {
    an[IllegalArgumentException] should be thrownBy
      Privacy.kAnonymityReport(people, Seq("zip"), 1)
  }

  "violatingRows" should "return exactly the rows in under-k groups" in {
    val ids = Privacy.violatingRows(people, Seq("zip", "age_band"), 3)
      .select("id").as[Long].collect().sorted
    ids shouldBe Array(4L, 5L, 6L)
  }

  "kAnonymitySummary" should "report group counts, rows at risk and achieved k" in {
    val r = Privacy.kAnonymitySummary(people, Seq("zip", "age_band"), 3)
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ((3L, 2L, 3L, 1L))
  }

  it should "report achieved_k = min group size even when nothing violates" in {
    val r = Privacy.kAnonymitySummary(people, Seq("age_band"), 2)
      .collect().head
    // one group ("30s" x5, "40s" x1): 40s violates k=2
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ((2L, 1L, 1L, 1L))
  }

  "lDiversityReport" should "flag homogeneous groups k-anonymity accepts" in {
    val df = Seq(
      ("94110", "flu"), ("94110", "flu"), ("94110", "flu"), // k=3, l=1
      ("94611", "flu"), ("94611", "cold"), ("94611", "ok")  // k=3, l=3
    ).toDF("zip", "diagnosis")
    val rows = Privacy.lDiversityReport(df, Seq("zip"), "diagnosis", 2)
      .orderBy("zip").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    rows shouldBe Array(
      ("94110", 3L, 1L, 1),
      ("94611", 3L, 3L, 0))
  }

  it should "count NULL as one sensitive value" in {
    val df = Seq(("z", Some("flu")), ("z", None), ("z", None))
      .toDF("zip", "diagnosis")
    val r = Privacy.lDiversityReport(df, Seq("zip"), "diagnosis", 3)
      .collect().head
    r.getLong(2) shouldBe 2L // flu + NULL
    r.getInt(3) shouldBe 1
  }

  it should "reject a sensitive column that is also a QI" in {
    an[IllegalArgumentException] should be thrownBy
      Privacy.lDiversityReport(people, Seq("zip"), "zip", 2)
  }
}
