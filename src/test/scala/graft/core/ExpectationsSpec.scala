package graft.core

import graft.SparkSpec
import Expectations._

/** Expectations: per-check violation counts, one-pass report shape,
  * NULL handling, referential integrity.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10.0), "F", "ok-1"),
    (2L, Some("b"), Some(-5.0), "O", "ok-2"),
    (3L, None: Option[String], Some(20.0), "X", "bad"),
    (3L, Some("d"), None: Option[Double], "F", "ok-3")
  ).toDF("id", "name", "score", "status", "tag")

  private def report(checks: Seq[Check]): Map[String, (Long, Int)] =
    validate(df, checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap

  "validate" should "count violations per check in one pass" in {
    val r = report(Seq(
      NotNull("name"),
      Unique(Seq("id")),
      InRange("score", 0.0, 100.0),
      InSet("status", Seq("F", "O", "P")),
      Matches("tag", "^ok-[0-9]$"),
      RowCountBetween(1, 10)))
    r("not_null(name)") shouldBe ((1L, 0))
    r("unique(id)") shouldBe ((1L, 0))          // id 3 appears twice
    r("in_range(score)") shouldBe ((1L, 0))     // -5.0
    r("in_set(status)") shouldBe ((1L, 0))      // X
    r("matches(tag)") shouldBe ((1L, 0))        // "bad"
    r("row_count") shouldBe ((0L, 1))
  }

  it should "pass a clean table" in {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val r = validate(clean,
      Seq(NotNull("name"), Unique(Seq("id")), RowCountBetween(2, 2)))
      .collect()
    all(r.map(_.getInt(2))) shouldBe 1
  }

  it should "not count NULLs as range/set/regex violations" in {
    val r = report(Seq(InRange("score", -100, 100), Matches("name", ".*")))
    r("in_range(score)") shouldBe ((0L, 1))
    r("matches(name)") shouldBe ((0L, 1))
  }

  it should "fail row_count outside the declared bounds" in {
    report(Seq(RowCountBetween(5, 9)))("row_count") shouldBe ((1L, 0))
  }

  "subsetOf" should "count dangling foreign keys" in {
    val dim = Seq(1L, 2L).toDF("k")
    val fact = Seq(1L, 1L, 2L, 3L, 4L).toDF("fk")
    val r = subsetOf(fact, "fk", dim, "k").head()
    (r.getString(0), r.getLong(1), r.getInt(2)) shouldBe
      (("subset_of(fk)", 2L, 0))
  }

  it should "ignore NULL foreign keys" in {
    val dim = Seq(1L).toDF("k")
    val fact = Seq(Some(1L), None).toDF("fk")
    subsetOf(fact, "fk", dim, "k").head().getLong(1) shouldBe 0L
  }
}
