package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Single-pass dataset profiling: exact-regime values, null accounting,
  * single-scan plan shape, and the column-subset API.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), "x"),
    (2L, Some("b"), "x"),
    (3L, Some("a"), "y"),
    (4L, None, "x")
  ).toDF("id", "opt", "cat")

  "Profile.profile" should "report counts, nulls, cardinality and top " +
      "values per column" in {
    val got = Profile.profile(fixture)
      .collect().map(r => r.getString(0) -> r).toMap
    got.keySet shouldBe Set("id", "opt", "cat")
    val id = got("id")
    id.getLong(1) shouldBe 4L // n_rows
    id.getLong(2) shouldBe 0L // n_null
    id.getLong(3) shouldBe 4L // est_distinct (exact below k)
    val opt = got("opt")
    opt.getLong(2) shouldBe 1L
    opt.getLong(3) shouldBe 2L
    opt.getString(4) shouldBe "a" // top value (exact regime)
    opt.getLong(5) shouldBe 2L
    val cat = got("cat")
    cat.getString(4) shouldBe "x"
    cat.getLong(5) shouldBe 3L
  }

  it should "profile an all-null column as null top_value, zero counts" in {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "gone")
    val got = Profile.profile(df, Seq("gone")).collect().head
    got.getLong(1) shouldBe 2L
    got.getLong(2) shouldBe 2L
    got.getLong(3) shouldBe 0L
    got.isNullAt(4) shouldBe true
    got.getLong(5) shouldBe 0L
  }

  it should "profile every column in ONE scan (single aggregate over " +
      "one relation)" in {
    val plan = Profile.profile(fixture).queryExecution.optimizedPlan
    var rels = 0
    plan.foreach {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        rels += 1
      case _ =>
    }
    rels shouldBe 1
  }
}
