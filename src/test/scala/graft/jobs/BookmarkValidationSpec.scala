package graft.jobs

import graft.SparkSpec
import graft.jobs.sync.BookmarkValidation
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class BookmarkValidationSpec extends SparkSpec {

  // sync_summary nested schema (FIXTURES.md §3, tests/test_sync_bookmark.py:12-64)
  private val problemType = StructType(Seq(
    StructField("name", StringType), StructField("count", LongType)))
  private val validationType = StructType(Seq(
    StructField("version", LongType), StructField("checked", LongType),
    StructField("took", LongType),
    StructField("problems", ArrayType(problemType))))
  private val engineType = StructType(Seq(
    StructField("name", StringType), StructField("status", StringType),
    StructField("failure_reason", StructType(Seq(StructField("name", StringType)))),
    StructField("validation", validationType)))
  private val syncSchema = StructType(Seq(
    StructField("app_build_id", StringType),
    StructField("app_version", StringType),
    StructField("app_display_version", StringType),
    StructField("app_name", StringType),
    StructField("app_channel", StringType),
    StructField("uid", StringType),
    StructField("device_id", StringType),
    StructField("when", LongType),
    StructField("failure_reason", StructType(Seq(StructField("name", StringType)))),
    StructField("status", StructType(Seq(StructField("sync", StringType)))),
    StructField("engines", ArrayType(engineType)),
    StructField("submission_date_s3", StringType)))

  private def engine(name: String = "bookmarks",
      problems: Seq[Row] = Seq(Row("missing", 2L)),
      checked: java.lang.Long = 100L): Row =
    Row(name, "ok", null,
      Row(1L, checked, 5L, if (problems == null) null else problems))

  private def syncRow(uid: String, deviceId: String, when: Long,
      engines: Seq[Row], failureReason: Row = null): Row =
    Row("build1", "54.0", "54.0", "Firefox", "release", uid, deviceId, when,
      failureReason, Row("success"), engines, "20170101")

  it should "flatten engines and problems with LATERAL VIEW OUTER" in {
    val data = Seq(
      syncRow("u1", "d1", 1483228800000L, Seq(
        engine(problems = Seq(Row("missing", 2L), Row("orphans", 1L))),
        engine(name = "history", problems = null))),
      syncRow("u2", "d2", 1483228900000L, Seq(
        engine(problems = null))),
      syncRow("u3", "d3", 1483229000000L, Seq(engine()),
        failureReason = Row("network")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), syncSchema)
      .createOrReplaceTempView("sync_summary")

    val ev = BookmarkValidation.engineValidations(spark)
    // u3 is dropped (ping-level failure); u1 bookmarks → 2 problem rows,
    // u1 history + u2 bookmarks → 1 null-problem row each (OUTER explode)
    ev.count() shouldBe 4
    val (problems, aggs) = BookmarkValidation.transform(spark)
    rowsOf(problems, "uid", "engine_validation_problem_name",
      "engine_validation_problem_count") shouldBe Set(
      Seq("u1", "missing", 2L), Seq("u1", "orphans", 1L))
    val a = aggs.collect().head
    a.getAs[String]("submission_day") shouldBe "20170101"
    a.getAs[Long]("total_bookmark_validations") shouldBe 2L
    a.getAs[Long]("total_validated_users") shouldBe 2L
    // NOTE: faithful reference over-count — `checked` is summed over the
    // problem-flattened rows (u1 contributes 2×100), bookmark_validation.py:78
    a.getAs[Long]("total_bookmarks_checked") shouldBe 300L
    // sync_day derives from the ms-epoch `when` column
    ev.select("sync_day").distinct().collect()
      .map(_.getString(0)).toSet shouldBe Set("20170101")
  }

  private def register(rows: Seq[Row]): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), syncSchema)
      .createOrReplaceTempView("sync_summary")

  // tests/test_sync_bookmark.py:195-282 — the bookmarks-buffered engine
  // counts toward problems alongside plain bookmarks; non-bookmark
  // engines and failed pings never do
  it should "sum validation problems across bookmark engine variants" in {
    register(Seq(
      syncRow("f1", "d", 1483228800000L,
        Seq(engine(name = "not bookmarks", problems = null)),
        failureReason = Row("some failure")),
      syncRow("u1", "d", 1483228800000L,
        Seq(engine(name = "not bookmarks", problems = null))),
      syncRow("u2", "d", 1483228800000L, Seq(engine(problems = null))),
      syncRow("u3", "d", 1483228800000L,
        Seq(engine(problems = Seq(Row("1", 1L))))),
      syncRow("u4", "d", 1483228800000L, Seq(
        engine(name = "not bookmarks", problems = null),
        engine(problems = Seq(Row("2", 10L))),
        engine(problems = Seq(Row("3", 100L), Row("4", 1000L))))),
      syncRow("u5", "d", 1483228800000L, Seq(
        engine(name = "bookmarks-buffered",
          problems = Seq(Row("new problem", 50L), Row("another problem", 4L))))),
      syncRow("u6", "d", 1483228800000L,
        Seq(engine(name = "bookmarks-buffered", problems = null)))))
    val (problems, _) = BookmarkValidation.transform(spark)
    problems.count() shouldBe 6
    def psum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(org.apache.spark.sql.functions.sum(
        "engine_validation_problem_count")).head.getLong(0)
    psum(problems) shouldBe 1165L
    psum(problems.where(
      org.apache.spark.sql.functions.col("engine_name") === "bookmarks")) shouldBe 1111L
    psum(problems.where(org.apache.spark.sql.functions
      .col("engine_name") === "bookmarks-buffered")) shouldBe 54L
  }

  // tests/test_sync_bookmark.py:302-316 — duplicate (uid, device, when)
  // validations collapse in the distinct count
  it should "count distinct validations across duplicate pings" in {
    register(Seq(
      syncRow("0", "0", 1483228800000L, Seq(engine())),
      syncRow("0", "1", 1483228800000L, Seq(engine())),
      syncRow("1", "0", 1483228800000L, Seq(engine())),
      syncRow("1", "1", 1483228800000L, Seq(engine())),
      syncRow("1", "1", 1483228800000L, Seq(engine())),
      syncRow("1", "1", 1483228800000L, Seq(engine()))))
    val (_, aggs) = BookmarkValidation.transform(spark)
    aggs.count() shouldBe 1
    aggs.head.getAs[Long]("total_bookmark_validations") shouldBe 4L
  }

  // tests/test_sync_bookmark.py:319-341 — users count by SUBMISSION day,
  // not sync day: a user whose `when` falls on the previous day still
  // counts toward the partition day being processed
  it should "count distinct users per submission day regardless of sync day" in {
    val day1 = 1483228800000L            // 2017-01-01
    val day2 = day1 - 86400000L          // 2016-12-31
    register(Seq(
      syncRow("0", "d", day1, Seq(engine())),
      syncRow("1", "d", day1, Seq(engine())),
      syncRow("1", "d", day2, Seq(engine())),
      syncRow("1", "d", day2, Seq(engine())),
      syncRow("2", "d", day2, Seq(engine()))))
    val (_, aggs) = BookmarkValidation.transform(spark)
    val a = aggs.collect()
    a.length shouldBe 1
    a.head.getAs[String]("submission_day") shouldBe "20170101"
    a.head.getAs[Long]("total_validated_users") shouldBe 3L
  }
}
