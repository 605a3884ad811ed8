package graft.operators

import graft.SparkSpec

/** Snapshot diff: add/remove/change classification, null-safe column
  * comparison, changed-column naming, unchanged suppression.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq(
    (1L, Some("alpha"), "en"),
    (2L, Some("bravo"), "en"),
    (3L, Some("charlie"), "fr"),
    (4L, None: Option[String], "de"),
    (5L, Some("echo"), "en")
  ).toDF("id", "text", "lang")

  private val cur = Seq(
    (1L, Some("alpha"), "en"),         // unchanged
    (2L, Some("bravo2"), "en"),        // text changed
    (3L, Some("charlie"), "en"),       // lang changed
    (4L, Some("delta"), "de"),         // NULL -> value counts as change
    (6L, Some("foxtrot"), "en")        // added; 5 removed
  ).toDF("id", "text", "lang")

  private def run(includeUnchanged: Boolean = false) =
    SnapshotDiff.diff(old, cur, Seq("id"), Seq("text", "lang"),
        includeUnchanged)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  "diff" should "classify added, removed and changed rows" in {
    run() shouldBe Array(
      (2L, "changed", "text"),
      (3L, "changed", "lang"),
      (4L, "changed", "text"),
      (5L, "removed", ""),
      (6L, "added", ""))
  }

  it should "include unchanged rows only on request" in {
    val withAll = run(includeUnchanged = true)
    withAll.length shouldBe 6
    withAll.head shouldBe ((1L, "unchanged", ""))
  }

  it should "name every changed column, sorted" in {
    val both = SnapshotDiff.diff(
      Seq((9L, "a", "x")).toDF("id", "text", "lang"),
      Seq((9L, "b", "y")).toDF("id", "text", "lang"),
      Seq("id"), Seq("text", "lang")).collect()
    both.map(r => (r.getLong(0), r.getString(1), r.getString(2))) shouldBe
      Array((9L, "changed", "lang,text"))
  }

  it should "not flag NULL == NULL as a change" in {
    val o = Seq((1L, None: Option[String])).toDF("id", "text")
    val n = Seq((1L, None: Option[String])).toDF("id", "text")
    SnapshotDiff.diff(o, n, Seq("id"), Seq("text")).count() shouldBe 0L
  }

  it should "support composite keys" in {
    val o = Seq(("s1", 1L, 10.0), ("s1", 2L, 20.0)).toDF("src", "k", "v")
    val n = Seq(("s1", 1L, 10.0), ("s2", 2L, 20.0)).toDF("src", "k", "v")
    val rows = SnapshotDiff.diff(o, n, Seq("src", "k"), Seq("v"))
      .orderBy("src", "k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    rows shouldBe Array(("s1", 2L, "removed"), ("s2", 2L, "added"))
  }
}
