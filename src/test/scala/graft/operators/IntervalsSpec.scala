package graft.operators

import graft.SparkSpec

/** Interval union: overlap merge, touching intervals, disjoint spans,
  * degenerate/invalid rows, coverage accounting, partition invariance.
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def spans(rows: Seq[(String, Long, Long)]) =
    Intervals.mergeOverlaps(rows.toDF("k", "s", "e"), "k", "s", "e")
      .orderBy("k", "span_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  "mergeOverlaps" should "merge overlapping and touching intervals" in {
    // [0,10) ∪ [5,15) ∪ [15,20) -> one span [0,20); [30,35) separate
    val got = spans(Seq(("a", 0L, 10L), ("a", 5L, 15L), ("a", 15L, 20L),
      ("a", 30L, 35L)))
    got shouldBe Array(("a", 0L, 20L, 3L, 20L), ("a", 30L, 35L, 1L, 5L))
  }

  it should "keep intervals contained in earlier ones in the same span" in {
    // [0,100) swallows [10,20) and [30,40)
    val got = spans(Seq(("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L)))
    got shouldBe Array(("a", 0L, 100L, 3L, 100L))
  }

  it should "scope keys independently and drop invalid rows" in {
    val df = Seq(("a", Some(0L), Some(10L)), ("b", Some(0L), Some(10L)),
      ("a", Some(20L), None), ("a", Some(9L), Some(5L)))
      .toDF("k", "s", "e")
    val got = Intervals.mergeOverlaps(df, "k", "s", "e").collect()
    got.length shouldBe 2 // one valid span per key
  }

  "coverage" should "report the double-counting removed by the merge" in {
    val df = Seq(("a", 0L, 10L), ("a", 5L, 15L)).toDF("k", "s", "e")
    val r = Intervals.coverage(df, "k", "s", "e").collect().head
    r.getLong(1) shouldBe 2L // n_intervals
    r.getLong(2) shouldBe 1L // n_spans
    r.getLong(3) shouldBe 20L // raw
    r.getLong(4) shouldBe 15L // covered
    r.getLong(5) shouldBe 5L // overlap removed
  }

  it should "be invariant under repartitioning" in {
    val rows = (1L to 200L).map(i =>
      ("k", (i * 13) % 97, (i * 13) % 97 + (i % 9) + 1))
    val a = spans(rows)
    val b = Intervals.mergeOverlaps(
        rows.toDF("k", "s", "e").repartition(7), "k", "s", "e")
      .orderBy("k", "span_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    b shouldBe a
  }
}
