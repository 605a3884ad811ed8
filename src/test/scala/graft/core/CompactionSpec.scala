package graft.core

import graft.SparkSpec

/** Compaction planning: greedy sequential fill, oversized files,
  * per-group planning, summary, determinism.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val files = Seq(
    ("f1", 40L), ("f2", 40L), ("f3", 40L), // 0,40,80 -> bins 0,0,0
    ("f4", 40L),                           // offset 120 -> bin 1
    ("f5", 300L),                          // offset 160 -> bin 1 (oversized)
    ("f6", 10L)                            // offset 460 -> bin 4
  ).toDF("file", "size")

  "planBins" should "fill bins sequentially toward the target" in {
    val plan = Compaction.planBins(files, "file", "size", 100L)
      .orderBy("file").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(2)))
    plan shouldBe Array(
      ("f1", 0L, 0L), ("f2", 0L, 40L), ("f3", 0L, 80L),
      ("f4", 1L, 120L), ("f5", 1L, 160L), ("f6", 4L, 460L))
  }

  it should "give an oversized file its span without splitting it" in {
    val plan = Compaction.planBins(files, "file", "size", 100L)
    // f5 (300 bytes) stays whole in bin 1; f6 lands past its span
    plan.where("file = 'f6'").select("bin").as[Long].collect()
      .head shouldBe 4L
  }

  it should "plan per group with no cross-group carryover" in {
    val parts = Seq(
      ("p1", "a", 60L), ("p1", "b", 60L),
      ("p2", "c", 60L), ("p2", "d", 60L)
    ).toDF("part", "file", "size")
    val plan = Compaction.planBins(parts, "file", "size", 100L,
        groupCols = Seq("part"))
      .orderBy("part", "file").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    // each partition restarts at offset 0; both files fit bin 0 under
    // the exclusive-prefix rule (second file's offset 60 < 100)
    plan shouldBe Array(
      ("p1", "a", 0L), ("p1", "b", 0L),
      ("p2", "c", 0L), ("p2", "d", 0L))
  }

  it should "respect a caller-supplied layout order" in {
    val df = Seq(("fb", 60L, 2), ("fa", 60L, 1)).toDF("file", "size", "z")
    val byZ = Compaction.planBins(df, "file", "size", 100L,
        orderCols = Seq("z"))
      .orderBy("z").collect().map(r => (r.getString(0), r.getLong(3)))
    // z-order puts fa first: offsets 0 and 60, not 60 and 0
    byZ shouldBe Array(("fa", 0L), ("fb", 60L))
  }

  it should "be invariant under input partitioning" in {
    val a = Compaction.planBins(files, "file", "size", 100L)
      .orderBy("file").collect().map(_.toSeq)
    val b = Compaction.planBins(files.repartition(5), "file", "size", 100L)
      .orderBy("file").collect().map(_.toSeq)
    a shouldBe b
  }

  "binSummary" should "count files and bytes per bin" in {
    val plan = Compaction.planBins(files, "file", "size", 100L)
    val sum = Compaction.binSummary(plan, "size")
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    sum shouldBe Array((0L, 3L, 120L), (1L, 2L, 340L), (4L, 1L, 10L))
  }

  it should "reject a non-positive target" in {
    an[IllegalArgumentException] should be thrownBy
      Compaction.planBins(files, "file", "size", 0L)
  }
}
