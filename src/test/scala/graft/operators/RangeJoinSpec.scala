package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0 until 500)
    .map(i => (i.toLong, (i * 37 % 1000).toDouble)).toDF("pid", "x")

  // overlapping, irregular intervals incl. one empty and one edge-aligned
  private def ranges = Seq(
    (0L, 0.0, 250.0), (1L, 200.0, 400.0), (2L, 390.0, 391.0),
    (3L, 500.0, 600.0), (4L, 955.5, 1000.0), (5L, 100.0, 100.0)
  ).toDF("rid", "lo", "hi")

  it should "match the naive theta-join exactly" in {
    val bucketed = RangeJoin.pointInInterval(
      points, "x", ranges, "lo", "hi", bucketWidth = 64.0)
    val naive = points.join(ranges, $"x" >= $"lo" && $"x" < $"hi")
    rowsOf(bucketed, "pid", "rid") shouldBe rowsOf(naive, "pid", "rid")
    bucketed.count() should be > 0L
  }

  it should "be width-insensitive (correctness never depends on the tuning knob)" in {
    val expected = rowsOf(RangeJoin.pointInInterval(
      points, "x", ranges, "lo", "hi", bucketWidth = 64.0), "pid", "rid")
    for (w <- Seq(1.0, 10.0, 250.0, 10000.0))
      rowsOf(RangeJoin.pointInInterval(
        points, "x", ranges, "lo", "hi", bucketWidth = w),
        "pid", "rid") shouldBe expected
  }

  it should "plan an equi-join, not a nested loop" in {
    val bucketed = RangeJoin.pointInInterval(
      points, "x", ranges, "lo", "hi", bucketWidth = 64.0)
    bucketed.queryExecution.toRdd.foreach(_ => ())
    bucketed.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin") shouldBe false
    // the naive inequality join nested-loops — the wall this operator removes
    val naive = points.join(ranges, $"x" >= $"lo" && $"x" < $"hi")
    naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin") shouldBe true
  }

  it should "emit each overlapping interval pair exactly once" in {
    val l = Seq((0L, 0.0, 10.0), (1L, 5.0, 300.0), (2L, 600.0, 700.0))
      .toDF("lid", "l_lo", "l_hi")
    val r = Seq((0L, 8.0, 12.0), (1L, 250.0, 650.0), (2L, 900.0, 950.0))
      .toDF("rid", "r_lo", "r_hi")
    val out = RangeJoin.intervalOverlap(
      l, "l_lo", "l_hi", r, "r_lo", "r_hi", bucketWidth = 50.0)
    val naive = l.join(r, $"l_lo" < $"r_hi" && $"r_lo" < $"l_hi")
    // wide intervals share many buckets — dedup-at-overlap-start must
    // still emit each pair exactly once (count equality, not set equality)
    out.groupBy("lid", "rid").count().filter($"count" > 1).count() shouldBe 0
    rowsOf(out, "lid", "rid") shouldBe rowsOf(naive, "lid", "rid")
  }

  it should "match the naive overlap join on random intervals at any width" in {
    for (seed <- Seq(3, 17)) {
      val rng = new scala.util.Random(seed)
      def intervals(n: Int, pfx: String) = (0 until n).map { i =>
        val lo = rng.nextDouble() * 900
        (i.toLong, lo, lo + 1 + rng.nextDouble() * 120)
      }.toDF(s"${pfx}id", s"${pfx}lo", s"${pfx}hi")
      val l = intervals(60, "l")
      val r = intervals(60, "r")
      val naive = rowsOf(
        l.join(r, $"llo" < $"rhi" && $"rlo" < $"lhi"), "lid", "rid")
      for (w <- Seq(7.0, 64.0, 500.0)) {
        val out = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi", w)
        withClue(s"seed $seed width $w: ") {
          out.groupBy("lid", "rid").count()
            .filter($"count" > 1).count() shouldBe 0
          rowsOf(out, "lid", "rid") shouldBe naive
        }
      }
    }
  }
}
