package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0 until 400)
    .map(i => (i.toLong, (i * 29 % 777).toDouble)).toDF("pid", "x")

  private def ranges = Seq(
    (0L, 0.0, 100.0), (1L, 90.0, 300.0), (2L, 300.0, 301.0),
    (3L, 512.0, 777.0)
  ).toDF("rid", "lo", "hi")

  private def withWidth[A](w: Option[Double])(body: => A): A = {
    RangeJoinRewrite.install(spark)
    w.foreach(v => spark.conf.set(RangeJoinRewrite.WidthConf, v.toString))
    try body
    finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  private def bnlj(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.queryExecution.toRdd.foreach(_ => ())
    df.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin")
  }

  it should "rewrite a user-written theta join to a bucketed equi-join" in {
    withWidth(Some(100.0)) {
      val joined = points.join(ranges, $"x" >= $"lo" && $"x" < $"hi")
      bnlj(joined) shouldBe false
      // identical rows to the explicit bucketed operator
      rowsOf(joined, "pid", "rid") shouldBe
        rowsOf(graft.operators.RangeJoin.pointInInterval(
          points, "x", ranges, "lo", "hi", 100.0), "pid", "rid")
    }
  }

  it should "stay inert without the width conf" in {
    RangeJoinRewrite.install(spark)
    val joined = points.join(ranges, $"x" >= $"lo" && $"x" < $"hi")
    bnlj(joined) shouldBe true
  }

  it should "rewrite flipped comparison orders identically" in {
    withWidth(Some(64.0)) {
      val flipped = points.join(ranges, $"lo" <= $"x" && $"hi" > $"x")
      bnlj(flipped) shouldBe false
      rowsOf(flipped, "pid", "rid") shouldBe
        rowsOf(graft.operators.RangeJoin.pointInInterval(
          points, "x", ranges, "lo", "hi", 64.0), "pid", "rid")
    }
  }

  it should "add the bucket key inside a composite equi+range condition" in {
    withWidth(Some(100.0)) {
      // the common production shape: hash key + range — the rewrite must
      // ADD the bucket equality next to the user's key equality (so the
      // hash join runs on (key, bucket), splitting skewed keys), not bail
      val keyedRanges = ranges.withColumn("rk", $"rid" % 2)
      val keyedPoints = points.withColumn("pk", $"pid" % 2)
      val joined = keyedPoints.join(keyedRanges,
        $"pk" === $"rk" && $"x" >= $"lo" && $"x" < $"hi")
      // the optimized plan carries the generated bucket column
      joined.queryExecution.optimizedPlan.toString should
        include(RangeJoinRewrite.BucketPrefix)
      // and the physical join is an equi-join (hash/sort-merge), never a
      // nested loop (executedPlan is AQE-wrapped; match on the string form
      // like the other cases)
      joined.queryExecution.toRdd.foreach(_ => ())
      val planStr = joined.queryExecution.executedPlan.toString
      planStr should not include "BroadcastNestedLoopJoin"
      (planStr.contains("HashJoin") ||
        planStr.contains("SortMergeJoin")) shouldBe true
      // oracle: the same composite join without the rule
      val expected = keyedPoints.join(keyedRanges, Seq(), "cross")
        .filter($"pk" === $"rk" && $"x" >= $"lo" && $"x" < $"hi")
      rowsOf(joined, "pid", "rid") shouldBe rowsOf(expected, "pid", "rid")
    }
  }

  it should "leave composite joins on their hash plan when disabled by conf" in {
    withWidth(Some(100.0)) {
      spark.conf.set(RangeJoinRewrite.CompositeConf, "false")
      try {
        val keyedRanges = ranges.withColumn("rk", $"rid" % 2)
        val keyedPoints = points.withColumn("pk", $"pid" % 2)
        val joined = keyedPoints.join(keyedRanges,
          $"pk" === $"rk" && $"x" >= $"lo" && $"x" < $"hi")
        // no bucket fan-out: the user's equi key hash-joins as before
        joined.queryExecution.optimizedPlan.toString should
          not include RangeJoinRewrite.BucketPrefix
        // pure range joins still rewrite under the same conf
        val pure = points.join(ranges, $"x" >= $"lo" && $"x" < $"hi")
        bnlj(pure) shouldBe false
      } finally spark.conf.unset(RangeJoinRewrite.CompositeConf)
    }
  }

  it should "disable the rewrite (not throw) on a malformed width conf" in {
    RangeJoinRewrite.install(spark)
    spark.conf.set(RangeJoinRewrite.WidthConf, "not-a-number")
    try {
      val joined = points.join(ranges, $"x" >= $"lo" && $"x" < $"hi")
      // the optimizer must not propagate a NumberFormatException; the
      // join silently stays on its naive plan
      joined.count() shouldBe graft.operators.RangeJoin.pointInInterval(
        points, "x", ranges, "lo", "hi", 100.0).count()
    } finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  it should "not re-fire on its own output (idempotent under composite)" in {
    withWidth(Some(100.0)) {
      val joined = points.join(ranges, $"x" >= $"lo" && $"x" < $"hi")
      // exactly ONE fan-out Generate in the optimized plan: the rule fired
      // once and its bucket marker stopped every later optimizer pass from
      // re-bucketing the (now equi+range) condition
      val generates = joined.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }
      generates.size shouldBe 1
      joined.count() shouldBe graft.operators.RangeJoin.pointInInterval(
        points, "x", ranges, "lo", "hi", 100.0).count()
    }
  }

  it should "not re-bucket explicit RangeJoin operator plans" in {
    withWidth(Some(100.0)) {
      // the operator's internal bucket column carries the rule's marker
      // prefix, so a width-conf session doesn't stack a second fan-out
      // on plans the user already bucketed explicitly
      val op = graft.operators.RangeJoin.pointInInterval(
        points, "x", ranges, "lo", "hi", 100.0)
      val generates = op.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }
      generates.size shouldBe 1
    }
  }

  it should "rewrite when the point side is on the right" in {
    withWidth(Some(50.0)) {
      val joined = ranges.join(points, $"x" >= $"lo" && $"x" < $"hi")
      bnlj(joined) shouldBe false
      rowsOf(joined, "pid", "rid") shouldBe
        rowsOf(graft.operators.RangeJoin.pointInInterval(
          points, "x", ranges, "lo", "hi", 50.0), "pid", "rid")
    }
  }
}
