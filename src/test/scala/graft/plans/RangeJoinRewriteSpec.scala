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

  it should "leave equi-joins and flipped comparisons semantically intact" in {
    withWidth(Some(64.0)) {
      // equi conjunct present → Spark hash-joins it; rule must not touch
      val dim = Seq((0L, 0.0, 500.0)).toDF("k", "dlo", "dhi")
      val pts = points.withColumn("k", $"pid" % 1)
      val equi = pts.join(dim, Seq("k")).filter($"x" >= $"dlo" && $"x" < $"dhi")
      equi.count() should be > 0L
      // flipped writing order still rewrites and matches
      val flipped = points.join(ranges, $"lo" <= $"x" && $"hi" > $"x")
      bnlj(flipped) shouldBe false
      rowsOf(flipped, "pid", "rid") shouldBe
        rowsOf(graft.operators.RangeJoin.pointInInterval(
          points, "x", ranges, "lo", "hi", 64.0), "pid", "rid")
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
