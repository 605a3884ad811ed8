package graft.operators

import graft.SparkSpec

/** Holt linear smoothing: hand-stepped recurrence, trend capture on a
  * ramp, degenerate series, null skipping, determinism.
  */
class HoltSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[Double], alpha: Double = 0.5,
      beta: Double = 0.5, horizon: Int = 1) = {
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("k", "o", "v")
    Holt.latest(df, "k", "o", "v", alpha, beta, horizon)
      .collect().head
  }

  "latest" should "match the hand-stepped recurrence" in {
    // v = [2, 4, 6]; l0=2 b0=0
    // step 4: l = .5*4 + .5*(2+0) = 3; b = .5*(3-2) + .5*0 = 0.5
    // step 6: l = .5*6 + .5*(3.5) = 4.75; b = .5*1.75 + .25 = 1.125
    val r = run(Seq(2.0, 4.0, 6.0))
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe 4.75 +- 1e-12
    r.getDouble(3) shouldBe 1.125 +- 1e-12
    r.getDouble(4) shouldBe (4.75 + 1.125) +- 1e-12
  }

  it should "learn the slope of a clean linear ramp" in {
    val r = run((1 to 40).map(_ * 3.0), alpha = 0.8, beta = 0.8,
      horizon = 2)
    // steady state on v_i = 3i: trend -> 3, forecast ~ level + 6
    r.getDouble(3) shouldBe 3.0 +- 1e-6
    r.getDouble(4) shouldBe (r.getDouble(2) + 6.0) +- 1e-9
  }

  it should "degrade to level = v0, trend = 0 on a single point" in {
    val r = run(Seq(7.5))
    (r.getDouble(2), r.getDouble(3), r.getDouble(4)) shouldBe
      ((7.5, 0.0, 7.5))
  }

  it should "skip nulls before the fold" in {
    val df = Seq(("k", 0, Some(2.0)), ("k", 1, None), ("k", 2, Some(4.0)))
      .toDF("k", "o", "v")
    val r = Holt.latest(df, "k", "o", "v", 0.5, 0.5).collect().head
    r.getLong(1) shouldBe 2L
    r.getDouble(2) shouldBe 3.0 +- 1e-12 // folds [2, 4] only
  }

  it should "be bit-identical under repartitioning" in {
    val df = (1 to 100).map(i => ("k" + i % 3, i, math.sin(i) * 10))
      .toDF("k", "o", "v")
    val a = Holt.latest(df, "k", "o", "v", 0.3, 0.2)
      .orderBy("k").collect().map(_.toSeq)
    val b = Holt.latest(df.repartition(13), "k", "o", "v", 0.3, 0.2)
      .orderBy("k").collect().map(_.toSeq)
    a shouldBe b
  }

  it should "reject out-of-range parameters" in {
    val df = Seq(("k", 0, 1.0)).toDF("k", "o", "v")
    an[IllegalArgumentException] should be thrownBy
      Holt.latest(df, "k", "o", "v", 0.0, 0.5)
    an[IllegalArgumentException] should be thrownBy
      Holt.latest(df, "k", "o", "v", 0.5, 1.5)
    an[IllegalArgumentException] should be thrownBy
      Holt.latest(df, "k", "o", "v", 0.5, 0.5, horizon = -1)
  }
}
