package graft.operators

import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // 10 calm points then a spike; ord is just an index
  private def series = ((1 to 10).map(i => ("k", i.toLong, 10.0 + (i % 3))) :+
    (("k", 11L, 100.0))).toDF("k", "o", "v")

  it should "flag a spike against the trailing window, self excluded" in {
    val got = Anomaly.trailingZScore(series, "k", Seq("o"), "v",
      lookback = 8, minN = 4, threshold = 3.0)
      .select("o", "n_window", "z", "is_anomaly")
      .as[(Long, Long, Option[Double], Int)].collect()
      .map(r => r._1 -> r).toMap
    got(11L)._4 shouldBe 1 // the spike
    got(11L)._3.get should be > 50.0 // self-exclusion keeps sigma tiny
    got(10L)._4 shouldBe 0 // calm point before it
    // warm-up: fewer than minN preceding points → no z, never flagged
    got(1L)._3 shouldBe None
    got(4L)._3 shouldBe None
    got(5L)._3.isDefined shouldBe true
    got(5L)._2 shouldBe 4L
  }

  it should "emit null z for a constant (zero-variance) window" in {
    val flat = (1 to 6).map(i => ("k", i.toLong, 5.0)).toDF("k", "o", "v")
    val got = Anomaly.trailingZScore(flat, "k", Seq("o"), "v",
      lookback = 4, minN = 2)
      .select("o", "z").as[(Long, Option[Double])].collect().toMap
    got(6L) shouldBe None
  }

  it should "reject inconsistent window settings" in {
    an[IllegalArgumentException] should be thrownBy
      Anomaly.trailingZScore(series, "k", Seq("o"), "v",
        lookback = 4, minN = 10)
  }

  behavior of "Anomaly.robustZ"

  it should "match the hand-computed median/MAD score" in {
    // values 1..5: median 3, |dev| = {2,1,0,1,2}, MAD = 1
    // robust_z(5) = 0.6745 * (5-3) / 1 = 1.349
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("g", "v")
    val z = Anomaly.robustZ(df, Seq("g"), "v")
      .filter($"v" === 5.0).select("robust_z").as[Double].head()
    z shouldBe (0.6745 * 2.0) +- 1e-12
  }

  it should "resist masking by a huge outlier" in {
    // classic z: the 1000 inflates sigma so much its own z stays < 3 and
    // nothing else flags; robust z still scores it enormous
    val df = ((1 to 20).map(i => ("g", 10.0 + (i % 3))) :+ (("g", 1000.0)))
      .toDF("g", "v")
    val rz = Anomaly.robustZ(df, Seq("g"), "v")
      .filter($"v" === 1000.0).select("robust_z").as[Double].head()
    rz should be > 100.0
  }

  it should "emit NULL when at least half the group sits on the median" in {
    val df = (Seq.fill(6)(("g", 5.0)) :+ (("g", 9.0))).toDF("g", "v")
    val out = Anomaly.robustZ(df, Seq("g"), "v")
      .filter($"v" === 9.0).select("robust_z")
    out.collect()(0).isNullAt(0) shouldBe true
  }

  it should "scope medians per group" in {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 100.0), ("b", 200.0), ("b", 300.0)).toDF("g", "v")
    val out = Anomaly.robustZ(df, Seq("g"), "v")
      .select("g", "grp_median").distinct()
      .as[(String, Double)].collect().toMap
    out shouldBe Map("a" -> 2.0, "b" -> 200.0)
  }
}
