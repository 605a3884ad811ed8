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
}
