package graft.operators

import graft.SparkSpec

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  it should "fold the recurrence in series order regardless of row order" in {
    // rows deliberately shuffled: the sort inside the fold pins the order
    val df = Seq(("k", 3L, 30.0), ("k", 1L, 10.0), ("k", 2L, 20.0))
      .toDF("k", "o", "v")
    val got = Ewma.latest(df, "k", "o", "v", alpha = 0.5)
      .as[(String, Long, Double)].collect().head
    got._2 shouldBe 3L
    // s1=10, s2=.5*20+.5*10=15, s3=.5*30+.5*15=22.5
    got._3 shouldBe 22.5
  }

  it should "return the single value for a one-point series" in {
    val df = Seq(("k", 1L, 42.0)).toDF("k", "o", "v")
    Ewma.latest(df, "k", "o", "v", alpha = 0.3)
      .as[(String, Long, Double)].collect().head._3 shouldBe 42.0
  }

  it should "skip null observations instead of poisoning the fold" in {
    val df = Seq(("k", 1L, Some(10.0)), ("k", 2L, None), ("k", 3L, Some(20.0)))
      .toDF("k", "o", "v")
    val got = Ewma.latest(df, "k", "o", "v", alpha = 0.5)
      .as[(String, Long, Double)].collect().head
    got._2 shouldBe 2L // two folded points
    got._3 shouldBe 15.0
  }

  it should "reject out-of-range alpha" in {
    val df = Seq(("k", 1L, 1.0)).toDF("k", "o", "v")
    an[IllegalArgumentException] should be thrownBy
      Ewma.latest(df, "k", "o", "v", alpha = 0.0)
  }
}
