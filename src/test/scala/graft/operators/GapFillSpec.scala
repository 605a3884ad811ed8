package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  private def events = Seq(
    ("a", ts(1, 10), 10.0), ("a", ts(1, 40), 5.0), // hour 1: two events
    ("a", ts(4, 0), 7.0), // hours 2-3 are gaps
    ("b", ts(2, 30), 1.0) // independent, single-bucket range
  ).toDF("k", "t", "v")

  it should "densify each key's range and carry the last sum forward" in {
    val got = GapFill.carryForwardResample(events, "k", "t", "v", "hour")
      .as[(String, Timestamp, Long, Double, Int)].collect()
      .map(r => (r._1, r._2.toString.substring(11, 13)) -> ((r._3, r._4, r._5)))
      .toMap
    got(("a", "01")) shouldBe ((2L, 15.0, 0))
    got(("a", "02")) shouldBe ((0L, 15.0, 1)) // gap, carried
    got(("a", "03")) shouldBe ((0L, 15.0, 1))
    got(("a", "04")) shouldBe ((1L, 7.0, 0))
    got(("b", "02")) shouldBe ((1L, 1.0, 0))
    got.keySet.map(_._1) shouldBe Set("a", "b")
    got.count(_._1._1 == "a") shouldBe 4 // exactly hours 1-4, no global grid
  }

  it should "reject unknown units before touching the plan" in {
    an[IllegalArgumentException] should be thrownBy
      GapFill.carryForwardResample(events, "k", "t", "v", "fortnight")
  }
}
