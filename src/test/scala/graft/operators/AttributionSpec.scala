package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Linear attribution: equal split with remainder-to-latest, exact
  * conservation, horizon filtering, multi-conversion accumulation.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  private val conv = Seq(
    (1L, 100L, ts(60), 10.0),   // user 1 buys 10.0 at t=60m
    (2L, 200L, ts(60), 1.0)     // user 2 buys 1.0
  ).toDF("user_id", "conv_id", "cts", "value")

  private val touch = Seq(
    (1L, 11L, ts(30)), (1L, 12L, ts(50)), (1L, 13L, ts(59)), // 3 in-horizon
    (1L, 14L, ts(61)),                                        // after conv
    (2L, 21L, ts(10)),                                        // in horizon
    (2L, 22L, ts(-70))                                        // too old
  ).toDF("user_id", "touch_id", "tts")

  private def run() = Attribution.linearCredit(conv, touch, "user_id",
      "conv_id", "cts", "value", "touch_id", "tts", horizonSec = 3600L)
    .collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

  "linearCredit" should "split equally with the remainder on the latest touch" in {
    val m = run()
    // 10.0 -> 10_000_000 micro over 3 touches: 3,333,333 each, +1 to latest
    m(11L) shouldBe ((1L, 3333333L, 3.333333))
    m(12L) shouldBe ((1L, 3333333L, 3.333333))
    m(13L) shouldBe ((1L, 3333334L, 3.333334))
  }

  it should "conserve every conversion's value exactly" in {
    val m = run()
    val user1 = m(11L)._2 + m(12L)._2 + m(13L)._2
    user1 shouldBe 10000000L
    m(21L)._2 shouldBe 1000000L
  }

  it should "exclude touches after the conversion or past the horizon" in {
    val m = run()
    m should not contain key(14L)
    m should not contain key(22L)
  }

  it should "accumulate credit across conversions" in {
    val conv2 = Seq(
      (1L, 100L, ts(60), 4.0),
      (1L, 101L, ts(70), 2.0)
    ).toDF("user_id", "conv_id", "cts", "value")
    val t2 = Seq((1L, 11L, ts(55))).toDF("user_id", "touch_id", "tts")
    val m = Attribution.linearCredit(conv2, t2, "user_id", "conv_id",
        "cts", "value", "touch_id", "tts", 3600L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    m(11L) shouldBe ((2L, 6000000L))
  }

  it should "be invariant under repartitioning" in {
    val a = Attribution.linearCredit(conv, touch, "user_id", "conv_id",
        "cts", "value", "touch_id", "tts", 3600L)
      .orderBy("touch_id").collect().map(_.toSeq)
    val b = Attribution.linearCredit(conv.repartition(5),
        touch.repartition(3), "user_id", "conv_id", "cts", "value",
        "touch_id", "tts", 3600L)
      .orderBy("touch_id").collect().map(_.toSeq)
    a shouldBe b
  }
}
