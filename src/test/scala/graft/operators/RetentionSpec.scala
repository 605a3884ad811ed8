package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")

  it should "bucket entities into first-seen cohorts with offsets" in {
    // 2024-01-01 is a Monday; epoch-day/7 periods roll on Thursdays —
    // days 1-3 and 4-10 land in different periods
    val events = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(5)), // cohort w0, active w0+w1
      (2L, ts(2)), // cohort w0 only
      (3L, ts(5)), (3L, ts(12)) // cohort w1, active w1+w2
    ).toDF("user_id", "t")
    val got = Retention.cohorts(events, "user_id", "t", periodDays = 7)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val w0 = got.keys.map(_._1).min
    got((w0, 0L)) shouldBe 2L // users 1, 2
    got((w0, 1L)) shouldBe 1L // user 1 returns
    got((w0 + 1, 0L)) shouldBe 1L // user 3's cohort
    got((w0 + 1, 1L)) shouldBe 1L
    got.values.sum shouldBe 5L // distinct (user, period) pairs
  }

  it should "count a chatty entity once per period" in {
    val events = Seq((1L, ts(1)), (1L, ts(1)), (1L, ts(2)))
      .toDF("user_id", "t")
    val got = Retention.cohorts(events, "user_id", "t", periodDays = 7)
      .as[(Long, Long, Long)].collect().toSeq
    got.map(_._3) shouldBe Seq(1L)
  }

  it should "reject a non-positive period" in {
    val events = Seq((1L, ts(1))).toDF("user_id", "t")
    an[IllegalArgumentException] should be thrownBy
      Retention.cohorts(events, "user_id", "t", periodDays = 0)
  }
}
