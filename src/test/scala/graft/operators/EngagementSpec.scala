package graft.operators

import graft.SparkSpec

/** Rolling actives: hand-computed WAU windows, dedup of repeat
  * activity, window-edge behavior, range clipping, partition
  * invariance.
  */
class EngagementSpec extends SparkSpec {
  import spark.implicits._

  private def curve(rows: Seq[(Long, Long)], w: Int): Map[Long, Long] =
    Engagement.rollingActives(rows.toDF("u", "d"), "u", "d", w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  "rollingActives" should "count trailing-window distinct users" in {
    // u1 active d1, d2; u2 active d1; u3 active d4
    val m = curve(Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 4L)), 3)
    m(1L) shouldBe 2L // u1, u2
    m(2L) shouldBe 2L
    m(3L) shouldBe 2L // u1 (d2 within [1,3]), u2 (d1)
    m(4L) shouldBe 2L // u1 (d2 in [2,4]), u3
    m.keySet.max shouldBe 4L // clipped to observed range
  }

  it should "count a user once no matter how many rows they produce" in {
    val m = curve(Seq((1L, 1L), (1L, 1L), (1L, 1L), (2L, 1L)), 1)
    m(1L) shouldBe 2L
  }

  it should "reduce to daily actives at window 1" in {
    val m = curve(Seq((1L, 1L), (2L, 1L), (1L, 3L)), 1)
    m shouldBe Map(1L -> 2L, 3L -> 1L) // day 2 has no activity: no row
  }

  it should "cover gap days inside a window" in {
    // activity only on day 1; window 3 keeps days 2 and 3 alive
    val m = curve(Seq((1L, 1L), (2L, 5L)), 3)
    m(2L) shouldBe 1L
    m(3L) shouldBe 1L
    m.get(4L) shouldBe None // window expired, no activity
  }

  it should "be invariant under repartitioning" in {
    val rows = (1L to 300L).map(i => (i % 23, (i * 7) % 31))
    val a = curve(rows, 7)
    val b = Engagement.rollingActives(
        rows.toDF("u", "d").repartition(9), "u", "d", 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a shouldBe b
  }
}
