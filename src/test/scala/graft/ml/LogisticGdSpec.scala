package graft.ml

import graft.SparkSpec

/** Integer-GD logistic regression: weights match an independent plain-Scala
  * replay of the algorithm, the hard-sigmoid link clamps, updates are
  * exact truncating division, partition invariance.
  */
class LogisticGdSpec extends SparkSpec {
  import spark.implicits._

  // (y, bias, x1, x2)
  private val rows = Seq(
    (1L, 1L, 3L, 0L), (1L, 1L, 4L, 1L), (1L, 1L, 5L, 0L),
    (0L, 1L, 0L, 2L), (0L, 1L, 1L, 3L), (0L, 1L, 0L, 4L),
    (1L, 1L, 2L, 1L), (0L, 1L, 1L, 1L))
  private def df = rows.toDF("y", "x0", "x1", "x2")

  /** Independent replay: plain Scala longs, same spec. */
  private def replay(rounds: Int, etaDen: Long): Array[Long] = {
    val w = Array(0L, 0L, 0L)
    for (_ <- 1 to rounds) {
      val g = Array(0L, 0L, 0L)
      for ((y, x0, x1, x2) <- rows) {
        val xs = Array(x0, x1, x2)
        val z = (0 to 2).map(i => w(i) * xs(i)).sum
        val p = math.min(math.max(500000L + z / 4, 0L), 1000000L)
        val err = y * 1000000L - p
        (0 to 2).foreach(i => g(i) += err * xs(i))
      }
      (0 to 2).foreach(i => w(i) += g(i) / (etaDen * rows.size))
    }
    w
  }

  "fit" should "match an independent integer replay across rounds" in {
    for (rounds <- 1 to 3) {
      LogisticGd.fit(df, "y", Seq("x0", "x1", "x2"), rounds,
        etaDen = 10L) shouldBe replay(rounds, 10L)
    }
  }

  it should "be invariant under repartitioning (exact integer sums)" in {
    val a = LogisticGd.fit(df, "y", Seq("x0", "x1", "x2"), 3)
    val b = LogisticGd.fit(df.repartition(5), "y", Seq("x0", "x1", "x2"), 3)
    a shouldBe b
  }

  it should "learn the signal direction on separable data" in {
    val w = LogisticGd.fit(df, "y", Seq("x0", "x1", "x2"), 3)
    w(1) should be > 0L // x1 high for positives
    w(2) should be < 0L // x2 high for negatives
  }

  "predict" should "clamp the hard sigmoid to [0, 1e6]" in {
    val scored = LogisticGd.predict(
      Seq((1L, 100L), (1L, -100L), (1L, 0L)).toDF("x0", "x1"),
      Seq("x0", "x1"), Array(0L, 100000L))
      .select("p_micro").collect().map(_.getLong(0))
    scored should contain theSameElementsAs Seq(1000000L, 0L, 500000L)
  }
}
