package graft.ml

import graft.SparkSpec

/** Fixed-grid Epanechnikov KDE: hand-computed kernel sums, zero cells on
  * the spine, out-of-grid and negative samples, normalization shape,
  * partition invariance.
  */
class KdeSpec extends SparkSpec {
  import spark.implicits._

  private def run(xs: Seq[Long], lo: Long, step: Long, n: Int, h: Long) =
    Kde.densityGrid(xs.toDF("v"), "v", lo, step, n, h)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  "densityGrid" should "match hand-computed Epanechnikov sums" in {
    // xs = {0, 10}, grid {0, 5, 10}, h = 7:
    //   k=0: t=0 -> 750000;            (x=10 out of reach)
    //   k=1: t=±5 -> (750000*24)//49 = 367346 each -> 734692
    //   k=2: t=0 -> 750000
    val got = run(Seq(0L, 10L), 0L, 5L, 3, 7L)
    got.map(_._3) shouldBe Array(750000L, 734692L, 750000L)
    got.map(_._2) shouldBe Array(0L, 5L, 10L)
    got(0)._4 shouldBe 750000.0 / 1000000.0 / 2.0 / 7.0
  }

  it should "emit zero rows for unreached grid points" in {
    val got = run(Seq(100L), 0L, 5L, 3, 7L)
    got.map(_._3) shouldBe Array(0L, 0L, 0L)
    got.map(_._4) shouldBe Array(0.0, 0.0, 0.0)
  }

  it should "handle negative samples (trunc-div range widening)" in {
    // x = -3, h = 7: only k=0 reached, t=3 -> (750000*40)//49 = 612244
    val got = run(Seq(-3L), 0L, 5L, 3, 7L)
    got.map(_._3) shouldBe Array(612244L, 0L, 0L)
  }

  it should "exclude the |t| = h boundary (strict inequality)" in {
    val got = run(Seq(7L), 0L, 7L, 2, 7L)
    // k=0: t=7 -> outside; k=1: t=0 -> 750000
    got.map(_._3) shouldBe Array(0L, 750000L)
  }

  it should "be invariant under repartitioning" in {
    val xs = (1 to 200).map(i => (i * 37 % 100).toLong)
    val a = run(xs, 0L, 10L, 11, 15L)
    val b = Kde.densityGrid(xs.toDF("v").repartition(7), "v",
        0L, 10L, 11, 15L)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    a shouldBe b
  }
}
