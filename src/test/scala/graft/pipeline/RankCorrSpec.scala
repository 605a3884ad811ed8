package graft.pipeline

import graft.SparkSpec
import graft.operators.RankCorr

/** Spearman rank correlation (operators/RankCorr): pinned values on
  * monotone/reversed/tied fixtures, parity with a direct textbook
  * computation, grouped variant, degenerate groups, partition
  * invariance.
  */
class RankCorrSpec extends SparkSpec {
  import spark.implicits._

  behavior of "RankCorr.spearman"

  it should "be 1 for a monotone relation and -1 for its reverse" in {
    // ±1 up to the one-ulp slack of sqrt(vx)·sqrt(vy) vs the exact
    // integer moments (the gate needs determinism, not prettiness: the
    // oracle replays the identical IEEE op sequence)
    val up = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0))
      .toDF("x", "y")
    RankCorr.spearman(up, "x", "y").head().getDouble(1) shouldBe
      1.0 +- 1e-12
    val down = Seq((1.0, 40.0), (2.0, 30.0), (3.0, 20.0), (4.0, 10.0))
      .toDF("x", "y")
    RankCorr.spearman(down, "x", "y").head().getDouble(1) shouldBe
      -1.0 +- 1e-12
  }

  it should "match the textbook average-rank computation with ties" in {
    val rows = (1 to 50).map { i =>
      val x = ((i * 2654435761L) % 7L).toDouble
      val y = ((i * 40503L) % 5L).toDouble
      (x, y)
    }
    def avgRanks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted.zipWithIndex
      val byVal = sorted.groupBy(_._1)
        .map { case (value, xs) =>
          value -> (xs.map(_._2 + 1.0).sum / xs.size)
        }
      v.map(byVal)
    }
    val rx = avgRanks(rows.map(_._1))
    val ry = avgRanks(rows.map(_._2))
    val n = rows.size
    val mx = rx.sum / n
    val my = ry.sum / n
    val num = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum) *
      math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    val expected = num / den
    val got = RankCorr.spearman(rows.toDF("x", "y"), "x", "y")
      .head().getDouble(1)
    got shouldBe expected +- 1e-12
  }

  it should "compute per-group rho with NULL for constant variables" in {
    val df = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 3.0), ("a", 3.0, 5.0),
      ("b", 1.0, 7.0), ("b", 2.0, 7.0), ("b", 3.0, 7.0) // y constant
    ).toDF("g", "x", "y")
    val out = RankCorr.spearman(df, "x", "y", Seq("g"))
      .orderBy("g").collect()
    out(0).getDouble(2) shouldBe 1.0 +- 1e-12
    out(1).isNullAt(2) shouldBe true
    out(1).getLong(1) shouldBe 3L
  }

  it should "be invariant to partitioning" in {
    val df = (1 to 80).map(i =>
      (((i * 31L) % 13L).toDouble, ((i * 17L) % 11L).toDouble))
      .toDF("x", "y")
    val a = RankCorr.spearman(df, "x", "y").head().getDouble(1)
    val b = RankCorr.spearman(df.repartition(9), "x", "y")
      .head().getDouble(1)
    a shouldBe b
  }
}
