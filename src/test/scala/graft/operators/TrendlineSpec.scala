package graft.operators

import graft.SparkSpec

/** Trend line: exact fit on a perfect line, hand-computed noisy fit,
  * degenerate groups, group scoping, partition invariance.
  */
class TrendlineSpec extends SparkSpec {
  import spark.implicits._

  private def one(points: Seq[(Double, Double)]) =
    Trendline.fit(points.map(p => ("k", p._1, p._2))
      .toDF("g", "x", "y"), "g", "x", "y").collect().head

  "fit" should "recover a perfect line exactly with R2 = 1" in {
    val r = one(Seq((0.0, 3.0), (1.0, 5.0), (2.0, 7.0), (3.0, 9.0)))
    r.getDouble(2) shouldBe 2.0 +- 1e-9 // slope
    r.getDouble(3) shouldBe 3.0 +- 1e-9 // intercept
    r.getDouble(4) shouldBe 1.0 +- 1e-12
  }

  it should "match the hand-computed least squares on noisy points" in {
    // x=0..3, y=[1,2,2,4]: sx=6 sy=9 sxy=18 sxx=14
    // cov=18-13.5=4.5, varx=14-9=5 -> slope 0.9, intercept 0.9
    val r = one(Seq((0.0, 1.0), (1.0, 2.0), (2.0, 2.0), (3.0, 4.0)))
    r.getDouble(2) shouldBe 0.9 +- 1e-9
    r.getDouble(3) shouldBe 0.9 +- 1e-9
    // vary = 25 - 20.25 = 4.75; r2 = 4.5^2/(5*4.75)
    r.getDouble(4) shouldBe 20.25 / 23.75 +- 1e-9
  }

  it should "emit NULL slope when x is constant" in {
    val r = one(Seq((5.0, 1.0), (5.0, 2.0), (5.0, 3.0)))
    r.isNullAt(2) shouldBe true
    r.isNullAt(3) shouldBe true
  }

  it should "emit NULL r2 when y is constant (but a 0 slope)" in {
    val r = one(Seq((0.0, 7.0), (1.0, 7.0), (2.0, 7.0)))
    r.getDouble(2) shouldBe 0.0 +- 1e-12
    r.isNullAt(4) shouldBe true
  }

  it should "scope groups and survive repartitioning bit-identically" in {
    val rows = (1 to 200).map(i =>
      (s"g${i % 3}", (i % 17).toDouble, (i % 13).toDouble + i % 5))
    val a = Trendline.fit(rows.toDF("g", "x", "y"), "g", "x", "y")
      .orderBy("g").collect().map(_.toSeq)
    val b = Trendline.fit(rows.toDF("g", "x", "y").repartition(9),
        "g", "x", "y")
      .orderBy("g").collect().map(_.toSeq)
    a shouldBe b
  }
}
