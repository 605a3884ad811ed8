package graft.operators

import graft.SparkSpec

/** Isotonic reliability curve: hand-computed PAV pooling, monotonicity,
  * already-monotone passthrough, binning edge cases.
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def curve(rows: Seq[(Long, Long)], bins: Int) =
    Calibration.isotonicCurve(rows.toDF("s", "y"), "s", "y", bins)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq

  "isotonicCurve" should "pool a non-monotone middle pair like PAV" in {
    // 4 occupied bins with rates 0, 0.75, 0.25, 1 → PAV pools the
    // violating middle pair (2 pos + 1 pos over 4+4) to 0.5 each
    val rows =
      Seq.fill(4)((0L, 0L)) ++
        (Seq.fill(3)((10L, 1L)) :+ (10L, 0L)) ++
        (Seq.fill(1)((20L, 1L)) ++ Seq.fill(3)((20L, 0L))) ++
        Seq.fill(4)((30L, 1L))
    val got = curve(rows, bins = 4)
    got.map(_._4) shouldBe Seq(0.0, 0.75, 0.25, 1.0)
    got.map(_._5) shouldBe Seq(0.0, 0.5, 0.5, 1.0)
  }

  it should "pass an already-monotone curve through unchanged" in {
    val rows =
      Seq.fill(4)((0L, 0L)) ++
        (Seq.fill(1)((10L, 1L)) ++ Seq.fill(3)((10L, 0L))) ++
        (Seq.fill(3)((20L, 1L)) :+ (20L, 0L)) ++
        Seq.fill(4)((30L, 1L))
    val got = curve(rows, bins = 4)
    got.map(_._5) shouldBe got.map(_._4)
  }

  it should "always produce a nondecreasing fit" in {
    val rows = (1L to 200L).map(i => (i, (i * 7 % 13) % 2))
    val got = curve(rows, bins = 10)
    got.map(_._5) shouldBe got.map(_._5).sorted
    // mass is conserved: Σ fitted·n == Σ n_pos (PAV preserves the mean)
    val mass = got.map(c => c._5 * c._2).sum
    mass shouldBe got.map(_._3.toDouble).sum +- 1e-9
  }

  it should "collapse to one bin when all scores are equal" in {
    val got = curve(Seq((5L, 1L), (5L, 0L), (5L, 1L), (5L, 0L)), bins = 8)
    got shouldBe Seq((0L, 4L, 2L, 0.5, 0.5))
  }

  it should "exclude NULL scores and labels" in {
    val df = Seq(
      (Some(1L), Some(1L)), (None, Some(0L)), (Some(2L), None),
      (Some(2L), Some(0L))).toDF("s", "y")
    val got = Calibration.isotonicCurve(df, "s", "y", 2)
      .orderBy("bin").as[(Long, Long, Long, Double, Double)]
      .collect().toSeq
    got.map(_._2).sum shouldBe 2L
  }

  it should "reject invalid bin counts" in {
    an[IllegalArgumentException] should be thrownBy
      Calibration.isotonicCurve(Seq((1L, 1L)).toDF("s", "y"), "s", "y", 1)
  }
}
