package graft.operators

import graft.SparkSpec

/** CUPED adjusted means: hand-computed theta/rho2/adjustment, the
  * mean-preservation identity, degenerate covariate, NULL handling,
  * partition invariance.
  */
class CupedSpec extends SparkSpec {
  import spark.implicits._

  private val units = Seq(
    ("A", 1.0, 2.0), ("A", 2.0, 4.0), ("B", 1.0, 3.0), ("B", 3.0, 5.0)
  ).toDF("variant", "x", "y")

  private def byVariant(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))).toMap

  "adjustedMeans" should "match the hand-computed theta, rho2 and " +
      "adjusted means" in {
    // pooled: n=4 sx=7 sy=14 sxy=28 sxx=15 syy=54
    // covN=3.5 varXN=2.75 varYN=5 -> theta=14/11, rho2=12.25/13.75
    val m = byVariant(Cuped.adjustedMeans(units, "variant", "x", "y"))
    val theta = 3.5 / 2.75
    m("A")._4 shouldBe theta +- 1e-9
    m("A")._5 shouldBe 12.25 / 13.75 +- 1e-9
    // A: mean_y=3, mean_x=1.5, global mean_x=1.75 -> 3 + 0.25*theta
    m("A")._6 shouldBe 3.0 + 0.25 * theta +- 1e-9
    m("B")._6 shouldBe 4.0 - 0.25 * theta +- 1e-9
    m("A")._2 shouldBe 1.5 +- 1e-12
    m("A")._3 shouldBe 3.0 +- 1e-12
  }

  it should "preserve the weighted overall metric mean (unbiasedness)" in {
    val rows = Cuped.adjustedMeans(units, "variant", "x", "y").collect()
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(6)).sum /
      rows.map(_.getLong(1)).sum
    weighted shouldBe 3.5 +- 1e-9 // = global mean of y
  }

  it should "emit NULL theta and adjustment when the covariate is " +
      "constant" in {
    val df = Seq(("A", 5.0, 1.0), ("A", 5.0, 2.0), ("B", 5.0, 3.0))
      .toDF("variant", "x", "y")
    val r = Cuped.adjustedMeans(df, "variant", "x", "y")
      .orderBy("variant").collect().head
    r.isNullAt(4) shouldBe true // theta
    r.isNullAt(6) shouldBe true // adj_mean
    r.getDouble(3) shouldBe 1.5 +- 1e-12 // raw mean still there
  }

  it should "ignore units with NULL metric or covariate" in {
    val df = Seq(
      ("A", Some(1.0), Some(2.0)), ("A", None, Some(9.0)),
      ("A", Some(2.0), None), ("A", Some(2.0), Some(4.0)),
      ("B", Some(1.0), Some(3.0)), ("B", Some(3.0), Some(5.0))
    ).toDF("variant", "x", "y")
    val m = byVariant(Cuped.adjustedMeans(df, "variant", "x", "y"))
    m("A")._1 shouldBe 2L
    m("A")._6 shouldBe byVariant(
      Cuped.adjustedMeans(units, "variant", "x", "y"))("A")._6
  }

  it should "be bit-identical under repartitioning (decimal moments)" in {
    val big = (1 to 300).map(i =>
      (if (i % 2 == 0) "A" else "B", (i % 7).toDouble + 0.25,
        (i % 11).toDouble + ((i % 7) * 0.5)))
    val a = Cuped.adjustedMeans(big.toDF("variant", "x", "y"),
      "variant", "x", "y").orderBy("variant").collect().map(_.toSeq)
    val b = Cuped.adjustedMeans(big.toDF("variant", "x", "y")
        .repartition(13), "variant", "x", "y")
      .orderBy("variant").collect().map(_.toSeq)
    a shouldBe b
  }
}
