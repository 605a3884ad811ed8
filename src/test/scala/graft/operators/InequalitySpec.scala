package graft.operators

import graft.SparkSpec

/** Gini coefficient: textbook values, tie compression correctness,
  * extremes, per-group scoping, partition invariance.
  */
class InequalitySpec extends SparkSpec {
  import spark.implicits._

  private def giniOf(vals: Seq[Long]): Double = {
    val df = vals.toDF("v")
    Inequality.gini(df, "v").collect().head.getDouble(3)
  }

  "gini" should "be 0 for perfect equality" in {
    giniOf(Seq(5L, 5L, 5L, 5L)) shouldBe 0.0 +- 1e-12
  }

  it should "approach (n-1)/n when one row holds everything" in {
    // [0,0,0,100]: G = 3/4
    giniOf(Seq(0L, 0L, 0L, 100L)) shouldBe 0.75 +- 1e-12
  }

  it should "match the hand-computed textbook value" in {
    // sorted [1,2,3,4]: rank mass = 1+4+9+16 = 30; G = 60/(4*10) - 5/4 = 0.25
    giniOf(Seq(3L, 1L, 4L, 2L)) shouldBe 0.25 +- 1e-12
  }

  it should "handle ties exactly via the compressed rank mass" in {
    // sorted [1,1,2]: mass = 1*1 + 1*2 + 2*3 = 9; G = 18/(3*4) - 4/3
    giniOf(Seq(1L, 2L, 1L)) shouldBe (18.0 / 12.0 - 4.0 / 3.0) +- 1e-12
  }

  it should "be NULL when the total is zero" in {
    val r = Inequality.gini(Seq(0L, 0L).toDF("v"), "v").collect().head
    r.isNullAt(3) shouldBe true
  }

  it should "scope groups independently" in {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 0L), ("b", 10L))
      .toDF("g", "v")
    val m = Inequality.gini(df, "v", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    m("a") shouldBe 0.0 +- 1e-12
    m("b") shouldBe 0.5 +- 1e-12
  }

  it should "be invariant under repartitioning" in {
    val vals = (1 to 200).map(i => ((i * 31) % 17).toLong)
    val a = Inequality.gini(vals.toDF("v"), "v").collect().head.toSeq
    val b = Inequality.gini(vals.toDF("v").repartition(7), "v")
      .collect().head.toSeq
    a shouldBe b
  }
}
