package graft.operators

import graft.SparkSpec

/** Cohen's κ: hand-computed contingency, perfect/chance/degenerate
  * regimes, NULL-label exclusion.
  */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  private def kappaOf(rows: Seq[(String, String)]): (Long, Long, Option[Double]) = {
    val r = Agreement.kappa(rows.toDF("a", "b"), "a", "b").head()
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  "kappa" should "match the textbook hand computation" in {
    // 50 items: 20 yy, 5 yn, 10 ny, 15 nn → po = 0.7,
    // pe_num = 25·30 + 25·20 = 1250, κ = (50·35 − 1250)/(2500 − 1250) = 0.4
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
        Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    kappaOf(rows) shouldBe ((50L, 35L, Some(0.4)))
  }

  it should "return 1 for perfect multi-label agreement" in {
    val rows = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
    kappaOf(rows) shouldBe ((4L, 4L, Some(1.0)))
  }

  it should "return 0 for exactly chance-level agreement" in {
    val rows = Seq(("A", "A"), ("A", "B"), ("B", "A"), ("B", "B"))
    kappaOf(rows) shouldBe ((4L, 2L, Some(0.0)))
  }

  it should "be NULL when both raters are constant and identical" in {
    // pe_num = n² → denominator 0: agreement is undefined, not perfect
    kappaOf(Seq(("x", "x"), ("x", "x"))) shouldBe ((2L, 2L, None))
  }

  it should "exclude rows where either label is NULL" in {
    val df = Seq(
      (Some("y"), Some("y")), (Some("y"), None), (None, Some("n")),
      (Some("n"), Some("n"))).toDF("a", "b")
    val r = Agreement.kappa(df, "a", "b").head()
    r.getLong(0) shouldBe 2L
    r.getLong(1) shouldBe 2L
  }

  it should "be invariant under physical layout" in {
    val rows = (1 to 300).map(i =>
      (s"l${i % 4}", s"l${(i * 7) % 4}"))
    val a = kappaOf(rows)
    val b = {
      val r = Agreement.kappa(
        rows.toDF("a", "b").repartition(13), "a", "b").head()
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    b shouldBe a
  }
}
