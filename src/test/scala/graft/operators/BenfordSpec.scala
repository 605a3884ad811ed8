package graft.operators

import graft.SparkSpec

/** Benford audit: digit extraction across magnitudes, probability
  * constants, zero/NULL exclusion, chi-square arithmetic.
  */
class BenfordSpec extends SparkSpec {
  import spark.implicits._

  "ProbMicro" should "sum to one (within rounding) and lead with 30.1%" in {
    Benford.ProbMicro.head shouldBe 301030L
    Benford.ProbMicro.sum shouldBe (1000000L +- 5L)
  }

  "firstDigitReport" should "extract first significant digits at any magnitude" in {
    val df = Seq(123.45, 0.0042, -9000.0, 0.5, 7e8).toDF("v")
    val m = Benford.firstDigitReport(df, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    m(1) shouldBe 1L // 123.45
    m(4) shouldBe 1L // 0.0042
    m(9) shouldBe 1L // -9000
    m(5) shouldBe 1L // 0.5
    m(7) shouldBe 1L // 7e8
    m.values.sum shouldBe 5L
  }

  it should "exclude zeros and NULLs and emit all nine digits" in {
    val df = Seq(Some(1.0), Some(0.0), None).toDF("v")
    val rows = Benford.firstDigitReport(df, "v")
      .orderBy("digit").collect()
    rows.length shouldBe 9
    rows.map(_.getLong(1)).sum shouldBe 1L
  }

  it should "compute chi2 terms from exact expected counts" in {
    // 100 ones, nothing else: exp(1) = 100*0.30103
    val df = (1 to 100).map(_ => 1.0).toDF("v")
    val r = Benford.firstDigitReport(df, "v")
      .where("digit = 1").collect().head
    r.getLong(2) shouldBe 100L * 301030L
    val e = (100L * 301030L).toDouble / 1e6
    r.getDouble(3) shouldBe ((100.0 - e) * (100.0 - e) / e) +- 1e-12
  }

  it should "pass a Benford-ish geometric sample with small chi2" in {
    // powers of 1.3 cycle first digits Benford-like
    val df = (1 to 500).map(i => math.pow(1.3, i % 70 + 1)).toDF("v")
    val chi2 = Benford.firstDigitReport(df, "v")
      .agg(org.apache.spark.sql.functions.sum("chi2_term"))
      .head().getDouble(0)
    chi2 should be < 30.0
  }
}
