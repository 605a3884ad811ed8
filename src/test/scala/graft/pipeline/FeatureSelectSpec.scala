package graft.pipeline

import graft.SparkSpec
import graft.text.FeatureSelect

/** χ² feature selection (text/FeatureSelect): hand-computed statistic,
  * discriminative terms outrank shared ones, presence (not frequency)
  * semantics, degenerate-term exclusion, partition invariance.
  */
class FeatureSelectSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "food", "apple banana shared"),
    (2L, "food", "apple cherry shared"),
    (3L, "tech", "kernel socket shared"),
    (4L, "tech", "kernel buffer shared")
  ).toDF("id", "label", "text")

  behavior of "FeatureSelect.chiSquareTopTerms"

  it should "match the hand-computed chi2 for a fully discriminative term" in {
    // "apple" in food: A=2 B=0 C=0 D=2, N=4 ->
    // chi2 = 4*(2*2-0)^2 / (2*2*2*2) = 64/16 = 4
    val out = FeatureSelect.chiSquareTopTerms(corpus, "label", "text", 10)
      .filter($"label" === "food" && $"term" === "apple")
      .select("chi2").as[Double].head()
    out shouldBe 4.0
  }

  it should "rank discriminative terms above shared ones" in {
    val top = FeatureSelect.chiSquareTopTerms(corpus, "label", "text", 2)
      .orderBy("label", "rank")
      .select("label", "term").as[(String, String)].collect()
    top.filter(_._1 == "food").map(_._2) should contain("apple")
    top.filter(_._1 == "tech").map(_._2) should contain("kernel")
    top.map(_._2) should not contain "shared"
  }

  it should "count presence, not frequency" in {
    val rep = Seq((1L, "a", "dup dup dup dup"), (2L, "b", "other"))
      .toDF("id", "label", "text")
    // "dup" appears in ONE doc of label a: A=1 despite 4 occurrences
    // -> chi2 = 2*(1*1-0)^2/(1*1*1*1) = 2
    FeatureSelect.chiSquareTopTerms(rep, "label", "text", 10)
      .filter($"label" === "a" && $"term" === "dup")
      .select("chi2").as[Double].head() shouldBe 2.0
  }

  it should "exclude terms present in every document" in {
    // "shared" is in all docs -> C+D = 0 for the complement -> NULL
    FeatureSelect.chiSquareTopTerms(corpus, "label", "text", 100)
      .filter($"term" === "shared").count() shouldBe 0L
  }

  it should "be invariant to partitioning" in {
    val a = FeatureSelect.chiSquareTopTerms(corpus, "label", "text", 3)
      .orderBy("label", "rank").collect()
    val b = FeatureSelect
      .chiSquareTopTerms(corpus.repartition(5), "label", "text", 3)
      .orderBy("label", "rank").collect()
    a shouldBe b
  }
}
