package graft.pipeline

import graft.SparkSpec
import graft.text.QualityPrune

/** Score-based pruning: exact integer cut per stratum, direction flag,
  * deterministic tie-breaks.
  */
class QualityPruneSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", 1.0), (2L, "en", 2.0), (3L, "en", 3.0), (4L, "en", 4.0),
    (5L, "de", 1.0), (6L, "de", 2.0)
  ).toDF("id", "lang", "score")

  "keepTopPermille" should "cut each stratum at floor(n*permille/1000)" in {
    // en: 4 rows * 500‰ = 2 kept; de: 2 * 500‰ = 1 kept
    QualityPrune.keepTopPermille(docs, "id", "score", "lang", 500)
      .select("id").as[Long].collect().sorted shouldBe Seq(1L, 2L, 5L)
  }

  it should "flip the direction for higher-is-better scores" in {
    QualityPrune.keepTopPermille(docs, "id", "score", "lang", 500,
        ascending = false)
      .select("id").as[Long].collect().sorted shouldBe Seq(3L, 4L, 6L)
  }

  it should "keep zero rows from a stratum below the floor" in {
    // de has 2 rows: 2 * 200‰ = 0.4 → floor 0 kept
    QualityPrune.keepTopPermille(docs, "id", "score", "lang", 200)
      .select("lang").as[String].collect() should not contain "de"
  }

  it should "break score ties by id deterministically" in {
    val tied = Seq((10L, "x", 1.0), (11L, "x", 1.0), (12L, "x", 1.0))
      .toDF("id", "lang", "score")
    QualityPrune.keepTopPermille(tied, "id", "score", "lang", 334)
      .select("id").as[Long].collect() shouldBe Seq(10L)
  }

  it should "reject out-of-range permille" in {
    an[IllegalArgumentException] should be thrownBy
      QualityPrune.keepTopPermille(docs, "id", "score", "lang", 1001)
  }

  "scoreBuckets" should "assign NTILE buckets best-first per stratum" in {
    // en has 4 rows → ntile(3) = sizes 2,1,1 by the standard distribution
    val got = QualityPrune.scoreBuckets(docs, "id", "score", "lang", 3)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    got(1L) shouldBe 1; got(2L) shouldBe 1 // head takes the extra row
    got(3L) shouldBe 2; got(4L) shouldBe 3
    got(5L) shouldBe 1; got(6L) shouldBe 2 // de: 2 rows → buckets 1,2
  }
}
