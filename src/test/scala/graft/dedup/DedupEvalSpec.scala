package graft.dedup

import graft.SparkSpec

/** Pair-set precision/recall/F1: hand-computed overlap, orientation and
  * duplicate insensitivity, empty-side regimes.
  */
class DedupEvalSpec extends SparkSpec {
  import spark.implicits._

  private def quality(pred: Seq[(Long, Long)], truth: Seq[(Long, Long)]) = {
    val r = DedupEval.pairQuality(
      pred.toDF("id_a", "id_b"), truth.toDF("id_a", "id_b")).head()
    def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (r.getLong(0), r.getLong(1), r.getLong(2), d(3), d(4), d(5))
  }

  "pairQuality" should "match the hand-computed counts and ratios" in {
    // truth {12, 13, 14, 23}; pred {12, 13, 15} → hit 2,
    // prec 2/3, rec 2/4, f1 = 2·2/(3+4)
    val got = quality(
      pred = Seq((1L, 2L), (1L, 3L), (1L, 5L)),
      truth = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)))
    got shouldBe ((4L, 3L, 2L,
      Some(2.0 / 3.0), Some(0.5), Some(4.0 / 7.0)))
  }

  it should "canonicalize orientation and collapse duplicate pairs" in {
    // (2,1) == (1,2); the doubled prediction counts once
    quality(
      pred = Seq((2L, 1L), (1L, 2L)),
      truth = Seq((1L, 2L))) shouldBe
      ((1L, 1L, 1L, Some(1.0), Some(1.0), Some(1.0)))
  }

  it should "handle an empty prediction side" in {
    quality(pred = Nil, truth = Seq((1L, 2L))) shouldBe
      ((1L, 0L, 0L, None, Some(0.0), Some(0.0)))
  }

  it should "handle an empty truth side" in {
    quality(pred = Seq((1L, 2L)), truth = Nil) shouldBe
      ((0L, 1L, 0L, Some(0.0), None, Some(0.0)))
  }

  it should "be NULL across the board when both sides are empty" in {
    quality(Nil, Nil) shouldBe ((0L, 0L, 0L, None, None, None))
  }
}
