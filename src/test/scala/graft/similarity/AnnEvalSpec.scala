package graft.similarity

import graft.SparkSpec

/** Recall@k: hand-computed per-query overlap, missing-query zero,
  * duplicate insensitivity, truth defines the query scope.
  */
class AnnEvalSpec extends SparkSpec {
  import spark.implicits._

  private def recall(pred: Seq[(Long, Long)], truth: Seq[(Long, Long)]) =
    AnnEval.recallAtK(pred.toDF("qid", "nid"), truth.toDF("qid", "nid"))
      .orderBy("qid")
      .as[(Long, Long, Long, Double)].collect().toSeq

  "recallAtK" should "score per-query overlap" in {
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
    val pred = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 77L), (2L, 78L))
    recall(pred, truth) shouldBe Seq(
      (1L, 3L, 2L, 2.0 / 3.0),
      (2L, 2L, 0L, 0.0))
  }

  it should "score a query absent from pred as zero, not drop it" in {
    recall(pred = Seq((1L, 10L)), truth = Seq((1L, 10L), (2L, 20L)))
      .shouldBe(Seq((1L, 1L, 1L, 1.0), (2L, 1L, 0L, 0.0)))
  }

  it should "ignore predictions for queries outside the truth set" in {
    recall(pred = Seq((1L, 10L), (9L, 90L)), truth = Seq((1L, 10L)))
      .shouldBe(Seq((1L, 1L, 1L, 1.0)))
  }

  it should "collapse duplicate (qid, nid) rows on both sides" in {
    recall(
      pred = Seq((1L, 10L), (1L, 10L)),
      truth = Seq((1L, 10L), (1L, 10L), (1L, 11L)))
      .shouldBe(Seq((1L, 2L, 1L, 0.5)))
  }
}
