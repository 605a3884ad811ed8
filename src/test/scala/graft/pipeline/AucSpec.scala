package graft.pipeline

import graft.SparkSpec
import graft.operators.Auc

/** AUC aggregation (operators/Auc): hand-computed values, brute-force
  * pair parity with ties, grouped variant, degenerate groups, partition
  * invariance.
  */
class AucSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Auc"

  it should "match the hand-computed value on a separable fixture" in {
    // positives score strictly above negatives -> AUC 1.0
    val df = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1))
      .toDF("score", "label")
    val row = Auc.auc(df, "score", "label").head()
    row.getLong(0) shouldBe 2L
    row.getLong(1) shouldBe 2L
    row.getDouble(3) shouldBe 1.0
  }

  it should "handle ties as half-wins exactly" in {
    // one positive tied with one negative at 2.0:
    // pairs: (2+,1-)=win, (2+,2-)=tie, (3+,1-)=win, (3+,2-)=win
    // AUC = (3 + 0.5) / 4 = 0.875
    val df = Seq((1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1))
      .toDF("score", "label")
    Auc.auc(df, "score", "label").head().getDouble(3) shouldBe 0.875
  }

  it should "agree with brute-force pair counting on a random fixture" in {
    val rows = (1 to 60).map { i =>
      val score = ((i * 2654435761L) % 17L).toDouble
      val label = if ((i * 2654435761L / 5L) % 3L == 0L) 1 else 0
      (score, label)
    }
    val expected = {
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      wins / (pos.size * neg.size)
    }
    Auc.auc(rows.toDF("score", "label"), "score", "label")
      .head().getDouble(3) shouldBe expected
  }

  it should "compute per-group AUC with NULL for degenerate groups" in {
    val df = Seq(
      ("a", 1.0, 0), ("a", 2.0, 1),
      ("b", 1.0, 1), ("b", 2.0, 1) // no negatives
    ).toDF("g", "score", "label")
    val out = Auc.auc(df, "score", "label", Seq("g"))
      .orderBy("g").collect()
    out(0).getDouble(4) shouldBe 1.0
    out(1).isNullAt(4) shouldBe true
    out(1).getLong(1) shouldBe 2L
  }

  it should "be invariant to partitioning" in {
    val df = (1 to 100).map(i =>
      (((i * 31L) % 11L).toDouble, (i % 2))).toDF("score", "label")
    val a1 = Auc.auc(df, "score", "label").head().getDouble(3)
    val a7 = Auc.auc(df.repartition(7), "score", "label")
      .head().getDouble(3)
    a1 shouldBe a7
  }

  it should "accept boolean labels" in {
    val df = Seq((1.0, false), (2.0, true)).toDF("score", "label")
    Auc.auc(df, "score", "label").head().getDouble(3) shouldBe 1.0
  }
}
