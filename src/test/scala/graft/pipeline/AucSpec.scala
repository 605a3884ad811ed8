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

  behavior of "Auc.averagePrecision"

  it should "score a perfect ranking exactly 1.0" in {
    val df = Seq((4.0, 1), (3.0, 1), (2.0, 0), (1.0, 0))
      .toDF("score", "label")
    Auc.averagePrecision(df, "score", "label").head().getDouble(2) shouldBe
      1.0
  }

  it should "match the hand-computed step AP with ties" in {
    // desc thresholds: s=3 (1+,0-): prec 1, contrib 1
    //                  s=2 (1+,1- tied): cum (2+,1-), prec 2/3, contrib 2/3
    //                  s=1 (0+,1-): no positives, contrib 0
    // AP = (1 + 2/3) / 2 = 5/6 (up to the 1e-6 precision quantization)
    val df = Seq((3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0))
      .toDF("score", "label")
    Auc.averagePrecision(df, "score", "label").head().getDouble(2) shouldBe
      (5.0 / 6.0 +- 1e-6)
  }

  it should "agree with a direct computation on a random fixture" in {
    val rows = (1 to 60).map { i =>
      val score = ((i * 2654435761L) % 17L).toDouble
      val label = if ((i * 2654435761L / 5L) % 3L == 0L) 1 else 0
      (score, label)
    }
    val expected = {
      val byScore = rows.groupBy(_._1).toSeq.sortBy(-_._1)
      var cump = 0L; var cumn = 0L; var apsum = 0.0
      byScore.foreach { case (_, xs) =>
        val p = xs.count(_._2 == 1); val n = xs.size - p
        cump += p; cumn += n
        apsum += p.toDouble * (cump * 1000000L / (cump + cumn))
      }
      apsum / (1000000.0 * rows.count(_._2 == 1))
    }
    Auc.averagePrecision(rows.toDF("score", "label"), "score", "label")
      .head().getDouble(2) shouldBe expected
  }

  it should "report NULL AP for a group with no positives" in {
    val df = Seq(("a", 2.0, 1), ("a", 1.0, 0), ("b", 1.0, 0))
      .toDF("g", "score", "label")
    val out = Auc.averagePrecision(df, "score", "label", Seq("g"))
      .orderBy("g").collect()
    out(0).getDouble(3) shouldBe 1.0
    out(1).isNullAt(3) shouldBe true
  }

  it should "be invariant to partitioning" in {
    val df = (1 to 100).map(i =>
      (((i * 31L) % 11L).toDouble, (i % 3) min 1)).toDF("score", "label")
    val a = Auc.averagePrecision(df, "score", "label").head().getDouble(2)
    val b = Auc.averagePrecision(df.repartition(7), "score", "label")
      .head().getDouble(2)
    a shouldBe b
  }
}
