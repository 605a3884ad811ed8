package graft.operators

import graft.SparkSpec

/** Kaplan–Meier: textbook curve with censoring, micro-nat log-survival
  * arithmetic, risk-set exhaustion, censor-only times, strata.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def lsOf(factors: Seq[(Long, Long)]): Long =
    factors.map { case (n, d) =>
      math.floor(math.log((n - d).toDouble / n.toDouble) * 1e6 + 0.5).toLong
    }.sum

  // durations 1†, 2c, 3†, 4†, 5c († death, c censored)
  private val classic = Seq((1, 1), (2, 0), (3, 1), (4, 1), (5, 0))
    .map { case (t, e) => (t.toLong, e) }.toDF("dur", "ev")

  "kaplanMeier" should "reproduce the textbook curve with censoring" in {
    val rows = Survival.kaplanMeier(classic, "dur", "ev")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    rows.map(r => (r._1, r._2, r._3)) shouldBe
      Array((1L, 5L, 1L), (3L, 3L, 1L), (4L, 2L, 1L))
    rows(0)._4 shouldBe lsOf(Seq((5L, 1L)))
    rows(1)._4 shouldBe lsOf(Seq((5L, 1L), (3L, 1L)))
    rows(2)._4 shouldBe lsOf(Seq((5L, 1L), (3L, 1L), (2L, 1L)))
    // S(1) = 4/5, S(3) = 8/15, S(4) = 4/15 — within micro-nat rounding
    rows(0)._5 shouldBe 0.8 +- 1e-5
    rows(2)._5 shouldBe (4.0 / 15.0) +- 1e-5
  }

  it should "pin survival to exactly 0 when deaths exhaust the risk set" in {
    val df = Seq((1L, 1), (2L, 1)).toDF("dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", "ev")
      .orderBy("t").collect()
    rows(1).getLong(1) shouldBe 1L // n_risk at t=2
    rows(1).isNullAt(3) shouldBe true // ls_micro has no -inf encoding
    rows(1).getDouble(4) shouldBe 0.0
  }

  it should "emit no row for censor-only times" in {
    val df = Seq((1L, 1), (2L, 0), (3L, 0)).toDF("dur", "ev")
    Survival.kaplanMeier(df, "dur", "ev")
      .select("t").as[Long].collect() shouldBe Array(1L)
  }

  it should "keep censored subjects in earlier risk sets" in {
    // censor at 2 still counts toward n_risk at t=1
    val df = Seq((1L, 1), (2L, 0)).toDF("dur", "ev")
    Survival.kaplanMeier(df, "dur", "ev")
      .collect().head.getLong(1) shouldBe 2L
  }

  it should "estimate strata independently" in {
    val df = Seq(("a", 1L, 1), ("a", 2L, 1), ("b", 1L, 1))
      .toDF("g", "dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", "ev", Seq("g"))
      .orderBy("g", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows shouldBe Array(("a", 1L, 2L), ("a", 2L, 1L), ("b", 1L, 1L))
  }

  it should "be invariant under repartitioning" in {
    val a = Survival.kaplanMeier(classic, "dur", "ev").orderBy("t")
      .collect().map(_.toSeq)
    val b = Survival.kaplanMeier(classic.repartition(4), "dur", "ev")
      .orderBy("t").collect().map(_.toSeq)
    a shouldBe b
  }
}
