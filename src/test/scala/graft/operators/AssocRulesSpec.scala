package graft.operators

import graft.SparkSpec

/** Association rules: hand-computed support/confidence/lift, Apriori
  * item pruning, presence (not multiplicity) semantics, both rule
  * directions, partition invariance.
  */
class AssocRulesSpec extends SparkSpec {
  import spark.implicits._

  private val baskets = Seq(
    (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "z"),
    (4L, "y")).toDF("b", "i")

  private def rules(df: org.apache.spark.sql.DataFrame, minCount: Long) =
    AssocRules.pairRules(df, "b", "i", minCount)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8))).toMap

  "pairRules" should "compute support, confidence and lift exactly" in {
    val m = rules(baskets, 2L)
    // x:3 y:3 z:1(pruned); pair (x,y) in baskets 1,2; N=4
    m.keySet shouldBe Set(("x", "y"), ("y", "x"))
    val (nPair, nA, nB, nBaskets, support, confidence, lift) = m(("x", "y"))
    (nPair, nA, nB, nBaskets) shouldBe ((2L, 3L, 3L, 4L))
    support shouldBe 0.5 +- 1e-12
    confidence shouldBe 2.0 / 3.0 +- 1e-12
    lift shouldBe 8.0 / 9.0 +- 1e-12
  }

  it should "prune pairs below minCount even when items are frequent" in {
    // x,y frequent but co-occur once
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y"), (5L, "x"),
      (5L, "y")).toDF("b", "i")
    rules(df, 2L) shouldBe empty
  }

  it should "count presence, not multiplicity" in {
    val dup = baskets.unionAll(Seq((1L, "x"), (1L, "x")).toDF("b", "i"))
    rules(dup, 2L) shouldBe rules(baskets, 2L)
  }

  it should "emit asymmetric confidence when margins differ" in {
    // pair (p,q) twice; p in 2 baskets, q in 4
    val df = Seq((1L, "p"), (1L, "q"), (2L, "p"), (2L, "q"), (3L, "q"),
      (4L, "q")).toDF("b", "i")
    val m = rules(df, 2L)
    m(("p", "q"))._6 shouldBe 1.0 +- 1e-12 // p -> q always
    m(("q", "p"))._6 shouldBe 0.5 +- 1e-12
    // lift symmetric: 4*2/(2*4) = 1
    m(("p", "q"))._7 shouldBe 1.0 +- 1e-12
    m(("q", "p"))._7 shouldBe 1.0 +- 1e-12
  }

  it should "be invariant under repartitioning" in {
    val big = (1 to 200).flatMap(b => Seq((b.toLong, s"i${b % 5}"),
      (b.toLong, s"i${(b + 1) % 5}")))
    val a = rules(big.toDF("b", "i"), 10L)
    val b = rules(big.toDF("b", "i").repartition(7), 10L)
    a shouldBe b
  }
}
