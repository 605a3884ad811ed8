package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** G² keyness: hand-computed statistic, zero-side limits, direction
  * labels, min-count pruning, partition invariance.
  */
class KeynessSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(String, String)], minCount: Long = 1L) =
    Keyness.g2(docs.toDF("side", "text"), "text",
        col("side") === "A", minCount)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getString(5))).toMap

  "g2" should "match the hand-computed statistic" in {
    // focus: 'x x y' (na=3), ref: 'x y y' (nb=3); term x: a=2, b=1
    // la = floor(ln(2*6/(3*3))*1e6+.5) = floor(ln(4/3)*1e6+.5) = 287682
    // lb = floor(ln(1*6/(3*3))*1e6+.5) = floor(ln(2/3)*1e6+.5) = -405465
    // g2m = 2*(2*287682 + 1*(-405465)) = 339798
    val m = run(Seq(("A", "x x y"), ("B", "x y y")))
    val (a, b, g2m, g2, dir) = m("x")
    (a, b) shouldBe ((2L, 1L))
    g2m shouldBe 339798L
    g2 shouldBe 0.339798 +- 1e-12
    dir shouldBe "focus"
    m("y")._5 shouldBe "reference" // mirror image
    m("y")._3 shouldBe 339798L // symmetric counts -> same statistic
  }

  it should "treat one-sided terms with the x ln x -> 0 limit" in {
    val m = run(Seq(("A", "only here"), ("B", "other stuff")))
    // 'only': a=1, b=0: G2 = 2*1*ln(1*4/(2*1)) = 2 ln 2
    m("only")._4 shouldBe 2.0 * 0.693147 +- 1e-5
    m("only")._5 shouldBe "focus"
  }

  it should "score evenly-distributed terms at zero" in {
    val m = run(Seq(("A", "common word"), ("B", "common word")))
    m("common")._3 shouldBe 0L
    m("common")._4 shouldBe 0.0
  }

  it should "prune below minCount" in {
    val m = run(Seq(("A", "rare common common"), ("B", "common")), 2L)
    m.keySet shouldBe Set("common")
  }

  it should "be invariant under repartitioning" in {
    val docs = (1 to 60).map(i =>
      (if (i % 2 == 0) "A" else "B", s"tok${i % 7} tok${i % 3} shared"))
    val a = run(docs)
    val b = Keyness.g2(docs.toDF("side", "text").repartition(9), "text",
        col("side") === "A", 1L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getString(5))).toMap
    a shouldBe b
  }
}
