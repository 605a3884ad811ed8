package graft.operators

import graft.SparkSpec

/** SPRT: boundary crossings in both directions, first-crossing
  * location, continue state, LLR linearity check, partition
  * invariance.
  */
class SprtSpec extends SparkSpec {
  import spark.implicits._

  private def run(outcomes: Seq[Int], p0: Double = 0.2,
      p1: Double = 0.4) = {
    val df = outcomes.zipWithIndex
      .map { case (x, i) => ("k", (i + 1).toLong, x) }
      .toDF("key", "o", "x")
    Sprt.bernoulli(df, "key", "o", "x", p0, p1).collect().head
  }

  "bernoulli" should "accept H1 on a high-rate stream and locate the " +
      "first crossing" in {
    val r = run(Seq.fill(30)(1))
    r.getString(4) shouldBe "accept_h1"
    // a = ln(2)*1e6 = 693147; upper = ln(19)*1e6 = 2944439 -> k = 5
    r.getLong(5) shouldBe 5L
    r.getLong(2) shouldBe 30L
  }

  it should "accept H0 on an all-failure stream" in {
    val r = run(Seq.fill(40)(0))
    r.getString(4) shouldBe "accept_h0"
    // b = ln(0.75)*1e6 = -287682; lower = -2944439 -> ceil(10.23) = 11
    r.getLong(5) shouldBe 11L
  }

  it should "continue while the walk stays inside the boundaries" in {
    val r = run(Seq(1, 0, 1, 0, 1, 0))
    r.getString(4) shouldBe "continue"
    r.isNullAt(5) shouldBe true
    // llr = 3a + 3b exactly (linearity in the counts)
    r.getLong(3) shouldBe 3 * Sprt.llrA(0.2, 0.4) +
      3 * Sprt.llrB(0.2, 0.4)
  }

  it should "report the EARLIER crossing when both bounds were hit" in {
    // burst of successes crosses up at k=5; later failures never undo
    // the recorded first crossing
    val r = run(Seq.fill(6)(1) ++ Seq.fill(60)(0))
    r.getString(4) shouldBe "accept_h1"
    r.getLong(5) shouldBe 5L
  }

  it should "be invariant under repartitioning" in {
    val rows = (1 to 200).map(i => ("k", i.toLong, i % 3 min 1))
    val a = Sprt.bernoulli(rows.toDF("key", "o", "x"), "key", "o", "x",
      0.3, 0.5).collect().head.toSeq
    val b = Sprt.bernoulli(rows.toDF("key", "o", "x").repartition(7),
      "key", "o", "x", 0.3, 0.5).collect().head.toSeq
    a shouldBe b
  }
}
