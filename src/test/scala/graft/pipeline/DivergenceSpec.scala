package graft.pipeline

import graft.SparkSpec
import graft.text.Divergence

/** Jensen–Shannon corpus divergence (text/Divergence): identity,
  * symmetry, the ln 2 disjoint bound, a hand-computed mixed case, and
  * partition invariance.
  */
class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("id", "text")

  private def js(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Double =
    Divergence.jsTokens(a, b, "text").select("js_nats").as[Double].head()

  behavior of "Divergence.jsTokens"

  it should "be ~0 for identical corpora and ln 2 for disjoint ones" in {
    val a = corpus(1L -> "alpha beta gamma", 2L -> "beta gamma")
    js(a, a) shouldBe 0.0 +- 1e-6
    val b = corpus(1L -> "delta epsilon", 2L -> "epsilon zeta")
    js(a, b) shouldBe math.log(2.0) +- 1e-6
  }

  it should "be symmetric" in {
    val a = corpus(1L -> "x x y z", 2L -> "y y z")
    val b = corpus(1L -> "x z z w")
    js(a, b) shouldBe js(b, a) +- 1e-9
  }

  it should "match a direct computation on a mixed vocabulary" in {
    val a = corpus(1L -> "x x y") // P: x 2/3, y 1/3
    val b = corpus(1L -> "x y y y") // Q: x 1/4, y 3/4
    def kl(p: Map[String, Double], m: Map[String, Double]) =
      p.map { case (t, pv) => pv * math.log(pv / m(t)) }.sum
    val p = Map("x" -> 2.0 / 3, "y" -> 1.0 / 3)
    val q = Map("x" -> 1.0 / 4, "y" -> 3.0 / 4)
    val m = p.map { case (t, pv) => t -> (pv + q(t)) / 2 }
    val expected = (kl(p, m) + kl(q, m)) / 2
    js(a, b) shouldBe expected +- 1e-5
  }

  it should "report NULL for an empty side with counts intact" in {
    val a = corpus(1L -> "x y")
    val out = Divergence.jsTokens(a, corpus(1L -> "  "), "text").head()
    out.isNullAt(3) shouldBe true
    out.getLong(1) shouldBe 2L // tot_a
    out.getLong(2) shouldBe 0L // tot_b
  }

  it should "be invariant to partitioning" in {
    val a = corpus((1L to 40L).map(i =>
      i -> s"tok${i % 7} tok${i % 3} shared"): _*)
    val b = corpus((1L to 40L).map(i =>
      i -> s"tok${i % 5} shared shared"): _*)
    js(a.repartition(7), b.repartition(3)) shouldBe js(a, b)
  }

  behavior of "Divergence.psi"

  private def nums(vs: Long*) = vs.zipWithIndex
    .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

  private def psiOf(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Double =
    Divergence.psi(a, b, "v", bins = 4).select("psi").as[Double].head()

  it should "be ~0 for identical distributions" in {
    val a = nums(1, 2, 3, 10, 11, 20, 21, 30)
    psiOf(a, a) shouldBe 0.0 +- 1e-6
  }

  it should "grow with distribution shift and stay symmetric-signless" in {
    val a = nums(1, 2, 3, 4, 5, 6, 7, 8) // low end
    val b = nums(33, 34, 35, 36, 37, 38, 39, 40) // high end
    val drift = psiOf(a, b)
    drift should be > 0.25 // "shifted" per the PSI rule of thumb
    psiOf(b, a) shouldBe drift +- 1e-9 // PSI is symmetric
    val mild = nums(1, 2, 3, 4, 33, 34, 35, 36)
    psiOf(a, mild) should be < drift
  }

  it should "match a direct smoothed computation" in {
    val a = nums(0, 0, 1, 1, 2, 3) // bins over [0,3], width 1
    val b = nums(0, 1, 2, 2, 3, 3)
    val ca = Seq(2L, 2L, 1L, 1L); val cb = Seq(1L, 1L, 2L, 2L)
    val (taS, tbS) = (6L + 4L, 6L + 4L)
    val expected = ca.zip(cb).map { case (x, y) =>
      val p = (x + 1.0) / taS; val q = (y + 1.0) / tbS
      (p - q) * math.log(p / q)
    }.sum
    psiOf(nums(0, 0, 1, 1, 2, 3), nums(0, 1, 2, 2, 3, 3)) shouldBe
      expected +- 1e-5
  }

  it should "be NULL for an empty side and partition-invariant" in {
    val a = nums(1, 2, 3)
    Divergence.psi(a, nums().limit(0), "v", 4)
      .head().isNullAt(3) shouldBe true
    val b = nums(5, 6, 7, 8, 9)
    Divergence.psi(a.repartition(5), b.repartition(3), "v", 4)
      .select("psi").as[Double].head() shouldBe psiOf(a, b)
  }

  behavior of "EventStreams.driftMonitor"

  it should "score each micro-batch against the reference" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val reference = corpus(1L -> "alpha beta", 2L -> "beta gamma")
    val seen = scala.collection.mutable.Map[Long, Double]()
    val source = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.driftMonitor(
        source.toDF().toDF("id", "text"), "text", reference) {
      (id, row) => seen.synchronized {
        seen(id) = if (row.isNullAt(3)) Double.NaN else row.getDouble(3)
      }
    }.start()
    try {
      source.addData(10L -> "alpha beta beta gamma") // same distribution
      q.processAllAvailable()
      source.addData(11L -> "delta epsilon") // disjoint
      q.processAllAvailable()
    } finally q.stop()
    seen(0L) shouldBe 0.0 +- 1e-6
    seen(1L) shouldBe math.log(2.0) +- 1e-6
  }

  // ---- 1-D Wasserstein ----

  "wasserstein1" should "match the hand-computed transport distance" in {
    import spark.implicits._
    // A = {0,0}, B = {2,2}: all mass moves distance 2 -> W1 = 2
    val a = Seq(0L, 0L).toDF("v")
    val b = Seq(2L, 2L).toDF("v")
    val r = graft.text.Divergence.wasserstein1(a, b, "v").collect().head
    r.getLong(3) shouldBe 8L // |cumA*WB - cumB*WA|*gap = |4-0|*2 at v=0
    r.getDouble(4) shouldBe 2.0 +- 1e-12
  }

  it should "be zero for identical distributions and metric-aware" in {
    import spark.implicits._
    val base = Seq(1L, 2L, 3L).toDF("v")
    graft.text.Divergence.wasserstein1(base, base, "v")
      .collect().head.getDouble(4) shouldBe 0.0
    // near shift costs less than far shift (PSI/JS cannot tell)
    val near = graft.text.Divergence.wasserstein1(
      Seq(10L).toDF("v"), Seq(11L).toDF("v"), "v")
      .collect().head.getDouble(4)
    val far = graft.text.Divergence.wasserstein1(
      Seq(10L).toDF("v"), Seq(50L).toDF("v"), "v")
      .collect().head.getDouble(4)
    near shouldBe 1.0 +- 1e-12
    far shouldBe 40.0 +- 1e-12
  }

  it should "handle unequal sample sizes via the CDF normalization" in {
    import spark.implicits._
    // A = {0}, B = {0,0,1}: F_a = [1, 1], F_b = [2/3, 1] -> W1 = 1/3
    val r = graft.text.Divergence.wasserstein1(
      Seq(0L).toDF("v"), Seq(0L, 0L, 1L).toDF("v"), "v").collect().head
    r.getDouble(4) shouldBe 1.0 / 3.0 +- 1e-12
  }

  it should "be invariant under repartitioning" in {
    import spark.implicits._
    val a = (1 to 200).map(i => ((i * 13) % 17).toLong).toDF("v")
    val b = (1 to 150).map(i => ((i * 7) % 23).toLong).toDF("v")
    val x = graft.text.Divergence.wasserstein1(a, b, "v")
      .collect().head.toSeq
    val y = graft.text.Divergence.wasserstein1(
      a.repartition(7), b.repartition(5), "v").collect().head.toSeq
    x shouldBe y
  }
}
