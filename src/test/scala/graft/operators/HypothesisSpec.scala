package graft.operators

import graft.SparkSpec

/** Welch t-test: hand-computed statistic and Welch–Satterthwaite df,
  * degenerate regimes, group exclusion, partition invariance.
  */
class HypothesisSpec extends SparkSpec {
  import spark.implicits._

  private val two = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
    ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0), ("b", 10.0)
  ).toDF("g", "x")

  private def first(df: org.apache.spark.sql.DataFrame) = {
    val r = df.orderBy("group_a", "group_b").collect().head
    (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
  }

  "welchT" should "match the hand-computed t and df" in {
    // A: n=4 mean=2.5 var=5/3; B: n=5 mean=6 var=10
    // se2 = 5/12 + 2; t = -3.5/sqrt(se2) = -2.2514363; df = 2523/457 = 5.5207877
    val (ga, gb, na, nb, ma, mb, t, df) = first(Hypothesis.welchT(two, "g", "x"))
    (ga, gb, na, nb) shouldBe (("a", "b", 4L, 5L))
    ma shouldBe 2.5 +- 1e-9
    mb shouldBe 6.0 +- 1e-9
    t shouldBe -2.2514363 +- 1e-6
    df shouldBe 5.5207877 +- 1e-6
  }

  it should "be invariant under repartitioning (exact sums)" in {
    val base = Hypothesis.welchT(two, "g", "x").collect().head
    val shuffled = Hypothesis.welchT(two.repartition(7), "g", "x")
      .collect().head
    shuffled.getDouble(6) shouldBe base.getDouble(6)
    shuffled.getDouble(7) shouldBe base.getDouble(7)
  }

  it should "emit NULL t when both variances are zero" in {
    val df = Seq(("a", 5.0), ("a", 5.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "x")
    val r = Hypothesis.welchT(df, "g", "x").collect().head
    r.isNullAt(6) shouldBe true
    r.isNullAt(7) shouldBe true
  }

  it should "still test when only one side is degenerate" in {
    val df = Seq(("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 9.0))
      .toDF("g", "x")
    val r = Hypothesis.welchT(df, "g", "x").collect().head
    // var_b = 32, se2 = 0 + 32/2 = 16; t = (5-5)/sqrt(16) = 0
    r.getDouble(6) shouldBe 0.0 +- 1e-12
  }

  it should "exclude groups with fewer than 2 observations and ignore NULLs" in {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(2.0)), ("b", Some(6.0)),
      ("c", Some(9.0)) // n=1: no variance, excluded
    ).toDF("g", "x")
    val pairs = Hypothesis.welchT(df, "g", "x")
      .select("group_a", "group_b").as[(String, String)].collect()
    pairs shouldBe Array(("a", "b"))
  }

  it should "emit every group pair exactly once, lexically ordered" in {
    val df = Seq(("c", 1.0), ("c", 2.0), ("a", 1.0), ("a", 5.0),
      ("b", 2.0), ("b", 9.0)).toDF("g", "x")
    val pairs = Hypothesis.welchT(df, "g", "x")
      .select("group_a", "group_b").as[(String, String)].collect().sorted
    pairs shouldBe Array(("a", "b"), ("a", "c"), ("b", "c"))
  }

  // ---- Mann–Whitney U ----

  "mannWhitney" should "match the hand-computed U, tie term, and z" in {
    // A=[1,2,3], B=[2,3,4]: mid-ranks 1, 2.5/2.5, 4.5/4.5, 6
    // R_a = 8, U_a = 2 (u2 = 4); T = (2^3-2)*2 = 12
    // sigma2 = 9/12 * (7 - 12/30) = 4.95; z = (2-4.5)/sqrt(4.95)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "x")
    val r = Hypothesis.mannWhitney(df, "g", "x").collect().head
    (r.getString(0), r.getString(1)) shouldBe (("a", "b"))
    (r.getLong(2), r.getLong(3)) shouldBe ((3L, 3L))
    r.getLong(4) shouldBe 4L // u2
    r.getDouble(5) shouldBe 2.0 // u exact (halves representable)
    r.getLong(6) shouldBe 12L // tie term
    r.getDouble(7) shouldBe -2.5 / math.sqrt(4.95) +- 1e-12
  }

  it should "give u2 = n_a*n_b (max) when A dominates B entirely" in {
    val df = Seq(("a", 10.0), ("a", 11.0), ("b", 1.0), ("b", 2.0),
      ("b", 3.0)).toDF("g", "x")
    val r = Hypothesis.mannWhitney(df, "g", "x").collect().head
    r.getLong(4) shouldBe 2L * 2L * 3L // u2 = 2*U = 2*6
    r.getLong(6) shouldBe 0L
  }

  it should "emit NULL z when every value is tied" in {
    val df = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "x")
    val r = Hypothesis.mannWhitney(df, "g", "x").collect().head
    // all in one tie run: T = n^3 - n = 60, sigma2 = 0
    r.isNullAt(7) shouldBe true
    r.getDouble(5) shouldBe 2.0 // U = n_a*n_b/2 under full ties
  }

  it should "be invariant under repartitioning" in {
    val vals = (1 to 100).map(i =>
      (if (i % 3 == 0) "a" else "b", ((i * 17) % 13).toDouble))
    val base = Hypothesis.mannWhitney(vals.toDF("g", "x"), "g", "x")
      .collect().head.toSeq
    val shuf = Hypothesis
      .mannWhitney(vals.toDF("g", "x").repartition(7), "g", "x")
      .collect().head.toSeq
    shuf shouldBe base
  }

  it should "order fractional values by their micro-quantization" in {
    // one micro-unit apart stays ordered; below half a micro-unit ties
    val apart = Seq(("a", 0.5), ("b", 0.500001)).toDF("g", "x")
    val r1 = Hypothesis.mannWhitney(apart, "g", "x").collect().head
    r1.getLong(4) shouldBe 0L // A strictly below B: U_a = 0
    r1.getLong(6) shouldBe 0L // no tie
    val tied = Seq(("a", 0.5), ("b", 0.5000004)).toDF("g", "x")
    val r2 = Hypothesis.mannWhitney(tied, "g", "x").collect().head
    r2.getLong(6) shouldBe 6L // 2^3-2: quantized into one tie run
  }

  it should "emit every group pair once with per-pair rank universes" in {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 1.0), ("c", 4.0)).toDF("g", "x")
    val rows = Hypothesis.mannWhitney(df, "g", "x")
      .orderBy("group_a", "group_b").collect()
    rows.map(r => (r.getString(0), r.getString(1))) shouldBe
      Array(("a", "b"), ("a", "c"), ("b", "c"))
    // a-vs-b: disjoint, a below: u2 = 0
    rows(0).getLong(4) shouldBe 0L
  }

  "ksTest" should "compute the exact integer CDF gap" in {
    // a = {1, 2}, b = {2, 3}: at v=1 gap |1·2 − 0·2| = 2; at v=2
    // |2·2 − 1·2| = 2; at v=3 |2·2 − 2·2| = 0 → d_num = 2, D = 0.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "x")
    val r = Hypothesis.ksTest(df, "g", "x").collect().head
    (r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe ((2L, 2L, 2L))
    r.getDouble(5) shouldBe 0.5
    r.getDouble(6) shouldBe math.sqrt(4.0 / 4.0) * 0.5
  }

  it should "reach D = 1 on disjoint supports and 0 on identical ones" in {
    val disjoint = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0))
      .toDF("g", "x")
    Hypothesis.ksTest(disjoint, "g", "x").collect()
      .head.getDouble(5) shouldBe 1.0
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "x")
    Hypothesis.ksTest(same, "g", "x").collect()
      .head.getDouble(5) shouldBe 0.0
  }

  it should "be invariant under repartitioning" in {
    val df = (1 to 120).map(i =>
      (if (i % 3 == 0) "a" else "b", (i * 17 % 31).toDouble))
      .toDF("g", "x")
    val a = Hypothesis.ksTest(df, "g", "x").collect().head
    val b = Hypothesis.ksTest(df.repartition(7), "g", "x")
      .collect().head
    a shouldBe b
  }
}
