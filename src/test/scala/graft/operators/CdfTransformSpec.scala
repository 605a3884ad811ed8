package graft.operators

import graft.SparkSpec

/** Percentile-rank transform: mid-rank tie handling, NULL passthrough,
  * per-partition distributions, symmetry, determinism.
  */
class CdfTransformSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, 10.0), (2L, 20.0), (3L, 20.0), (4L, 30.0))
    .toDF("id", "v")

  "percentileRank" should "use the mid-rank convention for ties" in {
    val m = CdfTransform.percentileRank(df, "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct_rank")).toMap
    m(1L) shouldBe 0.125
    m(2L) shouldBe 0.5
    m(3L) shouldBe 0.5
    m(4L) shouldBe 0.875
  }

  it should "average to exactly one half over any column" in {
    val rnd = (1 to 97).map(i => (i.toLong, ((i * 37) % 13).toDouble))
      .toDF("id", "v")
    val mean = CdfTransform.percentileRank(rnd, "v")
      .agg(org.apache.spark.sql.functions.avg("pct_rank"))
      .head().getDouble(0)
    mean shouldBe 0.5 +- 1e-12
  }

  it should "leave NULL values unranked" in {
    val withNull = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v")
    val rows = CdfTransform.percentileRank(withNull, "v")
      .collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Any]("pct_rank") == null))
      .toMap
    rows(1L) shouldBe false
    rows(2L) shouldBe true
  }

  it should "rank within partitions independently" in {
    val parts = Seq(("a", 1.0), ("a", 2.0), ("b", 100.0), ("b", 200.0))
      .toDF("g", "v")
    val m = CdfTransform.percentileRank(parts, "v", Seq("g"))
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Double]("v")) -> r.getAs[Double]("pct_rank"))
      .toMap
    m(("a", 1.0)) shouldBe 0.25
    m(("b", 100.0)) shouldBe 0.25 // same shape, different scale
  }

  it should "agree between broadcast and shuffle attach paths" in {
    val a = CdfTransform.percentileRank(df, "v").orderBy("id")
      .collect().map(_.toSeq)
    val b = CdfTransform.percentileRank(df, "v", broadcastRanks = false)
      .orderBy("id").collect().map(_.toSeq)
    a shouldBe b
  }

  it should "be invariant under repartitioning" in {
    val a = CdfTransform.percentileRank(df, "v").orderBy("id")
      .collect().map(_.toSeq)
    val b = CdfTransform.percentileRank(df.repartition(5), "v")
      .orderBy("id").collect().map(_.toSeq)
    a shouldBe b
  }

  // ---- equal-frequency bins ----

  "quantileBins" should "split distinct values evenly" in {
    val vals = (1 to 10).map(v => (v.toLong, v.toDouble)).toDF("id", "v")
    val bins = CdfTransform.quantileBins(vals, "v", 2)
      .collect().map(r => r.getAs[Double]("v") -> r.getAs[Long]("bin"))
      .toMap
    (1 to 5).foreach(v => bins(v.toDouble) shouldBe 0L)
    (6 to 10).foreach(v => bins(v.toDouble) shouldBe 1L)
  }

  it should "produce k balanced bins on 1..9 with k=3" in {
    val vals = (1 to 9).map(v => (v.toLong, v.toDouble)).toDF("id", "v")
    val counts = CdfTransform.quantileBins(vals, "v", 3)
      .groupBy("bin").count()
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("count"))
      .toMap
    counts shouldBe Map(0L -> 3L, 1L -> 3L, 2L -> 3L)
  }

  it should "place a whole tie run in one bin (unlike NTILE)" in {
    val vals = (Seq.fill(6)(5.0) ++ Seq(1.0, 9.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val byVal = CdfTransform.quantileBins(vals, "v", 4)
      .select("v", "bin").distinct().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    byVal.size shouldBe 3 // one bin per distinct value
    byVal(1.0) shouldBe 0L
    // ties at 5: midrank2 = 2*1+6 = 8 of 16 -> bin 8*4 div 16 = 2
    byVal(5.0) shouldBe 2L
    byVal(9.0) shouldBe 3L
  }

  it should "clamp the maximum value into bin k-1 and keep NULLs NULL" in {
    val vals = Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, None))
      .toDF("id", "v")
    val rows = CdfTransform.quantileBins(vals, "v", 2)
      .select("id", "bin").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    rows(2L) shouldBe 1L // midrank2 = 3 of 4: 3*2 div 4 = 1 (clamped path)
    rows(3L) shouldBe -1L // NULL value -> NULL bin
  }

  // ---- winsorization ----

  "winsorize" should "clamp tails to the exact order-statistic caps" in {
    // 1..100: p10 cap = 10th smallest = 10, p90 = ceil(90) = 90
    val vals = (1 to 100).map(v => (v.toLong, v.toDouble)).toDF("id", "v")
    val out = CdfTransform.winsorize(vals, "v", 0.10, 0.90)
      .collect().map(r => r.getAs[Double]("v") ->
        (r.getAs[Double]("v_capped"), r.getAs[Int]("clipped"))).toMap
    out(5.0) shouldBe ((10.0, -1))
    out(10.0) shouldBe ((10.0, 0)) // at the cap: untouched
    out(50.0) shouldBe ((50.0, 0))
    out(95.0) shouldBe ((90.0, 1))
  }

  it should "cap per group independently and pass NULLs through" in {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(100.0)),
      ("b", Some(1000.0)), ("b", Some(2000.0)), ("b", Some(3000.0)),
      ("a", None)).toDF("g", "v")
    // caps at (0.2, 0.5): lo = 1st smallest, hi = ceil(n/2)-th = 2nd
    val out = CdfTransform.winsorize(df, "v", 0.2, 0.5, Seq("g"))
      .collect()
    val aHi = out.filter(r => r.getString(0) == "a" && !r.isNullAt(1) &&
      r.getDouble(1) == 100.0).head
    aHi.getAs[Double]("v_capped") shouldBe 2.0 // a's p50 cap
    val bLo = out.filter(r => r.getString(0) == "b" &&
      r.getDouble(1) == 1000.0).head
    bLo.getAs[Int]("clipped") shouldBe 0 // b's own caps, not a's
    out.filter(_.isNullAt(1)).head.isNullAt(2) shouldBe true
  }

  it should "be invariant under repartitioning" in {
    val vals = (1 to 200).map(v => (v.toLong, ((v * 37) % 50).toDouble))
      .toDF("id", "v")
    val a = CdfTransform.winsorize(vals, "v", 0.05, 0.95)
      .orderBy("id").collect().map(_.toSeq)
    val b = CdfTransform.winsorize(vals.repartition(9), "v", 0.05, 0.95)
      .orderBy("id").collect().map(_.toSeq)
    a shouldBe b
  }

  // ---- weighted quantiles ----

  "weightedQuantiles" should "weight every unit, not every row" in {
    // values 1 (w 9), 10 (w 1): median by weight = 1, p95 = 10
    val df = Seq((1.0, 9L), (10.0, 1L)).toDF("v", "w")
    val r = CdfTransform.weightedQuantiles(df, "v", "w", Seq(50, 95))
      .collect().head
    r.getLong(0) shouldBe 10L // w_total
    r.getDouble(1) shouldBe 1.0 // p50
    r.getDouble(2) shouldBe 10.0 // p95
  }

  it should "reduce to plain order statistics at weight 1" in {
    val df = (1 to 100).map(v => (v.toDouble, 1L)).toDF("v", "w")
    val r = CdfTransform.weightedQuantiles(df, "v", "w", Seq(25, 50, 100))
      .collect().head
    r.getDouble(1) shouldBe 25.0
    r.getDouble(2) shouldBe 50.0
    r.getDouble(3) shouldBe 100.0
  }

  it should "scope groups and drop non-positive weights" in {
    val df = Seq(("a", 1.0, 5L), ("a", 2.0, 5L), ("b", 7.0, 1L),
      ("a", 99.0, 0L), ("a", 98.0, -3L)).toDF("g", "v", "w")
    val m = CdfTransform.weightedQuantiles(df, "v", "w", Seq(50),
        Seq("g")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    m("a") shouldBe ((10L, 1.0)) // 50% of weight reached at v=1
    m("b") shouldBe ((1L, 7.0))
  }

  it should "be invariant under repartitioning" in {
    val rows = (1 to 300).map(i => (((i * 13) % 40).toDouble,
      (i % 7 + 1).toLong))
    val a = CdfTransform.weightedQuantiles(rows.toDF("v", "w"), "v",
      "w", Seq(10, 50, 90)).collect().head.toSeq
    val b = CdfTransform.weightedQuantiles(
      rows.toDF("v", "w").repartition(11), "v", "w",
      Seq(10, 50, 90)).collect().head.toSeq
    a shouldBe b
  }
}
