package graft.operators

import graft.SparkSpec

/** CUSUM changepoint: hand-computed ramp on a level shift, symmetric
  * negative shift, flat series, slack absorption, first-attain tie
  * rule, partition invariance.
  */
class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def one(vals: Seq[Double], slack: Double = 0.0) = {
    val df = vals.zipWithIndex
      .map { case (v, i) => ("k", (i + 1).toLong, v) }
      .toDF("key", "o", "v")
    Changepoint.cusum(df, "key", "o", "v", slack).collect().head
  }

  "cusum" should "ramp on an upward level shift and locate it" in {
    // [0,0,0,3,3,3]: mean 1.5; S+ ramps over the last three points
    val r = one(Seq(0.0, 0.0, 0.0, 3.0, 3.0, 3.0))
    r.getLong(1) shouldBe 6L
    r.getDouble(2) shouldBe 1.5 +- 1e-12 // mean
    r.getDouble(3) shouldBe 4.5 +- 1e-12 // s_pos_max = 1.5*3
    r.getLong(4) shouldBe 6L // attained at the end
    r.getDouble(5) shouldBe 4.5 +- 1e-12 // s_neg ramps over the prefix
    r.getLong(6) shouldBe 3L
  }

  it should "report zero maxima and NULL locations on a flat series" in {
    val r = one(Seq(2.0, 2.0, 2.0, 2.0))
    r.getDouble(3) shouldBe 0.0
    r.isNullAt(4) shouldBe true
    r.getDouble(5) shouldBe 0.0
    r.isNullAt(6) shouldBe true
  }

  it should "absorb deviations below the slack allowance" in {
    val r = one(Seq(0.0, 0.0, 0.0, 3.0, 3.0, 3.0), slack = 2.0)
    // |deviation| = 1.5 < slack on every point: nothing accumulates
    r.getDouble(3) shouldBe 0.0
    r.getDouble(5) shouldBe 0.0
  }

  it should "mark the FIRST index attaining the maximum" in {
    // [4,0,0,0]: d+ = v - 1: [3,-1,-1,-1]; S+ = [3,2,1,0] -> max at o=1
    val r = one(Seq(4.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))
    r.getLong(4) shouldBe 1L
  }

  it should "fold in ord order regardless of row order and partitioning" in {
    val vals = (1 to 60).map(i => if (i > 40) 5.0 else 1.0)
    val rows = vals.zipWithIndex
      .map { case (v, i) => ("k", (i + 1).toLong, v) }
    val a = Changepoint.cusum(rows.toDF("key", "o", "v"), "key", "o", "v")
      .collect().head.toSeq
    val b = Changepoint.cusum(
        scala.util.Random.shuffle(rows).toDF("key", "o", "v")
          .repartition(7), "key", "o", "v")
      .collect().head.toSeq
    a shouldBe b
    a(4) shouldBe 60L // upward max attained at the series end
  }

  it should "scope keys independently" in {
    val df = (Seq(("a", 1L, 0.0), ("a", 2L, 4.0)) ++
      Seq(("b", 1L, 7.0), ("b", 2L, 7.0))).toDF("key", "o", "v")
    val m = Changepoint.cusum(df, "key", "o", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    m("a") shouldBe 2.0 +- 1e-12
    m("b") shouldBe 0.0
  }

  // ---- fixed-target + chunked ----

  "cusumFixed" should "ramp against the given baseline mean" in {
    val df = Seq(("k", 1L, 5.0), ("k", 2L, 5.0), ("k", 3L, 8.0),
      ("k", 4L, 8.0)).toDF("key", "o", "v")
    val r = Changepoint.cusumFixed(df, "key", "o", "v",
      targetMean = 5.0).collect().head
    r.getDouble(2) shouldBe 6.0 +- 1e-12 // (8-5)*2
    r.getLong(3) shouldBe 4L
    r.getDouble(4) shouldBe 0.0
  }

  "cusumFixedChunked" should "be bit-identical to the unchunked fold " +
      "at every chunk size" in {
    val rows = (1 to 60).map(i =>
      (s"k${i % 3}", i.toLong, ((i * 13) % 11).toDouble))
    val df = rows.toDF("key", "o", "v")
    val whole = Changepoint.cusumFixed(df, "key", "o", "v", 5.0, 1.0)
      .orderBy("key").collect().map(_.toSeq)
    for (cs <- Seq(2, 7, 64)) {
      val chunked = Changepoint.cusumFixedChunked(
          df.repartition(5), "key", "o", "v", 5.0, 1.0, chunkSize = cs)
        .orderBy("key").collect().map(_.toSeq)
      chunked shouldBe whole
    }
  }

  it should "return an empty typed frame on empty input" in {
    val df = Seq.empty[(String, Long, Double)].toDF("key", "o", "v")
    val out = Changepoint.cusumFixedChunked(df, "key", "o", "v", 1.0)
    out.count() shouldBe 0L
    out.columns shouldBe Array("key", "n_points", "s_pos_max", "pos_at",
      "s_neg_max", "neg_at")
  }
}
