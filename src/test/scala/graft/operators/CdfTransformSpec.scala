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
}
