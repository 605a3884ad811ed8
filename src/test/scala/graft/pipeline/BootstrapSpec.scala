package graft.pipeline

import graft.SparkSpec
import graft.operators.Bootstrap

/** Poisson bootstrap (operators/Bootstrap): threshold table pins,
  * determinism, resample-mean statistics around the true mean,
  * partition invariance, grouped output shape.
  */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data =
    (1 to 400).map(i => (i.toLong, (i % 50).toLong)).toDF("id", "v")
  private val trueMean = (1 to 400).map(_ % 50).sum / 400.0

  behavior of "Bootstrap.poissonMeans"

  it should "pin the Poisson(1) CDF threshold table" in {
    Bootstrap.Thresholds.length shouldBe 9
    // t0/M = e^-1, t1/M = 2e^-1 (within integer truncation)
    val m = 1000000007L
    (Bootstrap.Thresholds(0).toDouble / m) shouldBe
      math.exp(-1.0) +- 1e-9
    (Bootstrap.Thresholds(1).toDouble / m) shouldBe
      2 * math.exp(-1.0) +- 1e-9
    Bootstrap.Thresholds shouldBe sorted
    // residual mass above the w=9 cap is ~1e-6 of the hash space
    (m - Bootstrap.Thresholds.last).toDouble / m should be < 2e-6
  }

  it should "deal identical resamples on every run and partitioning" in {
    val a = Bootstrap.poissonMeans(data, "id", "v", 8, "s1")
      .orderBy("b").collect()
    val b = Bootstrap.poissonMeans(data.repartition(7), "id", "v", 8, "s1")
      .orderBy("b").collect()
    a shouldBe b
  }

  it should "produce resample means scattered around the true mean" in {
    val means = Bootstrap.poissonMeans(data, "id", "v", 32, "s2")
      .select("mean").as[Double].collect()
    means.length shouldBe 32
    // each resample keeps ~n rows (Poisson(1) weights sum to ~n), so
    // means concentrate near the truth with se ~ sd/sqrt(n) ~ 0.7
    val avg = means.sum / means.length
    avg shouldBe trueMean +- 1.0
    means.max should be > trueMean
    means.min should be < trueMean
    // and they are not all equal (the weights actually vary)
    means.distinct.length should be > 16
  }

  it should "resample independently per salt" in {
    val a = Bootstrap.poissonMeans(data, "id", "v", 4, "saltA")
      .select("mean").as[Double].collect().toSeq
    val b = Bootstrap.poissonMeans(data, "id", "v", 4, "saltB")
      .select("mean").as[Double].collect().toSeq
    a should not be b
  }

  it should "compute per-group resamples" in {
    val grouped = data.withColumn("g", $"id" % 2)
    val out = Bootstrap.poissonMeans(grouped, "id", "v", 4, "s3",
      Seq("g")).collect()
    out.length shouldBe 8 // 2 groups x 4 resamples
  }

  it should "reject an out-of-range resample count" in {
    an[IllegalArgumentException] should be thrownBy
      Bootstrap.poissonMeans(data, "id", "v", 0, "s")
  }
}
