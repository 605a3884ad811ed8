package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approximate-sketch aggregates are the 100 TB path (bounded
  * memory, mergeable partials); their errors are engine-specific so they
  * can't be oracle-gated — pin each against its exact counterpart
  * instead: approx_percentile (GK sketch) vs percentile (q38's subject),
  * approx_count_distinct (HyperLogLog++) vs count(distinct).
  */
class PercentileSpec extends SparkSpec {
  import spark.implicits._

  it should "keep approx_count_distinct within HLL++ error of exact" in {
    val df = (1 to 50000).map(i => (i % 4, s"user-${i % 9000}")).toDF("g", "u")
    val rows = df.groupBy("g").agg(
      countDistinct($"u").as("exact"),
      expr("approx_count_distinct(u, 0.02)").as("approx")).collect()
    rows should have length 4
    rows.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      math.abs(approx - exact).toDouble / exact should be < 0.06 // 3σ of 2%
    }
  }

  it should "keep approx_percentile within the accuracy bound of exact" in {
    // 10k skewed values (quadratic ramp) across 4 groups
    val df = (1 to 10000)
      .map(i => (i % 4, (i.toDouble / 100) * (i.toDouble / 100)))
      .toDF("g", "v")
    val rows = df.groupBy("g").agg(
      expr("percentile(v, 0.5)").as("exact"),
      expr("approx_percentile(v, 0.5, 1000)").as("approx"),
      count(lit(1)).as("n")).collect()
    rows should have length 4
    rows.foreach { r =>
      val (exact, approx, n) =
        (r.getDouble(1), r.getDouble(2), r.getLong(3))
      // GK guarantee: rank error ≤ n/accuracy; translate to a loose value
      // bound via the local density of the quadratic ramp (~1% here)
      math.abs(approx - exact) / exact should be < 0.05
      n shouldBe 2500L
    }
  }
}
