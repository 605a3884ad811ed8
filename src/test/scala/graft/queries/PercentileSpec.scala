package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** approx_percentile is the 100 TB path (bounded-memory GK sketch, no
  * per-group value map); its error is engine-specific so it can't be
  * oracle-gated — pin it against the exact percentile (q38's subject)
  * instead.
  */
class PercentileSpec extends SparkSpec {
  import spark.implicits._

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
