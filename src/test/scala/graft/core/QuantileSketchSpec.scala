package graft.core

import graft.SparkSpec
import graft.functions.TextFunctions.quantileSketch
import org.apache.spark.sql.functions._

/** Quantile sketch: exact order statistics below capacity, regime flag,
  * duplicate weighting, partition invariance in the exact regime,
  * bounded state + rank-error sanity above capacity, SQL surface.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int,
      qs: Seq[Double]): (Long, Long, Boolean, Seq[Long]) = {
    val r = df.agg(quantileSketch(col("v"), cap, qs).as("s"))
      .select("s.n_total", "s.n_entries", "s.exact", "s.values")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getBoolean(2),
      r.getAs[scala.collection.Seq[Long]](3).toSeq)
  }

  "quantileSketch" should "return exact order statistics below " +
      "capacity" in {
    val df = (1L to 100L).toDF("v")
    val (n, entries, exact, vals) =
      sketch(df, 200, Seq(0.0, 0.25, 0.5, 1.0))
    n shouldBe 100L
    entries shouldBe 100L
    exact shouldBe true
    vals shouldBe Seq(1L, 25L, 50L, 100L) // ceil(q*n)-th smallest
  }

  it should "weight duplicates (value histogram, not value set)" in {
    val df = (Seq.fill(90)(1L) ++ Seq.fill(10)(2L)).toDF("v")
    val (_, entries, exact, vals) = sketch(df, 10, Seq(0.5, 0.95))
    entries shouldBe 2L
    exact shouldBe true
    vals shouldBe Seq(1L, 2L) // rank 50 -> 1, rank 95 -> 2
  }

  it should "be partition-invariant in the exact regime" in {
    val rows = (1L to 500L).map(i => (i * 37) % 97)
    val a = sketch(rows.toDF("v"), 200, Seq(0.1, 0.5, 0.9))
    val b = sketch(rows.toDF("v").repartition(11), 200, Seq(0.1, 0.5, 0.9))
    a shouldBe b
    a._3 shouldBe true // 97 distinct < 200
  }

  it should "bound state and stay rank-accurate above capacity" in {
    val n = 10000
    val df = (1L to n.toLong).toDF("v")
    val (total, entries, exact, vals) = sketch(df, 128, Seq(0.25, 0.5, 0.75))
    total shouldBe n.toLong
    entries should be <= 128L
    exact shouldBe false
    // merge-reduce rank error: assert within 25% of n on each query
    vals.zip(Seq(0.25, 0.5, 0.75)).foreach { case (v, q) =>
      math.abs(v - q * n) should be <= (0.25 * n)
    }
  }

  it should "handle min/max fractions and empty input" in {
    val (_, _, _, vals) = sketch(Seq(5L, 3L, 9L).toDF("v"),
      10, Seq(0.0, 1.0))
    vals shouldBe Seq(3L, 9L)
    val (n0, e0, _, v0) = sketch(Seq.empty[Long].toDF("v"), 10, Seq(0.5))
    n0 shouldBe 0L
    e0 shouldBe 0L
    v0 shouldBe empty
  }

  it should "ignore NULLs" in {
    val df = Seq(Some(1L), None, Some(3L)).toDF("v")
    val (n, _, _, vals) = sketch(df, 10, Seq(1.0))
    n shouldBe 2L
    vals shouldBe Seq(3L)
  }

  it should "work from SQL via graft_quantiles" in {
    graft.core.GraftExtensions.register(spark)
    (1L to 50L).toDF("v").createOrReplaceTempView("qs_in")
    val r = spark.sql(
      "SELECT graft_quantiles(v, 100, array(0.5D)) AS s FROM qs_in")
      .select("s.exact", "s.values").collect().head
    r.getBoolean(0) shouldBe true
    r.getAs[scala.collection.Seq[Long]](1) shouldBe Seq(25L)
  }
}
