package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-grid kernel density estimate — the oracle-replayable twin of
  * MLlib KernelDensity (reference: taar/taar_similarity.py:258-342 scores
  * donor similarity with Gaussian KDEs over feature distances; the seeded
  * float path lives in jobs/taar/Similarity.scala). A Gaussian kernel
  * needs exp(), which drifts by ulps across libms, so the exact-integer
  * variant uses the Epanechnikov kernel K(u) = 3/4·(1 − u²)·1{|u| < 1} —
  * the MSE-optimal kernel (Epanechnikov 1969), polynomial, hence exactly
  * computable in longs: the contribution at grid point g from sample x is
  * (750000·(h² − t²)) div h² with t = g − x, zero outside |t| < h.
  *
  * Scale: each sample fans out to only the ≤ 2h/step + 1 grid points it
  * can reach (exact index-range explode — the rolling-actives smear
  * shape), then ONE map-side-combined sum per grid point; the grid spine
  * is a range() frame left-joined so empty cells emit 0, and n rides in
  * as a broadcast 1-row total. No corpus × grid crossJoin, no window, no
  * sort until the caller's final ORDER BY.
  *
  * Exactness: kernel sums are exact longs (bound 750000·n per cell — safe
  * under 2⁵³ to ~10¹⁰ samples per cell); the emitted
  * density = kernel_sum / (10⁶·n·h) is one fixed IEEE op sequence over
  * those exact integers, bit-identical in any replaying engine.
  */
object Kde {

  /** Density over the `nPoints`-point grid g_k = gridLo + k·gridStep,
    * k ∈ [0, nPoints). `valueCol` must be integral (callers quantize
    * upstream). Output: (k, gx, kernel_sum, density), one row per grid
    * point including zero cells.
    */
  def densityGrid(df: DataFrame, valueCol: String, gridLo: Long,
      gridStep: Long, nPoints: Int, bandwidth: Long): DataFrame = {
    require(nPoints >= 1, s"nPoints must be >= 1, got $nPoints")
    require(gridStep >= 1, s"gridStep must be >= 1, got $gridStep")
    require(bandwidth >= 1, s"bandwidth must be >= 1, got $bandwidth")
    // 750000·h² is the largest intermediate a single contribution forms;
    // past 2^53 it replays differently across engines (the Quant guarded-
    // operator discipline — DECIMAL/HUGEINT→DOUBLE casts are not
    // correctly rounded everywhere). 750000·(10⁵)² ≈ 7.5e15 < 2^53.
    require(bandwidth <= 100000L,
      s"bandwidth must be <= 100000 (2^53 cross-engine replay bound on " +
        s"750000*h^2), got $bandwidth")
    val h = bandwidth
    val v = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("x"))
    val nRow = v.agg(count(lit(1)).as("n"))
    // Candidate k range from trunc-div bounds, widened by 2 and clamped to
    // the grid: the exact |gx − x| < h filter below decides membership, so
    // the range arithmetic only needs to produce a superset (truncating
    // division is within 1 of floor for negative operands). Clamping both
    // ends into [0, nPoints) with the same monotone shape keeps
    // k_lo <= k_hi, so sequence() never descends.
    val sums = v.selectExpr(
        "x",
        s"greatest(least((x - ${h}L - ${gridLo}L) div ${gridStep}L - 2L, " +
          s"${nPoints - 1}L), 0L) AS k_lo",
        s"greatest(least((x + ${h}L - ${gridLo}L) div ${gridStep}L + 2L, " +
          s"${nPoints - 1}L), 0L) AS k_hi")
      .select(col("x"), explode(expr("sequence(k_lo, k_hi)")).as("k"))
      .withColumn("gx", lit(gridLo) + col("k") * lit(gridStep))
      .filter(abs(col("gx") - col("x")) < h)
      .withColumn("t", col("gx") - col("x"))
      .withColumn("c",
        expr(s"(750000L * (${h}L * ${h}L - t * t)) div (${h}L * ${h}L)"))
      .groupBy("k").agg(sum("c").as("kernel_sum"))
    val spine = df.sparkSession.range(nPoints).select(col("id").as("k"))
    val ks = coalesce(col("kernel_sum"), lit(0L))
    spine.join(sums, Seq("k"), "left")
      .crossJoin(broadcast(nRow))
      .select(col("k"),
        (lit(gridLo) + col("k") * lit(gridStep)).as("gx"),
        ks.as("kernel_sum"),
        (ks.cast("double") / lit(1000000.0) / col("n").cast("double") /
          lit(h.toDouble)).as("density"))
  }
}
