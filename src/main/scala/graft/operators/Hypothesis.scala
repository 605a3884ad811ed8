package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample hypothesis testing — Welch's unequal-variance t-test over
  * every pair of groups. This is the experiment-readout shape behind the
  * reference's experiment jobs (`experimentsdaily/` builds the per-branch
  * frames; the analyst's next question — "do the branches differ?" — is
  * this operator), and the pipeline question "did corpus metric X move
  * between sources/snapshots?" asked with error bars instead of a diff.
  *
  * Welch (1947) rather than Student: real branch/source groups never
  * share a variance, and Welch is the test that stays calibrated when
  * sizes and variances both differ. No p-value column — that needs the
  * incomplete beta function; the (t, df) pair IS the decision statistic
  * and keeps every emitted value a fixed-shape IEEE expression over
  * exact sums, bit-identical across engines.
  *
  * Exactness discipline (the micro-unit pattern shared with UnigramLm /
  * Auc): values quantize to integer micro-units (×10⁶, round-half-up —
  * lossless for integral inputs, one deterministic IEEE rounding for
  * fractional ones), and the moments are DECIMAL sums of those integers
  * — order-free where double accumulation is partitioning-dependent. The
  * micro-unit square is DECIMAL(18,0)² = DECIMAL(37,0), inside both
  * engines' exact range, which bounds |value| < ~5·10¹¹ — ample for any
  * metric column.
  *
  * Scale: the DATA pass is ONE map-side-combined moments aggregation
  * (n, Σm, Σm² per group) — rows never shuffle, only sufficient
  * statistics do. Everything after runs on the |groups|-sized stats
  * frame; the pairwise frame is a broadcast self-join emitting
  * C(groups, 2) rows.
  */
object Hypothesis {

  /** Pairwise Welch t-tests between all groups (group_a < group_b
    * lexically). Groups with fewer than 2 non-NULL values are excluded —
    * a variance needs two observations. NULL values are ignored (not
    * zero-filled).
    *
    * Output: (group_a, group_b, n_a, n_b, mean_a, mean_b, t_stat,
    * df_welch). t_stat is NULL when both sample variances are 0 (no
    * test exists); df_welch via Welch–Satterthwaite.
    */
  def welchT(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val x = col(valueCol)
    // integer micro-units; DECIMAL(18,0) so the square stays exact
    // (guarded — out-of-range input raises instead of silently nulling)
    val m = Quant.fixedPoint(x, 1000000.0)
    val stats = df.filter(x.isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(m).as("sx"),
        sum(m * m).as("sxx"))
      .filter(col("n") >= 2)

    // fixed IEEE op sequence — mirrored verbatim in any replaying engine
    def nD(p: String): Column = col(s"$p.n").cast("double")
    def mean(p: String): Column =
      col(s"$p.sx").cast("double") / lit(1000000.0) / nD(p)
    def variance(p: String): Column = {
      val sxd = col(s"$p.sx").cast("double") / lit(1000000.0)
      val sxxd = col(s"$p.sxx").cast("double") / lit(1.0e12)
      (sxxd - sxd * sxd / nD(p)) / (col(s"$p.n") - 1L).cast("double")
    }
    def vn(p: String): Column = variance(p) / nD(p)

    val a = stats.alias("a")
    val b = stats.alias("b")
    val se2 = vn("a") + vn("b")
    val tStat = when(se2 > 0.0,
      (mean("a") - mean("b")) / sqrt(se2))
    val dfW = when(se2 > 0.0,
      (se2 * se2) / (
        vn("a") * vn("a") / (col("a.n") - 1L).cast("double") +
          vn("b") * vn("b") / (col("b.n") - 1L).cast("double")))
    a.join(broadcast(b), col("a.g") < col("b.g"))
      .select(
        col("a.g").as("group_a"), col("b.g").as("group_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        mean("a").as("mean_a"), mean("b").as("mean_b"),
        tStat.as("t_stat"), dfW.as("df_welch"))
  }

  /** Pairwise Mann–Whitney U — the rank-sum test Welch's t cannot
    * replace when the metric is heavy-tailed or ordinal (session counts,
    * latencies, quality scores). Computed WITHOUT a global row sort via
    * the compressed-rank discipline (the X95 shape): values collapse to
    * per-(group, value) counts, each group pair unions its two count
    * vectors, and ONE window over the |distinct values|-sized pair table
    * yields doubled mid-ranks 2p + c + 1 — exact integers even under
    * ties (a run of c equal values after p predecessors has mid-rank
    * p + (c+1)/2).
    *
    * Exact-integer core: u2 = 2·U_a = Σ c_a·(2p+c+1) − n_a(n_a+1) and
    * the tie term T = Σ(c³−c) are emitted as longs; u = u2/2 is exact in
    * binary (halves are representable). The normal approximation
    *   z = (U − n_a·n_b/2) / sqrt(n_a·n_b/12 · ((n+1) − T/(n(n−1))))
    * is a fixed IEEE shape over those longs (the welchT convention), so
    * it replays bit-identically in any engine; NULL when the variance is
    * 0 (all values tied). No continuity correction — z is the decision
    * statistic, not a p-value.
    *
    * Scale: ONE map-side-combined count aggregation touches the rows;
    * everything after runs on |groups|·|distinct values| sufficient
    * statistics, and the group-pair frame is a broadcast self-join.
    */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val x = col(valueCol)
    // Quant.fixedPoint (the welch guard): out-of-range magnitudes raise
    // instead of silently saturating the double→long cast.
    val m = Quant.fixedPoint(x, 1000000.0).cast("long")
    val counts = df.filter(x.isNotNull)
      .groupBy(col(groupCol).as("g"), m.as("v"))
      .agg(count(lit(1)).as("c"))
    val groups = counts.select(col("g")).distinct()
    val pairs = groups.alias("pa").join(broadcast(groups.alias("pb")),
        col("pa.g") < col("pb.g"))
      .select(col("pa.g").as("ga"), col("pb.g").as("gb"))
    // per-pair per-value counts in ONE pass: a union of two per-side
    // joins would duplicate the counts subplan (and its scan) in both
    // branches; the OR-condition broadcast join fans each count row out
    // to only the pairs containing its group, and conditional sums
    // split the sides
    val merged = counts.join(broadcast(pairs),
        col("g") === col("ga") || col("g") === col("gb"))
      .groupBy("ga", "gb", "v")
      .agg(
        sum(when(col("g") === col("ga"), col("c")).otherwise(0L)).as("ca"),
        sum(when(col("g") === col("gb"), col("c")).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val byV = Window.partitionBy("ga", "gb").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = merged.withColumn("p", sum("c").over(byV) - col("c"))
    val agg = ranked.groupBy("ga", "gb").agg(
      sum("ca").as("n_a"), sum("cb").as("n_b"),
      sum(col("ca") * (lit(2L) * col("p") + col("c") + 1L)).as("r2a"),
      sum(col("c") * col("c") * col("c") - col("c")).as("tie_term"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val n = (col("n_a") + col("n_b")).cast("double")
    val u2 = col("r2a") - col("n_a") * (col("n_a") + 1L)
    // fixed IEEE op sequence — mirrored verbatim in the oracle
    val sigma2 = nA * nB / lit(12.0) *
      ((n + lit(1.0)) - col("tie_term").cast("double") / (n * (n - lit(1.0))))
    val z = when(sigma2 > 0.0,
      (col("u2").cast("double") / lit(2.0) - nA * nB / lit(2.0)) /
        sqrt(sigma2))
    agg.withColumn("u2", u2)
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("n_a"), col("n_b"), col("u2"),
        (col("u2").cast("double") / lit(2.0)).as("u"),
        col("tie_term"), z.as("z_score"))
  }

  /** Pairwise two-sample Kolmogorov–Smirnov — the DISTRIBUTION-shape test
    * the location tests (Welch t, Mann–Whitney) cannot replace: D is the
    * largest gap between the two empirical CDFs anywhere, so it fires on
    * variance/modality changes that leave means and ranks untouched —
    * the "did this source's metric distribution change shape" drift
    * question asked with a statistic instead of a histogram (the metric
    * companion to X67 JS / X68 PSI / X127 W₁).
    *
    * Exact-integer core (the mannWhitney compressed-rank shape): values
    * quantize to micro-unit longs and collapse to per-(group, value)
    * counts; per pair, ONE window over the |distinct values|-sized count
    * table yields both running and total counts, and
    * d_num = max |cumA·n_b − cumB·n_a| is an exact long (the CDF gap on
    * the common denominator n_a·n_b — no floats, no ties ambiguity: at
    * every distinct value both CDFs step together). D = d_num/(n_a·n_b)
    * and the sample-size-scaled √(n_a·n_b/(n_a+n_b))·D are fixed IEEE
    * shapes over those longs, bit-identical in any engine.
    *
    * Scale: ONE map-side-combined count aggregation touches the rows;
    * everything after runs on |groups|·|distinct values| cells with the
    * pair fan-out bounded by the broadcast pair frame.
    */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val x = col(valueCol)
    // Quant.fixedPoint (the welch guard): out-of-range magnitudes raise
    // instead of silently saturating the double→long cast.
    val m = Quant.fixedPoint(x, 1000000.0).cast("long")
    val counts = df.filter(x.isNotNull)
      .groupBy(col(groupCol).as("g"), m.as("v"))
      .agg(count(lit(1)).as("c"))
    val groups = counts.select(col("g")).distinct()
    val pairs = groups.alias("pa").join(broadcast(groups.alias("pb")),
        col("pa.g") < col("pb.g"))
      .select(col("pa.g").as("ga"), col("pb.g").as("gb"))
    val merged = counts.join(broadcast(pairs),
        col("g") === col("ga") || col("g") === col("gb"))
      .groupBy("ga", "gb", "v")
      .agg(
        sum(when(col("g") === col("ga"), col("c")).otherwise(0L)).as("ca"),
        sum(when(col("g") === col("gb"), col("c")).otherwise(0L)).as("cb"))
    // one sort pass: running and total counts from the same window spec
    val part = Window.partitionBy("ga", "gb").orderBy("v")
    val run = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = part.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val stepped = merged
      .withColumn("cum_a", sum("ca").over(run))
      .withColumn("cum_b", sum("cb").over(run))
      .withColumn("n_a", sum("ca").over(all))
      .withColumn("n_b", sum("cb").over(all))
    val agg = stepped.groupBy("ga", "gb").agg(
      max("n_a").as("n_a"), max("n_b").as("n_b"),
      max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
        .as("d_num"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val ksD = col("d_num").cast("double") / (nA * nB)
    agg
      .filter(col("n_a") > 0L && col("n_b") > 0L)
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("n_a"), col("n_b"), col("d_num"),
        ksD.as("ks_d"),
        (sqrt(nA * nB / (nA + nB)) * ksD).as("ks_stat"))
  }
}
