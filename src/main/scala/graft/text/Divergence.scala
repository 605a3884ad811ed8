package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions._

/** Corpus drift detection: Jensen–Shannon divergence between two
  * corpora's token distributions — "did this week's crawl shift?" is a
  * release gate in a continuously-ingesting pipeline, and JS is the
  * standard bounded (≤ ln 2), symmetric, zero-safe comparison (KL
  * alone blows up whenever a token appears on only one side; JS's
  * mixture midpoint absorbs that naturally — one-sided tokens just
  * contribute ln 2 mass).
  *
  * Engine-portable by construction, the house recipe: the log argument
  * p/m = 2·cA·tB / (cA·tB + cB·tA) is an EXACT integer ratio (products
  * in Decimal(38,0) — safe to ~10¹⁸ tokens a side), each term's
  * ln is quantized to integer micro-nats, contributions cnt·ln_micro
  * sum exactly and order-free, and the closing combination is a fixed
  * handful of IEEE ops — so the divergence replays bitwise (gate t29).
  *
  * Plan shape: one token-count aggregation per corpus (map-side
  * combined), a full-outer join on term (vocabulary-sized, never
  * documents), a 1-row totals broadcast, one scalar aggregation.
  */
object Divergence {

  private val Dec = DecimalType(38, 0)

  /** One row: (n_terms — union vocabulary size, tot_a, tot_b,
    * js_nats — Jensen–Shannon divergence in nats, NULL if either
    * corpus has no tokens).
    */
  def jsTokens(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, out: String) = df
      .select(explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as(out))
    val j = counts(a, "ca").join(counts(b, "cb"), Seq("term"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
    val tots = j.agg(sum("ca").as("ta"), sum("cb").as("tb"))
    val wide = j.crossJoin(broadcast(tots))
    // p/m and q/m as exact integer ratios, evaluated in one double
    // division each; ln quantized to micro-nats so the weighted sums
    // below are exact longs (cnt·|ln| ≤ cnt·ln2·1e6 — Decimal-summed)
    def lnMicro(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      floor(log(num.cast("double") / den.cast("double"))
        * lit(1000000.0) + lit(0.5)).cast("long")
    val caTb = col("ca").cast(Dec) * col("tb").cast(Dec)
    val cbTa = col("cb").cast(Dec) * col("ta").cast(Dec)
    val mDen = caTb + cbTa
    // the ta/tb>0 guards also keep mDen strictly positive whenever the
    // branch evaluates (an empty side would otherwise put 0/0 under the
    // ANSI divide even though js is NULL in that case anyway)
    val bothLive = col("ta") > 0 && col("tb") > 0
    val contribs = wide.select(
      when(col("ca") > 0 && bothLive,
        col("ca").cast(Dec) * (lnMicro(lit(2).cast(Dec) * caTb, mDen))
          .cast(Dec))
        .otherwise(lit(0).cast(Dec)).as("sa"),
      when(col("cb") > 0 && bothLive,
        col("cb").cast(Dec) * (lnMicro(lit(2).cast(Dec) * cbTa, mDen))
          .cast(Dec))
        .otherwise(lit(0).cast(Dec)).as("sb"),
      col("ta"), col("tb"))
    contribs
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_terms"), sum("sa").as("__sa"),
        sum("sb").as("__sb"))
      .select(col("n_terms"), col("ta").as("tot_a"), col("tb").as("tot_b"),
        when(col("ta") > 0 && col("tb") > 0,
          (col("__sa").cast("double") / col("ta").cast("double")
            + col("__sb").cast("double") / col("tb").cast("double"))
            / lit(2000000.0)).as("js_nats"))
  }

  /** Population stability index over an INTEGRAL metric column — the
    * numeric companion to [[jsTokens]] and the industry-standard
    * release gate for score/feature drift (rule of thumb: < 0.1 stable,
    * 0.1–0.25 watch, > 0.25 shifted).
    *
    * Equal-width bins over the COMBINED min/max (exact integer
    * scaling, the z-order recipe), Laplace +1 smoothing on every bin
    * (PSI's classic empty-bin blow-up), and the exactness recipe:
    * p/q = (cA+1)(tB+B) / ((cB+1)(tA+B)) is an exact integer ratio fed
    * to a micro-nat ln, each bin's (p−q) is put over the common
    * denominator (tA+B)(tB+B) so its numerator is an exact integer,
    * and the bin terms numerator·ln_micro sum exactly — ONE closing
    * float division sequence (gate q58).
    *
    * Plan: one 1-row bounds aggregation broadcast onto each side's
    * bin-count aggregation (both map-side combined; the shuffle
    * carries ≤ bins rows per side), a dense `spark.range(bins)` spine
    * so empty bins participate in the smoothing, one scalar agg.
    *
    * Output one row: (n_bins, tot_a, tot_b, psi — NULL if either side
    * is empty).
    */
  def psi(a: DataFrame, b: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100000, s"bins must be in [2, 1e5]: $bins")
    val spark = a.sparkSession
    val va = a.select(col(valueCol).cast("long").as("v")).filter(
      col("v").isNotNull)
    val vb = b.select(col(valueCol).cast("long").as("v")).filter(
      col("v").isNotNull)
    val bounds = va.unionByName(vb)
      .agg(min("v").as("lo"), max("v").as("hi"))
    def binned(side: DataFrame, out: String) = side
      .crossJoin(broadcast(bounds))
      .select(when(col("hi") > col("lo"),
        expr(s"((v - lo) * $bins) div (hi - lo + 1)"))
        .otherwise(lit(0L)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    val spine = spark.range(bins).select(col("id").as("bin"))
    val j = spine
      .join(binned(va, "ca"), Seq("bin"), "left")
      .join(binned(vb, "cb"), Seq("bin"), "left")
      .na.fill(0L, Seq("ca", "cb"))
    val tots = j.agg(sum("ca").as("ta"), sum("cb").as("tb"))
    val wide = j.crossJoin(broadcast(tots))
    val aSm = (col("ca") + 1).cast(Dec) * (col("tb") + bins).cast(Dec)
    val bSm = (col("cb") + 1).cast(Dec) * (col("ta") + bins).cast(Dec)
    val lnM = floor(log(aSm.cast("double") / bSm.cast("double"))
      * lit(1000000.0) + lit(0.5)).cast("long")
    val contribs = wide.select(col("ta"), col("tb"),
      when(col("ta") > 0 && col("tb") > 0,
        (aSm - bSm) * lnM.cast(Dec)).otherwise(lit(0).cast(Dec)).as("t"))
    contribs.groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_bins"), sum("t").as("__t"))
      .select(col("n_bins"), col("ta").as("tot_a"), col("tb").as("tot_b"),
        when(col("ta") > 0 && col("tb") > 0,
          col("__t").cast("double")
            / ((col("ta") + bins).cast("double")
              * (col("tb") + bins).cast("double") * lit(1000000.0)))
          .as("psi"))
  }

  /** 1-D Wasserstein distance (earth mover's) between two INTEGRAL
    * distributions — the drift measure that knows the metric: PSI/JS
    * treat bins as unordered symbols, so mass moving from bin 10 to
    * bin 11 scores like mass moving to bin 1000; W₁ charges transport
    * distance. W₁ = ∫|F_a − F_b| over the value axis, computed EXACTLY:
    * per-value counts, one merged-value window for both CDFs, and each
    * inter-value gap contributes |cumA·WB − cumB·WA|·gap — an exact
    * long numerator over the common denominator WA·WB (one double
    * division at the end).
    *
    * Bit-replay bound (the X104 discipline): WA·WB·range must stay
    * below 2⁵³ — holding to ~10⁶ rows per side on a 10²-wide value
    * axis; beyond that, downsample counts or rescale values.
    *
    * Scale: one map-side-combined count per side, a full-outer merge on
    * the |values|-sized tables, one window, one closing aggregation.
    * Rows never shuffle — only (value, count) cells.
    */
  def wasserstein1(a: DataFrame, b: DataFrame, valueCol: String)
      : DataFrame = {
    def counts(df: DataFrame, out: String) = df
      .select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as(out))
    val merged = counts(a, "ca").join(counts(b, "cb"), Seq("v"),
        "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    import org.apache.spark.sql.expressions.Window
    val byV = Window.orderBy("v")
    val run = byV.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = byV.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val stepped = merged
      .withColumn("cuma", sum("ca").over(run))
      .withColumn("cumb", sum("cb").over(run))
      .withColumn("wa", sum("ca").over(all))
      .withColumn("wb", sum("cb").over(all))
      .withColumn("gap", coalesce(lead("v", 1).over(byV) - col("v"),
        lit(0L)))
    stepped.agg(
        count(lit(1)).as("n_values"),
        max("wa").as("wa"), max("wb").as("wb"),
        sum(abs(col("cuma") * col("wb") - col("cumb") * col("wa")) *
          col("gap")).as("emd_num"))
      .select(col("n_values"), col("wa"), col("wb"), col("emd_num"),
        when(col("wa") > 0L && col("wb") > 0L,
          col("emd_num").cast("double") /
            (col("wa").cast("double") * col("wb").cast("double")))
          .as("emd"))
  }
}
