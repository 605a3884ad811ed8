package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.polyHash
import graft.functions.expressions.PolyHash

/** Poisson bootstrap — confidence intervals for corpus-scale metrics
  * without replicating the data (the streaming/bootstrap-at-scale
  * standard: resampling n rows WITH replacement is, per row,
  * Binomial(n, 1/n) ≈ Poisson(1), so each resample just reweights every
  * row by an independent Poisson(1) draw).
  *
  * Determinism: the draw for (row, resample b) is an inverse-CDF lookup
  * on a hash — h_b = (polyhash(id‖salt)·A + b·C) mod M compared against
  * PRECOMPUTED integer thresholds (Poisson(1) CDF × M, capped at w=9,
  * residual mass ~1e-6) — so every engine, run, and partitioning deals
  * the same weights (gate q55 replays the whole thing in SQL).
  *
  * Scale shape: NO row replication and no extra shuffle — all B
  * resamples ride ONE grouped aggregation as 2B map-side-combined sum
  * columns (the shuffle carries 2B longs per partition per group), then
  * an in-plan literal explode reshapes to long form. `valueCol` must be
  * integral (scale doubles to micro-units first — the repo-wide exact-
  * sum policy): weighted sums stay exact longs, and the only float op
  * is each resample's final mean division.
  *
  * The B resample means feed whatever interval the caller wants
  * (percentile CI via the exact-percentile machinery, or a normal
  * approximation); they are returned raw rather than pre-collapsed so
  * the CI policy stays out of the aggregation.
  */
object Bootstrap {

  /** Poisson(1) CDF × PolyHash.Mod as integer thresholds; weight k for
    * h in [t_{k-1}, t_k), capped at 9.
    */
  val Thresholds: Seq[Long] = {
    val e1 = math.exp(-1.0)
    val pmf = Iterator.iterate((e1, 0)) { case (p, k) =>
      (p / (k + 1), k + 1)
    }.map(_._1).take(9).toSeq
    pmf.scanLeft(0.0)(_ + _).tail
      .map(c => (BigDecimal(c) * BigDecimal(PolyHash.Mod)).toLong)
  }

  private val A = 1103515245L
  private val C = 2654435761L

  /** The deterministic Poisson(1) weight for hash column `hb`. */
  private[operators] def weight(hb: Column): Column =
    Thresholds.zipWithIndex.reverse.foldLeft(lit(9)) {
      case (acc, (t, k)) => when(hb < t, k).otherwise(acc)
    }

  /** B resample means of integral `valueCol`, per group.
    * Output: groupCols ++ (b, wsum, vsum, mean) — B rows per group;
    * mean is NULL for the (vanishingly rare) all-zero-weight resample.
    */
  def poissonMeans(df: DataFrame, idCol: String, valueCol: String,
      nResamples: Int, salt: String,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(nResamples >= 1 && nResamples <= 1000,
      s"nResamples must be in [1, 1000]: $nResamples")
    val g = groupCols.map(col)
    val base = df.select(g :+
      polyHash(concat(col(idCol).cast("string"), lit(salt))).as("__h0") :+
      col(valueCol).cast("long").as("__v"): _*)
    val aggs = (1 to nResamples).flatMap { b =>
      val hb = (col("__h0") * A + lit(b.toLong) * C) % PolyHash.Mod
      val w = weight(hb)
      Seq(sum(w.cast("long")).as(s"__ws_$b"),
        sum(w.cast("long") * col("__v")).as(s"__vs_$b"))
    }
    val wide =
      (if (groupCols.isEmpty) base.groupBy() else base.groupBy(g: _*))
        .agg(aggs.head, aggs.tail: _*)
    val stacked = wide.select(g :+ explode(array((1 to nResamples).map {
      b =>
        struct(lit(b).as("b"), col(s"__ws_$b").as("wsum"),
          col(s"__vs_$b").as("vsum"))
    }: _*)).as("__r"): _*)
    stacked.select(g :+ col("__r.b").as("b") :+
      col("__r.wsum").as("wsum") :+ col("__r.vsum").as("vsum") :+
      when(col("__r.wsum") > 0,
        col("__r.vsum").cast("double")
          / col("__r.wsum").cast("double")).as("mean"): _*)
  }
}
