package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record-linkage scoring (JASA 1969) —
  * the decision layer on top of this library's blocking stages (X20
  * fuzzy-join candidates, X39 MinHash pairs): each comparison field
  * contributes log(m/u) when the pair AGREES on it and
  * log((1−m)/(1−u)) when it disagrees, and the pair's total decides
  * match / possible / non-match. This is what turns "these two records
  * share a blocking key" into a calibrated score — agreement on a rare
  * value (matching on `lang = 'kr'`) is worth more than agreement on a
  * common one, automatically, because u is value-frequency-derived.
  *
  * Determinism + engine portability: u_f — the chance two RANDOM
  * records agree on field f — is the EXACT integer ratio Σ_v c_v² / N²
  * over the reference table's value counts (the classical
  * frequency-based u; no EM, no labels, no RNG); m_f is the caller's
  * prior (one number, the standard practice). Both log-weights are
  * computed ONCE in a 1-row frame as micro-nat integers
  * (floor(ln(exact ratio)·10⁶ + ½) — the UnigramLm discipline: ln's
  * ±1 ulp libm slack is absorbed by the quantization), then the pair
  * score is an exact long SUM of per-field integer weights.
  *
  * Scale: one count aggregation per field over the REFERENCE table
  * (vocabulary-sized results), folded to a single broadcast 1-row
  * weights frame; scoring is then a PROJECTION on the candidate pairs
  * — no shuffle at all beyond what produced the candidates. Bounds:
  * N ≤ ~3·10⁹ reference rows keeps N² in a long; beyond that, lift the
  * stats to DECIMAL(38,0).
  */
object Linkage {

  /** One comparison field: the pair frame's two sides and the reference
    * column whose value distribution estimates u.
    */
  final case class Field(leftCol: String, rightCol: String, refCol: String)

  /** Score candidate `pairs` on `fields` against reference table `ref`.
    * Agreement is null-safe equality (`<=>`): two NULLs agree — mirror
    * of the X76 changed-column rule. Output: pairs' columns +
    * (score_micro: Long — exact Σ of per-field micro-nat weights,
    * fs_score: Double = score_micro / 10⁶).
    */
  def fsScore(pairs: DataFrame, fields: Seq[Field], ref: DataFrame,
      m: Double = 0.9): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field")
    require(m > 0 && m < 1, s"m must be in (0, 1), got $m")
    // per-field u stats: Σ c² and N as one aggregation each, folded
    // into a single 1-row weights frame (vocabulary-sized inputs)
    val weights = fields.zipWithIndex.map { case (f, i) =>
      val cnts = ref.groupBy(col(f.refCol)).agg(count(lit(1)).as("c"))
      cnts.agg(sum(col("c") * col("c")).as("sumsq"),
          sum(col("c")).as("n"))
        .select(
          floor(log(lit(m) * (col("n") * col("n")).cast("double") /
              col("sumsq").cast("double")) * lit(1000000.0) + lit(0.5))
            .cast("long").as(s"wa_$i"),
          // a field whose reference values are ALL identical has u = 1:
          // disagreement is unobservable there and its weight undefined
          // (NULL, which poisons a disagreeing pair's score loudly
          // rather than silently — ANSI would otherwise throw casting
          // the ln(∞) micro-nat)
          when(col("n") * col("n") > col("sumsq"),
            floor(log(lit(1.0 - m) *
                (col("n") * col("n")).cast("double") /
                (col("n") * col("n") - col("sumsq")).cast("double")) *
                lit(1000000.0) + lit(0.5))
              .cast("long")).as(s"wd_$i"))
    }.reduce(_ crossJoin _)
    val scored = pairs.crossJoin(broadcast(weights))
    val score = fields.zipWithIndex.map { case (f, i) =>
      when(col(f.leftCol) <=> col(f.rightCol), col(s"wa_$i"))
        .otherwise(col(s"wd_$i"))
    }.reduce(_ + _)
    scored
      .withColumn("score_micro", score)
      .withColumn("fs_score",
        col("score_micro").cast("double") / lit(1000000.0))
      .drop(fields.indices.flatMap(i => Seq(s"wa_$i", s"wd_$i")): _*)
  }
}
