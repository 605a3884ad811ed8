package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional data
  * skipping — the capability behind `OPTIMIZE ... ZORDER BY` in lakehouse
  * engines: sort a table along an interleaved-bit curve of two columns so
  * that every output file/row-group covers a small RECTANGLE of the
  * (x, y) space instead of a thin stripe. Parquet min/max footer stats on
  * both columns then prune files for predicates on EITHER column — a
  * plain sort gives tight bounds on the leading column only.
  *
  * Everything here is deterministic integer arithmetic composed from
  * codegen'd built-ins (shifts, masks, ORs, integral div — no UDF, no
  * sampling): unlike sampled range-partitioning, two runs of the same
  * input produce the same layout, and the q51 oracle replays the
  * scaling, the bit interleave, and the bucket assignment bitwise in
  * SQL.
  *
  * Scale shape: one agg for the min/max frame (broadcast back — the
  * stats never touch the driver), one map-side projection for the
  * z-value, and one exchange to lay the curve out. Buckets are
  * equal-VOLUME slices of the z-range (z div (4^bits / n)), not
  * equal-population: fully deterministic, but a heavily skewed table
  * should pre-flatten with rank-scaling before interleaving (the skew
  * then only unbalances file sizes, never correctness).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. A fold of
    * 2·bits shift/mask/OR built-ins — whole-stage-codegen friendly.
    */
  def interleaveBits(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }
  }

  /** Adds `__zx`, `__zy` (the columns linearly min/max-scaled onto
    * [0, 2^bits) with exact long arithmetic — ((x − min)·(2^bits − 1))
    * div span, degenerate all-equal columns scale to 0), `__z` (Morton
    * value) and `__zbucket` (equal-volume z-range slice in
    * [0, nBuckets)) for two LONG-convertible columns. The min/max frame
    * is computed in-plan and broadcast — no driver round-trip.
    */
  def zvalues(df: DataFrame, colA: String, colB: String, bits: Int = 8,
      nBuckets: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    val zSpace = 1L << (2 * bits) // 4^bits distinct z-values
    require(nBuckets <= zSpace,
      s"nBuckets $nBuckets exceeds z-space $zSpace (raise bits)")
    val maxV = (1L << bits) - 1
    val bucketWidth = zSpace / nBuckets // ≥ 1 by the require above
    val stats = df.agg(
      min(col(colA).cast("long")).as("__amin"),
      max(col(colA).cast("long")).as("__amax"),
      min(col(colB).cast("long")).as("__bmin"),
      max(col(colB).cast("long")).as("__bmax"))
    df.crossJoin(broadcast(stats))
      .withColumn("__a", col(colA).cast("long"))
      .withColumn("__b", col(colB).cast("long"))
      .withColumn("__zx", when(col("__amax") > col("__amin"),
          expr(s"((__a - __amin) * $maxV) div (__amax - __amin)"))
        .otherwise(lit(0L)))
      .withColumn("__zy", when(col("__bmax") > col("__bmin"),
          expr(s"((__b - __bmin) * $maxV) div (__bmax - __bmin)"))
        .otherwise(lit(0L)))
      .withColumn("__z", interleaveBits(col("__zx"), col("__zy"), bits))
      // last bucket absorbs the remainder when nBuckets doesn't divide
      // the z-space
      .withColumn("__zbucket",
        least(expr(s"__z div $bucketWidth"), lit(nBuckets - 1L)))
      .drop("__a", "__b", "__amin", "__amax", "__bmin", "__bmax")
  }

  /** The layout form: rows clustered into `nBuckets` z-range slices and
    * sorted along the curve within each — write with
    * `.write.partitionBy("__zbucket")` (or drop the column after a plain
    * write) so each file's (colA, colB) footer stats span one z-tile.
    */
  def zorderLayout(df: DataFrame, colA: String, colB: String,
      bits: Int = 8, nBuckets: Int = 16): DataFrame =
    zvalues(df, colA, colB, bits, nBuckets)
      .repartition(nBuckets, col("__zbucket"))
      .sortWithinPartitions(col("__zbucket"), col("__z"))
}
