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

  /** Morton interleave of the low `bits` bits of N ≥ 2 non-negative
    * longs: bit i of column j lands at position i·N + j (dims cycle). A
    * fold of N·bits shift/mask/OR built-ins — whole-stage-codegen
    * friendly.
    */
  def interleaveBitsN(cs: Seq[Column], bits: Int): Column = {
    require(cs.size >= 2, s"interleave needs >= 2 columns: ${cs.size}")
    require(bits >= 1 && cs.size * bits <= 62,
      s"${cs.size} cols x $bits bits exceeds the 62-bit z budget")
    val n = cs.size
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cs.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(
          shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** Two-column form: bit i of `a` lands at position 2i, of `b` at
    * 2i+1.
    */
  def interleaveBits(a: Column, b: Column, bits: Int = 16): Column =
    interleaveBitsN(Seq(a, b), bits)

  /** Adds `__zx`, `__zy` (the columns linearly min/max-scaled onto
    * [0, 2^bits) with exact long arithmetic — ((x − min)·(2^bits − 1))
    * div span, degenerate all-equal columns scale to 0), `__z` (Morton
    * value) and `__zbucket` (equal-volume z-range slice in
    * [0, nBuckets)) for two LONG-convertible columns. The min/max frame
    * is computed in-plan and broadcast — no driver round-trip.
    */
  def zvalues(df: DataFrame, colA: String, colB: String, bits: Int = 8,
      nBuckets: Int = 16): DataFrame =
    zvaluesN(df, Seq(colA, colB), bits, nBuckets)
      .withColumnRenamed("__zc0", "__zx")
      .withColumnRenamed("__zc1", "__zy")

  /** N-dimensional form (ZORDER BY (a, b, c, …)): adds `__zc0..N-1`
    * scaled coordinates plus `__z`/`__zbucket`. N·bits must fit the
    * 62-bit z budget.
    */
  def zvaluesN(df: DataFrame, cols: Seq[String], bits: Int = 8,
      nBuckets: Int = 16): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    val n = cols.size
    require(n >= 2 && bits >= 1 && n * bits <= 62,
      s"$n cols x $bits bits outside the 62-bit z budget")
    val zSpace = 1L << (n * bits) // 2^(n·bits) distinct z-values
    require(nBuckets <= zSpace,
      s"nBuckets $nBuckets exceeds z-space $zSpace (raise bits)")
    val maxV = (1L << bits) - 1
    val bucketWidth = zSpace / nBuckets // ≥ 1 by the require above
    val stats = df.agg(
      min(col(cols.head).cast("long")).as("__min0"),
      cols.zipWithIndex.flatMap { case (c, j) =>
        val mn = if (j == 0) Nil
          else Seq(min(col(c).cast("long")).as(s"__min$j"))
        mn :+ max(col(c).cast("long")).as(s"__max$j")
      }: _*)
    val scaled = cols.zipWithIndex.foldLeft(df.crossJoin(broadcast(stats))) {
      case (acc, (c, j)) =>
        acc
          .withColumn(s"__v$j", col(c).cast("long"))
          .withColumn(s"__zc$j", when(col(s"__max$j") > col(s"__min$j"),
              expr(s"((__v$j - __min$j) * $maxV) div (__max$j - __min$j)"))
            .otherwise(lit(0L)))
    }
    scaled
      .withColumn("__z",
        interleaveBitsN(cols.indices.map(j => col(s"__zc$j")), bits))
      // last bucket absorbs the remainder when nBuckets doesn't divide
      // the z-space
      .withColumn("__zbucket",
        least(expr(s"__z div $bucketWidth"), lit(nBuckets - 1L)))
      .drop(cols.indices.flatMap(j =>
        Seq(s"__v$j", s"__min$j", s"__max$j")): _*)
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
