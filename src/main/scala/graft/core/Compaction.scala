package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the nightly maintenance pass every
  * parquet lake needs: ingest writes thousands of small files per
  * partition, and scan throughput dies on open/seek overhead until
  * someone re-bins them toward a target size. The reference hits the
  * same wall from the other side (`search/rollups.py` rewriting whole
  * versioned partitions; `landfill/sampler.py` capping file counts);
  * this operator emits the PLAN — which input files merge into which
  * output bin — as data, so the rewrite job is a deterministic
  * group-and-concat over it.
  *
  * Packing rule: files in a stable caller-chosen order (layout order —
  * e.g. z-order rank, X52 — so merged files keep locality), greedy
  * sequential fill: a file opens a new bin when the bytes accumulated
  * BEFORE it reach the next target multiple, i.e.
  * bin = floor(exclusive_prefix_sum / target). One pass, no
  * look-ahead — the rule every LSM/lakehouse compactor ships, because
  * optimal bin packing is NP-hard and files arrive sorted anyway.
  * Oversized files (> target) own their span and push later files into
  * fresh bins rather than splitting (a parquet file is the atomic unit).
  *
  * Scale: ONE window over the file INVENTORY — millions of rows for a
  * 100 TB lake (metadata, not data: ~1 row per file), so the global
  * running sum is a small single-stage window; per-partition planning
  * (the common case — compaction never crosses partition boundaries)
  * passes the partition columns as `groupCols` and the window becomes
  * fully parallel with no global sort at all.
  */
object Compaction {

  /** Assign every file to an output bin. Order within a group is
    * (orderCols..., fileCol) — fileCol is the required unique
    * tie-break so the plan is total-order deterministic.
    *
    * Output: input columns + (bin: Long, bin_offset: Long — bytes
    * accumulated in the group before this file).
    */
  def planBins(files: DataFrame, fileCol: String, sizeCol: String,
      targetBytes: Long, groupCols: Seq[String] = Seq.empty,
      orderCols: Seq[String] = Seq.empty): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w0 = if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val w = w0.orderBy((orderCols :+ fileCol).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = sum(col(sizeCol).cast("long")).over(w) -
      col(sizeCol).cast("long")
    files
      .withColumn("bin_offset", prefix)
      // integral div, not floor(double /): exact at any offset magnitude
      .withColumn("bin", expr(s"bin_offset div ${targetBytes}L"))
  }

  /** Per-bin summary of a plan: (groupCols*, bin, n_files, bin_bytes).
    * Rides the plan — bins whose fill is far below target at the tail
    * are the expected remainder, not a defect.
    */
  def binSummary(plan: DataFrame, sizeCol: String,
      groupCols: Seq[String] = Seq.empty): DataFrame =
    plan.groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol).cast("long")).as("bin_bytes"))
}
