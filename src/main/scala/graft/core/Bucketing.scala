package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle a fact table once on its join key
  * so every subsequent equi-join/aggregation on that key is exchange-free.
  *
  * This is the 100 TB lever the reference approximates with its
  * sample_id=0..99 path partitioning (addon_aggregates.py:196-202): write
  * cost once, amortized across every downstream join. With both sides
  * bucketed on the join key into the same bucket count, Spark plans a
  * SortMergeJoin with NO Exchange on either side (asserted in
  * BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(tableName)
  }

  /** True iff the executed plan of `df` contains a shuffle exchange —
    * the thing bucketing is supposed to eliminate.
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }
}
