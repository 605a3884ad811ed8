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
    *
    * With AQE on, the top-level plan is an AdaptiveSparkPlanExec — a leaf
    * as far as `exists` is concerned — so THIS query execution is run to
    * completion first (`toRdd.foreach` on the same QueryExecution — a
    * separate `df.count()` would build a new QueryExecution and leave this
    * one's adaptive plan un-finalized) and the final adaptive plan is
    * unwrapped recursively; without that, the check passes vacuously on
    * every plan.
    */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

    // finalize AQE on df's OWN QueryExecution so executedPlan below is the
    // runtime-adapted plan, not the initial static one
    df.queryExecution.toRdd.foreach(_ => ())

    def anyShuffle(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => anyShuffle(a.executedPlan)
      case s: QueryStageExec        => anyShuffle(s.plan)
      case _: ShuffleExchangeLike   => true
      // ReusedExchangeExec is a leaf wrapping the reused exchange — recurse
      // into its child or a reused shuffle is invisible to this check
      case r: ReusedExchangeExec    => anyShuffle(r.child)
      case other                    => other.children.exists(anyShuffle)
    }
    anyShuffle(df.queryExecution.executedPlan)
  }

  /** Number of DISTINCT shuffle exchanges in the executed plan (a reused
    * exchange counts once — reuse is free). Same AQE finalization rules as
    * `hasShuffle`; counting plan NODES, not `toString` matches, matters
    * because an adaptive plan prints both its final and initial sections.
    */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

    df.queryExecution.toRdd.foreach(_ => ())
    def count(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case s: QueryStageExec        => count(s.plan)
      case _: ShuffleExchangeLike   => 1
      case _: ReusedExchangeExec    => 0
      case other                    => other.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }
}
