package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Logical-lineage control for budgeted-iteration operators (PageRank,
  * HITS, k-core, label propagation, the BPE merge loop).
  *
  * Persisting a frame makes downstream rounds REUSE its data, but every
  * downstream plan still CARRIES its full logical lineage: analysis,
  * CacheManager canonicalization/lookup, AQE re-optimization per stage
  * and per-task plan serialization all walk the whole tree again, so an
  * r-round loop over an expensive base subtree builds an O(r · |base|)
  * plan even though execution is O(1) in |base|. Measured on the r18/r19
  * gates: d23_label_prop's physical plan was 51,978 lines and the gate
  * spent more wall time in the driver than in tasks (GateProfile r19:
  * 5.9 s of driver gaps, and broadcast-build stages burning 7–12 s of
  * task CPU on 0.03 MB inputs — plan/codegen shipping, not data work).
  *
  * `cut` truncates the LOGICAL plan to a leaf over the frame's computed
  * partitions (`localCheckpoint`, storage MEMORY_AND_DISK — the house
  * cache level). Rounds planned against the leaf stay O(1) in plan size.
  *
  * Contracts and tradeoffs:
  *  - NOT lazy: under AQE, wrapping the plan executes its exchange
  *    stages at call time, so call it only on paths that already run
  *    eager jobs at construction (the materialize-mode loops).
  *  - Data is identical; only the plan shape changes (LineageSpec pins
  *    result equality against the uncut path).
  *  - The checkpointed blocks do NOT live in the CacheManager, so
  *    `df.unpersist` / `catalog.clearCache` cannot release them. Call
  *    `release` once every consumer has materialized (the operators'
  *    materialize-mode finalizers do); a frame whose blocks were
  *    released cannot re-execute (lineage is gone) — same contract as
  *    the old "unpersist internals after the result cache fills"
  *    lifecycle, except re-execution errors instead of recomputing.
  *  - localCheckpoint trades fault-tolerance for speed: on executor loss
  *    the truncated lineage cannot recompute and the job fails — the
  *    standard budgeted-iteration tradeoff (GraphX does the same); these
  *    frames are node/edge-sized and the loops are minutes, not days.
  */
object Lineage {

  /** Truncate `df`'s logical plan to a computed leaf. Storage follows
    * the engine's MEMORY_AND_DISK convention; materialization happens
    * with the caller's next action (lazy flag), though AQE exchange
    * stages upstream run at call time.
    */
  def cut(df: DataFrame): DataFrame =
    df.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK)

  /** Release the storage blocks behind a `cut` frame (unpersist every
    * `LogicalRDD` leaf's RDD). Safe on never-materialized cuts (no
    * blocks yet) and on frames with no cut (no such leaves). After
    * release the frame CANNOT be recomputed — callers release only
    * once all consumers have materialized, exactly where the previous
    * persist-based lifecycle unpersisted its internal caches.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
}
