package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — classify every key across two corpus snapshots as
  * added / removed / changed (with the list of columns that changed).
  *
  * This is the daily warehouse question ("what did yesterday's crawl do
  * to the corpus?") asked row-by-row where the `monitor` CLI
  * (`Scd.merge2` + drift) answers it in aggregate: the diff names the
  * keys, the monitor summarizes them. The reference runs the same shape
  * when it reconciles versioned rollup partitions
  * (`search/rollups.py` re-writing a dated partition and comparing
  * vintage `v{n}` outputs).
  *
  * Scale: ONE full-outer shuffle join on the key — both sides exchange
  * once on `keyCols` and the per-column comparison is a projection; no
  * row ever carries more than its own two versions. With both snapshots
  * bucketed on the key (`core/Bucketing`) the exchange disappears
  * entirely. The `changed_cols` list is computed null-safely (`<=>`), so
  * a column going NULL→value or value→NULL counts as a change while
  * NULL→NULL does not — the SCD2 trap `Scd.merge2` documents.
  */
object SnapshotDiff {

  /** Diff `cur` against `old` on `keyCols`, comparing `compareCols`.
    *
    * Returns one row per key present in either snapshot:
    * (keyCols*, status ∈ {added, removed, changed, unchanged},
    * changed_cols: comma-joined sorted column names, empty unless
    * status = changed). Pass `includeUnchanged = false` (the default) to
    * keep only the rows a downstream writer must act on — at 100 TB the
    * unchanged majority is exactly what you don't want to materialize.
    */
  def diff(old: DataFrame, cur: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], includeUnchanged: Boolean = false)
      : DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val o = old.select((keyCols ++ compareCols).map(col): _*).alias("o")
    val n = cur.select((keyCols ++ compareCols).map(col): _*).alias("n")
    val keyEq = keyCols.map(k => col(s"o.$k") <=> col(s"n.$k"))
      .reduce(_ && _)
    val inOld = col(s"o.${keyCols.head}").isNotNull
    val inNew = col(s"n.${keyCols.head}").isNotNull
    // sorted so the emitted list is deterministic however the caller
    // ordered compareCols
    val diffs: Seq[Column] = compareCols.sorted.map(c =>
      when(!(col(s"o.$c") <=> col(s"n.$c")), lit(c)))
    val changedCols = concat_ws(",", array_compact(array(diffs: _*)))
    val status = when(!inOld, lit("added"))
      .when(!inNew, lit("removed"))
      .when(changedCols =!= "", lit("changed"))
      .otherwise(lit("unchanged"))
    val keys = keyCols.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k))
    val out = o.join(n, keyEq, "full_outer")
      .select(keys :+ status.as("status") :+
        when(status === "changed", changedCols).otherwise(lit(""))
          .as("changed_cols"): _*)
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }
}
