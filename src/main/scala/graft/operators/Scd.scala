package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style slowly-changing-dimension type 2 maintenance — the
  * warehouse upsert the reference's overwrite-a-partition jobs never
  * needed, but any dimension kept alongside a 100 TB fact store does:
  * track attribute history with (valid_from, valid_to) validity ranges,
  * closing a row when its tracked attributes change and opening the
  * replacement, without ever rewriting rows that didn't change.
  *
  * Pure joins + unions — every branch is deterministic column algebra,
  * so the whole merge replays bitwise in SQL (gate q53).
  *
  * Scale shape: CLOSED history (the bulk of a long-lived dimension)
  * passes through on a filter — it never joins, never shuffles. Only
  * the OPEN slice full-outer-joins the incoming snapshot on the key
  * (both sides hash-partitioned once; AQE's exchange reuse shares that
  * shuffle across the keep/close/insert branches). Update batches are
  * typically small — AQE broadcasts them under the threshold and the
  * open slice never shuffles at all.
  *
  * Change detection is null-safe equality (<=>) over `tracked`; columns
  * outside keys ++ tracked are not carried (project the dimension down
  * before merging). Validity bounds are ISO-date STRINGS (sortable,
  * engine-portable — the repo-wide policy of never shipping raw
  * timestamps across engines); `asOf` is such a string.
  */
object Scd {

  /** Apply `updates` (a key-complete snapshot of changed/new rows
    * effective at `asOf`) to `history`.
    *
    * `history`: keys ++ tracked ++ (validFrom, validTo) — validTo NULL
    * marks the open row. `updates`: keys ++ tracked.
    *
    *  - closed rows pass through untouched;
    *  - open rows absent from `updates` stay open (or close at `asOf`
    *    when `closeMissing` — snapshot-is-total semantics: a key not in
    *    the snapshot was deleted);
    *  - open rows whose tracked values are unchanged pass through;
    *  - changed keys: the open row closes at `asOf`, a new open row
    *    starts at `asOf`; new keys open at `asOf`.
    */
  def merge2(history: DataFrame, updates: DataFrame, keys: Seq[String],
      tracked: Seq[String], asOf: String,
      validFrom: String = "valid_from", validTo: String = "valid_to",
      closeMissing: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "merge2 needs at least one key column")
    require(tracked.nonEmpty, "merge2 needs at least one tracked column")
    val outCols = (keys ++ tracked :+ validFrom :+ validTo).map(col)

    val closed = history.filter(col(validTo).isNotNull).select(outCols: _*)
    val open = history.filter(col(validTo).isNull)

    val o = open
      .select((keys ++ tracked :+ validFrom).map(col) :+
        lit(true).as("__o"): _*)
    val u = updates
      .select(keys.map(col) ++
        tracked.map(c => col(c).as(s"__u_$c")) :+
        lit(true).as("__u"): _*)
    val j = o.join(u, keys, "full_outer")

    val unchanged = tracked
      .map(c => col(c) <=> col(s"__u_$c")).reduce(_ && _)
    val hasO = col("__o").isNotNull
    val hasU = col("__u").isNotNull

    // open rows that survive as-is: no update (unless closeMissing) or
    // an update with identical tracked values
    val keepOpen = j
      .filter(hasO && (hasU && unchanged ||
        (!hasU && lit(!closeMissing))))
      .select((keys ++ tracked :+ validFrom).map(col) :+
        lit(null).cast("string").as(validTo): _*)
    // open rows superseded (or deleted, when closeMissing): close at asOf
    val closeNow = j
      .filter(hasO && (hasU && !unchanged || (!hasU && lit(closeMissing))))
      .select((keys ++ tracked :+ validFrom).map(col) :+
        lit(asOf).as(validTo): _*)
    // changed or brand-new keys: a fresh open row effective asOf
    val opened = j
      .filter(hasU && (!hasO || !unchanged))
      .select(keys.map(col) ++ tracked.map(c => col(s"__u_$c").as(c)) :+
        lit(asOf).as(validFrom) :+
        lit(null).cast("string").as(validTo): _*)

    closed.unionByName(keepOpen).unionByName(closeNow).unionByName(opened)
  }

  /** Time-travel read: the dimension as it was on `date` — rows whose
    * validity range covers it (valid_from ≤ date < valid_to, open rows
    * unbounded). A pure filter: partition/file pruning applies when the
    * history is stored partitioned or z-ordered on the bounds.
    */
  def asOf(history: DataFrame, date: String,
      validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame =
    history.filter(col(validFrom) <= date &&
      (col(validTo).isNull || col(validTo) > date))
}
