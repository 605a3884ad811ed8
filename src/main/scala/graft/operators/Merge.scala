package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert — the warehouse maintenance primitive under every
  * "apply today's extract to the running table" job: matched rows take
  * the source version, unmatched source rows insert, unmatched target
  * rows survive or delete (`deleteMissing` — the full-sync vs
  * incremental-feed switch). SCD2 (X58) KEEPS history as validity
  * intervals; this is the type-1 overwrite flavor — current state
  * only, no lineage — which is what most serving tables want.
  *
  * Implementation is ONE full-outer join on the keys + a per-column
  * coalesce projection (source side wins), with an `action` column
  * (updated / inserted / kept) so callers can audit the merge. For the
  * full-snapshot case, `auditDeletes` is the dry run: same merged
  * output, but the rows `deleteMissing = true` WOULD drop are retained
  * and labeled `would-delete` for pre-commit review. Both sides shuffle
  * once on the keys; at scale, bucket both tables on the keys
  * (core/Bucketing) and the exchange disappears entirely.
  *
  * Schemas must match on the non-key columns (the reference's jobs
  * align schemas upstream; so does this engine's SCD machinery).
  */
object Merge {

  val ActionUpdated = "updated"
  val ActionInserted = "inserted"
  val ActionKept = "kept"
  val ActionWouldDelete = "would-delete"

  /** Merged current state. Output: target schema + `action`. With
    * `deleteMissing = true`, target rows absent from the source are
    * dropped (full-snapshot semantics); otherwise they stay as
    * `kept`.
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteMissing: Boolean = false): DataFrame =
    merge(target, source, keys, deleteMissing, ActionKept)

  /** Dry run of `deleteMissing = true`: identical merged output, but the
    * target rows a full-snapshot merge WOULD drop are retained and
    * labeled `would-delete` — the pre-commit audit frame.
    */
  def auditDeletes(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame =
    merge(target, source, keys, deleteMissing = false, ActionWouldDelete)

  private def merge(target: DataFrame, source: DataFrame,
      keys: Seq[String], deleteMissing: Boolean,
      targetOnlyLabel: String): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val nonKey = target.columns.filterNot(keys.contains).toSeq
    require(nonKey.forall(source.columns.contains),
      s"source is missing columns: " +
        nonKey.filterNot(source.columns.contains).mkString(", "))
    val t = target.select(
      keys.map(col) ++ nonKey.map(c => col(c).as(s"__t_$c")) :+
        lit(1).as("__in_t"): _*)
    val s = source.select(
      keys.map(col) ++ nonKey.map(c => col(c).as(s"__s_$c")) :+
        lit(1).as("__in_s"): _*)
    val joined = t.join(s, keys, "full_outer")
    val action = when(col("__in_t").isNotNull && col("__in_s").isNotNull,
        lit(ActionUpdated))
      .when(col("__in_s").isNotNull, lit(ActionInserted))
      .otherwise(lit(targetOnlyLabel))
    val merged = joined.select(
      keys.map(col) ++ nonKey.map(c =>
        when(col("__in_s").isNotNull, col(s"__s_$c"))
          .otherwise(col(s"__t_$c")).as(c)) :+
        action.as("action") :+ col("__in_s"): _*)
    val out = if (deleteMissing) merged.filter(col("__in_s").isNotNull)
      else merged
    out.drop("__in_s")
  }
}
