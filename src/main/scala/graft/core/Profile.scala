package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the "dataset card" / data-quality
  * summary a 100 TB ingest wants before anything else runs: per column,
  * the row count, null count, a distinct-cardinality estimate, and the
  * most frequent value. The profile is ONE full-table aggregation (every
  * column's sketches ride the same scan and the same partial-aggregate
  * tree), not a per-column loop of jobs — the difference between one
  * pass over 100 TB and |columns| of them.
  *
  * Cardinality comes from the bottom-k/KMV sketch (`graft_sample`,
  * exact below k) and the top value from the Misra-Gries heavy-hitter
  * sketch (`graft_freq`, exact while a column's distinct count fits the
  * capacity) — both mergeable, bounded state, deterministic. Values are
  * profiled through their canonical string form (CAST(x AS STRING)), so
  * every column type shares one sketch path.
  *
  * Output: one row per profiled column —
  * (column, n_rows, n_null, est_distinct, top_value, top_count), with
  * null top_value for all-null columns.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df` in one aggregation
    * pass. `k` bounds the KMV cardinality sketch, `m` the heavy-hitter
    * sketch (top value exact while distinct ≤ m).
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil, k: Int = 256,
      m: Int = 256): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "profile needs at least one column")
    val aggs = names.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(s).as(s"__nn_$c"),
        graft.functions.TextFunctions.kmvSample(s, k).as(s"__kmv_$c"),
        graft.functions.TextFunctions.freqSketch(s, m).as(s"__freq_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // reshape the 1-row wide frame to long form in-plan: one struct per
    // column, exploded — no driver round-trip, no second scan
    val entries = names.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
        col(s"__kmv_$c.est_distinct").as("est_distinct"),
        // get() (0-indexed) yields null past the end — an all-null
        // column's empty sketch must profile as null, not an ANSI
        // INVALID_ARRAY_INDEX from element_at
        get(col(s"__freq_$c"), lit(0)).getField("item").as("top_value"),
        get(col(s"__freq_$c"), lit(0)).getField("est").as("top_count"))
    }
    one
      .select(explode(array(entries: _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_null"),
        col("p.est_distinct"), col("p.top_value"),
        coalesce(col("p.top_count"), lit(0L)).as("top_count"))
  }
}
