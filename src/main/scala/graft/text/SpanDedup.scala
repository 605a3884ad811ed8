package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact duplicate-SPAN removal — the ExactSubstr move (Lee et al. 2022,
  * arXiv:2107.06499 §4.1: delete every substring of ≥ k tokens that
  * appears verbatim elsewhere in the corpus, keeping one occurrence) —
  * re-expressed for Spark with sliding fixed-length token windows in
  * place of the paper's suffix array: a maximal duplicated run of
  * r ≥ k tokens is exactly the union of its r−k+1 duplicated k-windows,
  * so removing every token covered by a non-first window deletes the
  * same maximal runs the suffix-array formulation finds (at
  * whitespace-token granularity).
  *
  * This is NOT [[ChunkDedup]] (the C4 move): chunks are fixed,
  * non-overlapping and phase-sensitive — a duplicated paragraph that
  * straddles a chunk boundary slips through, and two copies chunked at
  * different offsets never collide. Sliding windows are phase-invariant:
  * any k-token verbatim repeat is caught wherever it starts. The price
  * is one window per token position instead of one per k tokens.
  *
  * Scale shape: three exchanges, all narrow. (1) The first-occurrence
  * decision shuffles (fingerprint, doc, pos) — ~20 bytes/row; the window
  * TEXT is hashed map-side and never shuffles (the d08
  * fingerprint-as-identity discipline). (2) Duplicated positions regroup
  * by document — only duplicated windows survive to this exchange, so
  * its volume is proportional to the duplication rate, not the corpus.
  * (3) One hash join of the per-doc covered-position arrays back onto
  * the tokenized corpus. Coverage expansion (positions → covered token
  * index set) and the rebuild are per-row HOFs over attributes
  * materialized across those exchanges — nothing re-tokenizes, no
  * self-join, no driver state. All arithmetic is integer/string, so the
  * t22 oracle replays every stage bitwise in DuckDB.
  */
object SpanDedup {

  /** Drops every token covered by a length-`spanTokens` window whose
    * content already occurred at a smaller (doc id, position), and
    * rebuilds the surviving text. Documents shorter than `spanTokens`
    * tokens have no windows and pass through untouched (their text still
    * whitespace-normalized by the rebuild, like every kept row);
    * documents whose every token is covered vanish.
    *
    * Output: (idCol, n_tokens, n_kept, text_dedup), one row per
    * surviving document.
    */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 20): DataFrame = {
    require(spanTokens >= 2, s"spanTokens must be >= 2: $spanTokens")
    val reserved = Set("n_tokens", "n_kept", "text_dedup",
      "__toks", "__p", "__fp", "__rn", "__dups", "__cov", "__kept")
    require(!reserved.contains(idCol),
      s"idCol '$idCol' collides with a span-dedup output column")

    val base = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))

    // (doc, pos, fingerprint) — hash map-side, shuffle longs only
    val wins = base
      .select(col(idCol), posexplode(
        TextFunctions.slidingFromTokens(col("__toks"), spanTokens)))
      .select(col(idCol), col("pos").as("__p"),
        TextFunctions.polyHash(col("col")).as("__fp"))

    val firstSeen = Window.partitionBy(col("__fp"))
      .orderBy(col(idCol), col("__p"))

    // per-doc covered token positions, expanded AFTER the regroup so the
    // flatten runs on the aggregated array (an attribute, not a lambda
    // re-inlining target) and below the join boundary
    val covered = wins
      .withColumn("__rn", row_number().over(firstSeen))
      .filter(col("__rn") > 1)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__p"))).as("__dups"))
      .select(col(idCol),
        array_distinct(flatten(transform(col("__dups"),
          p => sequence(p, p + lit(spanTokens - 1))))).as("__cov"))

    base.join(covered, Seq(idCol), "left")
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        filter(col("__toks"), (_, i) =>
          !array_contains(
            coalesce(col("__cov"), array().cast("array<int>")), i))
          .as("__kept"))
      .select(col(idCol), col("n_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), " ").as("text_dedup"))
      .filter(col("n_kept") > 0)
  }
}
