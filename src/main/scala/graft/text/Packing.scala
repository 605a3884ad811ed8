package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Splits
import graft.functions.TextFunctions

/** Sequence packing — the step between a curated corpus and a training
  * run: documents are concatenated into a token stream and sliced into
  * fixed-length training sequences ("concat-and-chunk", the packing GPT
  * pipelines use; beyond-reference op, SURVEY §2.13). The output maps each
  * document to its span in sequence space: which training sequence it
  * starts in, at which offset, and in which sequence it ends — exactly
  * what a loader needs to materialize sequence files or an index.
  *
  * Scale design: a single GLOBAL document order would force a global sort
  * (one range exchange over 100 TB and a driver-visible skew hazard).
  * Instead documents are sharded by a deterministic hash of the id —
  * packing is independent per shard, so the whole computation is ONE hash
  * exchange + an in-partition sort, embarrassingly parallel at any scale,
  * and the assignment is a pure function of (id, salt, seqLen, nShards):
  * stable across runs, engines and cluster layouts. Within a shard the
  * stream order is ascending id.
  *
  * Everything is exact integer arithmetic (token counts, cumulative sums,
  * integer div/mod), so the mapping replays bitwise in any engine — the
  * t12 oracle recomputes it in DuckDB from the same tokenization.
  */
object Packing {

  /** Assigns each document its packed span.
    *
    * Output: (idCol, shard, n_tokens, off_start ∈ [0, seqLen),
    * seq_start, seq_end) — seq ids are per-shard, 0-based; a document
    * with seq_end > seq_start crosses one or more sequence boundaries
    * (the concat-and-chunk norm: no padding, documents may straddle).
    * Zero-token documents are dropped (they contribute nothing to the
    * stream and have no well-defined span).
    */
  def concatChunk(df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, nShards: Int = 32, salt: String = ""): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(nShards > 0 && nShards <= 1000,
      s"nShards must be in [1, 1000] (shards come from a permille bucket): $nShards")
    val reserved =
      Set("shard", "n_tokens", "off_start", "seq_start", "seq_end", "__start")
    require(!reserved.contains(idCol),
      s"idCol '$idCol' collides with a packing output column")
    val counted = df
      .select(
        col(idCol),
        (Splits.bucket(col(idCol), salt) % nShards).cast("long").as("shard"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    // one hash exchange on shard; running sum is an in-partition sort
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .withColumn("__start", sum("n_tokens").over(w) - col("n_tokens"))
      .select(
        col(idCol), col("shard"), col("n_tokens"),
        (col("__start") % seqLen).as("off_start"),
        expr(s"__start div $seqLen").as("seq_start"),
        expr(s"(__start + n_tokens - 1) div $seqLen").as("seq_end"))
  }
}
