package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Overlapping token-window chunking — context-window construction for
  * training and retrieval corpora: every document becomes windows of
  * `windowTokens` whitespace tokens starting every `strideTokens`
  * (stride < window ⇒ consecutive chunks overlap by window − stride
  * tokens, the standard long-document training shape; stride == window
  * ⇒ disjoint chunks).
  *
  * Scale shape: MAP-ONLY. Tokenization, window starts
  * (`sequence(0, n−1, stride)`), per-window slices and re-joins are all
  * codegen'd higher-order functions riding a single projection +
  * generate — no shuffle, no state, linear in output tokens. At 100 TB
  * the operator is embarrassingly parallel and the only cost knob is
  * the overlap factor (window/stride) multiplying output volume.
  *
  * Contract: a window starts at every multiple of `strideTokens` below
  * the token count, so tail windows may be shorter than `windowTokens`
  * (they clamp at the document end); documents with no tokens emit no
  * chunks.
  */
object Chunking {

  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1: $windowTokens")
    require(strideTokens >= 1 && strideTokens <= windowTokens,
      s"strideTokens must be in [1, windowTokens]: $strideTokens")
    val toks: Column = TextFunctions.tokens(lower(col(textCol)))
    docs
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1,
          lit(strideTokens))).as(Seq("chunk_idx", "start_tok")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(windowTokens), col("__n") - col("start_tok"))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__toks"), col("start_tok") + 1,
          lit(windowTokens))).as("chunk_text"))
  }
}
