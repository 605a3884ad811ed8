package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** One-pass corpus profile ("dataset card" numbers): per-stratum document
  * and token counts, length distribution, source diversity, and the
  * short-document fraction — the summary table every curated-corpus
  * release ships, produced by a single map-side-combinable aggregation
  * over the scan (no joins, no second pass).
  *
  * Ratios are single divisions of exact integers, so the t16 oracle
  * replays every cell bitwise.
  */
object CorpusStats {

  /** Per-stratum profile: (stratum, n_docs, n_tokens, max_tokens,
    * mean_tokens, n_sources, short_frac).
    */
  def byStratum(df: DataFrame, textCol: String, strataCol: String,
      sourceCol: String, shortTokens: Int = 50): DataFrame = {
    require(shortTokens >= 0, s"shortTokens must be non-negative: $shortTokens")
    val nt = size(TextFunctions.tokens(col(textCol))).cast("long")
    df.select(col(strataCol).as("stratum"), nt.as("__nt"),
        col(sourceCol).as("__src"))
      .groupBy("stratum")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        max(col("__nt")).as("max_tokens"),
        (sum(col("__nt")).cast("double") /
          count(lit(1)).cast("double")).as("mean_tokens"),
        countDistinct(col("__src")).as("n_sources"),
        (sum(when(col("__nt") < shortTokens, 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("short_frac"))
  }

  /** Per-document lexical diversity — type-token ratio plus the count
    * of corpus-hapax tokens (words appearing exactly ONCE in the whole
    * corpus) the document contains: TTR separates repetitive/templated
    * text from varied prose, and hapax density flags novelty
    * (or OCR noise — both ends of the tail matter for curation).
    *
    * Shape: one tokenize pass; types per doc is a (doc, term) distinct
    * + count; the corpus hapax set is a vocabulary-sized aggregation
    * semi-joined back per (doc, term). Exact integers + one ratio.
    */
  def lexicalDiversity(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.TextFunctions._
    val occ = df
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("__t"))
      .select(col("id"), explode(col("__t")).as("term"))
    val perDoc = occ.groupBy("id").agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("term")).as("n_types"))
    val hapax = occ.groupBy("term").agg(count(lit(1)).as("c"))
      .filter(col("c") === 1L).select("term")
    val hapaxPerDoc = occ.join(hapax, Seq("term"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hapax"))
    perDoc.join(hapaxPerDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
  }
}
