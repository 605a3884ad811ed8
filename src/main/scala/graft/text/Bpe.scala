package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Byte-pair frequency mining — the first step of BPE tokenizer
  * induction (Sennrich et al. 2016, arXiv:1508.07909): count adjacent
  * symbol pairs inside words across the corpus; the most frequent pair
  * is the next merge. Full BPE training iterates merge-and-recount —
  * inherently sequential — but the PAIR TABLE is the distributed
  * heavy lift (one pass over every character of the corpus), and its
  * top ranks are what tokenizer-vocabulary audits (X100 coverage, t03
  * token counting) consume: "which merges WOULD this corpus learn
  * first", per corpus, per source, per snapshot.
  *
  * Word-internal pairs only (the standard word-boundary convention):
  * tokens lowercase-split first, then each length-≥2 token contributes
  * its adjacent character pairs. The top-k cut is pinned deterministic
  * by (count DESC, pair ASC) — the X100 boundary-tie convention.
  *
  * Scale: one tokenize + character-pair Generate pass (map-side), one
  * grouped count (map-side combined — the shuffle carries (pair,
  * count) cells, bounded by the character-bigram alphabet, not the
  * corpus), one WindowGroupLimit-style top-k over the tiny pair table.
  */
object Bpe {

  /** Top-k adjacent character pairs: (rank, pair, cnt), rank 1 = the
    * pair BPE would merge first. Pairs below `minCount` are dropped
    * before ranking.
    */
  def topPairs(df: DataFrame, textCol: String, k: Int,
      minCount: Long = 1L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df
      .select(explode(tokens(lower(col(textCol)))).as("tok"))
      .filter(length(col("tok")) >= 2)
    val pairs = toks
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), " +
          "i -> substring(tok, i, 2))")).as("pair"))
    val counts = pairs.groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("pair").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("pair"), col("cnt"))
  }
}
