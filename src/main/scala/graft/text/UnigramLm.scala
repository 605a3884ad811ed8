package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Unigram language-model quality scoring — the CCNet-style recipe
  * (Wenzek et al. 2020, arXiv:1911.00359): score each document by its
  * mean negative log-probability under a unigram model, here trained on
  * the corpus itself (self-perplexity; gibberish and boilerplate both
  * stand out). Real pipelines threshold this score into quality tiers.
  *
  * Engine portability by construction: each token's log-probability is
  * quantized to an integer MICRO-NAT — lp = floor(ln(p)·1e6 + 0.5), a
  * LONG — so the per-document total is a sum of longs: exact, overflow-
  * safe (|lp| ≤ ~35e6 per token), and summation-ORDER-FREE, unlike any
  * float SUM. The final mean divides once in double (correctly-rounded
  * IEEE op). ln's ±1 ulp libm slack is absorbed by the quantization,
  * exactly as in Bm25's idf.
  *
  * Plan shape: two passes over the tokenized corpus — one grouped count
  * builds the model, one scoring join consumes it (the total token count
  * derives from the model's own counts, NOT a third corpus aggregation).
  * The model table is vocabulary-sized — broadcast here; at web-corpus
  * vocabularies drop the broadcast hint and let AQE pick the join (the
  * scoring join is then a shuffle on term, still never carrying
  * documents).
  */
object UnigramLm {

  /** Per-document mean negative log-probability (micro-nat-exact).
    * Documents with no tokens are omitted (no distribution to score).
    *
    * Output: (idCol, n_tokens, sum_lp — total log-prob in micro-nats,
    * nll — mean negative log-prob in nats).
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = df
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), explode(col("__toks")).as("term"))

    // total = Σ model counts — derived from the model subplan (whose
    // exchange the two branches share), not a separate full-corpus
    // aggregation that would cost a third tokenize+explode pass
    val counts = occ.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val model = counts
      .crossJoin(broadcast(total))
      .select(col("term"),
        floor(log(col("cnt").cast("double") / col("total").cast("double"))
          * lit(1000000.0) + lit(0.5)).as("lp"))

    occ.join(broadcast(model), "term")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp")).as("sum_lp"))
      .select(col(idCol), col("n_tokens"), col("sum_lp"),
        ((-col("sum_lp")).cast("double") / lit(1000000.0)
          / col("n_tokens").cast("double")).as("nll"))
  }
}
