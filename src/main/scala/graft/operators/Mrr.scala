package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MRR@k — mean reciprocal rank, the first-relevant-hit metric the eval
  * family still lacked: AUC/AP score whole binary orderings, recall@k
  * scores set overlap, NDCG scores graded positions; MRR scores exactly
  * ONE thing — how high the first relevant item sits — which is what
  * known-item search, deduplication lookup ("is the original in the
  * candidate list?"), and RAG retrieval are judged by in practice.
  *
  * Determinism: ranks come from row_number over (score DESC, id ASC) —
  * total order, no ties; each query's contribution is the EXACT integer
  * 10¹² div first_relevant_rank (the X86 Fusion scale), so the
  * cross-query mean is one exact long sum and ONE double division.
  * Queries with no relevant item in the top k contribute 0 — the
  * standard MRR convention, stated rather than silently dropped.
  *
  * Scale: one rank window per query group (WindowGroupLimit-bounded by
  * the k filter), one map-side-combined min per query, one tiny
  * aggregate — queries never interact, rows carry (query, 16 bytes).
  */
object Mrr {

  /** Contribution scale (the Fusion.Scale rationale: four significant
    * digits at rank 10⁸, ~10⁶ queries summable before long overflow).
    */
  val Scale: Long = 1000000000000L

  /** Per-query reciprocal rank of the FIRST relevant item (relCol > 0)
    * in the top k of the ranking induced by `scoreCol` (higher =
    * better, idCol breaks ties ascending).
    *
    * Output: (queryCol, first_rel_rank — NULL when no relevant item in
    * the top k, rr_micro — exact 10¹² div rank, 0 for misses,
    * rr — rr_micro/10¹²). Every query in the input appears exactly
    * once: misses are emitted as explicit zeros, never dropped.
    */
  def reciprocalRankAtK(df: DataFrame, queryCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val firsts = df
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k && col(relCol) > 0)
      .groupBy(col(queryCol))
      .agg(min(col("__rank")).cast("long").as("first_rel_rank"))
    df.select(col(queryCol)).distinct()
      .join(firsts, Seq(queryCol), "left")
      .withColumn("rr_micro",
        coalesce(expr(s"${Scale}L div first_rel_rank"), lit(0L)))
      .withColumn("rr", col("rr_micro").cast("double") / Scale)
  }

  /** MRR@k across all queries: ONE row (n_queries, rr_micro_sum — the
    * exact integer sum, mrr — one double division at the end).
    */
  def mrrAtK(df: DataFrame, queryCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame =
    reciprocalRankAtK(df, queryCol, idCol, scoreCol, relCol, k)
      .agg(count(lit(1)).as("n_queries"),
        sum(col("rr_micro")).as("rr_micro_sum"))
      .withColumn("mrr", col("rr_micro_sum").cast("double") /
        (col("n_queries").cast("double") * Scale))
}
