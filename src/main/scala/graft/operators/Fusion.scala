package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
  * the standard way to combine heterogeneous rankings whose SCORES are
  * incomparable (BM25 log-odds vs cosine similarity vs quality NLL):
  * only ranks enter the fusion, RRF(d) = Σ_lists 1/(k + rank_d), so a
  * list with wild score scales cannot drown the others. This is the
  * hybrid-search shape a retrieval-augmented pipeline runs on every
  * query (lexical X15 BM25 + semantic X7/X8 ANN), and the multi-signal
  * curation shape ("relevant AND high quality") a training-data
  * pipeline runs corpus-wide.
  *
  * Determinism: ranks come from row_number over (score DESC, id ASC) —
  * total order, no rank ties; each contribution is the EXACT integer
  * 10¹² div (k + rank), so per-item sums are order-free longs
  * (double addition of 1/(k+r) terms would be partitioning-dependent)
  * and the final double is one cast. Bit-identical in any engine.
  *
  * Scale: one window per input list — each bounded by WindowGroupLimit
  * when the caller pre-cut to top-N, and partitioned by the query
  * column for per-query fusion (no global sort); the fusion itself is
  * a map-side-combined sum over (keyCols, contribution) pairs. Scores
  * and documents never travel — only ids and 8-byte contributions.
  */
object Fusion {

  /** Contribution scale: 10¹² div (k + rank) keeps four significant
    * digits even at rank 10⁸ while summing ~10⁶ lists per item before
    * a long could overflow.
    */
  val Scale: Long = 1000000000000L

  /** Fuse ranked lists. Each input has `keyCols` (the fused identity —
    * e.g. (query_id, doc_id), or just doc_id for corpus-wide fusion),
    * a `scoreCol` (higher = better, list-local scale), and is ranked
    * within `partitionCols` ⊆ keyCols (empty = one global ranking per
    * list) by (score DESC, remaining keyCols ASC).
    *
    * Output: (keyCols*, rrf_micro: Long — exact Σ 10¹²div(k+rank),
    * rrf_score: Double = rrf_micro/10¹², n_lists, best_rank).
    */
  def reciprocalRank(inputs: Seq[DataFrame], keyCols: Seq[String],
      scoreCol: String, partitionCols: Seq[String] = Seq.empty,
      k: Int = 60): DataFrame = {
    require(inputs.nonEmpty, "at least one ranked list")
    require(k >= 1, "k must be >= 1")
    require(partitionCols.forall(keyCols.contains),
      "partitionCols must be a subset of keyCols")
    val tieCols = keyCols.filterNot(partitionCols.contains)
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols.map(col): _*)
    val w = w0.orderBy(col(scoreCol).desc +: tieCols.map(col(_).asc): _*)
    val ranked = inputs.map { in =>
      in.select((keyCols.map(col) :+ col(scoreCol)): _*)
        .withColumn("__rank", row_number().over(w).cast("long"))
        .select((keyCols.map(col) :+
          expr(s"${Scale}L div (${k}L + __rank)").as("__contrib") :+
          col("__rank")): _*)
    }
    ranked.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__contrib")).as("rrf_micro"),
        count(lit(1)).as("n_lists"),
        min(col("__rank")).as("best_rank"))
      .withColumn("rrf_score", col("rrf_micro").cast("double") / Scale)
  }
}
