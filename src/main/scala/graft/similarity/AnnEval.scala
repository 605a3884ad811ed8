package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@k evaluation for approximate nearest-neighbor search —
  * measure-don't-guess for the ANN knobs (nlist/nprobe, LSH planes,
  * quantization): per query, the fraction of the exact top-k actually
  * returned by the approximate index.
  *
  * Scale shape: both inputs are top-k frames (queries × k rows, never
  * corpus-sized); the evaluation is one equi-join on (query, neighbor)
  * plus two grouped counts. At 100 TB the exact side runs on a query
  * SAMPLE against the full corpus (brute force per query is linear,
  * not quadratic — sampling queries, not documents, keeps truth exact).
  *
  * Counts exact; recall is ONE double division of exact integers per
  * query — bit-identical across engines and partitionings.
  */
object AnnEval {

  /** Per-query row: (qid, n_truth, n_hit, recall); queries present in
    * `truth` but absent from `pred` score 0, queries absent from
    * `truth` are out of scope (truth defines the query set).
    */
  def recallAtK(pred: DataFrame, truth: DataFrame,
      qCol: String = "qid", nCol: String = "nid"): DataFrame = {
    val t = truth.select(col(qCol), col(nCol)).distinct()
    val p = pred.select(col(qCol), col(nCol)).distinct()
    val tc = t.groupBy(qCol).agg(count(lit(1)).as("n_truth"))
    val hits = p.join(t, Seq(qCol, nCol))
      .groupBy(qCol).agg(count(lit(1)).as("n_hit"))
    tc.join(hits, Seq(qCol), "left")
      .select(col(qCol),
        col("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_truth").cast("double")).as("recall"))
  }
}
