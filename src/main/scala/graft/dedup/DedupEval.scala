package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-quality evaluation for approximate near-dup detection —
  * "measure, don't guess" for the LSH knobs: score a predicted pair set
  * (MinHash-LSH, SimHash, embedding buckets) against a reference pair
  * set (the brute-force baseline, exact by construction) as
  * precision/recall/F1 over unordered pairs.
  *
  * At 100 TB the reference side is computed on a SAMPLE (the brute
  * baseline is O(n²) by definition — that is WHY the approximate path
  * exists); the harness itself is cheap: pairs are canonicalized
  * map-side, each side collapses to a count, and the only join is an
  * equi-join on the 16-byte canonical pair key over candidate-sized
  * (not corpus-sized) frames.
  *
  * Counts are exact integers; each ratio is ONE double division of
  * exact integers (F1 as 2·hit/(pred+truth), not composed from the
  * float ratios), so results are bit-identical across engines and
  * partitionings.
  */
object DedupEval {

  /** One row: (n_truth, n_pred, n_hit, prec, rec, f1); ratios NULL when
    * their denominator is zero (no predictions / no true pairs).
    */
  def pairQuality(pred: DataFrame, truth: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    def canon(df: DataFrame) = df.select(
      least(col(aCol), col(bCol)).as("pa"),
      greatest(col(aCol), col(bCol)).as("pb")).distinct()
    val p = canon(pred)
    val t = canon(truth)
    val np = p.agg(count(lit(1)).as("n_pred"))
    val nt = t.agg(count(lit(1)).as("n_truth"))
    val nh = p.join(t, Seq("pa", "pb")).agg(count(lit(1)).as("n_hit"))
    nt.crossJoin(np).crossJoin(nh).select(
      col("n_truth"), col("n_pred"), col("n_hit"),
      when(col("n_pred") =!= 0L,
        col("n_hit").cast("double") / col("n_pred").cast("double"))
        .as("prec"),
      when(col("n_truth") =!= 0L,
        col("n_hit").cast("double") / col("n_truth").cast("double"))
        .as("rec"),
      when(col("n_pred") + col("n_truth") =!= 0L,
        (col("n_hit") * 2L).cast("double") /
          (col("n_pred") + col("n_truth")).cast("double"))
        .as("f1"))
  }
}
