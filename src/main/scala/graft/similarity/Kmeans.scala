package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable Lloyd's k-means over embedding columns — the
  * clustering step semantic curation actually runs (SemDeDup's cells,
  * IVF's coarse quantizer, topic bucketing), formulated so every
  * iteration is EXACT integer arithmetic and therefore bit-identical
  * across engines, partitionings and re-runs:
  *
  *  - vectors quantize to integer micro-units (×10⁶, round-half-up) —
  *    one deterministic IEEE rounding at the boundary, everything after
  *    is integral;
  *  - distances are exact long sums of squared component diffs
  *    (|component| ≤ ~9·10⁸ µ fits 64 dims in a long with 10³ slack);
  *  - assignment ties break on the lowest centroid id (min struct);
  *  - centroid updates are per-component integer sums div counts — the
  *    floor-division remainder vanishes deterministically, exactly like
  *    PageRank's fixed-point ranks;
  *  - seeding is the k lowest-id vectors: reproducible by CONSTRUCTION,
  *    not by seed-plumbing (kmeans++ trades determinism for quality —
  *    a training-data pipeline re-running a 100 TB job wants the same
  *    clusters back, and rounds are budgeted, not converged, like
  *    X79's label propagation).
  *
  * Scale, per round: centroids (k×dims longs) BROADCAST onto the
  * unshuffled vector scan for assignment; the update is one
  * map-side-combined (cluster, pos) sum over k·dims cells — vectors
  * never shuffle, only k·dims aggregation cells do. Driver state is the
  * k×dims centroid table (collected per round — bounded by k, not n,
  * the NbClassifier model convention).
  */
object Kmeans {

  private def quantize(vecCol: Column): Column =
    transform(vecCol, x =>
      floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))

  /** Cluster `df.vecCol` into k groups with `rounds` Lloyd iterations.
    * Output: (idCol, cluster: Long — 0-based centroid index,
    * dist2_micro: Long — exact squared distance to the final centroid,
    * in µ² units).
    */
  def fitPredict(df: DataFrame, idCol: String, vecCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    val q = df.select(col(idCol), quantize(col(vecCol)).as("q"))

    // seed: the k lowest-id vectors, centroid index by id order
    var centroids: Array[(Long, Seq[Long])] = q.orderBy(col(idCol))
      .limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Long](1)) }

    def assigned: DataFrame = {
      // dist_j = Σ (q_i − c_j_i)²; argmin by (dist, j) — ONE compiled
      // call per row (expressions.KmeansAssign, r15: the HOF min-struct
      // fold ran k·dims interpreted lambda steps per row per round;
      // integer arithmetic, so the longs are identical by construction)
      val best = graft.core.Graft.column(
        graft.functions.expressions.KmeansAssign(
          graft.core.Graft.expression(col("q")),
          centroids.sortBy(_._1).map(_._2.toArray)))
      q.withColumn("__km", best)
        .select(col(idCol), col("q"), col("__km.cluster").as("cluster"),
          col("__km.dist2_micro").as("dist2_micro"))
    }

    for (_ <- 1 to rounds) {
      // update: exact per-component integer mean (sum div count) over
      // k·dims aggregation cells; empty clusters keep their centroid
      val cells = assigned
        .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("pos"), expr("s div n").as("c"))
        .collect()
      val updated = cells.groupBy(_.getLong(0)).map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
      }
      centroids = centroids.map { case (cid, c) =>
        (cid, updated.getOrElse(cid, c))
      }
    }
    assigned.select(col(idCol), col("cluster"), col("dist2_micro"))
  }
}
