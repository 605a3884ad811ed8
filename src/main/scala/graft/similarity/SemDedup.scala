package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Components

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus into IVF
  * cells, compare vectors only WITHIN a cell, then resolve the similar
  * pairs into clusters and keep one representative per cluster.
  *
  * The cell stage makes the quadratic part tractable: candidate pairs are
  * O(Σ cell²) instead of O(n²), and the comparison join is an equi-join on
  * cid (hash-partitioned, never a cross product). Pairs that straddle two
  * cells are missed by construction — that is SemDeDup's documented
  * approximation, traded for never scanning cross-cell pairs at all.
  *
  * Scale design (100 TB, 1000 executors):
  *  - Cell assignment is Ivf.assign: map-only over a broadcast literal
  *    centroid table, zero exchanges.
  *  - The within-cell self-join shuffles (cid, id, vec, nrm) rows once;
  *    norms are precomputed BEFORE the fan-out (the d09 lesson — computing
  *    them inside the pair projection re-folds every vector per pair).
  *  - `maxCellSize` caps quadratic blowup on a hot cell (same guard as
  *    NearDup.minhashCandidates): oversized cells are SKIPPED, not
  *    exploded — their members stay unlabelled singletons. At real scale
  *    nlist is sized so cells hold ~√(corpus/nlist) ≪ maxCellSize.
  */
object SemDedup {

  /** Within-cell cosine-similar pairs (id_a < id_b, cosine_sim ≥ t).
    * One pair per id pair by construction (each id lives in exactly one
    * cell), so no distinct is needed.
    */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
      model: Ivf.Model, threshold: Double,
      maxCellSize: Int = 0): DataFrame = {
    val asn0 = Ivf.assign(df, idCol, vecCol, model)
      .withColumn("nrm", Ann.l2norm(col("vec")))
    val asn =
      if (maxCellSize <= 0) asn0
      else {
        val ok = asn0.groupBy("cid").agg(count(lit(1)).as("cell_n"))
          .filter(col("cell_n") <= maxCellSize).drop("cell_n")
        asn0.join(ok, Seq("cid"))
      }
    val a = asn.select(col("cid"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = asn.select(col("cid"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("cid")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // zero-norm guard: a missing/failed embedding is an all-zero
        // vector, and an unguarded division is a fatal ANSI
        // DIVIDE_BY_ZERO; cosine with a zero vector is undefined → null
        // → the threshold filter drops the pair
        when(col("nrm_a") * col("nrm_b") > 0,
          Ann.dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
          .as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  /** Full SemDeDup labelling: every row gets its semantic cluster id
    * (transitive closure of the within-cell pairs; singletons keep their
    * own id), the cluster size, and keep = 1 on the minimum id.
    *
    * Output: (idCol, cluster_id, cluster_size, keep ∈ {0,1}).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      model: Ivf.Model, threshold: Double,
      maxCellSize: Int = 0): DataFrame = {
    val pairs = semanticPairs(df, idCol, vecCol, model, threshold, maxCellSize)
    Components.labelClusters(df, idCol,
      Components.connectedComponents(pairs, "id_a", "id_b"))
  }

  /** Incremental-ingest SEMANTIC dedup — the d14/d15 discipline for the
    * embedding family, completing the set (exact d14, MinHash d15,
    * semantic here): an incoming document is dropped iff
    *  (a) its vector is cosine-similar (≥ threshold) to a SEEN vector in
    *      the same IVF cell of the seen corpus' persisted `model`, or
    *  (b) it is similar to a SMALLER-id incoming vector within a cell
    *      (greedy keep-min within the batch, exactly d15's rule — NOT the
    *      transitive closure; `semanticDedup` is the closure form).
    *
    * The model is the PERSISTED index trained on the seen corpus — cell
    * assignment of the incoming batch is map-only over broadcast
    * centroids, and the seen side is first cell-pruned to the cells the
    * batch actually occupies (a tiny distinct-cid broadcast), so a small
    * ingest against a 100 TB corpus touches only the matching cells'
    * vectors — the same partition-pruning story as the d16 storage path.
    * `maxCellSize` caps a hot SEEN cell (skipped, not exploded), as in
    * `semanticPairs`.
    */
  def incrementalSemanticDedup(incoming: DataFrame, idCol: String,
      vecCol: String, seen: DataFrame, seenIdCol: String,
      seenVecCol: String, model: Ivf.Model, threshold: Double,
      maxCellSize: Int = 0): DataFrame = {
    val inc = Ivf.assign(incoming, idCol, vecCol, model)
      .withColumn("nrm", Ann.l2norm(col("vec")))
    val incCells = inc.select("cid").distinct()
    val seenAsn0 = Ivf.assign(seen, seenIdCol, seenVecCol, model)
      .join(broadcast(incCells), Seq("cid"))
      .withColumn("nrm", Ann.l2norm(col("vec")))
    val seenAsn =
      if (maxCellSize <= 0) seenAsn0
      else {
        val ok = seenAsn0.groupBy("cid").agg(count(lit(1)).as("cell_n"))
          .filter(col("cell_n") <= maxCellSize).drop("cell_n")
        seenAsn0.join(ok, Seq("cid"))
      }
    def sim(na: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column,
        va: org.apache.spark.sql.Column, vb: org.apache.spark.sql.Column) =
      when(na * nb > 0, Ann.dot(va, vb) / (na * nb))
    val crossHit = inc.select(col("cid"), col("id").as("new_id"),
        col("vec").as("vec_a"), col("nrm").as("nrm_a"))
      .join(seenAsn.select(col("cid"), col("vec").as("vec_b"),
        col("nrm").as("nrm_b")), Seq("cid"))
      .filter(sim(col("nrm_a"), col("nrm_b"),
        col("vec_a"), col("vec_b")) >= threshold)
      .select("new_id").distinct()
    val withinHit = inc.select(col("cid"), col("id").as("id_a"),
        col("vec").as("vec_a"), col("nrm").as("nrm_a"))
      .join(inc.select(col("cid"), col("id").as("id_b"),
        col("vec").as("vec_b"), col("nrm").as("nrm_b")), Seq("cid"))
      .filter(col("id_a") < col("id_b") &&
        sim(col("nrm_a"), col("nrm_b"),
          col("vec_a"), col("vec_b")) >= threshold)
      .select(col("id_b").as("new_id")).distinct()
    incoming.join(
      crossHit.union(withinHit).distinct().withColumnRenamed("new_id", idCol),
      Seq(idCol), "left_anti")
  }
}
