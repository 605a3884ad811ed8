package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation — community detection over a similarity
  * graph (the near-dup candidate graph, the TAAR guid-guid co-install
  * graph) for a FIXED number of rounds with deterministic tie-breaks.
  *
  * Connected components (`dedup/Components`) answers "what is reachable";
  * label propagation answers the softer "what clumps together": every
  * node adopts the most common label among its neighbors each round, so
  * bridges between dense regions do NOT merge them the way a single
  * stray edge merges components. The reference's nearest analog is the
  * TAAR coinstallation neighborhood model (`taar_lite_guidguid.py`),
  * which stops at direct neighbors; propagation iterates that idea.
  *
  * Determinism is non-negotiable for a gated operator, so this is the
  * SYNCHRONOUS variant (all round-r votes read round-(r-1) labels) with
  * the tie rule (max count, then min label) — async/randomized LPA, as
  * usually described, is run-order dependent. Rounds are a fixed
  * parameter, not convergence-tested: at 100 TB you budget iterations
  * up front (each is one co-partitioned join + one grouped count).
  *
  * Scale: per round, ONE shuffle join of labels onto the symmetrized
  * edge list (both sides hash-partition on the node id — consistent
  * across rounds, so AQE reuses the exchange layout), one
  * map-side-combined (node, label) count, and a top-1 window bounded by
  * WindowGroupLimit. Labels are 16 bytes/node; edges never carry
  * payloads. Degenerate hubs are capped by the same maxBucketSize guard
  * the LSH candidate generator applies upstream.
  */
object LabelProp {

  /** Propagate labels for `rounds` synchronous rounds.
    *
    * `nodes` supplies the universe (one row per node, `idCol` integral);
    * `edges` the undirected adjacency (each pair once, either
    * orientation). Nodes with no edges keep their own id as label.
    * Returns (idCol, community, community_size) where community is the
    * round-`rounds` label and sizes count the final assignment.
    */
  def propagate(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, rounds: Int,
      materialize: Boolean = true): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    import org.apache.spark.storage.StorageLevel
    // The edge list is referenced once per round and is often the
    // expensive lineage (the near-dup generator runs MinHash + verify);
    // each round's labels are referenced twice by the next round (votes
    // + carry-forward join). Without caching, evaluation re-runs the
    // edge lineage per round and doubles the label chain per round —
    // measured 7.0 s vs 1.3 s on the d23 gate. The caches are LAZY (no
    // per-round jobs); `materialize = true` (default) runs the one
    // eager count at the end and releases every intermediate, the
    // PageRank.ranks lifecycle (PageRank.scala:134-150).
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def keep(df: DataFrame): DataFrame =
      if (!materialize) df
      else { cached += df.persist(StorageLevel.MEMORY_AND_DISK); df }
    val sym = keep(edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .union(edges.select(col(dstCol).as("s"), col(srcCol).as("d"))))
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("lab"))
    val byNode = Window.partitionBy("id")
      .orderBy(col("c").desc, col("nl").asc)
    for (_ <- 1 to rounds) {
      val votes = sym
        .join(labels.select(col("id").as("s"), col("lab").as("nl")), "s")
        .groupBy(col("d").as("id"), col("nl"))
        .agg(count(lit(1)).as("c"))
      val winner = votes
        .withColumn("rn", row_number().over(byNode))
        .filter(col("rn") === 1)
        .select(col("id"), col("nl"))
      labels = keep(labels.join(winner, Seq("id"), "left")
        .select(col("id"), coalesce(col("nl"), col("lab")).as("lab")))
    }
    val sizes = labels.groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("community_size"))
    val out = labels.select(col("id").as(idCol), col("lab").as("community"))
      .join(sizes, "community")
      .select(col(idCol), col("community"), col("community_size"))
    if (materialize) {
      val m = out.persist(StorageLevel.MEMORY_AND_DISK)
      m.count()
      cached.foreach(_.unpersist(false))
      m
    } else out
  }

  /** Communities of the MinHash near-duplicate graph: LSH candidates
    * verified at `threshold`, then `rounds` of propagation over the
    * verified pairs. The near-dup twin of
    * `Components.nearDupClusters`, answering "which documents cluster
    * around the same template" rather than "which are transitive
    * duplicates".
    */
  def nearDupCommunities(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.8, rounds: Int = 3,
      maxBucketSize: Int = 0, materialize: Boolean = true): DataFrame = {
    val pairs = graft.dedup.NearDup.minhashNearDuplicates(
      df, idCol, textCol, n, numHashes, bands, threshold, maxBucketSize)
    propagate(df.select(idCol), idCol, pairs, "id_a", "id_b", rounds,
      materialize)
  }
}
