package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficients — the graph-density
  * diagnostics for the similarity graphs this library builds (the
  * near-dup candidate graph, the TAAR guid-guid co-install graph,
  * `taar_lite_guidguid.py`): a node's clustering coefficient says
  * whether its neighborhood is a coherent clump (template family) or a
  * hub of unrelated edges (a shingle-collision artifact) — the signal
  * that picks between keep-one dedup (X13 components) and community
  * splitting (X79 label prop).
  *
  * Algorithm: degree-ordered orientation (Chiba–Nishizeki / the
  * "compact-forward" scheme every distributed triangle counter uses —
  * cf. Suri & Vassilvitskii WWW'11): orient every undirected edge from
  * its lower (degree, id) endpoint to the higher, enumerate wedges as
  * pairs of out-neighbors, and close each wedge with ONE semi-join. The
  * orientation is the scale story — out-degree under it is O(√m)
  * regardless of hub size, so the wedge join's fan-out is bounded by
  * graph arboricity where the naive neighbor-pairs join explodes on the
  * first celebrity node. Each triangle is found exactly once (its
  * lowest-ordered vertex owns it).
  *
  * Plan: canonical-edge distinct, one degree aggregation, two
  * node-keyed joins to attach degrees, the wedge self-join on the
  * shared lowest vertex, a closing LEFT SEMI on (b, c), and a final
  * per-node count — every exchange keyed on node ids carrying ≤ 24-byte
  * rows; no document payloads, no cartesian products. The clustering
  * ratio is ONE double division of exact longs (bit-stable across
  * engines).
  */
object Triangles {

  /** Per-node (idCol, degree, triangles, clustering) over the undirected
    * graph given by `edges` (either orientation, duplicates and
    * self-loops tolerated — canonicalized away). Nodes from `nodes`
    * absent from any edge get degree 0; clustering is NULL below
    * degree 2 (no wedge exists to close).
    */
  def localCounts(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

    val ed = e
      .join(deg.select(col("id").as("u"), col("deg").as("degu")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("degv")), "v")
    val uFirst = struct(col("degu"), col("u")) < struct(col("degv"), col("v"))
    // dk = the destination's order key, carried so wedge endpoints can
    // be compared without re-joining degrees
    val oriented = ed.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("d"),
      when(uFirst, struct(col("degv").as("dg"), col("v").as("nd")))
        .otherwise(struct(col("degu").as("dg"), col("u").as("nd")))
        .as("dk"))

    val x = oriented.alias("x")
    val y = oriented.alias("y")
    val wedges = x.join(y,
        col("x.s") === col("y.s") && col("x.dk") < col("y.dk"))
      .select(col("x.s").as("a"), col("x.d").as("b"), col("y.d").as("c"))
    // the closing edge, if present, is oriented b→d c (same total order)
    val tri = wedges.join(
      oriented.select(col("s").as("b"), col("d").as("c")),
      Seq("b", "c"), "left_semi")

    val triCnt = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri"))

    val degree: Column = coalesce(col("deg"), lit(0L))
    val triangles: Column = coalesce(col("tri"), lit(0L))
    nodes.select(col(idCol).as("id"))
      .join(deg, Seq("id"), "left")
      .join(triCnt, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        degree.as("degree"),
        triangles.as("triangles"),
        when(degree >= 2L,
          (lit(2L) * triangles).cast("double") /
            (degree * (degree - 1L)).cast("double")).as("clustering"))
  }

  /** Triangle census of the MinHash near-duplicate graph (the d12 edge
    * set): LSH candidates verified at `threshold`, then local counts for
    * every document. High-clustering nodes sit inside template families;
    * high-degree low-clustering nodes are collision artifacts.
    */
  def nearDupTriangles(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.8, maxBucketSize: Int = 0): DataFrame = {
    val pairs = graft.dedup.NearDup.minhashNearDuplicates(
      df, idCol, textCol, n, numHashes, bands, threshold, maxBucketSize)
    localCounts(df.select(idCol), idCol, pairs, "id_a", "id_b")
  }
}
