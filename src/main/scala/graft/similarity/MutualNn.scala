package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutual nearest neighbors — the symmetric filter over an ANN result
  * that turns "a's closest vector is b" into the far stronger "a and b
  * each pick the other". The standard alignment/mining heuristic
  * (bitext mining, cross-snapshot entity matching, embedding-space
  * dedup seeding): one-directional top-1 matches are dominated by hub
  * vectors that are everyone's neighbor; mutuality removes hubs with no
  * threshold to tune.
  *
  * Composes with ANY of the engine's top-k backends (X7/X8/X43/X56 —
  * brute, IVF, int8, stored, projected): the filter itself is one
  * self-join of the n-row (qid, nid) top-1 frame on 16-byte keys —
  * negligible next to the search that produced it.
  */
object MutualNn {

  /** Mutual pairs from a (qid, rank, nid) top-k frame (rank 1 rows are
    * used). Output: (id_a, id_b) with id_a < id_b, each pair once.
    */
  def pairs(topK: DataFrame): DataFrame = {
    val r1 = topK.filter(col("rank") === 1)
      .select(col("qid"), col("nid"))
    r1.alias("a").join(r1.alias("b"),
        col("a.nid") === col("b.qid") && col("b.nid") === col("a.qid") &&
          col("a.qid") < col("b.qid"))
      .select(col("a.qid").as("id_a"), col("a.nid").as("id_b"))
  }

  /** Mutual top-1 pairs over a corpus through the composed 100 TB ANN
    * configuration (IVF cell pruning → int8 quantization → exact
    * integer-dot rerank, the d11 path): every vector queries its own
    * probed cells, so the whole operation reads nprobe/nlist of the
    * corpus per query and the rerank arithmetic replays bitwise.
    */
  /** Spread a narrow corpus across the executor pool before the
    * probed-cells scoring join: the join's probe side broadcasts, so the
    * scoring stage inherits the CORPUS partitioning — a single-file
    * corpus scan (1–3 partitions) serializes the kernel on one core
    * (r18 profile: q83 ran as ONE 1.8 s task on 32 idle cores). Only
    * widens, never shrinks: a cluster-scale corpus that already has
    * ≥ parallelism partitions passes through untouched.
    */
  private def spread(df: DataFrame, corpus: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Read the partition count from the RAW corpus scan, not the
    // assigned frame: assign/assignHier are narrow (partition-
    // preserving selects over a compiled nearest-cells call), so both
    // frames have the same partitioning, but `df.rdd` on the assigned
    // subtree physical-planned the full centroid-literal plan once just
    // to read a count and again at execution (r18 ADVICE). Planning the
    // bare corpus scan is cheap and has no side jobs.
    if (corpus.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def ivfMutualTopOne(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, nprobe: Int): DataFrame = {
    val model = Ivf.sampleCentroids(corpus, idCol, vecCol, nlist)
    val assigned = spread(Ivf.assign(corpus, idCol, vecCol, model), corpus)
    pairs(Quantize.ivfTopK(assigned, corpus, idCol, vecCol, model,
      k = 1, nprobe = nprobe))
  }

  /** `ivfMutualTopOne` through the hierarchical coarse quantizer
    * (X155): same quantized scoring kernel, but assignment and probing
    * rank nsuper + w·nlist/nsuper centroids per vector instead of
    * nlist — with `IvfHier.autoNlistHier`/`autoNsuper` sizing this is
    * the Θ(n^(4/3)) corpus-self-join configuration (flat + autoNlist is
    * Θ(n^1.5)).
    */
  def hierMutualTopOne(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, nsuper: Int, nprobe: Int, wassign: Int,
      wprobe: Int): DataFrame = {
    val h = IvfHier.hierarchy(
      Ivf.sampleCentroids(corpus, idCol, vecCol, nlist), nsuper)
    val assigned = spread(
      IvfHier.assignHier(corpus, idCol, vecCol, h, wassign), corpus)
    pairs(Quantize.hierTopK(assigned, corpus, idCol, vecCol, h,
      k = 1, wprobe, nprobe))
  }
}
