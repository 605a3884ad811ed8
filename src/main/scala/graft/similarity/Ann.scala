package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    O(|queries| × |corpus|); fine when the query side is small enough to
  *    broadcast (the common "probe a training shard" case). All arithmetic
  *    is double-precision column expressions inside codegen.
  *  - `lshTopK`: random-hyperplane LSH — the 100 TB path. Each vector maps
  *    to a small bucket key (sign bits of h fixed projections); the join is
  *    a hash join on bucket, shuffling keys instead of the full corpus
  *    cross product. Recall is tunable via hyperplane count / multiprobe.
  */
object Ann {

  /** Elementwise-double dot product of two float/double array columns —
    * the native codegen'd `DotProduct` expression (left-to-right
    * accumulation: deterministic summation order, bitwise identical to
    * the previous aggregate/zip_with fold, without the intermediate
    * array + boxed-element HOF interpretation on every scored pair).
    */
  def dot(a: Column, b: Column): Column =
    graft.core.Graft.column(graft.functions.expressions.DotProduct(
      graft.core.Graft.expression(a), graft.core.Graft.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Shared top-k kernel: per-query rank window over a scored
    * (qid, nid, cosine_sim) frame — ONE implementation behind every
    * similarity path (brute-force, LSH, IVF, quantized), so the ranking
    * semantics (desc cosine, nid tie-break) can never diverge between them.
    */
  private[similarity] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cosine_sim"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine_sim")
  }

  /** Exact top-k cosine neighbors for each query vector, full form with
    * per-frame column names. Output: (qid, rank 1..k, nid, cosine_sim).
    * The query side should be small; Spark broadcasts it under AQE /
    * the session's broadcast threshold, making this a map-only pass over
    * the corpus followed by a per-query top-k (no corpus shuffle).
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("nid"), col(corpusVec).as("nvec"))
    val q = queries.select(col(queryId).as("qid"), col(queryVec).as("qvec"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosine(col("qvec"), col("nvec")).as("cosine_sim"))
    rankTopK(scored, k)
  }

  /** Convenience form: same id/vec column names on both frames. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame =
    bruteForceTopK(corpus, idCol, vecCol, queries, idCol, vecCol, k)

  /** Deterministic pseudo-random hyperplane component for (table t,
    * plane p, dim d): a fixed hash folded to [-0.5, 0.5). Engine-portable
    * by construction.
    */
  private def planeComponent(tbl: Int, p: Int, d: Int): Double =
    (((1103515245L * ((tbl * 64 + p) * 1024 + d + 1) + 12345L) % 1000003L)
      .toDouble / 1000003.0) - 0.5

  /** Bucket key for one hash table: sign bits of `planes` projections.
    *
    * Each plane ships as ONE array literal (`typedlit` — a single
    * Literal node, not dim CreateArray children: the per-element-literal
    * unrolling made Catalyst optimize a ~1000-node tree per union branch
    * and dominated runtime with planning, not math) feeding the compiled
    * `DotProduct`, and the weighted bit sum unrolls over the 4–6 planes
    * — a ~3·planes-node tree with NO higher-order functions. The r16
    * FallbackAudit found the previous transform/zip_with/aggregate
    * wrapper was the last interpreted per-row stage on the d06/d09
    * corpus paths (each embedding row paid 3 interpreted HOF passes per
    * table). Bucket values are bit-identical: DotProduct accumulates
    * left-to-right exactly like the zip_with fold it replaced, sign
    * bits and the exact long sum are order-free.
    */
  def lshBucket(vec: Column, dim: Int, planes: Int, tbl: Int = 0): Column =
    if (planes == 0) lit(0L) // degenerate single-bucket LSH, as the old fold
    else (0 until planes).map { p =>
      val plane = typedlit((0 until dim).map(d => planeComponent(tbl, p, d)))
      when(dot(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduceLeft(_ + _)

  /** (id, vec, nrm, table, bucket) keys across `tables` independent hash
    * tables — OR-amplification: a pair is a candidate if it collides in
    * ANY table, the standard recall lever for hyperplane LSH. The L2 norm
    * is computed ONCE per input row before the table fan-out, so pair
    * scoring downstream is a single dot product instead of three
    * (dot/(nrm_a·nrm_b) builds the exact expression `cosine` builds —
    * bitwise-identical scores, 3× less HOF work on the scored pairs).
    */
  private def bucketKeys(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, tables: Int): DataFrame =
    // single pass + posexplode of per-table buckets (a tables-way union
    // would rescan the corpus per table)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      l2norm(col(vecCol)).as("nrm"),
      posexplode(array((0 until tables).map(tb =>
        lshBucket(col(vecCol), dim, planes, tb)): _*)).as(Seq("tbl", "bucket")))

  /** Approximate top-k: candidates share an LSH bucket in any of `tables`
    * hash tables, then exact cosine rank within candidates. Trades recall
    * for a bucket-local join (no corpus cross product).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, planes: Int = 8,
      tables: Int = 4): DataFrame = {
    val c = bucketKeys(corpus, idCol, vecCol, dim, planes, tables)
      .select(col("tbl"), col("bucket"), col("id").as("nid"),
        col("vec").as("nvec"), col("nrm").as("nnrm"))
    val q = bucketKeys(queries, idCol, vecCol, dim, planes, tables)
      .select(col("tbl"), col("bucket"), col("id").as("qid"),
        col("vec").as("qvec"), col("nrm").as("qnrm"))
    val scored = q.join(c, Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")))
          .as("cosine_sim"))
      .groupBy("qid", "nid").agg(max("cosine_sim").as("cosine_sim"))
    rankTopK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t) via
    * LSH bucketing — the embedding-space analogue of NearDup.
    */
  def cosineNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, planes: Int = 8,
      tables: Int = 4): DataFrame = {
    val keyed = bucketKeys(df, idCol, vecCol, dim, planes, tables)
    val a = keyed.select(col("tbl"), col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = keyed.select(col("tbl"), col("bucket"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("tbl", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
          .as("cosine_sim"))
      .distinct()
      .filter(col("cosine_sim") >= threshold)
  }
}
