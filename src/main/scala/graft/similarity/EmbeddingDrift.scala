package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding centroid drift — "did this source's SEMANTIC center move
  * between snapshots?": per group, the cosine between the two
  * snapshots' mean embeddings. The vector-space leg of the drift
  * family (X67 JS = token distributions, X68 PSI = numeric columns,
  * X107 CUSUM = metric series): token-level drift misses paraphrase
  * drift; the centroid catches it with no vocabulary at all.
  *
  * Exactness: components quantize to MILLI-units (the X104/X112 bound:
  * with 64 dims and snapshot sums ≤ ~10⁶ per dim, every moment —
  * Σ sa·sb, Σ sa², Σ sb² — stays an exact long below 2⁵³, so both
  * engines compute the identical cosine; micro-scale sums would cross
  * the bound at corpus size). Cosine of the SUM vectors equals the
  * cosine of the means (scale invariance), so no division happens
  * until the final fixed-IEEE shape.
  *
  * Scale: one posexplode pass (rows × dims cells, map-side combined to
  * groups × dims), one groups×dims → groups aggregation. Vectors never
  * shuffle whole; NULL cosine when either snapshot is empty or all
  * zeros.
  */
object EmbeddingDrift {

  /** Per-group centroid comparison between snapshot `a` and `b` rows
    * of the SAME frame, split by `sideCol` (boolean: true = a).
    * Output: (groupCol, n_a, n_b, dot, norm2_a, norm2_b,
    * centroid_cos).
    */
  /** Pairwise label-centroid cosine matrix — "which labels sit close in
    * embedding space" (the confusion structure a curator checks before
    * trusting label-stratified sampling or per-label quality cuts).
    * Same exactness machinery as centroidCosine: milli-quantized
    * component sums per (group, dim) — cosine of the SUM vectors equals
    * cosine of the means, so no division until the final IEEE shape.
    *
    * Scale: one posexplode pass map-side-combined to groups × dims
    * cells; the pair matrix is a broadcast self-join of that tiny frame
    * (groups² × dims products, groups ≤ hundreds). Output one row per
    * unordered pair (group_a < group_b).
    */
  def centroidPairCosine(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val cells = df
      .filter(col(vecCol).isNotNull)
      .select(col(groupCol).as("g"),
        posexplode(col(vecCol)).as(Seq("dim", "comp")))
      .withColumn("m",
        floor(col("comp").cast("double") * lit(1000.0) + lit(0.5))
          .cast("long"))
      .groupBy("g", "dim").agg(sum("m").as("s"))
    val norms = cells.groupBy("g").agg(sum(col("s") * col("s")).as("n2"))
    val a = cells.select(col("g").as("group_a"), col("dim"),
      col("s").as("s_a"))
    val b = cells.select(col("g").as("group_b"), col("dim").as("dim_b"),
      col("s").as("s_b"))
    a.join(broadcast(b),
        col("group_a") < col("group_b") && col("dim") === col("dim_b"))
      .groupBy("group_a", "group_b")
      .agg(sum(col("s_a") * col("s_b")).as("dot"))
      .join(broadcast(norms.select(col("g").as("group_a"),
        col("n2").as("norm2_a"))), "group_a")
      .join(broadcast(norms.select(col("g").as("group_b"),
        col("n2").as("norm2_b"))), "group_b")
      .select(col("group_a"), col("group_b"), col("dot"),
        col("norm2_a"), col("norm2_b"),
        when(col("norm2_a") > 0L && col("norm2_b") > 0L,
          col("dot").cast("double") /
            (sqrt(col("norm2_a").cast("double")) *
              sqrt(col("norm2_b").cast("double")))).as("centroid_cos"))
  }

  def centroidCosine(df: DataFrame, groupCol: String, sideCol: String,
      vecCol: String): DataFrame = {
    val cells = df
      .filter(col(vecCol).isNotNull)
      .select(col(groupCol).as("g"), col(sideCol).cast("boolean").as("a"),
        posexplode(col(vecCol)).as(Seq("dim", "comp")))
      .withColumn("m",
        floor(col("comp").cast("double") * lit(1000.0) + lit(0.5))
          .cast("long"))
    val perDim = cells.groupBy("g", "dim").agg(
      sum(when(col("a"), col("m")).otherwise(0L)).as("sa"),
      sum(when(col("a"), 0L).otherwise(col("m"))).as("sb"))
    val counts = df.filter(col(vecCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(sum(when(col(sideCol).cast("boolean"), 1L).otherwise(0L))
        .as("n_a"),
        sum(when(col(sideCol).cast("boolean"), 0L).otherwise(1L))
          .as("n_b"))
    val moments = perDim.groupBy("g").agg(
      sum(col("sa") * col("sb")).as("dot"),
      sum(col("sa") * col("sa")).as("norm2_a"),
      sum(col("sb") * col("sb")).as("norm2_b"))
    counts.join(moments, "g")
      .select(col("g").as(groupCol), col("n_a"), col("n_b"),
        col("dot"), col("norm2_a"), col("norm2_b"),
        when(col("norm2_a") > 0L && col("norm2_b") > 0L,
          col("dot").cast("double") /
            (sqrt(col("norm2_a").cast("double")) *
              sqrt(col("norm2_b").cast("double")))).as("centroid_cos"))
  }
}
