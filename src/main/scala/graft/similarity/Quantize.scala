package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the storage lever a
  * 100 TB vector corpus needs: 4× smaller than float32 (the int8 values
  * live in [-127, 127]), sequential-scan-friendly, and similarity runs on
  * integer dot products.
  *
  * Scheme: per-vector absolute max → `amax`; each component maps to
  * `floor(x·127/amax + 0.5)` (explicit round-half-up — engine-portable,
  * unlike round(), whose half-way rule differs across engines). Cosine is
  * SCALE-INVARIANT, so ranking needs no dequantization and the per-vector
  * scale never enters the kernel.
  *
  * Determinism (what makes the d10 gate bitwise-replayable): quantized
  * components are integral, so every dot product is an EXACT sum
  * (≤ dim·127² ≪ 2⁵³) where float summation ORDER cannot matter — the
  * only floats are one sqrt and one division over exact integers, both
  * correctly-rounded IEEE ops identical in any engine. Contrast d05/d06,
  * whose float dot products are deterministic only because both engines
  * accumulate left-to-right (AnnOracleGapSpec guards that assumption).
  */
object Quantize {

  /** Max |x| over the vector: left fold, no summation. */
  private def absMax(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))

  /** Quantize `vecCol` to integral components in [-127, 127].
    * Output: (id, qvec array<double> of integral values, amax).
    * qvec stays a double array so downstream kernels (Ann.dot) apply
    * unchanged; values are exact integers, and a writer targeting storage
    * would cast to array<tinyint> losslessly. amax = 0 (zero vector)
    * quantizes to all-zero rather than dividing by zero.
    */
  def scalarQuantize(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      // materialize amax as a column BEFORE the transform: HOF lambda
      // argument expressions re-evaluate per element, so an inline
      // aggregate() here would fold the whole vector again for every
      // component (the O(len²) trap PLANS.md documents for shingles)
      .withColumn("amax", absMax(col("v")))
      .withColumn("qvec",
        when(col("amax") === 0.0, transform(col("v"), _ => lit(0.0)))
          .otherwise(transform(col("v"),
            x => floor(x * lit(127.0) / col("amax") + lit(0.5))
              .cast("double"))))
      .select(col("id"), col("qvec"), col("amax"))

  /** Exact top-k cosine neighbors in the QUANTIZED space — same plan
    * shape as `Ann.bruteForceTopK` (broadcast query side, map-only corpus
    * pass, per-query top-k window): compression changes the kernel's
    * input width, not the dataflow. Composes with the IVF/LSH pruning
    * paths the same way (quantize after cell/bucket assignment).
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = scalarQuantize(corpus, idCol, vecCol)
      .select(col("id").as("nid"), col("qvec").as("nvec"))
    val q = scalarQuantize(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("qvec").as("qvec"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Ann.cosine(col("qvec"), col("nvec")).as("cosine_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cosine_sim"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine_sim")
  }
}
