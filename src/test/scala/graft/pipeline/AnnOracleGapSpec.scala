package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ann, Ivf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Canary for the d06/d07 gate oracles' summation-order dependency.
  *
  * The gates claim bitwise agreement with DuckDB because `Ann.dot` is a
  * left-to-right fold and DuckDB's `list_dot_product` currently
  * accumulates the same way. If DuckDB ever switched to pairwise/SIMD
  * summation, near-tie cosine scores could flip (rnk, nid) ordering and
  * the gate would fail as a mystery rank diff. This spec asserts the
  * fixture leaves a wide margin: every adjacent pair of candidates around
  * and inside the gate's top-k has a cosine gap far above double
  * round-off (or is an exact tie, where the nid tie-break is
  * engine-independent) — so a future summation change fails loudly HERE,
  * with a named cause, not at the gate.
  */
class AnnOracleGapSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def available: Boolean =
    new java.io.File(sfDir + "/embeddings.parquet").exists()

  /** Smallest nonzero gap between rank-adjacent cosine scores per query
    * (ranks 1..k+1, i.e. including the k/k+1 cut boundary).
    */
  private def minAdjacentGap(ranked: DataFrame): Double = {
    val a = ranked.select(col("qid"), col("rank"), col("cosine_sim"))
    val b = a.withColumnRenamed("rank", "rank_b")
      .withColumnRenamed("cosine_sim", "sim_b")
    a.join(b, a("qid") === b("qid") && col("rank_b") === col("rank") + 1)
      .select(abs(col("cosine_sim") - col("sim_b")).as("gap"))
      .filter(col("gap") > 0.0)
      .agg(min("gap")).collect().head.getDouble(0)
  }

  // 1e-9 is ~1e6 ULPs at cosine magnitude: far above anything a changed
  // summation order can produce, far below any real rank separation.
  private val MinGap = 1e-9

  it should "leave a summation-order-proof sim gap in the d06 LSH fixture" in {
    assume(available, s"$sfDir not present")
    val e = spark.read.parquet(sfDir + "/embeddings.parquet")
    // k = 6: one past the gate's k = 5, so the cut boundary is covered
    val ranked = Ann.lshTopK(e, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 6, dim = 64, planes = 4)
    minAdjacentGap(ranked) should be > MinGap
  }

  it should "leave a summation-order-proof threshold gap in the d09 fixture" in {
    assume(available, s"$sfDir not present")
    val e = spark.read.parquet(sfDir + "/embeddings.parquet")
    // all bucketed pairs (threshold 0 keeps every candidate's cosine);
    // the gate's inclusion boundary is cosine >= 0.35 at 6 planes
    val pairs = Ann.cosineNearDuplicates(e, "vec_id", "embedding",
      dim = 64, threshold = 0.0, planes = 6, tables = 4)
    val gap = pairs
      .select(abs(col("cosine_sim") - 0.35).as("gap"))
      .agg(min("gap")).collect().head.getDouble(0)
    gap should be > MinGap
  }

  it should "leave a summation-order-proof sim gap in the d07 IVF fixture" in {
    assume(available, s"$sfDir not present")
    val e = spark.read.parquet(sfDir + "/embeddings.parquet")
    val model = Ivf.sampleCentroids(e, "vec_id", "embedding", nlist = 8)
    val assigned = Ivf.assign(e, "vec_id", "embedding", model)
    val ranked = Ivf.search(assigned, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", model, k = 6, nprobe = 2)
    minAdjacentGap(ranked) should be > MinGap
  }
}
