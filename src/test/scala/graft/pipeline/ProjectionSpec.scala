package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ann, Projection}
import org.apache.spark.sql.functions._

/** JL random projection (similarity/Projection): sign-matrix
  * determinism, projection shape, recall of the project→rerank pipeline
  * against exact brute force, and the exact-rerank property (every
  * returned rank ordering agrees with full-precision cosine).
  */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic embeddings: 40 vectors in 32-d, clustered in
  // 4 directions with small hash-derived perturbations so true neighbor
  // structure exists for the recall assertion
  private def vec(id: Int): Seq[Float] = {
    val cluster = id % 4
    (0 until 32).map { d =>
      val base = if (d % 4 == cluster) 1.0f else 0.1f
      val wiggle = (((id.toLong * 31 + d) * 2654435761L) % 997L) / 9970.0f
      base + wiggle
    }
  }

  private lazy val emb =
    (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  behavior of "Projection"

  it should "derive a deterministic, roughly balanced sign matrix" in {
    Projection.sign(3, 7) shouldBe Projection.sign(3, 7)
    val signs = for (i <- 0 until 32; j <- 0 until 8)
      yield Projection.sign(i, j)
    signs.foreach(s => math.abs(s) shouldBe 1.0)
    val pos = signs.count(_ > 0)
    pos should (be > signs.size / 4 and be < 3 * signs.size / 4)
  }

  it should "project to the requested dimensionality, map-only" in {
    val p = Projection.project(emb, "embedding", 32, 8, "pv")
    p.select(org.apache.spark.sql.functions.size($"pv"))
      .distinct().as[Int].collect() shouldBe Array(8)
    // no exchange: projection is a pure per-row expression
    p.queryExecution.executedPlan.toString should not include "Exchange"
  }

  it should "recall most true neighbors and rerank them exactly" in {
    val queries = emb.filter($"vec_id" < 8)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Projection.projectedTopK(emb, queries, "vec_id",
      "embedding", k = 5, inDim = 32, outDim = 8, oversample = 4)
    val got = approx.select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    recall should be >= 0.8

    // exact-rerank property: within each query, returned ranks follow
    // full-precision cosine descending
    val sims = approx.select("qid", "rank", "cosine_sim")
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).values
    sims.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._3)
      byRank.zip(byRank.tail).foreach { case (a, b) => a should be >= b }
    }
  }

  it should "reject an output dimension above the input's" in {
    an[IllegalArgumentException] should be thrownBy
      Projection.project(emb, "embedding", 32, 33, "pv")
  }
}
