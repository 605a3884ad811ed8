package graft.operators

import graft.SparkSpec

/** Reciprocal-rank fusion: hand-computed contributions, cross-list
  * consensus beating single-list winners, per-query partitioning,
  * deterministic tie ranks, missing-item handling.
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  // list 1 ranks: d1, d2, d3; list 2 ranks: d2, d3, d1 (d2 is the
  // consensus item)
  private val l1 = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "s")
  private val l2 = Seq((2L, 0.9), (3L, 0.5), (1L, 0.1)).toDF("doc_id", "s")

  private def contrib(k: Int, rank: Int): Long =
    Fusion.Scale / (k + rank)

  "reciprocalRank" should "sum exact integer contributions per item" in {
    val out = Fusion.reciprocalRank(Seq(l1, l2), Seq("doc_id"), "s", k = 60)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out shouldBe Array(
      (1L, contrib(60, 1) + contrib(60, 3), 2L, 1L),
      (2L, contrib(60, 2) + contrib(60, 1), 2L, 1L),
      (3L, contrib(60, 3) + contrib(60, 2), 2L, 2L))
  }

  it should "rank the consensus item first" in {
    val top = Fusion.reciprocalRank(Seq(l1, l2), Seq("doc_id"), "s")
      .orderBy($"rrf_micro".desc).select("doc_id").as[Long]
      .collect().head
    top shouldBe 2L // rank 2+1 beats 1+3 at k=60
  }

  it should "expose the double score as exactly micro/scale" in {
    val r = Fusion.reciprocalRank(Seq(l1), Seq("doc_id"), "s")
      .where("doc_id = 1").collect().head
    r.getAs[Double]("rrf_score") shouldBe
      r.getAs[Long]("rrf_micro").toDouble / Fusion.Scale
  }

  it should "fuse per query when partitioned" in {
    val q1 = Seq(("qa", 1L, 2.0), ("qa", 2L, 1.0),
      ("qb", 1L, 1.0), ("qb", 2L, 2.0)).toDF("q", "doc_id", "s")
    val out = Fusion.reciprocalRank(Seq(q1), Seq("q", "doc_id"), "s",
        partitionCols = Seq("q"), k = 1)
      .orderBy("q", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array(
      ("qa", 1L, contrib(1, 1)), ("qa", 2L, contrib(1, 2)),
      ("qb", 1L, contrib(1, 2)), ("qb", 2L, contrib(1, 1)))
  }

  it should "break score ties on id ascending, never tying ranks" in {
    val tied = Seq((7L, 1.0), (3L, 1.0), (5L, 1.0)).toDF("doc_id", "s")
    val out = Fusion.reciprocalRank(Seq(tied), Seq("doc_id"), "s", k = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    out shouldBe Array((3L, 1L), (5L, 2L), (7L, 3L))
  }

  it should "count only the lists an item appears in" in {
    val short = Seq((1L, 1.0)).toDF("doc_id", "s")
    val out = Fusion.reciprocalRank(Seq(l1, short), Seq("doc_id"), "s")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    out shouldBe Array((1L, 2L), (2L, 1L), (3L, 1L))
  }

  it should "reject partition columns outside the key" in {
    an[IllegalArgumentException] should be thrownBy
      Fusion.reciprocalRank(Seq(l1), Seq("doc_id"), "s",
        partitionCols = Seq("q"))
  }
}
