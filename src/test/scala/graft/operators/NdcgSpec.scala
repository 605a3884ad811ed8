package graft.operators

import graft.SparkSpec

/** NDCG@k: hand-checked exact nano sums, perfect = 1.0, IDCG-0 NULL,
  * cutoff behavior, tie determinism, per-query scoping.
  */
class NdcgSpec extends SparkSpec {
  import spark.implicits._

  private val q = Seq(
    ("q1", 1L, 9.0, 3L),  // a
    ("q1", 2L, 10.0, 2L), // b ranks first, rel 2
    ("q1", 3L, 7.0, 0L),  // c
    ("q1", 4L, 8.0, 1L)   // d
  ).toDF("query", "id", "score", "rel")

  "ndcgAtK" should "produce the exact integer DCG/IDCG sums" in {
    val d = Ndcg.discountNano(3)
    val r = Ndcg.ndcgAtK(q, "query", "id", "score", "rel", 3)
      .collect().head
    // predicted top-3: b(3), a(7), d(1); ideal: a(7), b(3), d(1)
    val dcg = 3L * d(0) + 7L * d(1) + 1L * d(2)
    val idcg = 7L * d(0) + 3L * d(1) + 1L * d(2)
    (r.getLong(1), r.getLong(2)) shouldBe ((dcg, idcg))
    r.getDouble(3) shouldBe dcg.toDouble / idcg.toDouble
  }

  it should "score a perfect ranking exactly 1.0" in {
    val perfect = Seq(("q", 1L, 3.0, 5L), ("q", 2L, 2.0, 3L),
      ("q", 3L, 1.0, 0L)).toDF("query", "id", "score", "rel")
    Ndcg.ndcgAtK(perfect, "query", "id", "score", "rel", 3)
      .collect().head.getDouble(3) shouldBe 1.0
  }

  it should "emit NULL when the query has no relevant item" in {
    val none = Seq(("q", 1L, 2.0, 0L), ("q", 2L, 1.0, 0L))
      .toDF("query", "id", "score", "rel")
    Ndcg.ndcgAtK(none, "query", "id", "score", "rel", 2)
      .collect().head.isNullAt(3) shouldBe true
  }

  it should "ignore items past the cutoff in both orderings" in {
    val d = Ndcg.discountNano(1)
    val r = Ndcg.ndcgAtK(q, "query", "id", "score", "rel", 1)
      .collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((3L * d(0), 7L * d(0)))
  }

  it should "break score ties by id so reruns agree bitwise" in {
    val tied = Seq(("q", 2L, 1.0, 0L), ("q", 1L, 1.0, 3L))
      .toDF("query", "id", "score", "rel")
    // id 1 wins the tie -> rel 3 sits at rank 1 -> perfect
    Ndcg.ndcgAtK(tied, "query", "id", "score", "rel", 2)
      .collect().head.getDouble(3) shouldBe 1.0
  }

  it should "scope queries independently" in {
    val two = q.unionByName(Seq(("q2", 9L, 1.0, 1L))
      .toDF("query", "id", "score", "rel"))
    val out = Ndcg.ndcgAtK(two, "query", "id", "score", "rel", 3)
      .orderBy("query").collect()
    out.length shouldBe 2
    out(1).getDouble(3) shouldBe 1.0 // single relevant item, trivially ideal
  }

  it should "be invariant under repartitioning" in {
    val a = Ndcg.ndcgAtK(q, "query", "id", "score", "rel", 3)
      .collect().head.toSeq
    val b = Ndcg.ndcgAtK(q.repartition(7), "query", "id", "score", "rel", 3)
      .collect().head.toSeq
    a shouldBe b
  }
}
