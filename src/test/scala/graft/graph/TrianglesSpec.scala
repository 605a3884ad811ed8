package graft.graph

import graft.SparkSpec

/** Triangle counting: clique/path/star censuses, per-node attribution,
  * clustering coefficients, input canonicalization, isolates.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodeIds: Seq[Long], edges: Seq[(Long, Long)]) = {
    val nodes = nodeIds.toDF("id")
    val e = edges.toDF("s", "d")
    Triangles.localCounts(nodes, "id", e, "s", "d")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
  }

  "localCounts" should "give every K3 node one triangle and clustering 1" in {
    run(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (1L, 3L))) shouldBe Array(
      (1L, 2L, 1L, Some(1.0)),
      (2L, 2L, 1L, Some(1.0)),
      (3L, 2L, 1L, Some(1.0)))
  }

  it should "count K4 as three triangles per node, four total" in {
    val edges = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val rows = run(Seq(1L, 2L, 3L, 4L), edges)
    all(rows.map(_._2)) shouldBe 3L
    all(rows.map(_._3)) shouldBe 3L
    all(rows.map(_._4.get)) shouldBe 1.0
  }

  it should "find no triangles on a path, clustering 0 where defined" in {
    run(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L))) shouldBe Array(
      (1L, 1L, 0L, None),
      (2L, 2L, 0L, Some(0.0)),
      (3L, 1L, 0L, None))
  }

  it should "attribute the bridge node of two cliques its own triangle only" in {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val rows = run((1L to 6L), edges)
    rows(2) shouldBe ((3L, 3L, 1L, Some(1.0 / 3.0)))
    rows(3) shouldBe ((4L, 3L, 1L, Some(1.0 / 3.0)))
    rows(0) shouldBe ((1L, 2L, 1L, Some(1.0)))
  }

  it should "canonicalize duplicate, reversed and self-loop edges" in {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    run(Seq(1L, 2L, 3L), messy) shouldBe Array(
      (1L, 2L, 1L, Some(1.0)),
      (2L, 2L, 1L, Some(1.0)),
      (3L, 2L, 1L, Some(1.0)))
  }

  it should "report isolates with degree 0 and NULL clustering" in {
    run(Seq(1L, 2L, 3L, 9L), Seq((1L, 2L), (2L, 3L), (1L, 3L)))
      .last shouldBe ((9L, 0L, 0L, None))
  }

  it should "give a star center zero clustering over many wedges" in {
    val star = (2L to 6L).map(i => (1L, i))
    val rows = run((1L to 6L), star)
    rows.head shouldBe ((1L, 5L, 0L, Some(0.0)))
  }

  "nearDupTriangles" should "census the near-dup graph deterministically" in {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over the lazy dog tonight"),
      (4L, "completely different text about spark plans and shuffles")
    ).toDF("doc_id", "text")
    val rows = Triangles.nearDupTriangles(docs, "doc_id", "text",
        threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 1-2 identical, 1-3 and 2-3 near-dup -> one triangle; 4 isolated
    rows shouldBe Array((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L),
      (4L, 0L, 0L))
  }
}
