package graft.graph

import graft.SparkSpec

/** Degree assortativity: textbook signs (star negative, regular NULL),
  * hand-computed moments, symmetry over orientation, partition
  * invariance.
  */
class AssortativitySpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]) = {
    val r = Assortativity.degreeCorrelation(edges.toDF("s", "d"), "s", "d")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  "degreeCorrelation" should "be strongly negative on a star" in {
    // hub 0 with 4 leaves: every edge joins deg 4 to deg 1 -> r = -1
    val (m2, _, _, _, r) = run(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    m2 shouldBe 8L
    r.get shouldBe -1.0 +- 1e-12
  }

  it should "be NULL on a degree-regular graph (zero variance)" in {
    // 4-cycle: every endpoint degree 2
    val (_, sx, sxx, sxy, r) =
      run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    r shouldBe None
    sx shouldBe 16L // 8 ends x deg 2
    sxx shouldBe 32L
    sxy shouldBe 32L
  }

  it should "match hand-computed moments on a path" in {
    // path 1-2-3: degrees 1,2,1; ends (x,y): (1,2),(2,1),(2,1),(1,2)
    val (m2, sx, sxx, sxy, r) = run(Seq((1L, 2L), (2L, 3L)))
    (m2, sx, sxx, sxy) shouldBe ((4L, 6L, 10L, 8L))
    // r = (4*8-36)/(4*10-36) = -1
    r.get shouldBe -1.0 +- 1e-12
  }

  it should "be independent of edge orientation" in {
    val a = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)))
    val b = run(Seq((2L, 1L), (3L, 2L), (3L, 4L), (4L, 1L), (3L, 1L)))
    a shouldBe b
  }

  it should "be invariant under repartitioning" in {
    val edges = (1L to 50L).map(i => (i, (i % 17) + 100L))
    val a = run(edges)
    val r2 = Assortativity.degreeCorrelation(
        edges.toDF("s", "d").repartition(7), "s", "d")
      .collect().head
    a._4 shouldBe r2.getLong(3)
    a._5.get shouldBe r2.getDouble(4)
  }
}
