package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ivf, SemDedup}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated regions along axes e1 and e2. Within the e1 cell:
  // ids 1,2 nearly parallel (cos ≈ 1) and id 3 diagonal (cos(3,1) ≈ 0.71).
  // Within the e2 cell: ids 10,11 nearly parallel, id 12 orthogonal-ish.
  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(0.7f, 0.0f, 0.7f, 0.0f)),
    (10L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (11L, Seq(0.0f, 0.98f, 0.0f, 0.15f)),
    (12L, Seq(0.0f, 0.1f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  private def model = Ivf.Model(Seq(
    0 -> Array(1.0, 0.0, 0.3, 0.0),
    1 -> Array(0.0, 1.0, 0.0, 0.3)))

  behavior of "SemDedup"

  it should "find similar pairs only within a cell" in {
    val pairs = SemDedup.semanticPairs(vecs, "vec_id", "embedding",
      model, threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    pairs shouldBe Set((1L, 2L), (10L, 11L))
  }

  it should "label clusters with keep-one semantics" in {
    val got = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
      model, threshold = 0.9)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got(1L) shouldBe ((1L, 2L, 1))
    got(2L) shouldBe ((1L, 2L, 0))
    got(3L) shouldBe ((3L, 1L, 1)) // similar to nothing at 0.9 → singleton
    got(10L) shouldBe ((10L, 2L, 1))
    got(11L) shouldBe ((10L, 2L, 0))
    got(12L) shouldBe ((12L, 1L, 1))
  }

  it should "chain pairs transitively at a looser threshold" in {
    // at 0.65, 1~2, 1~3 and 2~3 (cos(2,3) ≈ 0.70) fuse into one cluster
    val got = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
      model, threshold = 0.65)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    got(1L) shouldBe 1L
    got(2L) shouldBe 1L
    got(3L) shouldBe 1L
  }

  it should "treat zero vectors as similar to nothing (ANSI-safe)" in {
    val withZero = vecs.union(
      Seq((99L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val got = SemDedup.semanticDedup(withZero, "vec_id", "embedding",
      model, threshold = 0.9)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    got(99L) shouldBe 99L // singleton, and no DIVIDE_BY_ZERO crash
    got(2L) shouldBe 1L // unrelated pairs unaffected
  }

  it should "skip cells above maxCellSize instead of exploding them" in {
    val got = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
      model, threshold = 0.9, maxCellSize = 2)
      .as[(Long, Long, Long, Int)].collect()
    // both cells hold 3 vectors → all comparisons skipped, all singletons
    all(got.map(r => r._3)) shouldBe 1L
    all(got.map(r => r._4)) shouldBe 1
  }

  behavior of "SemDedup.incrementalSemanticDedup"

  it should "drop incoming vectors similar to seen or smaller-id incoming ones" in {
    // seen corpus: 1 (e1-ish), 10 (e2-ish). incoming: 21 ≈ seen 1 (cross
    // hit), 23 fresh diagonal, 25 ≈ 23 (within-batch, greedy drops the
    // larger id), 27 orthogonal to everything in its cell
    val seen = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (10L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val incoming = Seq(
      (21L, Seq(0.99f, 0.05f, 0.0f, 0.0f)),
      (23L, Seq(0.7f, 0.0f, 0.7f, 0.0f)),
      (25L, Seq(0.69f, 0.0f, 0.71f, 0.0f)),
      (27L, Seq(0.0f, 0.1f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = SemDedup.incrementalSemanticDedup(incoming, "vec_id",
        "embedding", seen, "vec_id", "embedding", model, threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq
    out shouldBe Seq(23L, 27L)
  }
}
