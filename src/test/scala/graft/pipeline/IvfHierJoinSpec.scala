package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ivf, IvfHier, Quantize}
import org.apache.spark.sql.functions._

/** The broadcast-join two-stage forms must be BIT-IDENTICAL to the
  * compiled-literal rank: same driver-folded |c|², same left-to-right
  * dots, same (rel_dist, cid) tie-breaks — only WHERE the leaf table
  * lives changes (plan literal vs broadcast frame). This equivalence is
  * what lets gate d47 replay d40's oracle through the join path
  * verbatim, and what makes the past-10⁵-leaves configuration a pure
  * layout decision rather than a semantics change.
  */
class IvfHierJoinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rng = new scala.util.Random(29)
    (0 until 150).map { i =>
      val c = i % 5
      val base = Array.tabulate(16)(d => if (d == 3 * c) 9.0f else 0.0f)
      (i.toLong, base.map(v => v + rng.nextFloat()))
    }.toDF("vec_id", "embedding")
  }

  private def hier(nlist: Int, nsuper: Int) = {
    val model = Ivf.sampleCentroids(corpus, "vec_id", "embedding", nlist)
    IvfHier.hierarchy(model, nsuper)
  }

  it should "assign identically to the compiled literal rank" in {
    val h = hier(nlist = 8, nsuper = 3)
    for (wassign <- Seq(1, 2, 3)) {
      val lit = IvfHier.assignHier(corpus, "vec_id", "embedding", h,
        wassign)
      val join = IvfHier.assignHierJoin(corpus, "vec_id", "embedding", h,
        wassign)
      rowsOf(join, "id", "cid") shouldBe rowsOf(lit, "id", "cid")
      // vectors pass through untouched
      join.select("id", "vec").exceptAll(
        lit.select("id", "vec")).count() shouldBe 0
    }
  }

  it should "probe identically to the compiled literal rank" in {
    val h = hier(nlist = 8, nsuper = 3)
    val q = corpus.filter($"vec_id" < 12)
    for ((wprobe, nprobe) <- Seq((1, 1), (2, 2), (3, 4))) {
      val lit = IvfHier.probesHier(q, "vec_id", "embedding", h, wprobe,
        nprobe)
      val join = IvfHier.probesHierJoin(q, "vec_id", "embedding", h,
        wprobe, nprobe)
      rowsOf(join, "qid", "cid") shouldBe rowsOf(lit, "qid", "cid")
    }
  }

  it should "serve hierTopKJoin rank-identically to hierTopK" in {
    val h = hier(nlist = 8, nsuper = 3)
    val q = corpus.filter($"vec_id" < 12)
    val assignedLit = IvfHier.assignHier(corpus, "vec_id", "embedding",
      h, wassign = 2)
    val assignedJoin = IvfHier.assignHierJoin(corpus, "vec_id",
      "embedding", h, wassign = 2)
    val a = Quantize.hierTopK(assignedLit, q, "vec_id", "embedding", h,
      k = 5, wprobe = 2, nprobe = 2)
    val b = Quantize.hierTopKJoin(assignedJoin, q, "vec_id", "embedding",
      h, k = 5, wprobe = 2, nprobe = 2)
    rowsOf(b, "qid", "rank", "nid") shouldBe rowsOf(a, "qid", "rank", "nid")
  }

  it should "handle supers with no leaves (empty leaf join side)" in {
    // nsuper = nlist makes every super its own leaf parent; a hierarchy
    // over 2 supers with 8 leaves concentrates leaves unevenly — both
    // forms must agree wherever a probed super contributes no candidate
    val h = hier(nlist = 8, nsuper = 2)
    val q = corpus.filter($"vec_id" < 6)
    val lit = IvfHier.probesHier(q, "vec_id", "embedding", h, wprobe = 2,
      nprobe = 8)
    val join = IvfHier.probesHierJoin(q, "vec_id", "embedding", h,
      wprobe = 2, nprobe = 8)
    rowsOf(join, "qid", "cid") shouldBe rowsOf(lit, "qid", "cid")
  }
}
