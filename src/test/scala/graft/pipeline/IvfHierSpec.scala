package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ann, Ivf, IvfHier}
import org.apache.spark.sql.functions._

class IvfHierSpec extends SparkSpec {
  import spark.implicits._

  // four well-separated clusters in 8d; neighbors live in-cluster
  private def corpus = {
    val rng = new scala.util.Random(11)
    (0 until 120).map { i =>
      val c = i % 4
      val base = Array.tabulate(8)(d => if (d == 2 * c) 10.0f else 0.0f)
      (i.toLong, base.map(v => v + rng.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  "hierarchy" should "parent every leaf to a renumbered super" in {
    val model = Ivf.sampleCentroids(corpus, "vec_id", "embedding", nlist = 8)
    val h = IvfHier.hierarchy(model, nsuper = 3)
    h.supers.map(_._1) shouldBe Seq(0, 1, 2)
    h.leafSid.keySet shouldBe model.centroids.map(_._1).toSet
    h.leafSid.values.toSet.subsetOf(Set(0, 1, 2)) shouldBe true
    // each super-centroid IS one of the leaf vectors (sampled one level up)
    val leafVecs = model.centroids.map(_._2.toSeq).toSet
    h.supers.foreach { case (_, v) => leafVecs should contain(v.toSeq) }
    // a super's own vector parents to itself or an exact tie — its
    // rel-dist |s|²−2·s·s = −|s|² is the global minimum over supers
    h.supers.foreach { case (sid, sv) =>
      val cid = model.centroids.find(_._2.toSeq == sv.toSeq).get._1
      val d0 = sv.foldLeft(0.0)((a, x) => a + x * x)
      val best = h.supers.map { case (s2, v2) =>
        (v2.foldLeft(0.0)((a, x) => a + x * x) -
          2.0 * sv.zip(v2).foldLeft(0.0)((a, p) => a + p._1 * p._2), s2)
      }.min
      best._1 shouldBe (-d0) +- 1e-9
      h.leafSid(cid) shouldBe best._2
    }
  }

  it should "match flat assignment bitwise when wassign covers all supers" in {
    val model = Ivf.sampleCentroids(corpus, "vec_id", "embedding", nlist = 8)
    val h = IvfHier.hierarchy(model, nsuper = 3)
    val flat = Ivf.assign(corpus, "vec_id", "embedding", model)
      .select("id", "cid")
    val hier = IvfHier.assignHier(corpus, "vec_id", "embedding", h,
      wassign = 3)
    rowsOf(hier, "id", "cid") shouldBe rowsOf(flat, "id", "cid")
  }

  it should "assign and probe map-side with zero shuffle exchanges" in {
    val model = Ivf.sampleCentroids(corpus, "vec_id", "embedding", nlist = 8)
    val h = IvfHier.hierarchy(model, nsuper = 3)
    val assigned = IvfHier.assignHier(corpus, "vec_id", "embedding", h)
    assigned.count() shouldBe 120
    graft.core.Bucketing.hasShuffle(assigned) shouldBe false
    // unlike the flat Ivf.probes (per-query rank window = exchange), the
    // two-stage probe is in-row array math — no shuffle even unbroadcast
    val prb = IvfHier.probesHier(corpus, "vec_id", "embedding", h,
      wprobe = 2, nprobe = 2)
    prb.count() shouldBe 240
    graft.core.Bucketing.hasShuffle(prb) shouldBe false
  }

  it should "recover brute-force top-k when probing everything" in {
    val q = corpus.filter($"vec_id" < 4)
    val brute = Ann.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 5)
    val hier = IvfHier.topKHier(corpus, q, "vec_id", "embedding", k = 5,
      nlist = 4, nsuper = 2, nprobe = 4, wassign = 2, wprobe = 2)
    rowsOf(hier, "qid", "rank", "nid") shouldBe
      rowsOf(brute, "qid", "rank", "nid")
  }

  it should "recover in-cluster neighbors with narrow probes" in {
    val q = corpus.filter($"vec_id" < 4)
    val res = IvfHier.topKHier(corpus, q, "vec_id", "embedding", k = 5,
      nlist = 4, nsuper = 2, nprobe = 1, wassign = 2, wprobe = 2)
    val rows = res.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe 20
    rows.foreach { case (qid, nid) => nid % 4 shouldBe qid % 4 }
  }

  "autoNsuper/autoNlistHier" should "encode the two-level sizing laws" in {
    IvfHier.autoNsuper(100) shouldBe 10
    IvfHier.autoNsuper(100, wassign = 4) shouldBe 20
    IvfHier.autoNsuper(1) shouldBe 1
    // clamped at nlist even when w pushes past it
    IvfHier.autoNsuper(4, wassign = 100) shouldBe 4
    // nlist grows as n^(2/3): 1000x corpus -> 100x leaves
    IvfHier.autoNlistHier(1000000000L) shouldBe
      100 * IvfHier.autoNlistHier(1000000L)
    // hier affords MORE leaves than flat at the same n (cheaper rank)
    IvfHier.autoNlistHier(1000000L) should be > Ivf.autoNlist(1000000L)
    an[IllegalArgumentException] should be thrownBy IvfHier.autoNsuper(0)
    an[IllegalArgumentException] should be thrownBy
      IvfHier.autoNlistHier(0L)
  }
}
