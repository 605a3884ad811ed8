package graft.pipeline

import graft.SparkSpec
import graft.dedup.Components
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Components.connectedComponents"

  it should "label each component with its minimum id (both paths)" in {
    // two components: {1,2,3,4} (a path, so propagation needs >1 round)
    // and {10, 11}; 20-20 self-loop dropped; 7 isolated (absent — only
    // nodes appearing on edges are labelled)
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 20L)).toDF("src", "dst")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
    // adaptive default → driver union-find fast path
    Components.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap shouldBe expected
    // threshold 0 → distributed min-label loop
    Components.connectedComponents(edges, "src", "dst",
      localEdgeThreshold = 0).as[(Long, Long)].collect().toMap shouldBe expected
  }

  it should "converge on a long chain within the pointer-jumping bound" in {
    // a 64-node path has diameter 63; min-label alone needs ~63 rounds,
    // pointer jumping gets under maxIter=20 (≈ log2 doubling). Threshold 0
    // forces the DISTRIBUTED path — the driver fast path would hide it.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.connectedComponents(chain, "src", "dst",
      localEdgeThreshold = 0).as[(Long, Long)].collect()
    got.length shouldBe 64
    all(got.map(_._2)) shouldBe 0L
  }

  it should "reject non-integral node ids with a clear error" in {
    val strEdges = Seq(("a", "b")).toDF("src", "dst")
    val ex = the[IllegalArgumentException] thrownBy
      Components.connectedComponents(strEdges, "src", "dst")
    ex.getMessage should include("integral node ids")
  }

  it should "handle an empty edge list on both paths" in {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    Components.connectedComponents(empty, "src", "dst").count() shouldBe 0L
    Components.connectedComponents(empty, "src", "dst",
      localEdgeThreshold = 0).count() shouldBe 0L
  }

  it should "match a driver-side union-find on random graphs" in {
    import org.scalacheck.Gen
    val graphGen = for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(1, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es
    (0 until 5).foreach { seed =>
      val edges = graphGen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).get
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // distributed loop (threshold 0), checked against an independent
        // recursive union-find — NOT Components.localUnionFind, so the
        // driver fast path is pinned by a third implementation too
        val got = Components
          .connectedComponents(edges.toDF("src", "dst"), "src", "dst",
            localEdgeThreshold = 0)
          .as[(Long, Long)].collect().toMap
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x)).toMap
        got shouldBe expected
        Components.localUnionFind(edges.toArray) shouldBe expected
      }
    }
  }

  behavior of "Components.nearDupClusters"

  it should "cluster transitive near-dups and keep the minimum id" in {
    // A/B and B/C are near-identical (one token differs pairwise) so the
    // pair stage links A~B and B~C even though A and C differ in two
    // tokens; the component stage must fuse all three into one cluster.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val vA = base
    val vB = base.replace("tok7", "tokX")
    val vC = base.replace("tok7", "tokX").replace("tok23", "tokY")
    val docs = Seq(
      (100L, vA), (101L, vB), (102L, vC),
      (200L, (1 to 30).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")

    // bands = 8 (r = 1): per-band match probability equals the Jaccard
    // itself, so both chain pairs (J ≈ 0.8) reliably surface as candidates
    val got = Components.nearDupClusters(docs, "doc_id", "text",
      bands = 8, threshold = 0.5)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got(100L) shouldBe ((100L, 3L, 1))
    got(101L) shouldBe ((100L, 3L, 0))
    got(102L) shouldBe ((100L, 3L, 0))
    got(200L) shouldBe ((200L, 1L, 1))
  }

  it should "cluster STRING doc ids transparently via the dense-id map" in {
    // same fixture as above, ids as strings (the crawl-data norm the
    // integral-id require used to push back onto every caller)
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      ("crawl/a", base),
      ("crawl/b", base.replace("tok7", "tokX")),
      ("crawl/c", base.replace("tok7", "tokX").replace("tok23", "tokY")),
      ("crawl/z", (1 to 30).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Components.nearDupClusters(docs, "doc_id", "text",
      bands = 8, threshold = 0.5)
      .as[(String, String, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // cluster_id is the minimum ORIGINAL id (numbering is order-monotone)
    got("crawl/a") shouldBe (("crawl/a", 3L, 1))
    got("crawl/b") shouldBe (("crawl/a", 3L, 0))
    got("crawl/c") shouldBe (("crawl/a", 3L, 0))
    got("crawl/z") shouldBe (("crawl/z", 1L, 1))
  }

  behavior of "Components.denseIdMap"

  it should "number distinct ids densely in natural order" in {
    val df = Seq("m", "a", "z", "a", "m").toDF("k")
    val got = Components.denseIdMap(df, "k")
      .as[(String, Long)].collect().sortBy(_._2).toSeq
    got shouldBe Seq(("a", 0L), ("m", 1L), ("z", 2L))
  }
}
