package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ann, Ivf}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated clusters in 8d; neighbors live in-cluster
  private def corpus = {
    val rng = new scala.util.Random(7)
    (0 until 90).map { i =>
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d == c) 10.0f else 0.0f)
      (i.toLong, base.map(v => v + rng.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  it should "recover in-cluster neighbors with nprobe=1" in {
    val q = corpus.filter($"vec_id" < 3)
    val ivf = Ivf.topK(corpus, q, "vec_id", "embedding",
      k = 5, nlist = 3, nprobe = 1, seed = 42L)
    val brute = Ann.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 5)
    val iset = ivf.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bset = brute.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // with clean clusters, probing the single nearest cell recovers the
    // exact top-5 for every query
    iset shouldBe bset
    // neighbors share the query's cluster (ids ≡ qid mod 3)
    iset.foreach { case (qid, nid) => nid % 3 shouldBe qid % 3 }
  }

  it should "assign map-side with zero shuffle exchanges" in {
    val model = Ivf.sampleCentroids(corpus, "vec_id", "embedding", nlist = 3)
    val assigned = Ivf.assign(corpus, "vec_id", "embedding", model)
    assigned.count() shouldBe 90
    // the argmin is array_min over a centroid literal — a pure map pass;
    // at 100 TB this is the difference between a free scan and a
    // full-corpus hash exchange
    graft.core.Bucketing.hasShuffle(assigned) shouldBe false
  }

  it should "serve probes from cell-bucketed storage without moving the corpus" in {
    val model = Ivf.train(corpus, "embedding", nlist = 3, seed = 42L)
    val assigned = Ivf.assign(corpus, "vec_id", "embedding", model)
    graft.core.Bucketing.writeBucketed(assigned, "graft_test_ivf_cells", "cid", 3)
    try {
      val cells = spark.table("graft_test_ivf_cells")
      // per-cell maintenance aggregation reuses the bucket partitioning
      assertNoShuffle(cells.groupBy("cid").agg(count(lit(1)).as("n")))
      // probe join: broadcast probe side, bucket-local corpus — exchange-free
      val probes = Seq((0L, 0), (1L, 1)).toDF("qid", "cid")
      assertNoShuffle(
        cells.join(broadcast(probes), Seq("cid")).select("qid", "id"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_ivf_cells")
    }
  }

  private def assertNoShuffle(df: org.apache.spark.sql.DataFrame): Unit =
    graft.core.Bucketing.hasShuffle(df) shouldBe false

  it should "prune unprobed cells' files when searching partitioned storage" in {
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells").toString
    val model = Ivf.train(corpus, "embedding", nlist = 3, seed = 42L)
    val assigned = Ivf.assign(corpus, "vec_id", "embedding", model)
    Ivf.writePartitioned(assigned, dir)
    // one directory per cell on disk — the 100 TB layout
    new java.io.File(dir).list().count(_.startsWith("cid=")) shouldBe 3
    // ONE query probing ONE cell: 2 of 3 cell directories must be pruned
    val q = corpus.filter($"vec_id" === 0)
    val stored = Ivf.searchPartitioned(dir, q, "vec_id", "embedding",
      model, k = 5, nprobe = 1)
    // identical results to the in-memory search path
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(Ivf.search(assigned, q, "vec_id", "embedding",
        model, k = 5, nprobe = 1), "qid", "rank", "nid")
    // and the scan carries the probed-cells partition filter: unprobed
    // cells' files are pruned by Catalyst, not read-and-discarded
    // conjunct order/parenthesization varies run to run; match the shape:
    // a partition filter restricting cid to exactly one probed value
    val planStr = stored.queryExecution.sparkPlan.toString
    "PartitionFilters: \\[[^\\]]*cid#\\d+ (= \\d+|IN \\(\\d+\\))".r
      .findFirstIn(planStr) should not be empty
  }

  it should "assign every corpus row to exactly one cell" in {
    val model = Ivf.train(corpus, "embedding", nlist = 3, seed = 42L)
    val assigned = Ivf.assign(corpus, "vec_id", "embedding", model)
    assigned.count() shouldBe 90
    assigned.select("cid").distinct().count() shouldBe 3
    // cells align with the planted clusters
    val purity = assigned.groupBy("cid")
      .agg(countDistinct(expr("id % 3")).as("n"))
      .agg(max("n")).collect().head.getLong(0)
    purity shouldBe 1L
  }

  "autoNlist" should "follow the sqrt(nprobe * n) sizing rule" in {
    Ivf.autoNlist(10000L) shouldBe 100
    Ivf.autoNlist(10000L, nprobe = 4) shouldBe 200
    Ivf.autoNlist(10000L, nprobe = 1, weight = 4.0) shouldBe 200
    // clamped to [1, n]
    Ivf.autoNlist(1L) shouldBe 1
    Ivf.autoNlist(2L, nprobe = 8) shouldBe 2
    // grows as sqrt: 100x the corpus, 10x the cells — cell size grows
    // 10x instead of 100x, bounding self-join candidates at n^1.5
    Ivf.autoNlist(1000000L) shouldBe 10 * Ivf.autoNlist(10000L)
    an[IllegalArgumentException] should be thrownBy Ivf.autoNlist(0L)
    an[IllegalArgumentException] should be thrownBy
      Ivf.autoNlist(10L, nprobe = 0)
  }
}
