package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ann, Pq}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // four well-separated clusters in 8d
  private def corpus = {
    val rng = new scala.util.Random(13)
    (0 until 80).map { i =>
      val c = i % 4
      val base = Array.tabulate(8)(d => if (d == 2 * c) 10.0f else 0.0f)
      (i.toLong, base.map(v => v + rng.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  "sampleCodebooks" should "slice the hash-sampled rows per subspace" in {
    val cb = Pq.sampleCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 8)
    cb.m shouldBe 4
    cb.ds shouldBe 2
    cb.books.length shouldBe 4
    cb.books.foreach { b =>
      b.map(_._1) shouldBe (0 until 8)
      b.foreach { case (_, v) => v.length shouldBe 2 }
    }
    // subspace slices reassemble the sampled row
    val row0 = cb.books.flatMap(_.find(_._1 == 0).get._2)
    row0.length shouldBe 8
  }

  "encode" should "emit m codes in range plus the reconstruction norm, map-side" in {
    val cb = Pq.sampleCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 8)
    val enc = Pq.encode(corpus, "vec_id", "embedding", cb)
    graft.core.Bucketing.hasShuffle(enc) shouldBe false
    val rows = enc.select("code", "csqn").collect()
    rows.length shouldBe 80
    rows.foreach { r =>
      val code = r.getSeq[Int](0)
      code.length shouldBe 4
      code.foreach { c => c should (be >= 0 and be < 8) }
      // csqn = sum of the chosen centroids' squared norms
      val csqn = r.getDouble(1)
      val expected = code.zipWithIndex.map { case (c, j) =>
        val v = cb.books(j).find(_._1 == c).get._2
        v.foldLeft(0.0)((a, x) => a + x * x)
      }.foldLeft(0.0)(_ + _)
      csqn shouldBe expected +- 1e-12
    }
    // pass-through columns survive (IVF-PQ composition)
    enc.columns should contain allOf ("vec_id", "embedding")
  }

  it should "pick each row's own slice when every row is a centroid" in {
    val tiny = corpus.filter($"vec_id" < 8)
    val cb = Pq.sampleCodebooks(tiny, "vec_id", "embedding", m = 2, ksub = 8)
    val enc = Pq.encode(tiny, "vec_id", "embedding", cb)
    // with all rows in the codebooks, argmin distance to own slice is 0 —
    // every row must reconstruct exactly (code = its own sample rank)
    val hk = (id: Long) => (id * 2654435761L) % 1000003L
    val rank = (0L until 8L).sortBy(i => (hk(i), i)).zipWithIndex.toMap
    enc.select("vec_id", "code").collect().foreach { r =>
      val id = r.getLong(0)
      r.getSeq[Int](1) shouldBe Seq.fill(2)(rank(id))
    }
  }

  "searchAdc" should "equal brute force when the shortlist covers the corpus" in {
    val q = corpus.filter($"vec_id" < 4)
    val cb = Pq.sampleCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 8)
    val enc = Pq.encode(corpus, "vec_id", "embedding", cb)
    val pq = Pq.searchAdc(enc, corpus, q, "vec_id", "embedding", cb,
      k = 5, shortlist = 79)
    val brute = Ann.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 5)
    // rerank is exact cosine over the full shortlist = the brute ranking
    rowsOf(pq, "qid", "rank", "nid") shouldBe
      rowsOf(brute, "qid", "rank", "nid")
  }

  it should "recover in-cluster neighbors from a narrow ADC shortlist" in {
    val q = corpus.filter($"vec_id" < 4)
    val res = Pq.topK(corpus, q, "vec_id", "embedding", k = 5,
      m = 4, ksub = 8, shortlist = 10)
    val rows = res.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe 20
    // ADC approximation is coarse but cluster-separating at this geometry
    rows.foreach { case (qid, nid) => nid % 4 shouldBe qid % 4 }
  }

  "searchIvfPq" should "equal brute force when probing every cell with a full shortlist" in {
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val cb = Pq.sampleCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 8)
    val enc = Pq.encode(assigned, "id", "vec", cb)
    val res = Pq.searchIvfPq(enc, corpus, q, "vec_id", "embedding",
      ivf, cb, k = 5, nprobe = 4, shortlist = 79)
    val brute = Ann.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 5)
    rowsOf(res, "qid", "rank", "nid") shouldBe
      rowsOf(brute, "qid", "rank", "nid")
  }

  it should "recover in-cluster neighbors from pruned cells" in {
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val cb = Pq.sampleCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 8)
    val enc = Pq.encode(assigned, "id", "vec", cb)
    val res = Pq.searchIvfPq(enc, corpus, q, "vec_id", "embedding",
      ivf, cb, k = 5, nprobe = 1, shortlist = 10)
    val rows = res.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe 20
    rows.foreach { case (qid, nid) => nid % 4 shouldBe qid % 4 }
  }

  "trainCodebooks" should "produce per-subspace books of the right shape" in {
    val cb = Pq.trainCodebooks(corpus, "embedding", m = 2, ksub = 4)
    cb.ds shouldBe 4
    cb.books.length shouldBe 2
    cb.books.foreach { b =>
      b.map(_._1).sorted shouldBe (0 until 4)
      b.foreach { case (_, v) => v.length shouldBe 4 }
    }
    // trained books drive the same pipeline end-to-end
    val q = corpus.filter($"vec_id" < 2)
    val enc = Pq.encode(corpus, "vec_id", "embedding", cb)
    Pq.searchAdc(enc, corpus, q, "vec_id", "embedding", cb,
      k = 3, shortlist = 10).count() shouldBe 6
  }

  "encodeResidual" should "emit codes plus the exact reconstruction norm, map-side" in {
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val cb = Pq.sampleResidualCodebooks(assigned, ivf, m = 4, ksub = 8)
    val enc = Pq.encodeResidual(assigned, ivf, cb)
    graft.core.Bucketing.hasShuffle(enc) shouldBe false
    val cents = ivf.centroids.toMap
    val rows = enc.select("cid", "code", "csqn").collect()
    rows.length shouldBe 80
    rows.foreach { r =>
      val cid = r.getInt(0)
      val code = r.getSeq[Int](1)
      code.length shouldBe 4
      code.foreach { c => c should (be >= 0 and be < 8) }
      // csqn = |centroid + r̂|², recomputed driver-side
      val rh = code.zipWithIndex.flatMap { case (c, j) =>
        cb.books(j).find(_._1 == c).get._2
      }
      val recon = cents(cid).zip(rh).map { case (a, b) => a + b }
      r.getDouble(2) shouldBe
        recon.foldLeft(0.0)((a, x) => a + x * x) +- 1e-9
    }
  }

  "searchIvfPqResidual" should "equal brute force when probing every cell with a full shortlist" in {
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val cb = Pq.sampleResidualCodebooks(assigned, ivf, m = 4, ksub = 8)
    val enc = Pq.encodeResidual(assigned, ivf, cb)
    val res = Pq.searchIvfPqResidual(enc, corpus, q, "vec_id", "embedding",
      ivf, cb, k = 5, nprobe = 4, shortlist = 79)
    val brute = Ann.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 5)
    rowsOf(res, "qid", "rank", "nid") shouldBe
      rowsOf(brute, "qid", "rank", "nid")
  }

  it should "recover in-cluster neighbors from pruned cells" in {
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val cb = Pq.sampleResidualCodebooks(assigned, ivf, m = 4, ksub = 8)
    val enc = Pq.encodeResidual(assigned, ivf, cb)
    val res = Pq.searchIvfPqResidual(enc, corpus, q, "vec_id", "embedding",
      ivf, cb, k = 5, nprobe = 1, shortlist = 10)
    val rows = res.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe 20
    rows.foreach { case (qid, nid) => nid % 4 shouldBe qid % 4 }
  }

  "searchIvfPqResidualHier" should "equal the flat residual search when the two-level rank covers all supers" in {
    // wassign = wprobe = nsuper ⇒ the two-level rank sees every leaf, so
    // assignment, probing, residuals, codes, and the full ADC pipeline
    // are bit-identical to the flat path — the d38 composition's
    // equivalence anchor
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val h = graft.similarity.IvfHier.hierarchy(ivf, nsuper = 2)
    val assignedH = graft.similarity.IvfHier.assignHier(
      corpus, "vec_id", "embedding", h, wassign = 2)
    val cb = Pq.sampleResidualCodebooks(assignedH, ivf, m = 4, ksub = 8)
    val encH = Pq.encodeResidual(assignedH, ivf, cb)
    val hier = Pq.searchIvfPqResidualHier(encH, corpus, q, "vec_id",
      "embedding", h, cb, k = 5, wprobe = 2, nprobe = 2, shortlist = 10)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val enc = Pq.encodeResidual(assigned, ivf, cb)
    val flat = Pq.searchIvfPqResidual(enc, corpus, q, "vec_id",
      "embedding", ivf, cb, k = 5, nprobe = 2, shortlist = 10)
    rowsOf(hier, "qid", "rank", "nid") shouldBe
      rowsOf(flat, "qid", "rank", "nid")
  }

  it should "serve cid-partitioned PQ code storage identically to the in-memory path" in {
    // the d48 contract: smallint codes round-trip losslessly, the scan
    // is partition-pruned, ranks match searchIvfPq exactly
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq").toString
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val cb = Pq.sampleCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 8)
    val enc = Pq.encode(assigned, "id", "vec", cb)
    Pq.writeIvfPq(enc, dir, cb)
    val onDisk = spark.read.parquet(dir).schema
    onDisk("code").dataType.simpleString shouldBe "array<smallint>"
    onDisk("csqn").dataType.simpleString shouldBe "double"
    val stored = Pq.searchIvfPqStored(dir, corpus, q, "vec_id",
      "embedding", ivf, cb, k = 5, nprobe = 2, shortlist = 10)
    val mem = Pq.searchIvfPq(enc, corpus, q, "vec_id", "embedding",
      ivf, cb, k = 5, nprobe = 2, shortlist = 10)
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(mem, "qid", "rank", "nid")
    val planStr = stored.queryExecution.sparkPlan.toString
    "PartitionFilters: \\[[^\\]]*cid#\\d+ ".r
      .findFirstIn(planStr) should not be empty
  }

  it should "push an attribute filter beneath the pruned PQ scan" in {
    // the d51 filter contract at the PQ granularity: attribute persisted
    // next to the codes, predicate inside the probed-cells read, results
    // equal to filtering the in-memory encoded corpus
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq_f").toString
    val attributed = corpus.withColumn("lang",
      when($"vec_id" % 3 === 0, "en").otherwise("de"))
    val q = attributed.filter($"vec_id" < 6 && $"lang" === "en")
    val ivf = graft.similarity.Ivf.sampleCentroids(
      attributed, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      attributed, "vec_id", "embedding", ivf, keep = Seq("lang"))
    val cb = Pq.sampleCodebooks(attributed, "vec_id", "embedding",
      m = 4, ksub = 8)
    val enc = Pq.encode(assigned, "id", "vec", cb)
    Pq.writeIvfPq(enc, dir, cb, attrCols = Seq("lang"))
    val stored = Pq.searchIvfPqStored(dir, corpus, q, "vec_id",
      "embedding", ivf, cb, k = 5, nprobe = 2, shortlist = 10,
      filter = Some($"lang" === "en"))
    val mem = Pq.searchIvfPq(enc.filter($"lang" === "en"), corpus, q,
      "vec_id", "embedding", ivf, cb, k = 5, nprobe = 2, shortlist = 10)
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(mem, "qid", "rank", "nid")
    stored.select("nid").distinct().collect().map(_.getLong(0))
      .forall(_ % 3 == 0) shouldBe true
    val planStr = stored.queryExecution.sparkPlan.toString
    "PushedFilters: \\[[^\\]]*EqualTo\\(lang,en\\)".r
      .findFirstIn(planStr) should not be empty
  }
}
