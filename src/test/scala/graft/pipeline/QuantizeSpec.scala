package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ann, Quantize}
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rng = new scala.util.Random(13)
    (0 until 120).map { i =>
      val c = i % 4
      val base = Array.tabulate(16)(d => if (d == c * 4) 8.0f else 0.0f)
      (i.toLong, base.map(v => v + rng.nextFloat()))
    }.toDF("vec_id", "embedding")
  }

  it should "produce integral components in [-127, 127] with unit peak" in {
    val q = Quantize.scalarQuantize(corpus, "vec_id", "embedding")
    q.select(explode($"qvec").as("x"))
      .filter($"x" =!= floor($"x") || abs($"x") > 127).count() shouldBe 0
    // the peak component always quantizes to exactly ±127
    q.select(aggregate($"qvec", lit(0.0),
        (a, x) => greatest(a, abs(x))).as("peak"))
      .filter($"peak" =!= 127.0).count() shouldBe 0
  }

  it should "quantize a zero vector to all zeros without dividing by zero" in {
    val z = Seq((0L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val row = Quantize.scalarQuantize(z, "vec_id", "embedding").collect().head
    row.getAs[Double]("amax") shouldBe 0.0
    row.getSeq[Double](row.fieldIndex("qvec")).toSet shouldBe Set(0.0)
  }

  it should "preserve exact-cosine neighbor recall at int8 precision" in {
    val queries = corpus.filter($"vec_id" < 8)
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 10)
    val quant = Quantize.topK(corpus, queries, "vec_id", "embedding", k = 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (e, q) = (pairs(exact), pairs(quant))
    // int8 quantization perturbs near-tie ranks only: recall@10 >= 0.9
    val recall = (e & q).size.toDouble / e.size
    recall should be >= 0.9
  }

  it should "reduce ivfTopK to quantized brute force when probing all cells" in {
    // With nprobe = nlist the cell pruning admits every (qid, cell) pair,
    // so the composed path must equal Quantize.topK exactly — rank for
    // rank, not just as sets. This pins the composition glue (assignment
    // keeps every row, quantize-after-assign, probe join, shared kernel)
    // independent of the d11 oracle fixture.
    val queries = corpus.filter($"vec_id" < 8)
    val model = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", model)
    val composed = Quantize.ivfTopK(assigned, queries, "vec_id", "embedding",
      model, k = 10, nprobe = 4)
    val brute = Quantize.topK(corpus, queries, "vec_id", "embedding", k = 10)
    rowsOf(composed, "qid", "rank", "nid") shouldBe
      rowsOf(brute, "qid", "rank", "nid")
  }

  it should "serve int8 cell-partitioned storage identically to ivfTopK" in {
    // the full at-scale read path: cid-partitioned parquet with
    // array<tinyint> vectors → partition-pruned scan → lossless cast back
    // → exact integer rerank. Must equal the in-memory composed path rank
    // for rank (the tinyint round-trip is exact by construction).
    val dir = java.nio.file.Files.createTempDirectory("ivf_int8").toString
    val queries = corpus.filter($"vec_id" < 8)
    val model = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", model)
    Quantize.writeIvfQuantized(assigned, dir)
    // vectors really are int8 on disk, with amax for dequantization
    val onDisk = spark.read.parquet(dir).schema
    onDisk("qvec").dataType.simpleString shouldBe "array<tinyint>"
    onDisk("amax").dataType.simpleString shouldBe "double"
    val stored = Quantize.searchIvfQuantized(dir, queries,
      "vec_id", "embedding", model, k = 10, nprobe = 2)
    val mem = Quantize.ivfTopK(assigned, queries,
      "vec_id", "embedding", model, k = 10, nprobe = 2)
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(mem, "qid", "rank", "nid")
    // and the scan is partition-pruned on the probed cells
    val planStr = stored.queryExecution.sparkPlan.toString
    "PartitionFilters: \\[[^\\]]*cid#\\d+ ".r
      .findFirstIn(planStr) should not be empty
  }

  it should "keep recall with real pruning (nprobe < nlist)" in {
    val queries = corpus.filter($"vec_id" < 8)
    val model = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", model)
    val pruned = Quantize.ivfTopK(assigned, queries, "vec_id", "embedding",
      model, k = 10, nprobe = 2)
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding",
      k = 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (e, p) = (pairs(exact), pairs(pruned))
    (e & p).size.toDouble / e.size should be >= 0.8
  }

  it should "serve hierTopK identically to ivfTopK when the two-level rank covers all supers" in {
    // wassign = wprobe = nsuper ⇒ two-level assignment and probing see
    // every leaf, so the quantized scoring is bit-identical to the flat
    // path — the d40 composition's equivalence anchor
    val queries = corpus.filter($"vec_id" < 8)
    val model = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val h = graft.similarity.IvfHier.hierarchy(model, nsuper = 2)
    val assignedH = graft.similarity.IvfHier.assignHier(
      corpus, "vec_id", "embedding", h, wassign = 2)
    val hier = Quantize.hierTopK(assignedH, queries, "vec_id",
      "embedding", h, k = 5, wprobe = 2, nprobe = 2)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", model)
    val flat = Quantize.ivfTopK(assigned, queries, "vec_id", "embedding",
      model, k = 5, nprobe = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "nid").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    rows(hier) shouldBe rows(flat)
  }

  it should "serve hier-probed int8 storage identically to hierTopK with a pruned scan" in {
    // the d41 contract: the hier-assigned corpus goes through the SAME
    // cid-partitioned tinyint layout as the flat path (leaf cids are
    // flat cids), and the two-stage-probed cells push down as a
    // partition filter — the measured 100 TB configuration's read path
    val dir = java.nio.file.Files.createTempDirectory("ivf_int8_h").toString
    val queries = corpus.filter($"vec_id" < 8)
    val model = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val h = graft.similarity.IvfHier.hierarchy(model, nsuper = 2)
    val assignedH = graft.similarity.IvfHier.assignHier(
      corpus, "vec_id", "embedding", h, wassign = 1)
    Quantize.writeIvfQuantized(assignedH, dir)
    val stored = Quantize.searchIvfQuantizedHier(dir, queries,
      "vec_id", "embedding", h, k = 10, wprobe = 1, nprobe = 2)
    val mem = Quantize.hierTopK(assignedH, queries,
      "vec_id", "embedding", h, k = 10, wprobe = 1, nprobe = 2)
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(mem, "qid", "rank", "nid")
    val planStr = stored.queryExecution.sparkPlan.toString
    "PartitionFilters: \\[[^\\]]*cid#\\d+ ".r
      .findFirstIn(planStr) should not be empty
  }

  it should "serve a batched-append store identically to a one-shot write" in {
    // incremental ingestion: three batches against the frozen model must
    // produce a store the search cannot distinguish from one write —
    // per-vector quantization (amax per row) is what makes the stored
    // bytes batch-invariant
    val oneShot = java.nio.file.Files.createTempDirectory("ivf_one").toString
    val batched = java.nio.file.Files.createTempDirectory("ivf_app").toString
    val queries = corpus.filter($"vec_id" < 8)
    val model = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", model)
    Quantize.writeIvfQuantized(assigned, oneShot)
    Quantize.writeIvfQuantized(assigned.filter($"id" % 3 === 0), batched)
    Quantize.appendIvfQuantized(assigned.filter($"id" % 3 === 1), batched)
    Quantize.appendIvfQuantized(assigned.filter($"id" % 3 === 2), batched)
    // same stored rows cell for cell...
    rowsOf(spark.read.parquet(batched), "id", "cid", "amax") shouldBe
      rowsOf(spark.read.parquet(oneShot), "id", "cid", "amax")
    // ...and rank-identical search results
    val a = Quantize.searchIvfQuantized(batched, queries,
      "vec_id", "embedding", model, k = 10, nprobe = 2)
    val b = Quantize.searchIvfQuantized(oneShot, queries,
      "vec_id", "embedding", model, k = 10, nprobe = 2)
    rowsOf(a, "qid", "rank", "nid") shouldBe rowsOf(b, "qid", "rank", "nid")

    // offline compaction: the appended store's many small batch files
    // rewrite to ONE file per cell, rows and search ranks unchanged
    val compacted = java.nio.file.Files
      .createTempDirectory("ivf_cmp").toString
    graft.similarity.Ivf.compactPartitioned(spark, batched, compacted)
    def partFiles(root: String) = {
      val all = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        all.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(_.getParent.getFileName.toString).toSeq
      } finally all.close()
    }
    partFiles(batched).groupBy(identity).values
      .exists(_.size > 1) shouldBe true // the appends really fragmented
    partFiles(compacted).groupBy(identity).values
      .foreach(_.size shouldBe 1) // one file per cell after compaction
    rowsOf(spark.read.parquet(compacted), "id", "cid", "amax") shouldBe
      rowsOf(spark.read.parquet(batched), "id", "cid", "amax")
    val c = Quantize.searchIvfQuantized(compacted, queries,
      "vec_id", "embedding", model, k = 10, nprobe = 2)
    rowsOf(c, "qid", "rank", "nid") shouldBe rowsOf(b, "qid", "rank", "nid")
  }

  it should "delete victims in place, rewriting only their cells" in {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("ivf_del").toString
    val model = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", model)
    Quantize.writeIvfQuantized(assigned, dir)
    // victims: every third row — delete-after-write must equal
    // filter-before-write byte for byte (per-vector quantization)
    graft.similarity.Ivf.deletePartitioned(spark, dir,
      corpus.filter($"vec_id" % 3 === 0).select("vec_id"))
    val expectDir = java.nio.file.Files
      .createTempDirectory("ivf_del_exp").toString
    Quantize.writeIvfQuantized(assigned.filter($"id" % 3 =!= 0), expectDir)
    rowsOf(spark.read.parquet(dir), "id", "cid", "amax") shouldBe
      rowsOf(spark.read.parquet(expectDir), "id", "cid", "amax")
    // deleting EVERYTHING removes every cell directory (an empty store
    // has no parquet footers left to read — assert on the filesystem)
    graft.similarity.Ivf.deletePartitioned(spark, dir,
      corpus.select("vec_id"))
    val cellDirs = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      cellDirs.iterator().asScala
        .count(_.getFileName.toString.startsWith("cid=")) shouldBe 0
    } finally cellDirs.close()
    // no-op victim set leaves the store untouched
    graft.similarity.Ivf.deletePartitioned(spark, expectDir,
      corpus.filter($"vec_id" < 0).select("vec_id"))
    spark.read.parquet(expectDir).count() shouldBe
      corpus.filter($"vec_id" % 3 =!= 0).count()
  }

  it should "push the attribute filter beneath the pruned stored scan" in {
    // the tenant/attribute-constrained serving query: the predicate must
    // land INSIDE the probed-cells read — partition pruning on cid AND a
    // parquet PushedFilter on the stored attribute — and the results must
    // equal the in-memory filtered path (the d29 contract)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_filtered").toString
    val attributed = corpus.withColumn("lang",
      when($"vec_id" % 3 === 0, "en").otherwise("de"))
    val queries = attributed.filter($"vec_id" < 24 && $"lang" === "en")
    val model = graft.similarity.Ivf.sampleCentroids(
      attributed, "vec_id", "embedding", nlist = 4)
    // index from the FULL corpus (shared across tenants); the attribute
    // persists next to the codes
    val assigned = graft.similarity.Ivf.assign(
      attributed, "vec_id", "embedding", model, keep = Seq("lang"))
    Quantize.writeIvfQuantized(assigned, dir, attrCols = Seq("lang"))
    val stored = Quantize.searchIvfQuantized(dir, queries,
      "vec_id", "embedding", model, k = 5, nprobe = 2,
      filter = Some($"lang" === "en"))
    val mem = Quantize.ivfTopK(assigned.filter($"lang" === "en"),
      queries, "vec_id", "embedding", model, k = 5, nprobe = 2)
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(mem, "qid", "rank", "nid")
    // plan: cid partition-pruned AND the row filter pushed to parquet
    val planStr = stored.queryExecution.sparkPlan.toString
    "PartitionFilters: \\[[^\\]]*cid#\\d+ ".r
      .findFirstIn(planStr) should not be empty
    "PushedFilters: \\[[^\\]]*EqualTo\\(lang,en\\)".r
      .findFirstIn(planStr) should not be empty
    // filtered results really differ from the unfiltered store search
    // (the predicate is doing work inside the scan, not decoration)
    val unfiltered = Quantize.searchIvfQuantized(dir, queries,
      "vec_id", "embedding", model, k = 5, nprobe = 2)
    rowsOf(stored, "qid", "rank", "nid") should not be
      rowsOf(unfiltered, "qid", "rank", "nid")
    // every neighbor served is from the filtered slice
    stored.select("nid").distinct().collect().map(_.getLong(0))
      .forall(_ % 3 == 0) shouldBe true
  }

  it should "delete to a new path, leaving the source store untouched" in {
    // the live-serving-safe form: src never mutates (concurrent probes
    // stay consistent), untouched cells move as raw files, only victim
    // cells are rewritten; caller swaps src -> dst atomically
    val src = java.nio.file.Files.createTempDirectory("ivf_d2p_src")
      .toString
    val dst = java.nio.file.Files.createTempDirectory("ivf_d2p")
      .toString + "/next"
    val model = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", model)
    Quantize.writeIvfQuantized(assigned, src)
    val before = rowsOf(spark.read.parquet(src), "id", "cid", "amax")
    graft.similarity.Ivf.deleteToPath(spark, src, dst,
      corpus.filter($"vec_id" % 3 === 0).select("vec_id"))
    // dst behaves as if built from the survivors...
    val expectDir = java.nio.file.Files
      .createTempDirectory("ivf_d2p_exp").toString
    Quantize.writeIvfQuantized(assigned.filter($"id" % 3 =!= 0), expectDir)
    rowsOf(spark.read.parquet(dst), "id", "cid", "amax") shouldBe
      rowsOf(spark.read.parquet(expectDir), "id", "cid", "amax")
    // ...and src is byte-for-byte what it was
    rowsOf(spark.read.parquet(src), "id", "cid", "amax") shouldBe before
    // search over dst serves the survivor ranks
    val got = Quantize.searchIvfQuantized(dst,
      corpus.filter($"vec_id" < 8 && $"vec_id" % 3 =!= 0),
      "vec_id", "embedding", model, k = 5, nprobe = 2)
    val want = Quantize.searchIvfQuantized(expectDir,
      corpus.filter($"vec_id" < 8 && $"vec_id" % 3 =!= 0),
      "vec_id", "embedding", model, k = 5, nprobe = 2)
    rowsOf(got, "qid", "rank", "nid") shouldBe
      rowsOf(want, "qid", "rank", "nid")
  }
}
