package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ann, BinaryQuant, Projection}
import org.apache.spark.sql.functions._

class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  // four well-separated clusters in 16d (the Pq fixture geometry, widened
  // so 16 hyperplane sign columns distinguish all four dominant dims —
  // at 8 planes dims 0 and 6 share a sign column and clusters 0/3 alias)
  private def corpus = {
    val rng = new scala.util.Random(13)
    (0 until 80).map { i =>
      val c = i % 4
      val base = Array.tabulate(16)(d => if (d == 2 * c) 10.0f else 0.0f)
      (i.toLong, base.map(v => v + rng.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  // driver-side pack replay over Spark-computed projected coordinates:
  // pack is pure integer logic on the dot signs, so replaying it on the
  // engine's own dots isolates the packing contract from IEEE concerns
  private def packWords(pv: Seq[Double], bits: Int): Seq[Long] =
    (0 until BinaryQuant.numWords(bits)).map { w =>
      pv.slice(w * 32, w * 32 + 32)
        .foldLeft(0L)((acc, p) => acc * 2L + (if (p > 0.0) 1L else 0L))
    }

  private def projBits(df: org.apache.spark.sql.DataFrame, dim: Int,
      bits: Int): Map[Long, Seq[Double]] =
    Projection.project(df, "embedding", dim, bits, "pv")
      .select("vec_id", "pv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  "encode" should "pack hyperplane sign bits into 32-bit words, map-only" in {
    val enc = BinaryQuant.encode(corpus, "vec_id", "embedding",
      dim = 16, bits = 16)
    graft.core.Bucketing.hasShuffle(enc) shouldBe false
    val proj = projBits(corpus, 16, 16)
    val rows = enc.select("vec_id", "bcode").collect()
    rows.length shouldBe 80
    rows.foreach { r =>
      val words = r.getSeq[Long](1)
      words shouldBe packWords(proj(r.getLong(0)), 16)
      words.foreach { w => w should (be >= 0L and be < (1L << 32)) }
    }
    // pass-through columns survive (IVF composition)
    enc.columns should contain allOf ("vec_id", "embedding")
  }

  it should "span multiple words past 32 bits, partial last word low-packed" in {
    val rng = new scala.util.Random(7)
    val df40 = (0 until 12).map { i =>
      (i.toLong, Array.fill(40)(rng.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val enc = BinaryQuant.encode(df40, "vec_id", "embedding",
      dim = 40, bits = 40)
    val proj = projBits(df40, 40, 40)
    val rows = enc.select("vec_id", "bcode").collect()
    rows.length shouldBe 12
    rows.foreach { r =>
      val words = r.getSeq[Long](1)
      words.length shouldBe 2
      words shouldBe packWords(proj(r.getLong(0)), 40)
      words(1) should be < 256L // 40 - 32 = 8 bits, low positions
    }
  }

  "hamming" should "count differing sign bits exactly" in {
    val enc = BinaryQuant.encode(corpus, "vec_id", "embedding",
      dim = 16, bits = 16)
    val signs = projBits(corpus, 16, 16)
      .map { case (id, pv) => id -> pv.map(_ > 0.0) }
    val a = enc.select(col("vec_id").as("ida"), col("bcode").as("ca"))
    val b = enc.select(col("vec_id").as("idb"), col("bcode").as("cb"))
    val hd = a.join(b, col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        BinaryQuant.hamming(col("ca"), col("cb")).as("hd"))
      .collect()
    hd.length shouldBe 80 * 79 / 2
    hd.foreach { r =>
      val expect = signs(r.getLong(0)).zip(signs(r.getLong(1)))
        .count { case (x, y) => x != y }
      r.getLong(2) shouldBe expect.toLong
    }
  }

  "searchHamming" should "equal brute force when the shortlist covers the corpus" in {
    val q = corpus.filter($"vec_id" < 4)
    val enc = BinaryQuant.encode(corpus, "vec_id", "embedding",
      dim = 16, bits = 16)
    val res = BinaryQuant.searchHamming(enc, corpus, q, "vec_id",
      "embedding", dim = 16, bits = 16, k = 5, shortlist = 79)
    val brute = Ann.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 5)
    rowsOf(res, "qid", "rank", "nid") shouldBe
      rowsOf(brute, "qid", "rank", "nid")
  }

  it should "recover in-cluster neighbors from a narrow Hamming shortlist" in {
    val q = corpus.filter($"vec_id" < 4)
    val enc = BinaryQuant.encode(corpus, "vec_id", "embedding",
      dim = 16, bits = 16)
    val res = BinaryQuant.searchHamming(enc, corpus, q, "vec_id",
      "embedding", dim = 16, bits = 16, k = 5, shortlist = 10)
    val rows = res.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe 20
    // in-cluster codes are identical (hd 0, noise < the 10.0 separation);
    // the nearest foreign cluster sits at hd >= 5, so a 10-wide shortlist
    // never leaves the cluster
    rows.foreach { case (qid, nid) => nid % 4 shouldBe qid % 4 }
  }

  "searchIvfHamming" should "equal the flat Hamming search when probing every cell" in {
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val encA = BinaryQuant.encode(assigned, "id", "vec",
      dim = 16, bits = 16)
    val res = BinaryQuant.searchIvfHamming(encA, corpus, q, "vec_id",
      "embedding", ivf, dim = 16, bits = 16, k = 5, nprobe = 4,
      shortlist = 79)
    val enc = BinaryQuant.encode(corpus, "vec_id", "embedding",
      dim = 16, bits = 16)
    val flat = BinaryQuant.searchHamming(enc, corpus, q, "vec_id",
      "embedding", dim = 16, bits = 16, k = 5, shortlist = 79)
    rowsOf(res, "qid", "rank", "nid") shouldBe
      rowsOf(flat, "qid", "rank", "nid")
  }

  it should "recover in-cluster neighbors from pruned cells" in {
    val q = corpus.filter($"vec_id" < 4)
    // nlist = 5, not 4: the 4 hash-smallest rows cover only clusters
    // {0,1,3}, leaving cluster 2's rows scattered across foreign cells.
    // The fifth sample adds cluster 2's centroid — but it also gives
    // cluster 0 TWO centroids (rows 0 and 68), splitting its 20 rows
    // across two cells, so nprobe = 2 below: pruning still drops ≥ 3 of
    // 5 cells while every query's probed pair covers its cluster.
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 5)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val encA = BinaryQuant.encode(assigned, "id", "vec",
      dim = 16, bits = 16)
    val res = BinaryQuant.searchIvfHamming(encA, corpus, q, "vec_id",
      "embedding", ivf, dim = 16, bits = 16, k = 5, nprobe = 2,
      shortlist = 10)
    val rows = res.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe 20
    rows.foreach { case (qid, nid) => nid % 4 shouldBe qid % 4 }
  }

  "searchIvfHammingHier" should "equal the flat IVF search when the two-level rank covers all supers" in {
    // wassign = wprobe = nsuper ⇒ the two-level rank sees every leaf, so
    // assignment, probing, codes, shortlist, and rerank are
    // bit-identical to the flat IVF path — the d39 composition's
    // equivalence anchor (the PqSpec d38 case, binary arm)
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val h = graft.similarity.IvfHier.hierarchy(ivf, nsuper = 2)
    val assignedH = graft.similarity.IvfHier.assignHier(
      corpus, "vec_id", "embedding", h, wassign = 2)
    val encH = BinaryQuant.encode(assignedH, "id", "vec",
      dim = 16, bits = 16)
    val hier = BinaryQuant.searchIvfHammingHier(encH, corpus, q,
      "vec_id", "embedding", h, dim = 16, bits = 16, k = 5, wprobe = 2,
      nprobe = 2, shortlist = 10)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val encF = BinaryQuant.encode(assigned, "id", "vec",
      dim = 16, bits = 16)
    val flat = BinaryQuant.searchIvfHamming(encF, corpus, q, "vec_id",
      "embedding", ivf, dim = 16, bits = 16, k = 5, nprobe = 2,
      shortlist = 10)
    rowsOf(hier, "qid", "rank", "nid") shouldBe
      rowsOf(flat, "qid", "rank", "nid")
  }

  "WordsToCode/CodeToWords" should "round-trip packed codes at ceil(bits/8) bytes" in {
    // the on-disk layout contract: full words big-endian in 4 bytes, the
    // last word's low r bits in ceil(r/8) bytes — exercised across word
    // boundaries (multi-word, partial last word, sub-byte code)
    import graft.functions.expressions.{CodeToWords, WordsToCode}
    for (bits <- Seq(1, 7, 8, 16, 32, 33, 40, 64)) {
      val dim = math.max(bits, 16)
      val rng = new scala.util.Random(bits)
      val df = (0 until 10).map { i =>
        (i.toLong, Array.fill(dim)(rng.nextFloat() * 2f - 1f))
      }.toDF("vec_id", "embedding")
      val enc = BinaryQuant.encode(df, "vec_id", "embedding", dim, bits)
      val rt = enc.select($"vec_id", $"bcode",
        graft.core.Graft.column(WordsToCode(
          graft.core.Graft.expression($"bcode"), bits)).as("code"))
        .select($"vec_id", $"bcode", $"code",
          graft.core.Graft.column(CodeToWords(
            graft.core.Graft.expression($"code"), bits)).as("back"))
      rt.collect().foreach { r =>
        r.getAs[Array[Byte]]("code").length shouldBe (bits + 7) / 8
        r.getSeq[Long](r.fieldIndex("back")) shouldBe
          r.getSeq[Long](r.fieldIndex("bcode"))
      }
    }
  }

  "searchIvfBinary" should "serve cid-partitioned binary storage identically to the in-memory path" in {
    // the 100 TB binary read path: BINARY codes of bits/8 bytes in a
    // cid-partitioned store → partition-pruned scan → lossless decode →
    // identical shortlist + rerank (the QuantizeSpec d16 pattern)
    val dir = java.nio.file.Files.createTempDirectory("ivf_bin").toString
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      corpus, "vec_id", "embedding", ivf)
    val enc = BinaryQuant.encode(assigned, "id", "vec",
      dim = 16, bits = 16)
    BinaryQuant.writeIvfBinary(enc, dir, bits = 16)
    // codes really are 2-byte BINARY on disk
    val onDisk = spark.read.parquet(dir)
    onDisk.schema("code").dataType.simpleString shouldBe "binary"
    onDisk.select(expr("max(length(code))")).head().getInt(0) shouldBe 2
    // batched ingestion (the d44 discipline on the binary arm): rewrite
    // the store in two batches — codes are per-row, so the stored bytes
    // must be batch-invariant
    BinaryQuant.writeIvfBinary(enc.filter($"id" % 2 === 0), dir, bits = 16)
    BinaryQuant.appendIvfBinary(enc.filter($"id" % 2 =!= 0), dir, bits = 16)
    rowsOf(spark.read.parquet(dir), "id", "cid") shouldBe
      rowsOf(enc.select("id", "cid"), "id", "cid")
    val stored = BinaryQuant.searchIvfBinary(dir, corpus, q, "vec_id",
      "embedding", ivf, dim = 16, bits = 16, k = 5, nprobe = 2,
      shortlist = 10)
    val mem = BinaryQuant.searchIvfHamming(enc, corpus, q, "vec_id",
      "embedding", ivf, dim = 16, bits = 16, k = 5, nprobe = 2,
      shortlist = 10)
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(mem, "qid", "rank", "nid")
    // and the scan is partition-pruned on the probed cells
    val planStr = stored.queryExecution.sparkPlan.toString
    "PartitionFilters: \\[[^\\]]*cid#\\d+ ".r
      .findFirstIn(planStr) should not be empty
  }

  "searchIvfBinaryHier" should "serve the stored hier path identically to searchIvfHammingHier" in {
    val dir = java.nio.file.Files.createTempDirectory("ivf_bin_h").toString
    val q = corpus.filter($"vec_id" < 4)
    val ivf = graft.similarity.Ivf.sampleCentroids(
      corpus, "vec_id", "embedding", nlist = 4)
    val h = graft.similarity.IvfHier.hierarchy(ivf, nsuper = 2)
    val assignedH = graft.similarity.IvfHier.assignHier(
      corpus, "vec_id", "embedding", h, wassign = 1)
    val encH = BinaryQuant.encode(assignedH, "id", "vec",
      dim = 16, bits = 16)
    BinaryQuant.writeIvfBinary(encH, dir, bits = 16)
    val stored = BinaryQuant.searchIvfBinaryHier(dir, corpus, q,
      "vec_id", "embedding", h, dim = 16, bits = 16, k = 5, wprobe = 1,
      nprobe = 2, shortlist = 10)
    val mem = BinaryQuant.searchIvfHammingHier(encH, corpus, q,
      "vec_id", "embedding", h, dim = 16, bits = 16, k = 5, wprobe = 1,
      nprobe = 2, shortlist = 10)
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(mem, "qid", "rank", "nid")
  }

  it should "push an attribute filter beneath the pruned binary scan" in {
    // the d51 filter contract on the binary arm: attribute persisted
    // next to the codes, predicate inside the probed-cells read, results
    // equal to filtering the in-memory encoded corpus (post-filter
    // semantics — the index is the full corpus's)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_bin_f").toString
    val attributed = corpus.withColumn("lang",
      when($"vec_id" % 3 === 0, "en").otherwise("de"))
    val q = attributed.filter($"vec_id" < 6 && $"lang" === "en")
    val ivf = graft.similarity.Ivf.sampleCentroids(
      attributed, "vec_id", "embedding", nlist = 4)
    val assigned = graft.similarity.Ivf.assign(
      attributed, "vec_id", "embedding", ivf, keep = Seq("lang"))
    val enc = BinaryQuant.encode(assigned, "id", "vec",
      dim = 16, bits = 16)
    BinaryQuant.writeIvfBinary(enc, dir, bits = 16,
      attrCols = Seq("lang"))
    val stored = BinaryQuant.searchIvfBinary(dir, corpus, q, "vec_id",
      "embedding", ivf, dim = 16, bits = 16, k = 5, nprobe = 2,
      shortlist = 10, filter = Some($"lang" === "en"))
    val mem = BinaryQuant.searchIvfHamming(enc.filter($"lang" === "en"),
      corpus, q, "vec_id", "embedding", ivf, dim = 16, bits = 16,
      k = 5, nprobe = 2, shortlist = 10)
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(mem, "qid", "rank", "nid")
    stored.select("nid").distinct().collect().map(_.getLong(0))
      .forall(_ % 3 == 0) shouldBe true
    val planStr = stored.queryExecution.sparkPlan.toString
    "PushedFilters: \\[[^\\]]*EqualTo\\(lang,en\\)".r
      .findFirstIn(planStr) should not be empty
  }
}
