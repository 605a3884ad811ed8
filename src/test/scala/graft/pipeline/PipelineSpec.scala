package graft.pipeline

import graft.SparkSpec
import graft.dedup.NearDup
import graft.similarity.Ann
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  behavior of "NearDup"

  it should "find planted near-duplicates with MinHash LSH, matching brute force" in {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = docs(
      1L -> base,
      2L -> (base + " extra"),                       // near-dup of 1
      3L -> "completely different words about spark catalyst tungsten plans",
      4L -> "another unrelated document with its own set of words here now",
      5L -> base.replace("quick", "rapid"))          // near-dup of 1
    val lsh = NearDup.minhashNearDuplicates(corpus, "doc_id", "text",
      threshold = 0.5).select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteAll = NearDup.bruteForceJaccardPairs(corpus, "doc_id", "text",
      threshold = 0.5)
    val brute = bruteAll.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteHigh = bruteAll.filter($"jaccard" >= 0.9).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    brute should contain((1L, 2L))
    // LSH contract: no false positives survive verification (⊆ brute),
    // and every high-similarity pair (≥ 0.9, the 8-hash/4-band design
    // point) is recalled; borderline pairs near 0.5 may legitimately miss.
    lsh.subsetOf(brute) shouldBe true
    bruteHigh.subsetOf(lsh) shouldBe true
    lsh should contain((1L, 2L))
  }

  it should "cap pathological LSH buckets when asked" in {
    val same = (1L to 20L).map(i => i -> "common shared boilerplate text repeated across every doc")
    val sig = NearDup.minhashSignatures(docs(same: _*), "doc_id", "text")
    NearDup.minhashCandidates(sig, 8, 4).count() shouldBe 190 // 20C2
    NearDup.minhashCandidates(sig, 8, 4, maxBucketSize = 5).count() shouldBe 0
  }

  it should "give identical docs hamming distance 0 under SimHash" in {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      3L -> "nothing in common with the others at all whatsoever truly")
    val pairs = NearDup.simhashNearDuplicates(corpus, "doc_id", "text",
      maxHamming = 3)
    rowsOf(pairs, "id_a", "id_b", "hamming_dist") shouldBe
      Set(Seq(1L, 2L, 0))
  }

  it should "dedup exactly on content" in {
    val out = NearDup.exactDedup(
      docs(1L -> "aa", 2L -> "bb", 3L -> "aa"), "doc_id", "text")
    rowsOf(out, "keep_id", "dup_count") shouldBe
      Set(Seq(1L, 2L), Seq(2L, 1L))
  }

  it should "drop incoming docs already seen by fingerprint" in {
    val seen = docs(1L -> "old news", 2L -> "other old text")
    val incoming = docs(10L -> "old news",      // seen → dropped
      11L -> "fresh content", 12L -> "fresh content") // within-batch dup kept
    val out = NearDup.incrementalDedup(
      incoming, "doc_id", "text", seen, "text")
    out.select("doc_id").as[Long].collect().sorted shouldBe Seq(11L, 12L)
  }

  it should "drop incoming near-dups of seen docs and within-batch (greedy)" in {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val seen = docs(2L -> base, 4L -> "seen corpus text unlike anything else")
    val incoming = docs(
      11L -> (base + " extra"),                      // near-dup of seen 2
      13L -> "genuinely fresh incoming document with new words entirely",
      15L -> "genuinely fresh incoming document with new words entirely yes",
      17L -> "totally distinct third incoming doc nothing shared with others")
    def run(sig: Option[org.apache.spark.sql.DataFrame]) =
      NearDup.incrementalMinhashDedup(incoming, "doc_id", "text",
          seen, "doc_id", "text", seenSignatures = sig, threshold = 0.5)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val recomputed = run(None)
    // 11 drops (cross hit vs seen 2); 15 drops (within-batch vs 13, greedy
    // keep-min); 13 and 17 survive.
    recomputed shouldBe Seq(13L, 17L)
    // the persisted-signature path (what a real ingest uses) is identical
    val persisted = NearDup.minhashSignatures(seen, "doc_id", "text")
    run(Some(persisted)) shouldBe recomputed
  }

  behavior of "Ann"

  it should "rank exact cosine neighbors correctly" in {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 3)
    out.orderBy("rank").select("nid").collect().map(_.getLong(0)).toSeq shouldBe
      Seq(2L, 3L, 4L)
  }

  it should "recover close neighbors through LSH buckets" in {
    val near = Seq(
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.tabulate(8)(i => if (i == 0) 0.9f else 1.0f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val out = Ann.lshTopK(near, near.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 1, dim = 8, planes = 4, tables = 4)
    out.collect().head.getAs[Long]("nid") shouldBe 2L
    val dups = Ann.cosineNearDuplicates(near, "vec_id", "embedding",
      dim = 8, threshold = 0.99)
    rowsOf(dups, "id_a", "id_b") shouldBe Set(Seq(1L, 2L))
  }

  behavior of "TextAnalysis"

  it should "predict languages from marker stopwords" in {
    val out = TextAnalysis.languageId(docs(
      1L -> "the cat and the dog of the house",
      2L -> "el gato y los perros es bueno",
      3L -> "der hund und die katze ist gut",
      4L -> "le chat et la maison est grande",
      5L -> "xyzzy plugh quux"), "doc_id", "text")
    rowsOf(out, "id", "pred_lang") shouldBe Set(
      Seq(1L, "en"), Seq(2L, "es"), Seq(3L, "de"), Seq(4L, "fr"),
      Seq(5L, "und"))
  }

  it should "compute quality metrics" in {
    val out = TextAnalysis.qualityScore(docs(1L -> "aa bb aa"), "doc_id", "text")
    val r = out.collect().head
    r.getAs[Long]("n_tokens") shouldBe 3L
    r.getAs[Long]("n_types") shouldBe 2L
    r.getAs[Double]("type_token_ratio") shouldBe (2.0 / 3.0)
    r.getAs[Double]("mean_token_len") shouldBe 2.0
  }

  it should "fingerprint deterministically" in {
    val out = TextAnalysis.fingerprint(docs(1L -> "ab"), "doc_id", "text")
    // (0*31 + 97)*31 + 98 = 3105
    out.collect().head.getAs[Long]("fingerprint") shouldBe 3105L
  }

  it should "measure OOV rates against the corpus's own top-K vocabulary" in {
    // counts: aa x4, bb x3, cc x2, zz x1 -> top-2 vocab = {aa, bb}
    val df = docs(
      1L -> "aa aa bb cc",
      2L -> "aa aa bb cc",
      3L -> "bb zz")
    val out = TextAnalysis.vocabCoverage(df, "doc_id", "text", topK = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate"))).toMap
    out(1L) shouldBe ((4L, 1L, 0.25))
    out(3L) shouldBe ((2L, 1L, 0.5))
  }

  it should "pin the vocabulary boundary tie by term order" in {
    // bb and cc tie at 2; top-2 = {aa, bb} (bb < cc)
    val df = docs(1L -> "aa aa bb cc", 2L -> "bb cc")
    val out = TextAnalysis.vocabCoverage(df, "doc_id", "text", topK = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_oov")).toMap
    out(2L) shouldBe 1L // cc is OOV, bb is not
  }

  it should "report NULL oov_rate for empty documents" in {
    val r = TextAnalysis.vocabCoverage(docs(1L -> ""), "doc_id", "text", 5)
      .collect().head
    r.getAs[Long]("n_tokens") shouldBe 0L
    r.isNullAt(r.fieldIndex("oov_rate")) shouldBe true
  }
}
