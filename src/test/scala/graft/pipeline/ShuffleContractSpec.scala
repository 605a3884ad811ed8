package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zero-shuffle CONTRACTS for the documented map-only operators — the
  * properties the 100 TB design leans on hardest: these stages run at
  * corpus scale, so "no exchange" is not an optimization note, it is the
  * difference between a scan-speed pass and a corpus-wide shuffle. Bench
  * emits per-query `shuffle_mb`, but nothing FAILED when a map-only
  * operator grew an exchange (an innocuous-looking `.distinct()`, a
  * window, a non-broadcast join in a refactor) — a regression would
  * surface only in round-over-round artifact review. This spec pins each
  * contract in `sbt test` using the AQE-aware plan walk
  * (`Bucketing.hasShuffle` — finalized physical plan, ReusedExchange
  * unwrapped), on the real sf0.001 tables so pruning/pushdown shapes
  * match the gates.
  *
  * Contracts covered (the r11 verdict's list):
  *   - t30 `Chunking.chunkByTokens` — tokens/starts/slices are codegen
  *     HOFs, one Generate, no exchange
  *   - t42 `CodeDetect.score` — pure per-row string expressions
  *   - t15 `Redact.scrub` — ordered regex scrub, per-row
  *   - X56 `Projection.project` — literal sign rows, codegen'd dots
  *   - X56 serving twin `NbClassifier.scoreCompiled` — model compiled to
  *     plan literals, scoring is one per-row expression
  *   - t54 `Bpe.applyMergesBytes` — stored-table encode is a pure fold
  *   - X155 `IvfHier.{assignHier, probesHier}` — both two-level stages
  *     are in-row array math over literal centroid tables; probing
  *     especially (the flat `Ivf.probes` pays a rank-window exchange)
  *   - X156 `Pq.encode` — the corpus-scale PQ pass (argmin per subspace
  *     over the codebook literal + the csqn fold) is one map stage
  *   - X158 `Pq.encodeResidual` — IVF assign + residual subtraction +
  *     code argmin + reconstruction norm fuse into ONE map stage
  *   - X159 `Ivf.{assign, probes}` — the r15 compiled `NearestCells`
  *     rank: flat probing lost its broadcast join + rank-window
  *     exchange, so BOTH flat stages are now one map pass
  *   - X160 `UnigramTok.segment` — the compiled Viterbi DP is one
  *     per-row expression (the E-step's only exchange is its
  *     piece-count aggregation, bounded by the live vocabulary)
  *   - X161/d37 `BinaryQuant.encode` over an IVF-assigned corpus — the
  *     cell-pruned Hamming layout's corpus pass (assign + hyperplane
  *     dots + bit pack) is one map stage
  */
class ShuffleContractSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def tbl(name: String): DataFrame =
    graft.queries.GateQuery.table(spark, sfDir, name)

  private def assertMapOnly(df: DataFrame): Unit =
    graft.core.Bucketing.hasShuffle(df) shouldBe false

  "chunkByTokens (t30)" should "stay map-only on the documents table" in {
    assertMapOnly(graft.text.Chunking.chunkByTokens(
      tbl("documents"), "doc_id", "text",
      windowTokens = 20, strideTokens = 10))
  }

  "CodeDetect.score (t42)" should "stay map-only on the documents table" in {
    assertMapOnly(graft.text.CodeDetect.score(
      tbl("documents").select("doc_id", "text"), "text"))
  }

  "Redact.scrub (t15)" should "stay map-only on the events-derived text" in {
    // the t15 gate's exact input shape: props JSON + derived addresses
    val ev = tbl("events")
      .filter(col("event_id") % 11 === 0)
      .withColumn("text", concat(
        col("props"), lit(" from 10."),
        (col("user_id") % 200).cast("string"), lit(".0."),
        (col("event_id") % 250).cast("string"), lit(" by user"),
        col("user_id").cast("string"), lit("@example.com")))
    assertMapOnly(graft.text.Redact.scrub(ev, "text"))
  }

  "Projection.project (X56)" should "stay map-only on the embeddings" in {
    assertMapOnly(graft.similarity.Projection.project(
      tbl("embeddings"), "embedding", inDim = 64, outDim = 16, "proj"))
  }

  "NbClassifier.scoreCompiled (X56 twin)" should "stay map-only" in {
    val train = Seq(
      ("code", "def main return if else"),
      ("code", "class void static return"),
      ("prose", "the quick brown fox jumps"),
      ("prose", "over the lazy dog again")).toDF("label", "text")
    val compiled = graft.text.NbClassifier.compile(
      graft.text.NbClassifier.train(train, "label", "text",
        numBuckets = 64), numBuckets = 64)
    assertMapOnly(graft.text.NbClassifier.scoreCompiled(
      tbl("documents").select("doc_id", "text"), "doc_id", "text",
      compiled))
  }

  "Bpe.applyMergesBytes (t54 serving)" should "stay map-only" in {
    val words = tbl("documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("tok"))
    assertMapOnly(graft.text.Bpe.applyMergesBytes(
      words, "tok", Seq(("74", "68"), ("7468", "65"))))
  }

  "IvfHier assign + probes (X155)" should "stay map-only on embeddings" in {
    val e = tbl("embeddings")
    val h = graft.similarity.IvfHier.hierarchy(
      graft.similarity.Ivf.sampleCentroids(e, "vec_id", "embedding",
        nlist = 16), nsuper = 4)
    assertMapOnly(graft.similarity.IvfHier.assignHier(
      e, "vec_id", "embedding", h, wassign = 2))
    assertMapOnly(graft.similarity.IvfHier.probesHier(
      e, "vec_id", "embedding", h, wprobe = 2, nprobe = 2))
  }

  "Pq.encode (X156)" should "stay map-only on embeddings" in {
    val e = tbl("embeddings")
    val cb = graft.similarity.Pq.sampleCodebooks(
      e, "vec_id", "embedding", m = 4, ksub = 8)
    assertMapOnly(graft.similarity.Pq.encode(e, "vec_id", "embedding", cb))
  }

  "Pq.encodeResidual (X158)" should "stay map-only including the IVF assignment" in {
    val e = tbl("embeddings")
    val ivf = graft.similarity.Ivf.sampleCentroids(
      e, "vec_id", "embedding", nlist = 8)
    val assigned = graft.similarity.Ivf.assign(e, "vec_id", "embedding", ivf)
    val cb = graft.similarity.Pq.sampleResidualCodebooks(
      assigned, ivf, m = 4, ksub = 8)
    // assign → residual → code → reconstruction norm: one map stage
    assertMapOnly(graft.similarity.Pq.encodeResidual(assigned, ivf, cb))
  }

  "Ivf.probes (X159)" should "stay map-only — the r15 compiled rank removed the window exchange" in {
    val e = tbl("embeddings")
    val model = graft.similarity.Ivf.sampleCentroids(
      e, "vec_id", "embedding", nlist = 8)
    assertMapOnly(graft.similarity.Ivf.probes(
      e, "vec_id", "embedding", model, nprobe = 2))
    assertMapOnly(graft.similarity.Ivf.assign(
      e, "vec_id", "embedding", model))
  }

  "BinaryQuant.encode over an IVF-assigned corpus (X161/d37)" should "stay map-only" in {
    // the d37 layout's corpus-scale pass: compiled IVF assign + hyperplane
    // dots + bit pack fuse into one map stage — at 100 TB this is the
    // difference between a scan-speed encode and a corpus shuffle
    val e = tbl("embeddings")
    val ivf = graft.similarity.Ivf.sampleCentroids(
      e, "vec_id", "embedding", nlist = 8)
    val assigned = graft.similarity.Ivf.assign(e, "vec_id", "embedding", ivf)
    assertMapOnly(graft.similarity.BinaryQuant.encode(
      assigned, "id", "vec", dim = 64, bits = 16))
  }

  "UnigramTok.segment (X160)" should "stay map-only on the word census shape" in {
    val words = Seq(("alpha", 3L), ("beta", 2L)).toDF("word", "wcnt")
    val vocab = graft.functions.expressions.VocabTable(
      "alpha bet a l p h b e t".split(" ").map(_ -> 100L).toMap)
    assertMapOnly(words.select(
      graft.text.UnigramTok.segment($"word", vocab)))
  }
}
