package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ann, Ivf, MaxSim}
import org.apache.spark.sql.functions._

/** Late-interaction MaxSim: kernel semantics against a driver-side
  * replay, degenerate m = 1 equivalence with single-vector cosine,
  * pruned-vs-brute recall, and the zero-token guard.
  */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rng = new scala.util.Random(7)
    (0 until 60).map { i =>
      val c = i % 3
      val base = Array.tabulate(16)(d => if (d == 5 * c) 8.0f else 0.0f)
      (i.toLong, base.map(v => v + rng.nextFloat()))
    }.toDF("vec_id", "embedding")
  }

  "MaxSim.score" should "match a driver-side replay of the kernel" in {
    val q = corpus.filter($"vec_id" < 3)
    val got = MaxSim.bruteTopK(corpus, q, "vec_id", "embedding",
        dim = 16, m = 4, k = 60)
      .select("qid", "nid", "maxsim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // driver replay: slice, normalize, sum-of-max-dots in token order
    val rows = corpus.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def toks(v: Array[Double]): Seq[Array[Double]] =
      (0 until 4).map { t =>
        val tk = v.slice(t * 4, t * 4 + 4)
        val n = math.sqrt(tk.map(x => x * x).sum)
        if (n == 0.0) tk.map(_ => 0.0) else tk.map(_ / n)
      }
    def dotd(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    for (((qid, nid), s) <- got) {
      val want = toks(rows(qid))
        .foldLeft(0.0)((acc, qt) =>
          acc + toks(rows(nid)).map(dotd(qt, _)).max)
      s shouldBe want +- 1e-12
    }
  }

  it should "reduce to single-vector cosine at m = 1" in {
    // one token = the whole normalized vector, so MaxSim = cosine and
    // the rank order must equal Ann.bruteForceTopK's exactly
    val q = corpus.filter($"vec_id" < 4)
    val ms = MaxSim.bruteTopK(corpus, q, "vec_id", "embedding",
      dim = 16, m = 1, k = 10)
    val cos = Ann.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 10)
    rowsOf(ms, "qid", "rank", "nid") shouldBe
      rowsOf(cos, "qid", "rank", "nid")
  }

  it should "equal brute MaxSim when probing all cells" in {
    val q = corpus.filter($"vec_id" < 4)
    val model = Ivf.sampleCentroids(corpus, "vec_id", "embedding",
      nlist = 3)
    val pruned = MaxSim.ivfTopK(corpus, q, "vec_id", "embedding",
      model, dim = 16, m = 4, k = 10, nprobe = 3)
    val brute = MaxSim.bruteTopK(corpus, q, "vec_id", "embedding",
      dim = 16, m = 4, k = 10)
    rowsOf(pruned, "qid", "rank", "nid") shouldBe
      rowsOf(brute, "qid", "rank", "nid")
  }

  it should "keep in-cluster recall under real pruning" in {
    val q = corpus.filter($"vec_id" < 4)
    val model = Ivf.sampleCentroids(corpus, "vec_id", "embedding",
      nlist = 3)
    val pruned = MaxSim.ivfTopK(corpus, q, "vec_id", "embedding",
      model, dim = 16, m = 4, k = 5, nprobe = 1)
    val brute = MaxSim.bruteTopK(corpus, q, "vec_id", "embedding",
      dim = 16, m = 4, k = 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (p, b) = (pairs(pruned), pairs(brute))
    ((p & b).size.toDouble / b.size) should be >= 0.6
  }

  it should "serve the stored tokenized corpus identically to ivfTopK" in {
    val dir = java.nio.file.Files.createTempDirectory("maxsim_st").toString
    val attributed = corpus.withColumn("lang",
      when($"vec_id" % 3 === 0, "en").otherwise("de"))
    val q = corpus.filter($"vec_id" < 4)
    val model = Ivf.sampleCentroids(corpus, "vec_id", "embedding",
      nlist = 3)
    val assigned = Ivf.assign(attributed, "vec_id", "embedding", model,
      keep = Seq("lang"))
    MaxSim.writeIvf(assigned, dir, dim = 16, m = 4,
      attrCols = Seq("lang"))
    val stored = MaxSim.searchIvfStored(dir, q, "vec_id", "embedding",
      model, dim = 16, m = 4, k = 5, nprobe = 2)
    val mem = MaxSim.ivfTopK(corpus, q, "vec_id", "embedding", model,
      dim = 16, m = 4, k = 5, nprobe = 2)
    rowsOf(stored, "qid", "rank", "nid") shouldBe
      rowsOf(mem, "qid", "rank", "nid")
    // pruned scan + the filtered-serving contract on this arm too
    val planStr = stored.queryExecution.sparkPlan.toString
    "PartitionFilters: \\[[^\\]]*cid#\\d+ ".r
      .findFirstIn(planStr) should not be empty
    val filtered = MaxSim.searchIvfStored(dir, q, "vec_id", "embedding",
      model, dim = 16, m = 4, k = 5, nprobe = 2,
      filter = Some($"lang" === "en"))
    filtered.select("nid").distinct().collect().map(_.getLong(0))
      .forall(_ % 3 == 0) shouldBe true
    "PushedFilters: \\[[^\\]]*EqualTo\\(lang,en\\)".r
      .findFirstIn(filtered.queryExecution.sparkPlan.toString) should
      not be empty
  }

  it should "score bit-identically to the HOF reference formulation" in {
    // the X159 discipline: the compiled kernel carries its interpreted
    // twin in-tree and the spec pins equality BITWISE — same dots, same
    // fold order, same null contract
    val toksed = MaxSim.tokenize(corpus, "vec_id", "embedding",
      dim = 16, m = 4)
    val q = toksed.filter($"id" < 5)
      .select($"id".as("qid"), $"toks".as("qtoks"))
    val pairs = q.crossJoin(
      broadcast(toksed.select($"id".as("nid"), $"toks".as("ntoks"))))
    val both = pairs.select($"qid", $"nid",
      MaxSim.score($"qtoks", $"ntoks").as("compiled"),
      MaxSim.scoreHof($"qtoks", $"ntoks").as("hof"))
    both.filter(!($"compiled" <=> $"hof")).count() shouldBe 0
    // null contract: null/mismatched doc tokens skipped by the max;
    // an all-null doc side nulls the score; empty query side scores 0
    val edge = Seq(
      (1L, Seq(Seq(1.0, 0.0)), Seq(Seq(1.0, 0.0), null)),
      (2L, Seq(Seq(1.0, 0.0)), Seq[Seq[Double]](null)),
      (3L, Seq.empty[Seq[Double]], Seq(Seq(1.0, 0.0))),
      (4L, Seq(Seq(1.0, 0.0)), Seq(Seq(1.0))))
      .toDF("id", "qt", "dt")
    val got = edge.select($"id",
        MaxSim.score($"qt", $"dt").as("c"),
        MaxSim.scoreHof($"qt", $"dt").as("h"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    got(1L) shouldBe ((Some(1.0), Some(1.0))) // null dt skipped
    got(2L) shouldBe ((None, None))           // no valid dot -> null
    got(3L) shouldBe ((Some(0.0), Some(0.0))) // empty q -> the zero
    got(4L) shouldBe ((None, None))           // length mismatch -> null
  }

  it should "zero out all-zero token slices instead of dividing by zero" in {
    val z = Seq(
      (0L, Array.fill(8)(0.0f)),
      (1L, Array.tabulate(8)(d => if (d < 4) 1.0f else 0.0f)),
      (2L, Array.tabulate(8)(d => if (d >= 4) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val got = MaxSim.bruteTopK(z, z.filter($"vec_id" === 1), "vec_id",
        "embedding", dim = 8, m = 2, k = 2)
      .select("nid", "maxsim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got(0L) shouldBe 0.0 // all-zero doc contributes nothing, no NaN
    // cross-position token matching IS the point of late interaction:
    // q's first token [1,1,1,1] finds doc 2's SECOND token exactly
    // (dot 1.0) even though the packed vectors are orthogonal —
    // single-vector cosine would score this pair 0
    got(2L) shouldBe 1.0 +- 1e-12
  }
}
