package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * arXiv:2302.03169): given a large RAW pool and a small TARGET corpus
  * exemplifying the distribution you want (curated text, a domain, a
  * quality tier), fit bag-of-hashed-n-gram models to both and rank each
  * pool document by its log importance weight
  * log w(x) = Σ_features [ln p_target(b) − ln p_raw(b)] — then keep a
  * weighted sample. The standard recipe for corpus-scale "make the crawl
  * look like the target" selection, and the natural next step past the
  * corpus-agnostic quality filters ([[QualityRules]], [[UnigramLm]]):
  * those score documents in isolation; DSIR scores them against an
  * explicit target distribution.
  *
  * Features are hashed unigrams AND bigrams (the paper's featurization):
  * bucket = polyhash(gram) mod B, so both models are bounded at B rows
  * regardless of vocabulary. Laplace-α=1 smoothing over buckets; every
  * log-likelihood is quantized to integer MICRO-NATS exactly like
  * [[NbClassifier]]/[[UnigramLm]] (lw = floor(ln(p)·1e6 + 0.5), a long),
  * so a document's log-weight is an exact, summation-order-free long sum
  * and the whole featurize → fit → weight → rank pipeline replays
  * bitwise in SQL (gate t56).
  *
  * Plan shape (the 100 TB story): fitting is one grouped count per side
  * (map-side combined; the shuffle carries ≤ B partial rows per side —
  * model size is CONSTANT in corpus size). Weighting aggregates each
  * pool document's hashed term frequencies first (one exchange on
  * (id, bucket), combiner-reduced), then left-joins the two broadcast
  * B-row models — document text never shuffles, and nothing here is
  * quadratic. Selection is one rank window (top-k) over the id-level
  * weight table.
  */
object Dsir {

  private def micronat(x: Column): Column =
    floor(x * lit(1000000.0) + lit(0.5)).cast("long")

  /** (id, bucket) occurrence rows: hashed unigrams + hashed bigrams of
    * the lower-cased whitespace tokens. Bigrams use the sliding form
    * (no short-input fallback — a 1-token document contributes its
    * unigram once, not twice).
    */
  private def occurrences(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    df.select(col(idCol).as("id"),
        explode(concat(toks, slidingFromTokens(toks, 2))).as("gram"))
      .select(col("id"), (polyHash(col("gram")) % numBuckets).as("bucket"))
  }

  /** Laplace-α=1 hashed-n-gram log-likelihood model of one corpus side:
    * (bucket, l<tag>) micro-nat rows for seen buckets plus a 1-row
    * fallback frame l<tag>0 = ln(1/(total + B)) for unseen buckets.
    * Both derive from ONE grouped count (the branches share its
    * exchange, as in [[UnigramLm]]) — no driver hop, model ≤ B rows.
    */
  private def fit(occ: DataFrame, numBuckets: Int,
      tag: String): (DataFrame, DataFrame) = {
    val counts = occ.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(coalesce(sum("cnt"), lit(0L)).as("tot"))
    val weights = counts.crossJoin(broadcast(total))
      .select(col("bucket"),
        micronat(log((col("cnt") + 1).cast("double")
          / (col("tot") + numBuckets).cast("double"))).as(s"l$tag"))
    val fallback = total.select(
      micronat(log(lit(1.0) / (col("tot") + numBuckets).cast("double")))
        .as(s"l${tag}0"))
    (weights, fallback)
  }

  /** Per-pool-document importance weights against the target corpus.
    * Documents with no tokens are omitted (no features — same policy as
    * [[UnigramLm.scoreDocs]]). Output: (idCol, n_feats — feature
    * occurrence count, logw — log importance weight in micro-nats; > 0
    * means "more target-like than pool-like").
    */
  def importanceWeights(pool: DataFrame, target: DataFrame, idCol: String,
      textCol: String, numBuckets: Int): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2: $numBuckets")
    val poolOcc = occurrences(pool, idCol, textCol, numBuckets)
    val (tw, tw0) = fit(
      occurrences(target, idCol, textCol, numBuckets), numBuckets, "t")
    val (rw, rw0) = fit(poolOcc, numBuckets, "r")
    poolOcc.groupBy("id", "bucket").agg(count(lit(1)).as("tf"))
      .join(broadcast(tw), Seq("bucket"), "left")
      .join(broadcast(rw), Seq("bucket"), "left")
      .crossJoin(broadcast(tw0))
      .crossJoin(broadcast(rw0))
      .groupBy("id")
      .agg(sum("tf").as("n_feats"),
        sum(col("tf") * (coalesce(col("lt"), col("lt0"))
          - coalesce(col("lr"), col("lr0")))).as("logw"))
      .select(col("id").as(idCol), col("n_feats"), col("logw"))
  }

  /** Deterministic selection: the `k` pool documents with the highest
    * importance weight, ties broken on id — the rank-replayable gate
    * path. Output adds (rank, selected); all pool rows are kept so the
    * caller sees the full ranking (filter on `selected` to subset).
    */
  def selectTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.orderBy(col("logw").desc, col(idCol))
    weights.withColumn("rank", row_number().over(w))
      .withColumn("selected", (col("rank") <= k).cast("int"))
  }

  /** Gumbel-top-k importance RESAMPLING — the paper's sampling-without-
    * replacement semantics (top-k selection over-concentrates on the
    * single most target-like mode; Gumbel perturbation draws a sample
    * proportional to w(x) instead). The Gumbel key is deterministic per
    * document — g = −ln(−ln(u)) with u = (hash(id)+0.5)/m from the
    * engine-portable polynomial hash — so the draw is reproducible
    * across runs and cluster sizes; it composes two ln's, so unlike the
    * single-ln micro-nat quantizations it is NOT guaranteed bitwise
    * across engines (float spec'd, not oracle-gated: DsirSpec).
    */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val m = 1000003L
    val u = ((col(idCol).cast("long") * lit(2654435761L)) % lit(m)
      + lit(0.5)) / lit(m.toDouble)
    val key = col("logw").cast("double") / lit(1000000.0) - log(-log(u))
    val w = Window.orderBy(desc("__gk"), col(idCol))
    weights.withColumn("__gk", key)
      .withColumn("rank", row_number().over(w))
      .withColumn("selected", (col("rank") <= k).cast("int"))
      .drop("__gk")
  }
}
