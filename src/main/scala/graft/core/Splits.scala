package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.polyHash

/** Deterministic dataset splitting — the train/val/test assignment step of
  * a training-data pipeline. The split is a pure function of (id, salt):
  * reproducible across runs, engines, and cluster layouts (unlike
  * randomSplit, whose assignment depends on partitioning), and stable
  * under corpus growth — a document keeps its split when new data
  * arrives, so eval sets never silently absorb training documents.
  *
  * Map-only: one projection over whatever scan the pipeline already does;
  * at 100 TB the assignment is free and the per-split reads are plain
  * filters that Catalyst pushes into the scan.
  */
object Splits {

  /** Internal salt suffix that separates `assign`'s hash domain from the
    * sampling functions' (see `assign` scaladoc). Public so external
    * replays (oracles, other engines) can reproduce the split.
    */
  val SplitDomain: String = "/split"

  /** Permille bucket in [0, 1000) from the rolling hash of the id
    * rendered as a string plus the salt (change the salt → an independent
    * re-split). The rolling hash is passed through one LCG permute step
    * before the mod: polyHash of SHORT numeric ids is far from uniform
    * mod 1000 (a rolling hash has no avalanche — "2" hashes to 50), and
    * the permute restores uniformity while staying exactly replayable in
    * any engine (same trick as the MinHash permutations).
    */
  def bucket(id: Column, salt: String): Column =
    ((polyHash(concat(id.cast("string"), lit(salt))) * lit(1103515245L)
      + lit(12345L)) % lit(graft.functions.TextFunctions.HashMod)) % 1000

  /** Adds `split_bucket` (permille) and `split` ∈ {train, val, test}.
    * test takes buckets [0, testPermille), val the next valPermille
    * buckets, train the rest.
    *
    * The hash is DOMAIN-SEPARATED from the sampling functions: assign
    * internally suffixes the salt with [[SplitDomain]], so sampling with
    * `stratifiedSample`/`temperatureSample` and then splitting with the
    * SAME salt (the natural call) draws two independent hashes. Without
    * the separation, survivors of a stratum damped to rate r all have
    * bucket < r, so any stratum with r ≤ testPermille+valPermille would
    * land entirely in val/test with zero train rows. An engine replaying
    * the split (the t09 oracle) must append the same suffix.
    */
  def assign(df: DataFrame, idCol: String, salt: String = "",
      valPermille: Int = 10, testPermille: Int = 10): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      "val/test permille must be non-negative and sum to at most 1000")
    val b = bucket(col(idCol), salt + SplitDomain)
    df.withColumn("split_bucket", b)
      .withColumn("split",
        when(col("split_bucket") < testPermille, "test")
          .when(col("split_bucket") < testPermille + valPermille, "val")
          .otherwise("train"))
  }

  def train(df: DataFrame, idCol: String, salt: String = "",
      valPermille: Int = 10, testPermille: Int = 10): DataFrame =
    assign(df, idCol, salt, valPermille, testPermille)
      .filter(col("split") === "train").drop("split", "split_bucket")

  def validation(df: DataFrame, idCol: String, salt: String = "",
      valPermille: Int = 10, testPermille: Int = 10): DataFrame =
    assign(df, idCol, salt, valPermille, testPermille)
      .filter(col("split") === "val").drop("split", "split_bucket")

  def test(df: DataFrame, idCol: String, salt: String = "",
      valPermille: Int = 10, testPermille: Int = 10): DataFrame =
    assign(df, idCol, salt, valPermille, testPermille)
      .filter(col("split") === "test").drop("split", "split_bucket")

  /** Stratified deterministic sampling: keep a row iff its hash bucket
    * falls under its stratum's permille rate ("sample 10% of the common
    * language, keep 100% of the rare ones" — the curation rebalance).
    * Same hash → same survivors on every run and every engine; unknown
    * strata fall back to `defaultPermille`. The rate table compiles to a
    * literal CASE — map-only, no join, rides the existing scan.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      permilleByStratum: Map[String, Int], defaultPermille: Int,
      salt: String = ""): DataFrame = {
    (permilleByStratum.values.toSeq :+ defaultPermille).foreach(p =>
      require(p >= 0 && p <= 1000, s"permille out of range: $p"))
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (s, p)) => when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), salt) < rate)
  }

  /** Token-budget sampling: keep documents per stratum, in deterministic
    * hash order, until the stratum's WEIGHT budget is exhausted — the
    * mixture-in-tokens counterpart of `stratifiedSample` (which fixes a
    * keep RATE): real training mixtures are specified as token counts per
    * source/language, and rate-based sampling only hits a token target in
    * expectation. A document survives iff the cumulative weight up to and
    * including it (ordered by (bucket(id, salt), id) within its stratum)
    * is ≤ the stratum's budget, so the survivor set is a pure function of
    * (data, salt, budgets): reproducible and engine-replayable (exact
    * long sums). These are PREFIX-cut semantics: the running sum includes
    * every earlier document in hash order, kept or not, so an overweight
    * document also shadows its successors (the survivors are "the longest
    * prefix that fits", not a greedy knapsack — the greedy variant's
    * running sum over only-kept rows is sequential state no window
    * expresses, and its survivor set would not be growth-stable).
    *
    * Plan: one window exchange on the stratum key (the cumulative sum),
    * with the budget table compiled to a literal CASE — no joins, no
    * second pass over the data.
    */
  def budgetSample(df: DataFrame, idCol: String, strataCol: String,
      weightCol: String, budgetByStratum: Map[String, Long],
      defaultBudget: Long, salt: String = ""): DataFrame = {
    (budgetByStratum.values.toSeq :+ defaultBudget).foreach(b =>
      require(b >= 0, s"negative budget: $b"))
    require(!df.columns.contains("__cum"),
      "input already has a '__cum' column (reserved)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(bucket(col(idCol), salt), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val budget = budgetByStratum.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(col(strataCol) === s, lit(b)).otherwise(acc)
    }
    df.withColumn("__cum", sum(col(weightCol).cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Temperature-weighted rebalancing: per-stratum keep rates computed
    * FROM the data — rate_s = (min_count / count_s)^(1/2^halvings), so
    * the rarest stratum is kept whole and dominant strata are damped
    * toward (halvings=0: exactly to) uniform. This is the corpus-mixing
    * move of multilingual training pipelines ("temperature sampling",
    * e.g. mC4/XLM-R): flatten the language distribution without
    * hand-tuning one rate per language.
    *
    * The exponent is restricted to 1/2^halvings on purpose: division and
    * sqrt are CORRECTLY-ROUNDED IEEE-754 ops (pow is not), so the
    * permille rate — floor(1000 * sqrt^halvings(min/cnt)) — is the same
    * integer in every engine, which keeps the survivor set a pure
    * function of (id, salt, data). Rates clamp to >= 1‰ so extreme skew
    * can never floor a stratum to zero and silently delete it. The t14
    * oracle replays all of it bitwise.
    *
    * Plan: one map-side-combinable count over the strata, a 1-row min
    * broadcast onto it, and the resulting tiny rate table broadcast onto
    * the main scan — the big side is never shuffled.
    */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
      halvings: Int = 1, salt: String = ""): DataFrame = {
    require(halvings >= 0 && halvings <= 10,
      s"halvings must be in [0, 10]: $halvings")
    require(!df.columns.contains("__permille"),
      "input already has a '__permille' column (reserved)")
    // NOTE: rows with a NULL stratum are dropped (the rate join cannot
    // match them) — map unknowns to a sentinel stratum upstream to keep
    // them.
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
    val minCnt = counts.agg(min(col("__cnt")).as("__min"))
    val ratio = col("__min").cast("double") / col("__cnt").cast("double")
    val damped = (0 until halvings).foldLeft(ratio)((c, _) => sqrt(c))
    // clamp to >= 1‰: extreme skew (min/cnt below ~1e-6 at halvings=1)
    // would otherwise floor a dominant stratum's rate to ZERO and silently
    // delete the whole stratum — keep-at-least-a-sliver beats vanishing
    val rates = counts
      .crossJoin(broadcast(minCnt))
      .select(col(strataCol),
        greatest(lit(1L), floor(lit(1000.0) * damped)).as("__permille"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(bucket(col(idCol), salt) < col("__permille"))
      .drop("__permille")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): keep the k rows (per stratum) with the largest
    * u^(1/w) — equivalently the largest ln(u)/w — where u is a uniform
    * draw. Inclusion probability scales with the weight: THE primitive
    * for quality-weighted corpus subsampling (w = quality permille,
    * token count, dedup multiplicity…).
    *
    * Deterministic and engine-portable like every sampler here: u comes
    * from the salted id hash (LCG-permuted, +1 so ln never sees zero),
    * ln(u) is quantized to integer MICRO-NATS (the t10 pattern — libm's
    * ±1 ulp vanishes in the quantization), and the sort key is the one
    * double division lnu_micro/w, a correctly-rounded IEEE op both
    * engines perform identically on identical inputs. Same sample on
    * every run, partitioning, and engine (gate t28).
    *
    * The top-k compiles to WindowGroupLimit: each map task pre-filters
    * to its local top k, so the exchange carries ≤ k·partitions rows
    * regardless of corpus size (with no strata the final merge is one
    * task over that bounded set — top-k semantics, not a scan
    * bottleneck).
    *
    * Rows with weight ≤ 0 or NULL are excluded (no mass to sample).
    * Output: input columns + `es_key` + `sample_rank` (1..k, key desc).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "",
      strataCols: Seq[String] = Seq.empty): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val m = graft.functions.TextFunctions.HashMod
    val hp = (polyHash(concat(col(idCol).cast("string"), lit(salt)))
      * lit(1103515245L) + lit(12345L)) % lit(m)
    val lnu = floor(log((hp + 1).cast("double") / lit((m + 1).toDouble))
      * lit(1000000.0) + lit(0.5)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(col("es_key").desc, col(idCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key",
        lnu.cast("double") / col(weightCol).cast("double"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }
}
