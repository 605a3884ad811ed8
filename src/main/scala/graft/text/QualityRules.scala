package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Gopher-style document quality filtering (Rae et al. 2021, arXiv:
  * 2112.11446 §A1.1): the rule set real curation pipelines run before
  * training — word-count bounds, mean-word-length bounds, alphabetic-word
  * fraction, repetition (top-bigram fraction), stopword presence — each
  * emitted as a metric plus one combined keep flag.
  *
  * Plan shape: the per-token metrics are one map-only pass (tokens
  * materialized once, HOF re-evaluation trap avoided); the repetition
  * metric needs a (doc, bigram) grouped count — two map-side-combinable
  * aggregations whose shuffle carries (id, gram, count) rows — joined back
  * on id. All ratios are single double divisions of exact integers, so
  * the whole frame replays bitwise in any engine.
  */
object QualityRules {

  /** Gopher's duplicate-n-gram repetition rule with EXACT union-coverage
    * semantics (Rae et al. 2021 §A1.1: "fraction of characters contained
    * within duplicate n-grams"): a token position counts once no matter
    * how many duplicated n-grams cover it, so the fraction is always in
    * [0, 1] — the naive sum-of-duplicate-gram-lengths over-counts
    * overlapping repeats. Characters are measured as token lengths
    * (whitespace excluded).
    *
    * Output: (idCol, n_tokens, total_chars, dup_chars,
    * dup_ngram_char_frac). Documents with zero tokens are dropped; docs
    * shorter than n tokens report 0.0 (no n-gram can repeat).
    *
    * Shape: gram occurrence counts are a window over (doc, gram); covered
    * positions fan out n× per duplicated gram and collapse through a
    * distinct — every stage keys on the doc id, so the exchanges carry
    * (id, gram/idx) rows, never full documents, and all ratios are single
    * exact-integer divisions (the t18 oracle replays bitwise).
    */
  def dupNgramCoverage(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 2, s"duplicate-n-gram rule needs n >= 2: $n")
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    val tokPos = toks.select(col("id"),
      posexplode(transform(col("__toks"), t => length(t).cast("long"))))
      .withColumnRenamed("pos", "tokidx")
      .withColumnRenamed("col", "tok_chars")
    val grams = toks
      .filter(size(col("__toks")) >= n)
      .select(col("id"), explode(transform(
        sequence(lit(0), size(col("__toks")) - n),
        i => struct(i.as("gpos"),
          array_join(slice(col("__toks"), i + 1, lit(n)), " ")
            .as("gram")))).as("g"))
      .select(col("id"), col("g.gpos"), col("g.gram"))
    val occurrences = Window.partitionBy("id", "gram")
    val covered = grams
      .withColumn("__cnt", count(lit(1)).over(occurrences))
      .filter(col("__cnt") >= 2)
      .select(col("id"),
        explode(sequence(col("gpos"), col("gpos") + (n - 1))).as("tokidx"))
      .distinct()
    val dupChars = covered.join(tokPos, Seq("id", "tokidx"))
      .groupBy("id").agg(sum("tok_chars").as("dup_chars"))
    tokPos.groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("tok_chars").as("total_chars"))
      .join(dupChars, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"), col("total_chars"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        (coalesce(col("dup_chars"), lit(0L)).cast("double") /
          col("total_chars").cast("double")).as("dup_ngram_char_frac"))
  }

  /** English stopword markers (TextAnalysis.LangMarkers) — Gopher's
    * "contains ≥ 2 of a small stopword list" rule.
    */
  private val StopMarkers: Seq[String] =
    TextAnalysis.LangMarkers.collect { case ("en", m) => m }.flatten

  /** Per-document quality metrics + keep flag. Tokens are lowercased
    * (stopword hits must count sentence-initial forms; length/alpha
    * metrics are case-blind anyway).
    *
    * Output: (idCol, n_words, mean_word_len, frac_alpha_words,
    * top_bigram_frac, stop_hits, keep ∈ {0,1}).
    */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, maxTopBigramFrac: Double = 0.2,
      minStopHits: Long = 2): DataFrame = {
    val toks = df
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("__toks"))

    // ratio metrics are guarded: an empty/whitespace-only document has
    // zero tokens, and an unguarded division is a fatal DIVIDE_BY_ZERO
    // under the session's ANSI default — the doc must FAIL the filter
    // (n_words = 0 < minWords), not kill the job
    val nTok = size(col("__toks"))
    val metrics = toks.select(
      col("id"),
      nTok.cast("long").as("n_words"),
      when(nTok > 0,
        aggregate(transform(col("__toks"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double") / nTok.cast("double"))
        .as("mean_word_len"),
      when(nTok > 0,
        size(filter(col("__toks"), t => t.rlike("[a-z]"))).cast("double")
          / nTok.cast("double"))
        .as("frac_alpha_words"),
      size(filter(col("__toks"),
        t => t.isin(StopMarkers.map(_.asInstanceOf[Any]): _*)))
        .cast("long").as("stop_hits"))

    // repetition: most frequent bigram's share of all bigrams
    val bigrams = toks
      .select(col("id"), explode(shinglesFromTokens(col("__toks"), 2)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        (max(col("c")).cast("double") / sum(col("c")).cast("double"))
          .as("top_bigram_frac"))

    val joined = metrics.join(bigrams, Seq("id"), "left")
      .withColumn("top_bigram_frac",
        coalesce(col("top_bigram_frac"), lit(0.0)))
    val keep =
      col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanLen &&
        col("mean_word_len") <= maxMeanLen &&
        col("frac_alpha_words") >= minAlphaFrac &&
        col("top_bigram_frac") <= maxTopBigramFrac &&
        col("stop_hits") >= minStopHits
    joined.select(col("id").as(idCol), col("n_words"), col("mean_word_len"),
      col("frac_alpha_words"), col("top_bigram_frac"), col("stop_hits"),
      keep.cast("int").as("keep"))
  }
}
