package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Okapi BM25 scoring / top-k retrieval over a document frame — the exact
  * (inverted-index-shaped) text-search primitive of a training-data
  * pipeline: "pull the k documents most relevant to this probe query"
  * for curation, contamination checks, and eval-set mining.
  *
  * Plan shape (matters at 100 TB):
  *  - One tokenize+explode pass produces the postings (doc, term, tf);
  *    filtering to the query's terms happens BEFORE the shuffle, so the
  *    grouped tf aggregation touches only matching postings — the moral
  *    equivalent of an inverted-index seek, expressed declaratively.
  *  - Corpus stats (N, total token count) and per-term document
  *    frequencies are tiny aggregates broadcast back onto the postings;
  *    no driver-side collect.
  *  - The per-document score is a FIXED-ORDER sum of per-term partials
  *    (one conditional-max column per query term, then left-to-right
  *    addition), not a float SUM aggregate — double addition is not
  *    associative, so an unordered sum would not be deterministic across
  *    engines/partitionings. idf is quantized to 6 decimals via
  *    floor(x*1e6 + 0.5)/1e6 because `ln` is the one operation here that
  *    IEEE 754 does NOT require to be correctly rounded (±1 ulp across
  *    libm implementations); every other op (+,*,/,floor) is exact-per-op
  *    and evaluated in identical order by any engine, making the gate
  *    bit-stable by construction.
  */
object Bm25 {

  val K1: Double = 1.2
  val B: Double = 0.75

  /** Top-k documents for `queryTerms` by BM25. Text is lowercased before
    * tokenizing (queries are matched case-insensitively). Documents
    * matching no query term are omitted. Ties break on ascending id.
    *
    * Output: (idCol, n_terms — distinct query terms matched, score).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      rawQueryTerms: Seq[String], k: Int = 20): DataFrame = {
    // documents are lowercased before tokenizing, so an uppercase query
    // term could never match — normalize instead of silently scoring 0
    val queryTerms = rawQueryTerms.map(_.toLowerCase(java.util.Locale.ROOT))
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    require(queryTerms.distinct == queryTerms,
      "query terms must be distinct (case-insensitively)")

    // (id, toks) materialized once — the HOF re-evaluation trap
    // (NearDup.scala:33-38) applies to tokenization here too.
    val toks = docs
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), col("__toks"), size(col("__toks")).cast("long").as("dl"))

    // Postings, pre-filtered to query terms before any shuffle.
    val postings = toks
      .select(col("id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))

    // Corpus stats: 1-row frame, broadcast onto the postings.
    val stats = toks.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    // Per-term document frequency (# docs containing the term). Written as
    // sum(least(tf,1)) — identical in value to count(*) since tf ≥ 1 —
    // DELIBERATELY: a plain count lets Catalyst prune the tf aggregate on
    // this branch, the pruned subplan no longer canonically matches the
    // scoring branch, and AQE's exchange reuse stops firing — the corpus
    // would be scanned and exploded TWICE. Keeping tf in play makes both
    // branches share one shuffle stage (asserted by Bm25Spec's plan test).
    val dfreq = postings.groupBy("term")
      .agg(sum(least(col("tf"), lit(1L))).as("df"))

    val scored = postings
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      // floor(x*1e6 + 0.5)/1e6, NOT round(x, 6): Spark rounds via exact
      // BigDecimal while other engines multiply-round-divide — the floor
      // form is the same IEEE ops in the same order everywhere.
      .withColumn("idf",
        floor(log(lit(1.0)
            + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
              / (col("df").cast("double") + lit(0.5))) * lit(1000000.0) + lit(0.5))
          .cast("double") / lit(1000000.0))
      .withColumn("avgdl", col("total_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("part",
        col("idf") * (col("tf").cast("double") * lit(K1 + 1.0))
          / (col("tf").cast("double")
            + lit(K1) * (lit(1.0 - B) + lit(B) * (col("dl").cast("double") / col("avgdl")))))

    // Fixed-order per-term columns → deterministic left-to-right total.
    val perTerm = queryTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("part"))).as(s"__p$i")
    }
    val byDoc = scored.groupBy(col("id").as(idCol))
      .agg(perTerm.head, perTerm.tail: _*)
    val total = queryTerms.indices
      .map(i => coalesce(col(s"__p$i"), lit(0.0)))
      .reduceLeft(_ + _)
    val nTerms = queryTerms.indices
      .map(i => when(col(s"__p$i").isNotNull, 1L).otherwise(0L))
      .reduceLeft(_ + _)
    byDoc
      .select(col(idCol), nTerms.as("n_terms"), total.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
