package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Document-level text analysis for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. Pure column
  * expressions (codegen'd); each helper returns a DataFrame keyed by the
  * id column so pipelines can join them back cheaply.
  */
object TextAnalysis {

  /** Marker stopword lists per language for the n-gram/stopword-count
    * language-ID heuristic. Deliberately tiny and fixed: the heuristic is
    * a deterministic scoring rule, not a trained model.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  private def hits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(_.asInstanceOf[Any]): _*)))
      .cast("long")

  /** Per-document language scores + argmax prediction ("und" when no
    * marker hits; ties break in LangMarkers order).
    *
    * Text is LOWERCASED before tokenizing — sentence-initial "The"/"La"
    * must count as markers. Tokens are materialized in their own
    * projection first: HOFs get no common-subexpression elimination, so
    * an inline `tokens(text)` would re-tokenize the full document once
    * per language column (the shingleSets trap, NearDup.scala:33-38).
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = df
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("__toks"))
      .select(
        (col("id") +:
          LangMarkers.map { case (l, m) =>
            hits(col("__toks"), m).as(s"${l}_hits") }): _*)
    val best = LangMarkers.map(l => col(s"${l._1}_hits"))
      .reduceLeft((a, b) => greatest(a, b))
    // first-match-wins in LangMarkers order; no hits at all → "und"
    val pred = LangMarkers.reverse.foldLeft(lit("und")) {
      case (acc, (l, _)) =>
        when(col(s"${l}_hits") === best && best > 0, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Quality metrics: token count, distinct-token count, type/token ratio,
    * mean token length, char count. Ratios are single double divisions of
    * exact integers (bit-stable across engines).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize tokens once (see languageId note) — the three
    // token-derived metrics would otherwise each re-tokenize the document
    val toks = col("__toks")
    val nTok = size(toks).cast("long")
    val nTypes = size(array_distinct(toks)).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("__toks", tokens(col("__text")))
      .select(
        col("id"),
        length(col("__text")).cast("long").as("n_chars"),
        nTok.as("n_tokens"),
        nTypes.as("n_types"),
        when(nTok > 0, nTypes.cast("double") / nTok).as("type_token_ratio"),
        when(nTok > 0, sumLen.cast("double") / nTok).as("mean_token_len"))
  }

  /** Token counts: whitespace tokens and regex word tokens ([a-z0-9]+,
    * a BPE-ish lower-ASCII word pattern).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      size(tokens(col(textCol))).cast("long").as("ws_tokens"),
      regexp_count(col(textCol), lit("[a-z0-9]+")).cast("long")
        .as("re_tokens"))

  /** Content fingerprint: polynomial rolling hash of the raw text (exact-
    * dup key that shuffles 8 bytes instead of document bodies).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), polyHash(col(textCol)).as("fingerprint"))

  /** Vocabulary coverage / OOV rate per document against the corpus's
    * own top-`topK` vocabulary — the curation signal that separates
    * in-domain text from noise and foreign material (a doc whose tokens
    * mostly miss the corpus vocabulary is one or the other), and the
    * coverage check run against a TOKENIZER's vocab before training.
    *
    * Deterministic vocab cut: (count DESC, term ASC) — the boundary tie
    * is pinned. Scale: the vocabulary (topK rows) BROADCASTS into a
    * left semi-ish membership join against the exploded tokens — tokens
    * never shuffle for membership; the only exchange is the per-doc
    * (id, two longs) count aggregation, map-side combined. Documents
    * with no tokens report NULL oov_rate.
    *
    * Output: (idCol, n_tokens, n_oov, oov_rate — one double division
    * of exact longs).
    */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val toks = df
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val vocab = toks.groupBy("term")
      .agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("term").asc)
      .limit(topK)
      .select(col("term"), lit(1).as("__in_vocab"))
    val flagged = toks
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol)).join(flagged, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(col("n_tokens") > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }
}
