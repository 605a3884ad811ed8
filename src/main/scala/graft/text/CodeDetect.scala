package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-vs-prose detection — the modality router a mixed web corpus
  * needs before any text-quality rule fires: Gopher-style filters
  * (QualityRules) are calibrated for prose and would throw away
  * perfectly good source code (low stopword fraction, "weird"
  * punctuation density), so pipelines first split the stream by
  * modality and weight code separately in the training mix.
  *
  * Deliberately a TRANSPARENT heuristic, not a model: three density
  * signals any engine can replay bitwise —
  *  - symbol density: characters from the code alphabet {}()[];=<> per
  *    character (translate-delete counting — no regex engine
  *    dependency),
  *  - indented-line fraction: lines opening with 4 spaces or a tab
  *    (block structure survives minification of everything else),
  *  - keyword density: occurrences of a fixed signature list
  *    (replace-delete counting) per 1000 characters.
  * The X57 Naive-Bayes classifier is the LEARNED upgrade when labels
  * exist; this is the zero-training baseline and its feature extractor.
  *
  * Exactness: every signal is exact integer counting; the score is a
  * fixed IEEE combination in per-mille units and the flag one
  * threshold compare — the t-gate replays the whole frame in DuckDB.
  *
  * Scale: map-only (one projection, no shuffle, no UDFs — pure
  * codegen'd string expressions); composes with any downstream
  * aggregation without adding an exchange.
  */
object CodeDetect {

  /** The fixed keyword signature list. Trailing/leading spaces are part
    * of the signature (word-ish boundaries without regex): `return `
    * hits code far more often than prose mentions of "return".
    */
  val Keywords: Seq[String] = Seq(
    "def ", "return ", "import ", "function ", "var ", "const ",
    "public ", "void ", "#include", "println", "self.", "=>")

  private val SymbolAlphabet = "{}()[];=<>"

  /** Append per-document signals + score + flag:
    * (…input cols…, n_chars_text, symbol_chars, n_lines, indent_lines,
    * keyword_hits, code_score, is_code). Empty/NULL text scores 0 and
    * is not code. `threshold` is in score units (default 80 ≈ a
    * document needs strong evidence on at least two signals).
    *
    * code_score = 1000·symbol_frac + 1000·indent_frac
    *            + 10·keyword_hits_per_kchar, each term a double from
    * exact longs.
    */
  def score(df: DataFrame, textCol: String,
      threshold: Double = 80.0): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val nChars = length(t).cast("long")
    val symbolChars =
      (length(t) - length(translate(t, SymbolAlphabet, ""))).cast("long")
    val lines = split(t, "\n", -1)
    val nLines = size(lines).cast("long")
    val indentLines = size(filter(lines,
      l => l.startsWith("    ") || l.startsWith("\t"))).cast("long")
    val keywordHits = Keywords.map { kw =>
      ((length(t) - length(replace(t, lit(kw), lit("")))) /
        lit(kw.length)).cast("long")
    }.reduce(_ + _)
    // fixed IEEE shape over exact longs — mirrored in oracles
    val nD = nChars.cast("double")
    val scoreCol = when(nChars === 0L, lit(0.0)).otherwise(
      lit(1000.0) * symbolChars.cast("double") / nD +
        lit(1000.0) * indentLines.cast("double") / nLines.cast("double") +
        lit(10.0) * keywordHits.cast("double") * lit(1000.0) / nD)
    df.withColumn("n_chars_text", nChars)
      .withColumn("symbol_chars", symbolChars)
      .withColumn("n_lines", nLines)
      .withColumn("indent_lines", indentLines)
      .withColumn("keyword_hits", keywordHits)
      .withColumn("code_score", scoreCol)
      .withColumn("is_code", scoreCol >= lit(threshold))
  }
}
