package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern redaction — the PII-scrub step of a training-data pipeline:
  * each rule replaces every match of a regex with a placeholder token,
  * and the per-document redaction count is kept so downstream filters can
  * drop documents that are mostly redactions (a standard curation rule).
  *
  * Map-only: pure regexp_replace / regexp_extract_all projections that
  * ride the existing scan — nothing to shuffle, trivially parallel at any
  * scale. Patterns are restricted to the regex subset whose semantics
  * agree between engines (character classes, quantifiers, alternation —
  * no lookaround, no backreferences), which is what lets the t15 oracle
  * replay the scrub verbatim in DuckDB's RE2.
  */
object Redact {

  /** Default rules, most-specific first (an email must not first lose its
    * digits to the number rule): emails, dotted-quad IPs, then any digit
    * run. Replacement tokens are plain words so redacted text re-tokenizes
    * cleanly.
    */
  val DefaultRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "<IP>",
    "[0-9]+" -> "<NUM>")

  /** Adds `text_redacted` (all rules applied in order) and `n_redactions`
    * (total match count across rules, counted BEFORE that rule's
    * replacement so placeholder tokens are never re-counted).
    */
  def scrub(df: DataFrame, textCol: String,
      rules: Seq[(String, String)] = DefaultRules): DataFrame = {
    require(rules.nonEmpty, "at least one redaction rule is required")
    Seq("text_redacted", "n_redactions").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column (reserved by scrub)"))
    val (redacted, counts) =
      rules.foldLeft((col(textCol), Seq.empty[Column])) {
        case ((text, cs), (pattern, replacement)) =>
          val n = size(matches(text, pattern))
          (regexp_replace(text, pattern, replacement), cs :+ n)
      }
    df.withColumn("text_redacted", redacted)
      .withColumn("n_redactions",
        counts.reduce(_ + _).cast("long"))
  }

  private def matches(text: Column, pattern: String): Column =
    regexp_extract_all(text, lit(pattern), lit(0))
}
