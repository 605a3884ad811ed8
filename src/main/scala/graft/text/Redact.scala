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
    *
    * Each stage is MATERIALIZED as its own intermediate column: building
    * one nested expression instead (rule k's count referencing the
    * accumulated replace chain) re-runs k−1 replaces per count — O(rules²)
    * regex passes over every row. With named stages each text byte sees
    * each rule's regex exactly once; CollapseProject leaves the chain
    * alone because every stage is non-cheap and consumed twice (next
    * count + next replace). RedactSpec pins the plan to `rules.size`
    * regexp_replace expressions.
    */
  def scrub(df: DataFrame, textCol: String,
      rules: Seq[(String, String)] = DefaultRules): DataFrame = {
    require(rules.nonEmpty, "at least one redaction rule is required")
    val clash = df.columns.filter(c =>
      c == "text_redacted" || c == "n_redactions" || c.startsWith("__redact_"))
    require(clash.isEmpty,
      s"input columns reserved by scrub: ${clash.mkString(",")}")
    val staged = rules.zipWithIndex.foldLeft(df) {
      case (acc, ((pattern, replacement), i)) =>
        val prev = if (i == 0) col(textCol) else col(s"__redact_${i - 1}")
        acc.withColumn(s"__redact_cnt_$i", size(matches(prev, pattern)))
          .withColumn(s"__redact_$i",
            regexp_replace(prev, pattern, replacement))
    }
    staged
      .withColumn("text_redacted", col(s"__redact_${rules.size - 1}"))
      .withColumn("n_redactions",
        rules.indices.map(i => col(s"__redact_cnt_$i")).reduce(_ + _)
          .cast("long"))
      .drop(rules.indices.flatMap(i =>
        Seq(s"__redact_$i", s"__redact_cnt_$i")): _*)
  }

  private def matches(text: Column, pattern: String): Column =
    regexp_extract_all(text, lit(pattern), lit(0))
}
