package graft.pipeline

import graft.SparkSpec
import graft.text.QualityRules

/** Duplicate-n-gram coverage: union semantics (overlaps counted once),
  * short-doc zero, and the exact char arithmetic.
  */
class DupNgramSpec extends SparkSpec {
  import spark.implicits._

  "dupNgramCoverage" should "count overlapping duplicate grams once" in {
    // "a b a b a b": bigrams = [a b, b a, a b, b a, a b] — all duplicated,
    // covering every token once → frac = 1.0 despite 5 overlapping grams
    val out = QualityRules.dupNgramCoverage(
      Seq((1L, "a b a b a b")).toDF("doc_id", "text"), "doc_id", "text",
      n = 2).collect().head
    out.getLong(1) shouldBe 6L            // n_tokens
    out.getLong(2) shouldBe 6L            // total_chars
    out.getLong(3) shouldBe 6L            // dup_chars
    out.getDouble(4) shouldBe 1.0
  }

  it should "cover only the duplicated span" in {
    // "x y z x y w": "x y" repeats, covering tokens 0,1,3,4 → 4 of 6 chars
    val out = QualityRules.dupNgramCoverage(
      Seq((1L, "x y z x y w")).toDF("doc_id", "text"), "doc_id", "text",
      n = 2).collect().head
    out.getLong(3) shouldBe 4L
    out.getDouble(4) shouldBe 4.0 / 6.0
  }

  it should "report zero for unique or too-short documents" in {
    val out = QualityRules.dupNgramCoverage(
      Seq((1L, "all tokens unique here"), (2L, "solo")).toDF(
        "doc_id", "text"), "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    out(1L) shouldBe 0.0
    out(2L) shouldBe 0.0
  }

  it should "weight coverage by token length in characters" in {
    // "aaaa b aaaa": unigrams would differ; with n=2 no duplicate bigram
    // → 0; with the duplicated token pair "aaaa c aaaa c" n=2:
    val out = QualityRules.dupNgramCoverage(
      Seq((1L, "aaaa c aaaa c")).toDF("doc_id", "text"), "doc_id", "text",
      n = 2).collect().head
    // bigrams: [aaaa c, c aaaa, aaaa c] — "aaaa c" dup covers idx 0,1,2,3
    out.getLong(2) shouldBe 10L
    out.getLong(3) shouldBe 10L
    out.getDouble(4) shouldBe 1.0
  }
}
