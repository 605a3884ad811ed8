package graft.pipeline

import graft.SparkSpec
import graft.text.{Contamination, QualityRules}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  behavior of "QualityRules.gopherQuality"

  private def docs = Seq(
    // healthy: 8 words, stopwords present, varied bigrams
    (1L, "the quick brown fox jumps over a lazy dog"),
    // too short
    (2L, "tiny doc"),
    // repeated bigram dominates
    (3L, Seq.fill(20)("spam ham").mkString(" ")),
    // numbers only → alpha fraction 0
    (4L, (1 to 12).map(_.toString).mkString(" ") + " the a of"),
    // no stopwords
    (5L, "alpha beta gamma delta epsilon zeta eta theta")
  ).toDF("doc_id", "text")

  it should "compute metrics and apply every rule" in {
    val got = QualityRules.gopherQuality(docs, "doc_id", "text",
      minWords = 5, maxWords = 100, minMeanLen = 2.0, maxMeanLen = 10.0,
      minAlphaFrac = 0.8, maxTopBigramFrac = 0.3, minStopHits = 2)
      .collect().map(r => r.getLong(0) -> r).toMap

    got(1L).getInt(6) shouldBe 1 // keep
    got(2L).getInt(6) shouldBe 0 // word count
    got(3L).getInt(6) shouldBe 0 // repetition: "ham spam"/"spam ham" dominate
    got(4L).getInt(6) shouldBe 0 // alpha fraction 3/15
    got(5L).getInt(6) shouldBe 0 // no stopwords

    got(1L).getLong(1) shouldBe 9L // n_words
    got(1L).getLong(5) shouldBe 2L // "the", "a"
    got(3L).getDouble(4) should be > 0.4 // top bigram fraction
    got(4L).getDouble(3) shouldBe (3.0 / 15.0) // frac_alpha_words
  }

  it should "drop empty documents instead of dividing by zero (ANSI)" in {
    val withEmpty = docs.union(Seq((6L, ""), (7L, "   ")).toDF("doc_id", "text"))
    val got = QualityRules.gopherQuality(withEmpty, "doc_id", "text",
      minWords = 5).collect().map(r => r.getLong(0) -> r).toMap
    got(6L).getLong(1) shouldBe 0L // n_words
    got(6L).isNullAt(2) shouldBe true // mean_word_len undefined, not a crash
    got(6L).getInt(6) shouldBe 0
    got(7L).getInt(6) shouldBe 0
  }

  behavior of "Contamination"

  it should "flag documents overlapping the probe set, map-only" in {
    val df = Contamination.ngramOverlap(docs, "doc_id", "text",
      probe = Seq("quick brown fox", "no such gram"), n = 3)
    val got = df.collect().map(r => r.getLong(0) -> r).toMap
    got(1L).getLong(2) shouldBe 1L // overlap_cnt
    got(1L).getInt(4) shouldBe 1 // contaminated
    got(2L).getInt(4) shouldBe 0
    got(5L).getInt(4) shouldBe 0
    // shuffle-free: no exchange in the plan
    df.queryExecution.executedPlan.toString should not include "Exchange"
  }

  it should "decontaminate keeping all original columns" in {
    val kept = Contamination.decontaminate(docs, "doc_id", "text",
      probe = Seq("quick brown fox"))
    kept.columns.toSeq shouldBe Seq("doc_id", "text")
    kept.select("doc_id").as[Long].collect().toSet shouldBe
      Set(2L, 3L, 4L, 5L)
  }

  it should "match the literal-probe path through the hashed join " +
      "(large-probe scale form)" in {
    val probeDoc = Seq((100L, "the quick brown fox says hello"))
      .toDF("pid", "ptext")
    val probeGrams = Seq("the quick brown", "quick brown fox",
      "brown fox says", "fox says hello")
    val viaJoin = Contamination
      .ngramOverlapJoin(docs, "doc_id", "text", probeDoc, "ptext")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val viaLiteral = Contamination
      .ngramOverlap(docs, "doc_id", "text", probeGrams)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    viaJoin shouldBe viaLiteral
    viaJoin(1L)(2) shouldBe 2L // "the quick brown", "quick brown fox"
  }

  it should "report zero-shingle documents and apply the fraction " +
      "threshold" in {
    val probeDoc = Seq((100L, "the quick brown fox says hello"))
      .toDF("pid", "ptext")
    val withEmpty = docs.union(Seq((6L, "")).toDF("doc_id", "text"))
    val flagged = Contamination
      .ngramOverlapJoin(withEmpty, "doc_id", "text", probeDoc, "ptext",
        maxOverlapFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    flagged(6L).getLong(1) shouldBe 0L // n_shingles
    flagged(6L).getInt(4) shouldBe 0
    // doc 1 overlaps 2/7 ≈ 0.29 < 0.5 → below threshold, not contaminated
    flagged(1L).getInt(4) shouldBe 0
    Contamination.decontaminateJoin(withEmpty, "doc_id", "text",
        probeDoc, "ptext", maxOverlapFrac = 0.5)
      .select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 2L, 3L, 4L, 5L, 6L)
    // default threshold (any hit) drops doc 1
    Contamination.decontaminateJoin(withEmpty, "doc_id", "text",
        probeDoc, "ptext")
      .select("doc_id").as[Long].collect().toSet shouldBe
      Set(2L, 3L, 4L, 5L, 6L)
  }
}
