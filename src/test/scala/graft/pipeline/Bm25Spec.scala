package graft.pipeline

import graft.SparkSpec
import graft.text.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  behavior of "Bm25.topK"

  // 4 docs; "rare" appears only in doc 1, "common" in all.
  private def corpus = Seq(
    (1L, "common rare alpha beta gamma"),
    (2L, "common alpha alpha alpha beta"),
    (3L, "common beta beta gamma gamma delta"),
    (4L, "common delta delta delta delta delta delta delta delta")
  ).toDF("doc_id", "text")

  it should "rank the only document containing a rare term first" in {
    val got = Bm25.topK(corpus, "doc_id", "text", Seq("rare", "common"))
      .as[(Long, Long, Double)].collect()
    got.map(_._1).head shouldBe 1L
    got.map(_._1).toSet shouldBe Set(1L, 2L, 3L, 4L) // all match "common"
    got.head._2 shouldBe 2L // doc 1 matches both terms
    // scores strictly ordered (desc) with id tiebreak
    got.map(_._3).toSeq shouldBe got.map(_._3).toSeq.sorted.reverse
  }

  it should "reward higher tf but saturate, and penalize long documents" in {
    val got = Bm25.topK(corpus, "doc_id", "text", Seq("alpha", "delta"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // doc 2 (tf=3 alpha, short) beats doc 1 (tf=1 alpha)
    got(2L) should be > got(1L)
    // doc 4 has 8× "delta" but is long; saturation + length norm keep its
    // score in the same ballpark as doc 3's tf=1 (k1=1.2 caps the gain
    // well under 8×)
    got(4L) should be < got(3L) * 3
  }

  it should "omit documents matching no term and honor k" in {
    val one = Bm25.topK(corpus, "doc_id", "text", Seq("rare"), k = 10)
      .as[(Long, Long, Double)].collect()
    one.map(_._1).toSeq shouldBe Seq(1L)
    Bm25.topK(corpus, "doc_id", "text", Seq("common"), k = 2)
      .count() shouldBe 2L
  }

  it should "match terms case-insensitively" in {
    val docs = Seq((1L, "Spark SPARK spark"), (2L, "flink")).toDF("doc_id", "text")
    val got = Bm25.topK(docs, "doc_id", "text", Seq("spark"))
      .as[(Long, Long, Double)].collect()
    got.map(_._1).toSeq shouldBe Seq(1L)
  }

  it should "reuse the postings shuffle between the scoring and df branches" in {
    // df is sum(least(tf,1)) specifically so the df branch's subplan stays
    // canonically identical to the scoring branch and AQE reuses the
    // exchange — a plain count(*) regresses to scanning the corpus twice
    val df = Bm25.topK(corpus, "doc_id", "text", Seq("alpha", "common"))
    df.collect()
    df.queryExecution.executedPlan.toString should include("ReusedExchange")
  }

  it should "reject empty or duplicate query terms" in {
    an[IllegalArgumentException] should be thrownBy
      Bm25.topK(corpus, "doc_id", "text", Nil)
    an[IllegalArgumentException] should be thrownBy
      Bm25.topK(corpus, "doc_id", "text", Seq("a", "a"))
  }
}
