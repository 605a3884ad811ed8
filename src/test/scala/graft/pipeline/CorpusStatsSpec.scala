package graft.pipeline

import graft.SparkSpec
import graft.text.CorpusStats

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  "byStratum" should "profile each stratum in one pass" in {
    val docs = Seq(
      (1L, "en", "s1", "one two three"),
      (2L, "en", "s2", "a b c d e f"),
      (3L, "de", "s1", "ein zwei")
    ).toDF("doc_id", "lang", "source", "text")
    val got = CorpusStats.byStratum(docs, "text", "lang", "source",
        shortTokens = 4)
      .orderBy("stratum")
      .as[(String, Long, Long, Long, Double, Long, Double)]
      .collect().toSeq
    got shouldBe Seq(
      ("de", 1L, 2L, 2L, 2.0, 1L, 1.0),
      ("en", 2L, 9L, 6L, 4.5, 2L, 0.5))
  }

  it should "reject a negative short-doc threshold" in {
    an[IllegalArgumentException] should be thrownBy
      CorpusStats.byStratum(Seq((1L, "x", "s", "t")).toDF(
        "doc_id", "lang", "source", "text"), "text", "lang", "source", -1)
  }
}
