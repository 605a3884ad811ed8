package graft.pipeline

import graft.SparkSpec
import graft.text.UnigramLm

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  it should "score rare-token documents as higher-surprise" in {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common common rare"),
      (3L, "")).toDF("doc_id", "text")
    val got = UnigramLm.scoreDocs(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

    got.keySet shouldBe Set(1L, 2L) // empty doc omitted
    // corpus: 8 tokens, common=7, rare=1
    val lpCommon = math.floor(math.log(7.0 / 8.0) * 1e6 + 0.5).toLong
    val lpRare = math.floor(math.log(1.0 / 8.0) * 1e6 + 0.5).toLong
    got(1L)._3 shouldBe 4 * lpCommon
    got(2L)._3 shouldBe 3 * lpCommon + lpRare
    got(2L)._4 should be > got(1L)._4 // rare token → higher mean NLL
    got(1L)._4 shouldBe -(4.0 * lpCommon).toDouble / 1e6 / 4.0
  }

  it should "be case-insensitive like the other text ops" in {
    val docs = Seq((1L, "Word word WORD")).toDF("doc_id", "text")
    val got = UnigramLm.scoreDocs(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().head
    got._2 shouldBe 3L
    got._4 shouldBe 0.0 // p(word) = 1 → ln 1 = 0
  }
}
