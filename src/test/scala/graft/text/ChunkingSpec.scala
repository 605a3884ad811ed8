package graft.text

import graft.SparkSpec

/** Token-window chunking: window/stride geometry, tail clamping,
  * overlap content, empty-document behavior, parameter validation.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  private def chunks(text: String, w: Int, s: Int) =
    Chunking.chunkByTokens(doc(text), "doc_id", "text", w, s)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq

  "chunkByTokens" should "produce overlapping clamped windows" in {
    val text = (1 to 25).map(i => s"t$i").mkString(" ")
    val got = chunks(text, w = 20, s = 10)
    got.map(c => (c._1, c._2, c._3)) shouldBe
      Seq((0L, 0L, 20L), (1L, 10L, 15L), (2L, 20L, 5L))
    // overlap content: chunk 1 covers tokens 11..25
    got(1)._4 shouldBe (11 to 25).map(i => s"t$i").mkString(" ")
    got(2)._4 shouldBe (21 to 25).map(i => s"t$i").mkString(" ")
  }

  it should "emit one short chunk for a sub-window document" in {
    chunks("a b c", w = 20, s = 10) shouldBe
      Seq((0L, 0L, 3L, "a b c"))
  }

  it should "produce disjoint chunks when stride equals window" in {
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val got = chunks(text, w = 4, s = 4)
    got.map(c => (c._2, c._3)) shouldBe Seq((0L, 4L), (4L, 4L), (8L, 1L))
    got.map(_._4).mkString(" ") shouldBe text.toLowerCase
  }

  it should "emit nothing for empty or whitespace-only documents" in {
    Chunking.chunkByTokens(
      Seq((1L, ""), (2L, "   \t  "), (3L, "one")).toDF("doc_id", "text"),
      "doc_id", "text", 8, 4).select("doc_id")
      .as[Long].collect().toSeq shouldBe Seq(3L)
  }

  it should "lowercase and collapse whitespace like the corpus tokenizer" in {
    chunks("  Foo   BAR\tbaz ", w = 2, s = 1).map(_._4) shouldBe
      Seq("foo bar", "bar baz", "baz")
  }

  it should "reject invalid window/stride combinations" in {
    an[IllegalArgumentException] should be thrownBy
      Chunking.chunkByTokens(doc("x"), "doc_id", "text", 0, 1)
    an[IllegalArgumentException] should be thrownBy
      Chunking.chunkByTokens(doc("x"), "doc_id", "text", 4, 5)
    an[IllegalArgumentException] should be thrownBy
      Chunking.chunkByTokens(doc("x"), "doc_id", "text", 4, 0)
  }
}
