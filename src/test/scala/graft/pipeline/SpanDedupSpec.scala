package graft.pipeline

import graft.SparkSpec
import graft.text.SpanDedup

/** ExactSubstr-style sliding-window span dedup: any ≥k-token verbatim
  * repeat is removed wherever it starts (phase-invariant, unlike fixed
  * chunks), keeping the earliest (doc, position) occurrence.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 4-token span repeated across docs at DIFFERENT offsets — the case
  // fixed-chunk dedup (ChunkDedup at size 4) structurally misses
  private val span = "terms of use apply"

  private def docs = Seq(
    (1L, s"$span alpha beta gamma"),          // span at offset 0
    (2L, s"prefix $span epsilon zeta"),       // span at offset 1
    (3L, span),                               // nothing but the span
    (4L, "iota kappa lambda"),                // 3 tokens < k → untouched
    (5L, "")                                  // zero tokens → dropped
  ).toDF("doc_id", "text")

  private def out = SpanDedup.dedupSpans(docs, "doc_id", "text",
    spanTokens = 4)

  "dedupSpans" should "remove a repeated span at any offset, keeping its first occurrence" in {
    val byId = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    byId(1L) shouldBe ((7L, 7L, s"$span alpha beta gamma"))
    byId(2L) shouldBe ((7L, 3L, "prefix epsilon zeta"))
    byId(4L) shouldBe ((3L, 3L, "iota kappa lambda"))
  }

  it should "drop fully-duplicated documents and empty documents" in {
    out.select("doc_id").as[Long].collect().sorted shouldBe Seq(1L, 2L, 4L)
  }

  it should "collapse within-document self-repetition to one copy" in {
    // "a b c d" repeated back-to-back: the seam windows ("b c d a" …)
    // are unique, so the only duplicate window is the second copy at
    // p=4, covering exactly tokens 4..7 — the repeat collapses to one
    // copy with the surrounding text intact
    val selfDup = Seq((1L, "a b c d a b c d e f g h")).toDF("doc_id", "text")
    val r = SpanDedup.dedupSpans(selfDup, "doc_id", "text", 4).collect()
    r.length shouldBe 1
    r.head.getLong(1) shouldBe 12L
    r.head.getLong(2) shouldBe 8L
    r.head.getString(3) shouldBe "a b c d e f g h"
  }

  it should "catch a straddling repeat that fixed chunks miss" in {
    // doc 1 carries "p q r s" at offset 2 (straddles the 4-chunk
    // boundary); doc 2 carries it at offset 0 — chunk dedup keeps both
    val straddle = Seq(
      (1L, "x y p q r s z w"),
      (2L, "p q r s t u v k")).toDF("doc_id", "text")
    val spanOut = SpanDedup.dedupSpans(straddle, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    spanOut.map(_.getString(3)).toSeq shouldBe
      Seq("x y p q r s z w", "t u v k")
    val chunkOut = graft.text.ChunkDedup
      .dedupChunks(straddle.toDF("doc_id", "text"), "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    chunkOut.map(_.getString(3)).toSeq shouldBe
      Seq("x y p q r s z w", "p q r s t u v k") // both survive chunking
  }

  it should "be invariant under physical layout" in {
    val base = out.orderBy("doc_id").collect().toSeq
    val shuffled = SpanDedup.dedupSpans(docs.repartition(5), "doc_id",
      "text", spanTokens = 4).orderBy("doc_id").collect().toSeq
    shuffled shouldBe base
  }

  it should "reject reserved id column names and tiny spans" in {
    an[IllegalArgumentException] should be thrownBy
      SpanDedup.dedupSpans(docs.withColumnRenamed("doc_id", "n_kept"),
        "n_kept", "text", 4)
    an[IllegalArgumentException] should be thrownBy
      SpanDedup.dedupSpans(docs, "doc_id", "text", 1)
  }
}
