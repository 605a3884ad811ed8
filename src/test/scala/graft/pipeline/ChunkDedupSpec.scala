package graft.pipeline

import graft.SparkSpec
import graft.text.ChunkDedup

/** C4-style chunk-level dedup: repeated spans keep only their first
  * corpus occurrence, documents rebuild in position order, fully-seen
  * documents disappear.
  */
class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "terms of use apply"  // 4-token chunk at size 4

  private def docs = Seq(
    (1L, s"$boiler alpha beta gamma delta"),
    (2L, s"$boiler epsilon zeta eta theta"),
    (3L, boiler),                       // nothing but the boilerplate
    (4L, "iota kappa lambda mu nu xi"), // 6 tokens → chunks of 4 + 2
    (5L, "")                            // zero tokens
  ).toDF("doc_id", "text")

  private def out = ChunkDedup.dedupChunks(docs, "doc_id", "text",
    chunkTokens = 4)

  "dedupChunks" should "keep repeated chunks only at their first occurrence" in {
    val byId = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    byId(1L) shouldBe ((2L, 2L, s"$boiler alpha beta gamma delta"))
    byId(2L) shouldBe ((2L, 1L, "epsilon zeta eta theta"))
    byId(4L) shouldBe ((2L, 2L, "iota kappa lambda mu nu xi"))
  }

  it should "remove documents made entirely of seen chunks, and empty docs" in {
    out.select("doc_id").as[Long].collect().sorted shouldBe Seq(1L, 2L, 4L)
  }

  it should "dedup a chunk repeated within one document" in {
    val selfDup = Seq((1L, "a b c d a b c d e f g h")).toDF("doc_id", "text")
    val r = ChunkDedup.dedupChunks(selfDup, "doc_id", "text", 4).collect()
    r.length shouldBe 1
    r.head.getLong(1) shouldBe 3L          // n_chunks
    r.head.getLong(2) shouldBe 2L          // n_kept
    r.head.getString(3) shouldBe "a b c d e f g h"
  }

  it should "be invariant under physical layout" in {
    val base = out.orderBy("doc_id").collect().toSeq
    val shuffled = ChunkDedup.dedupChunks(docs.repartition(5), "doc_id",
      "text", 4).orderBy("doc_id").collect().toSeq
    shuffled shouldBe base
  }
}
