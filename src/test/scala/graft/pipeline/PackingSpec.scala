package graft.pipeline

import graft.SparkSpec
import graft.text.Packing
import org.apache.spark.sql.functions._

/** Sequence packing (concat-and-chunk) invariants: the packed spans tile
  * each shard's token stream exactly, the arithmetic is deterministic
  * under any physical layout, and the whole plan is one exchange.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val seqLen = 10

  private def docs = Seq(
    (1L, "a b c d e f g"),          // 7 tokens
    (2L, "h i j k l m n o p q r"),  // 11 tokens — crosses a boundary
    (3L, "  \t  "),                 // zero tokens — dropped
    (4L, "s t u"),
    (5L, "v w x y z a b c d e f g h i j k l m n o p q"), // 22 tokens
    (6L, "z"),
    (7L, "one two three four five six seven eight nine ten eleven twelve")
  ).toDF("doc_id", "text")

  private def packed =
    Packing.concatChunk(docs, "doc_id", "text", seqLen, nShards = 2,
      salt = "spec")

  "concatChunk" should "tile each shard's stream contiguously" in {
    val rows = packed
      .select("shard", "doc_id", "n_tokens", "off_start", "seq_start",
        "seq_end")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .groupBy(_._1)
    rows.foreach { case (_, shardRows) =>
      var expectStart = 0L
      shardRows.sortBy(_._2).foreach {
        case (_, _, n, off, seqStart, seqEnd) =>
          val start = seqStart * seqLen + off
          start shouldBe expectStart
          off should (be >= 0L and be < seqLen.toLong)
          seqEnd shouldBe (start + n - 1) / seqLen
          seqEnd should be >= seqStart
          expectStart = start + n
      }
    }
  }

  it should "drop zero-token documents and keep every other doc" in {
    packed.select("doc_id").as[Long].collect().sorted shouldBe
      Seq(1L, 2L, 4L, 5L, 6L, 7L)
  }

  it should "be invariant under physical layout" in {
    val base = packed.orderBy("doc_id").collect().toSeq
    val shuffled = Packing.concatChunk(
      docs.repartition(7).sortWithinPartitions(desc("text")),
      "doc_id", "text", seqLen, nShards = 2, salt = "spec")
      .orderBy("doc_id").collect().toSeq
    shuffled shouldBe base
  }

  it should "plan exactly one exchange (hash by shard, no global sort)" in {
    val df = packed
    df.collect()
    // AQE prints Final + Initial sections; count the final one only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges =
      plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    exchanges shouldBe 1
    plan.toLowerCase should not include "rangepartitioning"
  }

  it should "reject non-positive seqLen and out-of-range nShards" in {
    an[IllegalArgumentException] should be thrownBy
      Packing.concatChunk(docs, "doc_id", "text", 0)
    an[IllegalArgumentException] should be thrownBy
      Packing.concatChunk(docs, "doc_id", "text", 10, nShards = 1001)
  }

  it should "reject an id column that collides with an output column" in {
    an[IllegalArgumentException] should be thrownBy
      Packing.concatChunk(docs.withColumnRenamed("doc_id", "shard"),
        "shard", "text", 10)
  }
}
