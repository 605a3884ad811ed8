package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MRR@k: hand-computed reciprocal ranks, miss-as-zero emission, the
  * k cutoff, tie-break determinism, and the exact-integer mean.
  */
class MrrSpec extends SparkSpec {
  import spark.implicits._

  // two queries: q1's first relevant sits at rank 2; q2 has relevance
  // only at rank 4; q3 has NO relevant item at all
  private def ranked = Seq(
    ("q1", 1L, 9.0, 0L), ("q1", 2L, 8.0, 1L), ("q1", 3L, 7.0, 1L),
    ("q2", 1L, 9.0, 0L), ("q2", 2L, 8.0, 0L), ("q2", 3L, 7.0, 0L),
    ("q2", 4L, 6.0, 2L),
    ("q3", 1L, 9.0, 0L), ("q3", 2L, 8.0, 0L))
    .toDF("q", "id", "score", "rel")

  "reciprocalRankAtK" should "find the first relevant rank per query" in {
    val out = Mrr.reciprocalRankAtK(ranked, "q", "id", "score", "rel",
        k = 10).collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2)))
      .toMap
    out("q1") shouldBe ((Some(2L), Mrr.Scale / 2))
    out("q2") shouldBe ((Some(4L), Mrr.Scale / 4))
    out("q3") shouldBe ((None, 0L)) // miss emitted, not dropped
  }

  it should "respect the k cutoff" in {
    val out = Mrr.reciprocalRankAtK(ranked, "q", "id", "score", "rel",
        k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    out("q1") shouldBe Mrr.Scale / 2
    out("q2") shouldBe 0L // its first relevant sits at rank 4 > k
  }

  it should "break score ties by id ascending, deterministically" in {
    val tied = Seq(("q", 5L, 1.0, 0L), ("q", 2L, 1.0, 1L),
      ("q", 9L, 1.0, 1L)).toDF("q", "id", "score", "rel")
    // order by (score desc, id asc): 2, 5, 9 -> first relevant is id 2
    // at rank 1
    Mrr.reciprocalRankAtK(tied, "q", "id", "score", "rel", k = 3)
      .collect().head.getLong(1) shouldBe 1L
  }

  "mrrAtK" should "average exact integer contributions" in {
    val row = Mrr.mrrAtK(ranked, "q", "id", "score", "rel", k = 10)
      .collect().head
    row.getLong(0) shouldBe 3L
    row.getLong(1) shouldBe (Mrr.Scale / 2 + Mrr.Scale / 4)
    row.getDouble(2) shouldBe
      ((Mrr.Scale / 2 + Mrr.Scale / 4).toDouble / (3.0 * Mrr.Scale))
  }
}
