package graft.pipeline

import graft.SparkSpec
import graft.dedup.NearDup

/** Prefix-filtered exact Jaccard join: result equality with the brute
  * all-pairs join (the exactness claim), threshold edges, short-doc
  * fallback sets, partition invariance.
  */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map { i =>
      val base = (0 until 12).map(k => s"w${(i * 7 + k * 3) % 15}")
      val toks = if (rnd.nextBoolean() && i > 1)
        // near-copy of a smaller id with light edits
        (0 until 12).map(k => s"w${((i - 1) * 7 + k * 3) % 15}")
          .updated(rnd.nextInt(12), s"edit$i")
      else base
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame, t: Double) =
    NearDup.prefixJaccardPairs(df, "doc_id", "text", 3, t)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet

  private def bruteOf(df: org.apache.spark.sql.DataFrame, t: Double) =
    NearDup.bruteForceJaccardPairs(df, "doc_id", "text", 3, t)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet

  "prefixJaccardPairs" should "equal the brute-force join exactly" in {
    val df = corpus(42, 60)
    for (t <- Seq(0.5, 0.8, 0.95))
      pairsOf(df, t) shouldBe bruteOf(df, t)
  }

  it should "find identical docs at threshold 1.0 (prefix length 1)" in {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c x y"))
      .toDF("doc_id", "text")
    val got = pairsOf(df, 1.0)
    got.map(p => (p._1, p._2)) shouldBe Set((1L, 2L))
  }

  it should "handle short documents through the token-fallback sets" in {
    // < 3 tokens: shingleSets falls back to raw tokens
    val df = Seq((1L, "solo pair"), (2L, "solo pair"), (3L, "other"))
      .toDF("doc_id", "text")
    pairsOf(df, 0.9).map(p => (p._1, p._2)) shouldBe Set((1L, 2L))
  }

  it should "be invariant under repartitioning" in {
    val df = corpus(7, 40)
    pairsOf(df.repartition(9), 0.7) shouldBe pairsOf(df, 0.7)
  }
}
