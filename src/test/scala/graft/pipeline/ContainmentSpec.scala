package graft.pipeline

import graft.SparkSpec
import graft.dedup.NearDup
import org.apache.spark.sql.functions._

/** Containment verification: exact directional arithmetic, the
  * subset-vs-Jaccard separation it exists for, threshold behavior,
  * and the LSH-composed path on guaranteed candidates.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val shortDoc = "alpha beta gamma delta epsilon zeta eta theta"
  private val longDoc = shortDoc + " iota kappa"

  private def setsOf(rows: (Long, String)*) =
    NearDup.shingleSets(rows.toDF("doc_id", "text"), "doc_id", "text", 3)

  "containmentPairs" should "compute both directions exactly" in {
    // short: 8 tokens -> 6 trigram shingles, all inside long's 8
    val sets = setsOf(1L -> shortDoc, 2L -> longDoc)
    val cand = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = NearDup.containmentPairs(cand, sets, 0.5).collect().head
    r.getDouble(2) shouldBe 1.0 +- 1e-12 // cont_ab: short in long
    r.getDouble(3) shouldBe 6.0 / 8.0 +- 1e-12
    r.getDouble(4) shouldBe 1.0 +- 1e-12 // max
  }

  it should "flag subset pairs a Jaccard threshold misses" in {
    val sets = setsOf(1L -> shortDoc, 2L -> longDoc)
    val cand = Seq((1L, 2L)).toDF("id_a", "id_b")
    // Jaccard = 6/8 = 0.75 < 0.9; containment = 1.0 >= 0.9
    NearDup.verifyPairs(cand, sets, 0.9).count() shouldBe 0L
    NearDup.containmentPairs(cand, sets, 0.9).count() shouldBe 1L
  }

  it should "respect the threshold on the max direction" in {
    val sets = setsOf(1L -> "a b c d e f", 2L -> "x y z w v u")
    val cand = Seq((1L, 2L)).toDF("id_a", "id_b")
    NearDup.containmentPairs(cand, sets, 0.01).count() shouldBe 0L
  }

  "containmentNearDuplicates" should "pair identical docs through the " +
      "LSH path at containment 1" in {
    val docs = Seq((1L, shortDoc), (2L, shortDoc),
      (3L, "different words entirely here now friends"))
      .toDF("doc_id", "text")
    val got = NearDup.containmentNearDuplicates(docs, "doc_id", "text",
        threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 2L))
  }

  it should "be invariant under repartitioning" in {
    val docs = (1L to 40L).map(i =>
      (i, s"tok${i % 6} tok${i % 5} tok${i % 4} tok${i % 3} pad$i"))
    val a = NearDup.containmentNearDuplicates(
      docs.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val b = NearDup.containmentNearDuplicates(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text",
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    a shouldBe b
  }
}
