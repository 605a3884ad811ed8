package graft.pipeline

import graft.SparkSpec
import graft.dedup.NearDup
import graft.functions.TextFunctions.{bloomContains, bloomFilter}
import org.apache.spark.sql.functions._

/** Bloom runtime filter (expressions.BloomAgg/BloomContains): the
  * membership contract (no false negatives, ever), partition-count
  * invariance of the merged bitset, a false-positive-rate sanity bound
  * at the documented sizing, and exactness of the d18 fast path against
  * the plain d14 anti-join — including under a deliberately undersized
  * filter where almost every probe is a false positive.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  behavior of "graft_bloom"

  it should "never report an inserted key absent (across partitions)" in {
    val keys = (1L to 5000L).map(_ * 2654435761L)
    val bloom = keys.toDF("fp").repartition(7)
      .agg(bloomFilter($"fp", 1 << 16, 5).as("b"))
    val misses = keys.toDF("fp")
      .crossJoin(broadcast(bloom))
      .filter(!bloomContains($"b", $"fp"))
      .count()
    misses shouldBe 0L
  }

  it should "build the same bitset for any partitioning" in {
    val df = (1L to 2000L).toDF("fp")
    def bits(parts: Int): Seq[Byte] =
      df.repartition(parts).agg(bloomFilter($"fp", 1 << 12, 5).as("b"))
        .head().getAs[Array[Byte]]("b").toSeq
    bits(1) shouldBe bits(8)
  }

  it should "hold ~1% false positives at 10 bits/key, 5 hashes" in {
    val n = 3000L
    val bloom = (1L to n).toDF("fp")
      .agg(bloomFilter($"fp", 1 << 15, 5).as("b")) // 32768 bits ≈ 11/key
    val fp = (1L to n).map(_ + 1000000L).toDF("fp")
      .crossJoin(broadcast(bloom))
      .filter(bloomContains($"b", $"fp"))
      .count()
    fp.toDouble / n should be < 0.03
  }

  it should "probe from SQL via graft_bloom / graft_bloom_contains" in {
    (1L to 100L).toDF("fp").createOrReplaceTempView("bloom_keys")
    val row = spark.sql(
      """WITH b AS (SELECT graft_bloom(fp, 1024, 5) AS bl FROM bloom_keys)
        |SELECT graft_bloom_contains(bl, 42L) AS hit,
        |       graft_bloom_contains(bl, -99L) AS miss42 FROM b""".stripMargin)
      .head()
    row.getBoolean(0) shouldBe true
    // -99 was never inserted; with 1024 bits for 100 keys a false
    // positive on one fixed probe is possible but deterministic — assert
    // the inserted key only, and that the expression at least evaluates
    row.schema.fieldNames should contain("miss42")
  }

  behavior of "incrementalDedupBloom"

  private val docs = Seq(
    (1L, "the quick brown fox"), // dup of seen 4 — dropped
    (2L, "jumped over the dog"),
    (3L, "the quick brown fox"), // dup of seen 4 — dropped
    (5L, "entirely new content"), // the only survivor
    (4L, "the quick brown fox"),
    (6L, "jumped over the dog"), // seen twin of 2
    (8L, "seen only text")).toDF("doc_id", "text")

  it should "match the plain anti-join exactly" in {
    val inc = docs.filter($"doc_id" % 2 === 1)
    val seen = docs.filter($"doc_id" % 2 === 0)
    val plain = NearDup.incrementalDedup(inc, "doc_id", "text", seen, "text")
    val fast = NearDup.incrementalDedupBloom(
      inc, "doc_id", "text", seen, "text", numBits = 1 << 10)
    rowsOf(fast, "doc_id") shouldBe rowsOf(plain, "doc_id")
  }

  it should "stay exact when the filter is saturated (all probes maybe)" in {
    val inc = docs.filter($"doc_id" % 2 === 1)
    val seen = docs.filter($"doc_id" % 2 === 0)
    // 64 bits for 3 keys × 5 hashes — high FP rate by construction; the
    // verify join must absorb every false positive
    val fast = NearDup.incrementalDedupBloom(
      inc, "doc_id", "text", seen, "text", numBits = 64, numHashes = 16)
    rowsOf(fast, "doc_id") shouldBe Set(Seq(5L))
  }

  it should "reject a non-power-of-two or oversized bits argument" in {
    val inc = docs.limit(1)
    an[Exception] should be thrownBy
      inc.agg(bloomFilter(lit(1L), 1000, 5)).collect()
    an[Exception] should be thrownBy
      inc.agg(bloomFilter(lit(1L), 1 << 16, 0)).collect()
  }
}
