package graft.core

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.functions.expressions.PolyHash
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch: cell arithmetic against the hand-replicated
  * formula, one-sided estimates, collision overestimation, cell-sum
  * mergeability, partition invariance.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def bucketOf(j: Int, item: String, width: Int): Long =
    (PolyHash.hash(UTF8String.fromString(item)) * TextFunctions.MinHashA(j) +
      TextFunctions.MinHashB(j)) % TextFunctions.HashMod % width

  private val items = Seq("a", "a", "a", "b", "b", "c").toDF("item")

  "build" should "produce exactly the hand-computed cells" in {
    val cells = CountMin.build(items, "item", width = 64, depth = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = Seq("a" -> 3L, "b" -> 2L, "c" -> 1L)
      .flatMap { case (it, n) =>
        (0 until 2).map(j => (j, bucketOf(j, it, 64)) -> n)
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    cells shouldBe expected
  }

  "estimate" should "never underestimate and be exact without collisions" in {
    val sk = CountMin.build(items, "item", 64, 2)
    val probes = Seq("a", "b", "c", "zzz").toDF("item")
    val est = CountMin.estimate(sk, probes, "item", 64, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 distinct items in 64 buckets x 2 rows: collisions would show as
    // overshoot; verify against the true counts computed the same way
    est("a") should be >= 3L
    est("b") should be >= 2L
    est("c") should be >= 1L
    est("zzz") should be >= 0L
    if (Seq("a", "b", "c").flatMap(i => (0 until 2).map(j =>
      (j, bucketOf(j, i, 64)))).distinct.size == 6) {
      est("a") shouldBe 3L
      est("b") shouldBe 2L
      est("c") shouldBe 1L
    }
  }

  it should "overestimate under forced collisions, never underestimate" in {
    val sk = CountMin.build(items, "item", width = 2, depth = 1)
    val est = CountMin.estimate(sk, Seq("a", "b", "c").toDF("item"),
        "item", 2, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est("a") should be >= 3L
    est("b") should be >= 2L
    est("c") should be >= 1L
    est.values.sum should be >= 6L
  }

  "cells" should "merge by summing — two halves equal the full build" in {
    val h1 = CountMin.build(Seq("a", "a", "b").toDF("item"), "item", 64, 2)
    val h2 = CountMin.build(Seq("a", "b", "c").toDF("item"), "item", 64, 2)
    val merged = h1.unionByName(h2)
      .groupBy("row", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = CountMin.build(items, "item", 64, 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    merged shouldBe full
  }

  it should "be invariant under repartitioning" in {
    val a = CountMin.build(items, "item", 32, 3)
      .orderBy("row", "bucket").collect().map(_.toSeq)
    val b = CountMin.build(items.repartition(5), "item", 32, 3)
      .orderBy("row", "bucket").collect().map(_.toSeq)
    a shouldBe b
  }

  it should "reject out-of-range dimensions" in {
    an[IllegalArgumentException] should be thrownBy
      CountMin.build(items, "item", 1, 2)
    an[IllegalArgumentException] should be thrownBy
      CountMin.build(items, "item", 8, CountMin.MaxDepth + 1)
  }
}
