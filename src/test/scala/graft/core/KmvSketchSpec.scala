package graft.core

import graft.SparkSpec
import graft.functions.TextFunctions.kmvSample
import graft.functions.expressions.PolyHash
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k/KMV sketch: exact sample + count below capacity, the
  * deterministic bottom-k of the polyhash permutation above it, estimate
  * error sanity, partitioning invariance (mergeable-summaries property),
  * duplicate dedup, and the SQL surface.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ph(s: String): Long = PolyHash.hash(UTF8String.fromString(s))

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int)
      : (Seq[String], Long) = {
    val r = df.agg(kmvSample(col("item"), k).as("s"))
      .select(col("s.sample"), col("s.est_distinct"))
      .collect().head
    (r.getAs[scala.collection.Seq[String]](0).toSeq, r.getLong(1))
  }

  "kmvSample" should "return every distinct item and the exact count " +
      "below capacity" in {
    val df = (Seq.fill(7)("x") ++ Seq.fill(2)("y") ++ Seq("z")).toDF("item")
    val (sample, est) = sketch(df, 10)
    sample.sorted shouldBe Seq("x", "y", "z")
    sample shouldBe sample.sortBy(s => (ph(s), s)) // hash order
    est shouldBe 3L
  }

  it should "keep the bottom-k of the hash permutation at capacity, " +
      "invariant under partitioning" in {
    val items = (1 to 500).map(i => s"item$i")
    // duplicates spread across partitions must count once
    val df = (items ++ items).toDF("item")
    val expected = items.sortBy(s => (ph(s), s)).take(32)
    for (partitions <- Seq(1, 4, 13)) {
      val (sample, est) =
        sketch(df.repartition(partitions), 32)
      sample shouldBe expected
      // deterministic KMV estimate: (k-1)*M div h_k, same every run
      est shouldBe 31L * PolyHash.Mod / ph(expected.last)
      // sanity: within 50% of the truth for k=32 on 500 distinct
      est.toDouble shouldBe 500.0 +- 250.0
    }
  }

  it should "ignore nulls and handle an all-null group" in {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("item")
    sketch(df, 8) shouldBe ((Seq("a", "b").sortBy(s => (ph(s), s)), 2L))
    val (empty, est0) = sketch(Seq.empty[Option[String]].toDF("item"), 8)
    empty shouldBe Seq.empty
    est0 shouldBe 0L
  }

  it should "be callable from SQL via graft_sample" in {
    GraftExtensions.register(spark)
    (1 to 100).map(i => s"v$i").toDF("item").createOrReplaceTempView("kmv_t")
    val r = spark.sql(
      "SELECT graft_sample(item, 16).est_distinct AS e, " +
        "size(graft_sample(item, 16).sample) AS n FROM kmv_t")
      .collect().head
    r.getInt(1) shouldBe 16
    val expected16 = (1 to 100).map(i => s"v$i")
      .sortBy(s => (ph(s), s)).take(16)
    r.getLong(0) shouldBe 15L * PolyHash.Mod / ph(expected16.last)
  }

  it should "survive serialize/deserialize round-trips losslessly" in {
    val agg = graft.functions.expressions.KmvSketch(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val buf = agg.createAggregationBuffer()
    Seq("a", "b", "c", "d", "e", "f").foreach(s => buf.add(ph(s), s))
    val rt = agg.deserialize(agg.serialize(buf))
    rt.sorted shouldBe buf.sorted
    rt.estimate shouldBe buf.estimate
  }
}
