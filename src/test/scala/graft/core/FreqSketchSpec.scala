package graft.core

import graft.SparkSpec
import graft.functions.TextFunctions.freqSketch
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitter sketch: exact below capacity, one-sided error
  * bounds against the exact counts above it, guarantees stable under
  * partitioning (the mergeable-summaries property), and the SQL surface.
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  // 500×a + 300×b + 100×c + 200 distinct singletons, N = 1100
  private def items =
    (Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ Seq.fill(100)("c") ++
      (1 to 200).map(i => s"tail$i")).toDF("item")

  private def exact: Map[String, Long] = Map("a" -> 500L, "b" -> 300L,
    "c" -> 100L) ++ (1 to 200).map(i => s"tail$i" -> 1L)

  private def sketchRows(m: Int, partitions: Int): Seq[(String, Long, Long)] =
    items.repartition(partitions)
      .agg(freqSketch(col("item"), m).as("sk"))
      .collect().head.getAs[scala.collection.Seq[Row]](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  "freqSketch" should "be exact when cardinality fits the capacity" in {
    val rows = (Seq.fill(5)("x") ++ Seq.fill(3)("y")).toDF("item")
      .agg(freqSketch(col("item"), 10))
      .collect().head.getAs[scala.collection.Seq[Row]](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows shouldBe Seq(("x", 5L, 0L), ("y", 3L, 0L))
  }

  it should "bound every estimate and keep guaranteed heavy hitters" in {
    for (partitions <- Seq(1, 4, 13)) {
      val rows = sketchRows(m = 5, partitions)
      rows.size should be <= 5
      val est = rows.map { case (i, e, _) => i -> e }.toMap
      val err = rows.head._3
      // est <= true <= est + err, for every monitored item
      rows.foreach { case (item, e, d) =>
        e should be <= exact(item)
        exact(item) should be <= (e + d)
      }
      // any item above N/(m+1) = 1100/6 must be present
      est.keySet should contain allOf ("a", "b")
      // absent items are bounded by err too: true <= err
      (exact.keySet -- est.keySet).foreach { item =>
        exact(item) should be <= err
      }
    }
  }

  it should "order the output by estimate descending" in {
    val rows = sketchRows(m = 5, partitions = 4)
    rows.map(_._2) shouldBe rows.map(_._2).sorted.reverse
    rows.head._1 shouldBe "a"
  }

  it should "work grouped and via the SQL surface" in {
    GraftExtensions.register(spark)
    items.withColumn("g", lit(1)).createOrReplaceTempView("fs_items")
    val viaSql = spark.sql(
      "SELECT g, graft_freq(item, 5) AS sk FROM fs_items GROUP BY g")
      .collect().head.getAs[scala.collection.Seq[Row]](1)
    viaSql.head.getString(0) shouldBe "a"
  }

  it should "reject a non-literal or out-of-range capacity" in {
    an[Exception] should be thrownBy
      items.agg(freqSketch(col("item"), 0)).collect()
  }
}
