package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lineage.cut / Lineage.release: data identity against the uncut plan,
  * plan truncation, and the block lifecycle the operators' materialize
  * finalizers rely on.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"))
    .toDF("id", "k")
    .groupBy("k").agg(count(lit(1)).as("n"), sum("id").as("s"))

  "cut" should "return exactly the uncut frame's rows and schema" in {
    val uncut = base
    val cut = Lineage.cut(base)
    cut.schema shouldBe uncut.schema
    cut.orderBy("k").collect().toSeq shouldBe
      uncut.orderBy("k").collect().toSeq
    Lineage.release(cut)
  }

  it should "truncate the logical plan to a leaf" in {
    val cut = Lineage.cut(base)
    // the cut frame's analyzed plan is a single leaf (LogicalRDD) —
    // downstream rounds planned against it stay O(1) in plan size
    cut.queryExecution.analyzed.children shouldBe empty
    val grown = cut.join(cut.select(col("k"), col("n").as("n2")), "k")
    grown.count() shouldBe 3L
    Lineage.release(cut)
  }

  it should "survive composition across simulated rounds" in {
    var cur = Lineage.cut(base)
    val expect = base.orderBy("k").collect().toSeq
    (1 to 3).foreach { _ =>
      val next = Lineage.cut(
        cur.groupBy("k").agg(sum("n").as("n"), sum("s").as("s")))
      next.count() // materialize before releasing the input
      Lineage.release(cur)
      cur = next
    }
    cur.orderBy("k").collect().toSeq shouldBe expect
    Lineage.release(cur)
  }

  "release" should "drop the checkpoint blocks of a materialized cut" in {
    val before = spark.sparkContext.getPersistentRDDs.size
    val cut = Lineage.cut(base)
    cut.count()
    spark.sparkContext.getPersistentRDDs.size should be > before
    Lineage.release(cut)
    spark.sparkContext.getPersistentRDDs.size shouldBe before
  }

  it should "be a safe no-op on never-materialized cuts and uncut frames" in {
    val before = spark.sparkContext.getPersistentRDDs.size
    Lineage.release(Lineage.cut(base)) // lazy checkpoint, never computed
    Lineage.release(base)              // no LogicalRDD leaves at all
    spark.sparkContext.getPersistentRDDs.size shouldBe before
  }
}
