package graft.operators

import graft.SparkSpec

/** MERGE/upsert: action labeling, source-wins semantics, delete-missing
  * mode, schema guard, partition invariance.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    .toDF("id", "lab", "v")
  private val source = Seq((2L, "B", 99L), (4L, "d", 40L))
    .toDF("id", "lab", "v")

  private def byId(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getString(3))).toMap

  "upsert" should "update matches, insert new keys, keep the rest" in {
    val m = byId(Merge.upsert(target, source, Seq("id")))
    m(1L) shouldBe (("a", 10L, "kept"))
    m(2L) shouldBe (("B", 99L, "updated")) // source wins
    m(3L) shouldBe (("c", 30L, "kept"))
    m(4L) shouldBe (("d", 40L, "inserted"))
  }

  it should "drop unmatched target rows with deleteMissing" in {
    val m = byId(Merge.upsert(target, source, Seq("id"),
      deleteMissing = true))
    m.keySet shouldBe Set(2L, 4L)
  }

  "auditDeletes" should "retain and label the rows deleteMissing would drop" in {
    val m = byId(Merge.auditDeletes(target, source, Seq("id")))
    m(1L) shouldBe (("a", 10L, "would-delete"))
    m(2L) shouldBe (("B", 99L, "updated"))
    m(3L) shouldBe (("c", 30L, "would-delete"))
    m(4L) shouldBe (("d", 40L, "inserted"))
    // the audit is exactly the deleteMissing=true survivor set plus the
    // labeled would-drops
    val dropped = byId(Merge.upsert(target, source, Seq("id"),
      deleteMissing = true))
    m.filterNot(_._2._3 == "would-delete") shouldBe dropped
  }

  it should "fail fast when the source misses target columns" in {
    an[IllegalArgumentException] should be thrownBy
      Merge.upsert(target, source.drop("v"), Seq("id"))
  }

  it should "be invariant under repartitioning" in {
    val a = byId(Merge.upsert(target, source, Seq("id")))
    val b = byId(Merge.upsert(target.repartition(5),
      source.repartition(3), Seq("id")))
    a shouldBe b
  }
}
