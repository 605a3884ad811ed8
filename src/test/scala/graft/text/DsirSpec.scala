package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (100L, "cats purr softly cats nap in sunbeams"),
    (101L, "a cat naps and the cats purr"),
    (102L, "purr purr cats love warm sunbeams")).toDF("doc_id", "text")

  private val pool = Seq(
    (1L, "cats purr in warm sunbeams"),
    (2L, "dogs bark loudly at the mail"),
    (3L, "the cats nap and purr all day"),
    (4L, "stock markets fell sharply on tuesday"),
    (5L, "dogs chase the ball in the park")).toDF("doc_id", "text")

  "importanceWeights" should "rank target-like pool documents above the rest" in {
    val w = Dsir.importanceWeights(pool, target, "doc_id", "text", 1024)
      .orderBy(desc("logw"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    w.take(2).toSet shouldBe Set(1L, 3L) // the two cat documents
    w.size shouldBe 5
  }

  it should "omit documents with no tokens and be partitioning-invariant" in {
    val poolE = pool.union(Seq((6L, "   ")).toDF("doc_id", "text"))
    val a = Dsir.importanceWeights(poolE, target, "doc_id", "text", 256)
    val b = Dsir.importanceWeights(poolE.repartition(7), target.repartition(3),
      "doc_id", "text", 256)
    a.count() shouldBe 5L // the whitespace-only doc has no features
    a.orderBy("doc_id").collect().toSeq shouldBe
      b.orderBy("doc_id").collect().toSeq
  }

  "selectTopK" should "flag exactly k docs, ranked by weight with id tie-break" in {
    val w = Dsir.importanceWeights(pool, target, "doc_id", "text", 1024)
    val sel = Dsir.selectTopK(w, "doc_id", k = 2).orderBy("rank")
    sel.filter(col("selected") === 1).count() shouldBe 2L
    sel.select("rank").as[Int].collect().toSeq shouldBe (1 to 5)
    sel.filter(col("selected") === 1).select("doc_id")
      .as[Long].collect().toSet shouldBe Set(1L, 3L)
  }

  "gumbelTopK" should "be deterministic and sample k docs" in {
    val w = Dsir.importanceWeights(pool, target, "doc_id", "text", 1024)
    val a = Dsir.gumbelTopK(w, "doc_id", k = 3)
    val b = Dsir.gumbelTopK(w.repartition(4), "doc_id", k = 3)
    a.filter(col("selected") === 1).count() shouldBe 3L
    a.orderBy("rank").collect().toSeq shouldBe b.orderBy("rank").collect().toSeq
  }
}
