package graft.pipeline

import graft.SparkSpec
import graft.text.NbClassifier

/** Naive Bayes hashed-feature classifier (text/NbClassifier): learns
  * separable vocabulary, held-out generalization, prior fallback for
  * unseen features, partition invariance of the trained weights.
  */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256

  // two clearly-separated vocabularies + one label with more documents
  // (so the prior alone prefers it)
  private lazy val corpus = Seq(
    (1L, "food", "apple banana cherry apple"),
    (2L, "food", "banana cherry mango apple"),
    (3L, "food", "cherry apple mango banana"),
    (4L, "tech", "kernel compiler socket thread"),
    (5L, "tech", "compiler socket kernel buffer")
  ).toDF("id", "label", "text")

  behavior of "NbClassifier"

  it should "fit the training corpus it was trained on" in {
    val pred = NbClassifier.trainScore(corpus, "id", "label", "text", B)
      .select("id", "pred").as[(Long, String)].collect().toMap
    pred shouldBe Map(1L -> "food", 2L -> "food", 3L -> "food",
      4L -> "tech", 5L -> "tech")
  }

  it should "generalize to held-out documents by vocabulary" in {
    val m = NbClassifier.train(corpus, "label", "text", B)
    val unseen = Seq((10L, "mango mango banana"),
      (11L, "buffer thread compiler")).toDF("id", "text")
    val pred = NbClassifier.score(unseen, "id", "text", m, B)
      .select("id", "pred").as[(Long, String)].collect().toMap
    pred shouldBe Map(10L -> "food", 11L -> "tech")
  }

  it should "fall back to the prior for wholly unseen vocabulary" in {
    val m = NbClassifier.train(corpus, "label", "text", B)
    // every token unseen -> per-label score = lpr + n*lw0; "food" has the
    // larger prior (3 of 5 docs) and the larger corpus makes its lw0
    // smaller in magnitude only through tot, so verify the argmax matches
    // the hand-computed winner rather than assuming
    val meta = m.labelMeta.select("label", "lpr", "lw0")
      .as[(String, Long, Long)].collect()
    val expected = meta.toSeq
      .map { case (l, lpr, lw0) => (l, lpr + 3 * lw0) }
      .maxBy { case (l, s) => (s, l) }._1
    val pred = NbClassifier.score(
      Seq((20L, "zebra quark flux")).toDF("id", "text"), "id", "text", m, B)
      .select("pred").as[String].head()
    pred shouldBe expected
  }

  it should "train identical weights under any partitioning" in {
    val m1 = NbClassifier.train(corpus, "label", "text", B)
    val m7 = NbClassifier.train(corpus.repartition(7), "label", "text", B)
    m1.tokenWeights.orderBy("label", "bucket").collect() shouldBe
      m7.tokenWeights.orderBy("label", "bucket").collect()
    m1.labelMeta.orderBy("label").collect() shouldBe
      m7.labelMeta.orderBy("label").collect()
  }

  it should "omit documents with no tokens" in {
    val m = NbClassifier.train(corpus, "label", "text", B)
    NbClassifier.score(Seq((30L, "   ")).toDF("id", "text"),
      "id", "text", m, B).count() shouldBe 0L
  }

  it should "score identically through the compiled map-only path" in {
    val m = NbClassifier.train(corpus, "label", "text", B)
    val c = NbClassifier.compile(m, B)
    val docs = corpus.select($"id", $"text")
      .unionByName(Seq((12L, "apple kernel zebra")).toDF("id", "text"))
    val viaJoin = NbClassifier.score(docs, "id", "text", m, B)
      .orderBy("id").collect()
    val compiled = NbClassifier.scoreCompiled(docs, "id", "text", c)
    compiled.orderBy("id").collect() shouldBe viaJoin
    // serving shape: no join, no exchange — pure per-row expressions
    compiled.queryExecution.executedPlan.toString should
      not include "Exchange"
  }

  it should "score a stream with the compiled model in append mode" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val m = NbClassifier.train(corpus, "label", "text", B)
    val c = NbClassifier.compile(m, B)
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val scored = NbClassifier.scoreCompiled(
      source.toDF().toDF("id", "text"), "id", "text", c)
    val q = scored.writeStream.format("memory")
      .queryName("nb_stream").outputMode("append").start()
    try {
      source.addData((100L, "banana mango cherry"),
        (101L, "socket kernel thread"))
      q.processAllAvailable()
      val out = spark.sql("SELECT id, pred FROM nb_stream")
        .as[(Long, String)].collect().toMap
      out shouldBe Map(100L -> "food", 101L -> "tech")
    } finally q.stop()
  }

  it should "reject a degenerate bucket count" in {
    an[IllegalArgumentException] should be thrownBy
      NbClassifier.train(corpus, "label", "text", 1)
  }
}
