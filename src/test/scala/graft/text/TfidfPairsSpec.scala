package graft.text

import graft.SparkSpec

/** TF-IDF cosine pairs: hand-computed weights, identical-document
  * limit, df-cap exclusion, threshold filtering, partition invariance.
  */
class TfidfPairsSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], threshold: Double,
      maxDf: Long) =
    TfidfPairs.cosinePairs(docs.toDF("doc_id", "text"), "doc_id",
        "text", threshold, maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

  "cosinePairs" should "match the hand-computed quantized cosine" in {
    // N=3; df(x)=2 -> idf_milli = floor(ln(1.5)*1000+.5) = 405
    //       df(y)=df(z)=df(w)=1 -> floor(ln(3)*1000+.5) = 1099
    // doc1={x,y}, doc2={x,z}: dot = 405^2 = 164025
    // norms^2 = 405^2 + 1099^2 = 1371826 each
    val m = run(Seq((1L, "x y"), (2L, "x z"), (3L, "w")), 0.05, 10L)
    val (dot, cos) = m((1L, 2L))
    dot shouldBe 164025L
    cos shouldBe 164025.0 / 1371826.0 +- 1e-15
  }

  it should "score identical documents at cosine 1" in {
    val m = run(Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "other words entirely")), 0.9, 10L)
    m.keySet shouldBe Set((1L, 2L))
    m((1L, 2L))._2 shouldBe 1.0 +- 1e-12
  }

  it should "drop terms above the df cap from the representation" in {
    // 'the' is in 3 of 4 docs (idf > 0); with maxDf=2 it vanishes and
    // the only shared term is gone -> no pair survives any threshold
    val docs = Seq((1L, "the cat"), (2L, "the dog"), (3L, "the bird"),
      (4L, "plain fish"))
    run(docs, 0.0001, 2L) shouldBe empty
    // raising the cap restores the pairs
    run(docs, 0.0001, 3L).keySet should not be empty
  }

  it should "not pair disjoint documents" in {
    run(Seq((1L, "aa bb"), (2L, "cc dd")), 0.0, 10L) shouldBe empty
  }

  it should "be invariant under repartitioning" in {
    val docs = (1L to 30L).map(i =>
      (i, s"tok${i % 5} tok${i % 7} tok${i % 3} filler$i"))
    val a = run(docs, 0.2, 20L)
    val b = TfidfPairs.cosinePairs(
        docs.toDF("doc_id", "text").repartition(9), "doc_id", "text",
        0.2, 20L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    a shouldBe b
  }
}
