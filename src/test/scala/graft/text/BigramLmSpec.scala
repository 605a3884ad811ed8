package graft.text

import graft.SparkSpec

/** Bigram LM: hand-replayed micro-nat arithmetic, event counting,
  * transition sensitivity, degenerate docs.
  */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)], lambda: Double = 0.75) =
    BigramLm.scoreDocs(docs.toDF("doc_id", "text"), "doc_id", "text",
        lambda)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3))))
      .toMap

  "scoreDocs" should "replay the micro-nat model exactly" in {
    // corpus: "a b" / "a b a" → unigrams a:3 b:2, N=5 V=2
    // bigrams: (a,b):2, (b,a):1 ; c1(a)=3, c1(b)=2
    val out = score(Seq((1L, "a b"), (2L, "a b a")))
    def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val nv = 5.0 + 2.0
    val lpFirstA = q((3.0 + 1.0) / nv)                       // both docs start with a
    val lpAB = q(0.75 * (2.0 / 3.0) + 0.25 * ((2.0 + 1.0) / nv))
    val lpBA = q(0.75 * (1.0 / 2.0) + 0.25 * ((3.0 + 1.0) / nv))
    out(1L)._1 shouldBe 2L
    out(1L)._2 shouldBe (lpFirstA + lpAB)
    out(2L)._1 shouldBe 3L
    out(2L)._2 shouldBe (lpFirstA + lpAB + lpBA)
    out(2L)._3 shouldBe (-(lpFirstA + lpAB + lpBA).toDouble / 1e6 / 3.0)
  }

  it should "score predictable transitions better than scrambled ones" in {
    // same unigram content; doc 2's transitions are rare in the corpus
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a b a b a b"), (3L, "a b a b a b"),
      (4L, "b b b a a a"))
    val out = score(docs)
    out(4L)._3 should be > out(1L)._3
  }

  it should "score a single-token doc by the smoothed unigram alone" in {
    val out = score(Seq((1L, "x")))
    // p = (1+1)/(1+1) = 1 → lp 0 → nll 0
    out(1L) shouldBe ((1L, 0L, 0.0))
  }

  it should "omit empty documents and count events = tokens" in {
    val out = score(Seq((1L, "   "), (2L, "w x y z")))
    out.keySet shouldBe Set(2L)
    out(2L)._1 shouldBe 4L
  }

  it should "reject a degenerate lambda" in {
    an[IllegalArgumentException] should be thrownBy
      score(Seq((1L, "a b")), lambda = 1.0)
  }
}
