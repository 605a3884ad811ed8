package graft.text

import graft.SparkSpec

/** BPE pair mining: hand-counted pairs, word-boundary convention,
  * deterministic tie cut, min-count pruning, partition invariance.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String], k: Int, minCount: Long = 1L) =
    Bpe.topPairs(texts.map(Tuple1(_)).toDF("text"), "text", k, minCount)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  "topPairs" should "count word-internal adjacent pairs" in {
    // 'abab' -> ab, ba, ab; 'ab' -> ab
    val got = run(Seq("abab ab"), 10)
    got.head shouldBe ((1L, "ab", 3L))
    got.map(t => t._2 -> t._3).toMap.apply("ba") shouldBe 1L
  }

  it should "not pair across word boundaries and lowercase first" in {
    // 'xy ZX' yields xy and zx — never 'y z' or 'yz'
    val got = run(Seq("xy ZX"), 10).map(_._2).toSet
    got shouldBe Set("xy", "zx")
  }

  it should "break count ties on the pair string ascending" in {
    val got = run(Seq("aa bb cc"), 3)
    got.map(_._2) shouldBe Array("aa", "bb", "cc")
    got.map(_._1) shouldBe Array(1L, 2L, 3L)
  }

  it should "prune below minCount and ignore single-char tokens" in {
    val got = run(Seq("zz zz q r s"), 10, minCount = 2L)
    got.map(_._2) shouldBe Array("zz")
  }

  it should "be invariant under repartitioning" in {
    val texts = (1 to 60).map(i => s"tok${i % 7} word${i % 5} pad")
    val a = run(texts, 15)
    val b = Bpe.topPairs(
        texts.map(Tuple1(_)).toDF("text").repartition(9), "text", 15)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    b shouldBe a
  }
}
