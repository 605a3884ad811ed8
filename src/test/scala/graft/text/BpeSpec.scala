package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  private def loop(texts: Seq[String], merges: Int) =
    Bpe.mergeLoop(texts.map(Tuple1(_)).toDF("text"), "text", merges)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))

  "mergeLoop" should "iterate merges over the rewritten corpus" in {
    // 'abab ab': round 1 counts (a,b)=3 (b,a)=1 -> merge (a,b);
    // corpus becomes 'ab ab' / 'ab'; round 2 merges (ab,ab)=1;
    // corpus 'abab' / 'ab' has no pairs left -> loop stops at 2 rows.
    loop(Seq("abab ab"), 3) shouldBe Array(
      (1L, "a", "b", 3L), (2L, "ab", "ab", 1L))
  }

  it should "apply merges greedily left-to-right (no overlap)" in {
    // 'aaa': (a,a) counts 2 but merges ONCE -> 'aa a'; round 2 merges
    // (aa,a) once -> 'aaa'.
    loop(Seq("aaa"), 2) shouldBe Array(
      (1L, "a", "a", 2L), (2L, "aa", "a", 1L))
  }

  it should "break winner ties on the space-joined pair ascending" in {
    loop(Seq("ab cd"), 1) shouldBe Array((1L, "a", "b", 1L))
  }

  it should "respect word boundaries across rounds" in {
    // merging (a,b) in 'ab ba' never creates a cross-token pair
    val got = loop(Seq("ab ba", "ab"), 2)
    got(0) shouldBe ((1L, "a", "b", 2L))
    got(1) shouldBe ((2L, "b", "a", 1L))
  }

  it should "be invariant under repartitioning" in {
    val texts = (1 to 40).map(i => s"alpha${i % 3} beta${i % 5}")
    val a = loop(texts, 3)
    val b = Bpe.mergeLoop(
        texts.map(Tuple1(_)).toDF("text").repartition(9), "text", 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    b shouldBe a
  }

  "applyMerges" should "encode new tokens with a stored merge table" in {
    val got = Bpe.applyMerges(
        Seq("abab", "aab", "xy").map(Tuple1(_)).toDF("tok"), "tok",
        Seq(("a", "b"), ("ab", "ab")))
      .select("encoded").collect().map(_.getSeq[String](0))
    got(0) shouldBe Seq("abab") // ab+ab then merged pairwise
    got(1) shouldBe Seq("a", "ab") // greedy: first a survives
    got(2) shouldBe Seq("x", "y") // untouched vocabulary
  }

  "encodeTopTokens" should "census the corpus through its own merges" in {
    // one merge on 'abab ab ab': round 1 merges (a,b); corpus becomes
    // ab ab / ab / ab -> token 'ab' x4
    val got = Bpe.encodeTopTokens(
        Seq("abab ab ab").map(Tuple1(_)).toDF("text"), "text",
        merges = 1, k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    got shouldBe Array((1L, "ab", 4L))
  }

  private def byteLoop(texts: Seq[String], merges: Int) =
    Bpe.byteMergeLoop(texts.map(Tuple1(_)).toDF("text"), "text", merges)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))

  "byteMergeLoop" should "merge hex-byte symbols with the end-of-word marker" in {
    // 'abab ab': a=61 b=62; round 1 counts (61,62)=3 (62,61)=1 (62,.)=2
    // -> merge (61,62); round 2: '6162 6162 .' + '6162 .' counts
    // (6162,.)=2 (6162,6162)=1 -> merge (6162,.); round 3 merges the
    // remaining (6162, 6162.) pair once.
    byteLoop(Seq("abab ab"), 3) shouldBe Array(
      (1L, "61", "62", 3L), (2L, "6162", ".", 2L),
      (3L, "6162", "6162.", 1L))
  }

  it should "preserve case (no casefold at byte level)" in {
    // char-level lowercases 'AB ab' to two 'ab's (pair count 2);
    // byte-level keeps 41 42 distinct from 61 62 — all pairs count 1
    // and the winner falls to the tie-break: '41 42' ascii-first.
    byteLoop(Seq("AB ab"), 1) shouldBe Array((1L, "41", "42", 1L))
  }

  it should "give single-char words a byte+marker pair" in {
    // char-level skips 1-char words (no pair); byte-level still learns
    // the word-final unit: 'a .' twice beats 'b .' once
    byteLoop(Seq("a a b"), 1) shouldBe Array((1L, "61", ".", 1L + 1L))
  }

  it should "learn multi-byte UTF-8 merges bytewise" in {
    // 'éé' is c3 a9 c3 a9 + marker; (c3,a9) counts 2 per word ->
    // merges first across the 3-word corpus
    val got = byteLoop(Seq("éé éé x"), 1)
    got shouldBe Array((1L, "c3", "a9", 4L))
  }

  "applyMergesBytes" should "round-trip every word through decode" in {
    val texts = Seq("héllo wörld", "héllo mix", "a béta mix")
    val df = texts.map(Tuple1(_)).toDF("text")
    val table = Bpe.byteMergeLoop(df, "text", 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    table.length shouldBe 4
    val words = df
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(org.apache.spark.sql.functions.length(col("tok")) >= 1)
      .distinct()
    val got = Bpe.applyMergesBytes(words, "tok", table)
      .select(col("tok"), col("encoded")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
    got.length should be > 0
    got.foreach { case (word, encoded) =>
      // bytes concatenate across symbols, then decode ONCE — the
      // marker rides the final symbol and strips in decode
      Bpe.decodeByteSymbols(encoded) shouldBe word
      encoded.last should endWith(".")
    }
  }

  it should "round-trip when a merge splits a multi-byte char across symbols" in {
    // 'ö' is c3 b6; the hand-built table merges (b6, .) FIRST, leaving
    // the lone continuation byte c3 in its own symbol: ["c3", "b6."].
    // Per-symbol decode of "c3" is U+FFFD (not round-trip-safe by
    // design); the word-level decode concatenates bytes first and
    // recovers the character exactly.
    val words = Seq("ö", "wörld").map(Tuple1(_)).toDF("tok")
    val got = Bpe.applyMergesBytes(words, "tok", Seq(("b6", ".")))
      .select(col("tok"), col("encoded")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    got("ö") shouldBe Seq("c3", "b6.")
    Bpe.decodeByteSymbols(got("ö")) shouldBe "ö"
    Bpe.decodeByteSymbols(got("wörld")) shouldBe "wörld"
    // the per-symbol decode really is alignment-dependent here
    Bpe.decodeByteSymbol("c3") shouldBe "�"
  }

  it should "agree with encodeTopTokensBytes on the learned table" in {
    // the t53 equivalence in byte form: serving the corpus words through
    // the stored table reproduces the training loop's own final symbol
    // census exactly (applying merges in order IS the training rewrite)
    val texts = (1 to 30).map(i => s"gamma${i % 4} delta${i % 3}")
    val df = texts.map(Tuple1(_)).toDF("text")
    val table = Bpe.byteMergeLoop(df, "text", 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val words = df.select(
      explode(split(col("text"), "\\s+")).as("tok"))
    val viaApply = Bpe.applyMergesBytes(words, "tok", table)
      .select(explode(col("encoded")).as("sym"))
      .groupBy("sym").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaCensus = Bpe.encodeTopTokensBytes(df, "text", 3, 1000)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    viaApply shouldBe viaCensus
  }

  it should "agree with applyMerges on the mergeLoop table" in {
    val texts = (1 to 30).map(i => s"gamma${i % 4} delta${i % 3}")
    val df = texts.map(Tuple1(_)).toDF("text")
    val table = Bpe.mergeLoop(df, "text", 2).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val viaApply = Bpe.applyMerges(
        df.select(explode(split(lower(col("text")), "\\s+")).as("tok"))
          .filter(org.apache.spark.sql.functions.length(col("tok")) >= 2),
        "tok", table)
      .select(explode(col("encoded")).as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaEncode = Bpe.encodeTopTokens(df, "text", 2, 1000)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    viaApply shouldBe viaEncode
  }
}
