package graft.text

import graft.SparkSpec
import graft.functions.expressions.{ViterbiSegment, VocabTable}
import org.apache.spark.sql.functions._

class UnigramTokSpec extends SparkSpec {
  import spark.implicits._

  private def seg(word: String, vocab: Map[String, Long]): Option[Seq[String]] = {
    val df = Seq(Tuple1(word)).toDF("w")
    val out = df.select(UnigramTok.segment($"w", VocabTable(vocab)).as("p"))
      .collect()(0)
    if (out.isNullAt(0)) None else Some(out.getSeq[String](0))
  }

  /** Exhaustive reference: enumerate EVERY segmentation, order by the
    * (cost, count, boundary-mask) triple — the same total order the
    * t58 oracle's recursive CTE replays.
    */
  private def brute(word: String, vocab: Map[String, Long])
      : Option[Seq[String]] = {
    def all(pos: Int): Seq[List[String]] =
      if (pos == word.length) Seq(Nil)
      else (1 to math.min(6, word.length - pos)).flatMap { l =>
        val p = word.substring(pos, pos + l)
        if (vocab.contains(p)) all(pos + l).map(p :: _) else Nil
      }
    val cands = all(0).map { pieces =>
      val cost = pieces.map(vocab).sum
      val mask = pieces.init.scanLeft(0)(_ + _.length).tail
        .map(j => 1L << j).sum
      ((cost, pieces.length, mask), pieces)
    }
    if (cands.isEmpty) None
    else Some(cands.minBy(_._1)._2)
  }

  behavior of "ViterbiSegment"

  it should "match the exhaustive argmin on random vocabularies" in {
    val rng = new scala.util.Random(31)
    val alphabet = "abc"
    for (trial <- 0 until 60) {
      val word = Seq.fill(3 + rng.nextInt(9))(
        alphabet(rng.nextInt(alphabet.length))).mkString
      // random subword vocab over the alphabet; all chars kept so every
      // word segments
      val pieces = (alphabet.map(_.toString) ++
        Seq.fill(8)(Seq.fill(2 + rng.nextInt(3))(
          alphabet(rng.nextInt(alphabet.length))).mkString)).distinct
      val vocab = pieces.map(p => p -> (100000L + rng.nextInt(900000))).toMap
      withClue(s"trial $trial word=$word vocab=$vocab: ") {
        seg(word, vocab) shouldBe brute(word, vocab)
      }
    }
  }

  it should "prefer fewer pieces, then the longest final piece, on cost ties" in {
    val vocab = Map("a" -> 10L, "aa" -> 20L)
    // a|a|a (cost 30, np 3), a|aa (30, 2, mask 2), aa|a (30, 2, mask 4):
    // the mask term resolves to the longest LAST piece
    seg("aaa", vocab) shouldBe Some(Seq("a", "aa"))
  }

  it should "return null for unsegmentable or over-long words" in {
    seg("xyz", Map("a" -> 1L)) shouldBe None
    seg("a" * 63, Map("a" -> 1L)) shouldBe None
    (seg("a" * 62, Map("a" -> 1L)) should not be None)
  }

  it should "index by code points, not UTF-16 units" in {
    val g = "𝄞" // 𝄞 U+1D11E, one code point, two UTF-16 units
    // 40 astral chars = 80 UTF-16 units: the 62-position limit counts
    // code points (the oracle's len()), so this must segment
    seg(g * 40, Map(g -> 5L)) shouldBe Some(Seq.fill(40)(g))
    // pieces spanning an astral char resolve at code-point boundaries
    seg(s"${g}ab",
      Map(g -> 10L, "a" -> 10L, "b" -> 10L, s"${g}a" -> 15L)) shouldBe
      Some(Seq(s"${g}a", "b"))
    // the limit still rejects 63 code points
    seg(g * 63, Map(g -> 1L)) shouldBe None
  }

  behavior of "UnigramTok"

  private def corpus = Seq(
    "the cat sat on the mat",
    "the mats sat on the cats",
    "a cat and a mat and a hat",
    "hats and mats and cats").toDF("text")

  it should "seed a vocabulary that segments every censused word" in {
    val words = UnigramTok.wordCensus(corpus, "text")
    val vocab = UnigramTok.vocabOf(
      UnigramTok.seedVocab(words, maxPieceLen = 4, multiPieces = 30))
    val nulls = words.select(UnigramTok.segment($"word", vocab).as("p"))
      .filter($"p".isNull).count()
    nulls shouldBe 0
  }

  it should "drive corpus cost monotonically down under hard EM" in {
    val words = UnigramTok.wordCensus(corpus, "text")
    words.persist()
    val totalW = words.agg(sum($"wcnt")).as[Long].head()
    var vocabDf = UnigramTok.seedVocab(words, maxPieceLen = 4,
      multiPieces = 50)
    var prev = UnigramTok.corpusCost(words, UnigramTok.vocabOf(vocabDf))
    for (_ <- 1 to 3) {
      val counts = UnigramTok.estepCounts(words, UnigramTok.vocabOf(vocabDf))
      val next = UnigramTok.emTrainStep(words, counts)
      val cost = UnigramTok.corpusCost(words, UnigramTok.vocabOf(next))
      // hard EM is coordinate descent on this objective; the slack term
      // covers micro-nat rounding (≤ ~1 micro-nat per emitted piece)
      cost should be <= prev + 10L * totalW
      prev = cost
    }
    words.unpersist()
  }

  it should "match an independent driver-side replay of two hard-EM rounds" in {
    // the t59 contract in miniature: seed → (exhaustive-argmin E-step →
    // char-floored M-step → renormalize) × 2, re-derived here with the
    // brute segmenter and Scala collections — an independent engine for
    // every stage of emTrainWords, costs included
    val words = UnigramTok.wordCensus(corpus, "text")
    val census: Map[String, Long] = words.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def withCostsRef(cnts: Map[String, Long]): Map[String, (Long, Long)] = {
      val total = cnts.values.sum
      cnts.map { case (p, c) =>
        p -> (c, -math.floor(
          math.log(c.toDouble / total.toDouble) * 1e6 + 0.5).toLong)
      }
    }
    // seed: substrings of length 1..4, all chars + top-30 multi
    val seedCnt = census.toSeq.flatMap { case (w, c) =>
      for {
        i <- 0 until w.length
        j <- (i + 1) to math.min(w.length, i + 4)
      } yield (w.substring(i, j), c)
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val topMulti = seedCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(30)
    var ref = withCostsRef(seedCnt.filter(_._1.length == 1) ++ topMulti)
    val censusChars = census.keys.flatMap(_.map(_.toString)).toSet
    for (_ <- 1 to 2) {
      val costs = ref.map { case (p, (_, cost)) => p -> cost }
      val counts = census.toSeq.flatMap { case (w, wc) =>
        brute(w, costs).getOrElse(Nil).map(p => (p, wc))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      ref = withCostsRef(
        counts.filter { case (p, _) => !censusChars.contains(p) } ++
          censusChars.map(ch =>
            ch -> math.max(counts.getOrElse(ch, 0L), 1L)))
    }
    // vocabSize larger than the surviving multi set ⇒ the prune's final
    // renormalization runs over the same frame, costs unchanged
    val engine = UnigramTok.emTrainWords(words, vocabSize = 1000,
        iters = 2, maxPieceLen = 4, multiPieces = 30)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    engine shouldBe ref
  }

  it should "serve a trained vocabulary: drop unservable words, cover the rest" in {
    // the t60 contract: serving runs on words OUTSIDE the training
    // census; a word containing a character training never saw has no
    // complete segmentation and must contribute NOTHING (not a partial
    // path), while every served word's pieces concatenate back to it
    val words = Seq(("abab", 5L), ("ab", 3L), ("cd", 2L))
      .toDF("word", "wcnt")
    val trained = UnigramTok.emTrainWords(words, vocabSize = 10,
      iters = 2, maxPieceLen = 3, multiPieces = 10)
    val vocab = UnigramTok.vocabOf(trained)
    val serve = Seq(("abab", 5L), ("abcd", 4L), ("ax", 7L))
      .toDF("word", "wcnt")
    val census = UnigramTok.estepCounts(serve, vocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    census.keys.exists(_.contains("x")) shouldBe false // ax dropped whole
    // abcd (4) + abab (5) served: every emitted piece is vocabulary
    census.keySet.subsetOf(
      trained.collect().map(_.getString(0)).toSet) shouldBe true
    // coverage: piece counts weighted by wcnt reconstruct the served
    // characters exactly (4+5 words, zero contribution from ax)
    val served = UnigramTok.segment(col("word"), vocab)
    val rows = serve.select(col("word"), served.as("p")).collect()
    rows.filter(_.getString(0) != "ax").foreach { r =>
      r.getSeq[String](1).mkString shouldBe r.getString(0)
    }
    rows.find(_.getString(0) == "ax").get.isNullAt(1) shouldBe true
  }

  it should "train deterministically end-to-end" in {
    val a = UnigramTok.emTrain(corpus, "text", vocabSize = 40, iters = 2,
      maxPieceLen = 4, multiPieces = 50).collect().toSeq
    val b = UnigramTok.emTrain(corpus, "text", vocabSize = 40, iters = 2,
      maxPieceLen = 4, multiPieces = 50).collect().toSeq
    a.map(_.toString).sorted shouldBe b.map(_.toString).sorted
    a.nonEmpty shouldBe true
  }
}
