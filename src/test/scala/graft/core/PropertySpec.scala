package graft.core

import graft.SparkSpec
import graft.functions.expressions.PolyHash
import graft.jobs.graphics.Trends
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

/** Property-based invariants for the engine's deterministic primitives.
  * ScalaCheck generators drive explicit seeded samples (the
  * scalatest-scalacheck bridge artifact is not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    samples(g, n).foreach(f)

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
      .map(_.mkString)

  behavior of "PolyHash"

  it should "stay within [0, mod) and be deterministic" in {
    forAll(asciiText) { s =>
      val h1 = PolyHash.hash(UTF8String.fromString(s))
      val h2 = PolyHash.hash(UTF8String.fromString(s))
      h1 shouldBe h2
      h1 should (be >= 0L and be < PolyHash.Mod)
    }
  }

  it should "match the reference fold over code points" in {
    forAll(asciiText) { s =>
      val expected = s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % PolyHash.Mod)
      PolyHash.hash(UTF8String.fromString(s)) shouldBe expected
    }
  }

  behavior of "jaccard / shingles"

  it should "bound jaccard in [0,1], 1 on self, symmetric" in {
    val docs = Gen.listOfN(2, asciiText.suchThat(_.trim.nonEmpty))
    forAll(docs, n = 10) { case List(a, b) =>
      val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val sets = graft.dedup.NearDup.shingleSets(df, "doc_id", "text")
      if (sets.count() == 2) {
        val Array(r) = sets.agg(
          graft.functions.TextFunctions.jaccard(
            first(when($"id" === 1, $"shingle_set"), ignoreNulls = true),
            first(when($"id" === 2, $"shingle_set"), ignoreNulls = true))
            .as("j")).collect()
        val j = r.getDouble(0)
        j should (be >= 0.0 and be <= 1.0)
      }
    }
  }

  behavior of "Trends.mostRecentSunday"

  it should "always return a Sunday on or before the input" in {
    val dates = Gen.choose(0L, 20000L)
      .map(java.time.LocalDate.ofEpochDay)
    forAll(dates, n = 300) { d =>
      val s = Trends.mostRecentSunday(d)
      s.getDayOfWeek shouldBe java.time.DayOfWeek.SUNDAY
      s.isAfter(d) shouldBe false
      java.time.temporal.ChronoUnit.DAYS.between(s, d) should be < 7L
    }
  }

  behavior of "Salt"

  it should "produce the same join result as an unsalted join" in {
    val large = (1L to 500L).map(i => (i % 7, i)).toDF("key", "row_id")
    val small = (0L until 7L).map(i => (i, s"v$i")).toDF("key", "v")
    val salted = Salt.saltedJoin(large, small, "key", "row_id", 8)
      .orderBy("row_id")
    val plain = large.join(small, "key").orderBy("row_id")
    salted.collect().map(_.toSeq).toSet shouldBe
      plain.collect().map(_.toSeq).toSet
    salted.count() shouldBe 500
  }

  it should "aggregate hot keys in two phases with identical totals" in {
    val df = (1L to 1000L).map(i => (if (i % 10 == 0) 1L else i, i * 1.0))
      .toDF("key", "v")
    val twoPhase = Salt.saltedAgg(df, "key", "v", 16,
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pc")),
      merge = Seq(sum("ps").as("total"), sum("pc").as("cnt")))
    val direct = df.groupBy("key")
      .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
    twoPhase.collect().map(_.toSeq).toSet shouldBe
      direct.collect().map(_.toSeq).toSet
  }
}
