package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The compiled `Shingles` expression must be BITWISE equal to the HOF
  * zip_with chains it replaced (r15) — the whole dedup gate family
  * (d01–d04, d08, d12–d18, t13, t22, t45, t46, q100, ...) shingles
  * through `TextFunctions`, and every one of those oracles replays the
  * HOF semantics in DuckDB.
  */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r15 HOF forms, verbatim. */
  private def hofShingles(toks: Column, n: Int): Column = {
    val m = org.apache.spark.sql.functions.size(toks) - (n - 1)
    val shingled = (1 until n).foldLeft(slice(toks, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), m),
        (a, b) => concat(a, lit(" "), b))
    }
    when(org.apache.spark.sql.functions.size(toks) >= n, shingled).otherwise(toks)
  }

  private def hofSliding(toks: Column, n: Int): Column = {
    val m = greatest(org.apache.spark.sql.functions.size(toks) - (n - 1), lit(0))
    (1 until n).foldLeft(slice(toks, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), m),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  private val rng = new scala.util.Random(11)

  private def randTokens(maxLen: Int): Seq[String] =
    Seq.fill(rng.nextInt(maxLen + 1))(
      Seq.fill(1 + rng.nextInt(5))(('a' + rng.nextInt(4)).toChar).mkString)

  it should "match the HOF forms bitwise across modes, n, and lengths" in {
    val df = (0 until 300).map(i => (i.toLong, randTokens(12)))
      .toDF("id", "toks")
    for (n <- Seq(1, 2, 3, 5)) {
      val got = df.select($"id",
        graft.functions.TextFunctions.shinglesFromTokens($"toks", n).as("s"),
        graft.functions.TextFunctions.slidingFromTokens($"toks", n).as("w"),
        graft.functions.TextFunctions.shingleSetFromTokens($"toks", n).as("d"))
      val want = df.select($"id",
        hofShingles($"toks", n).as("s"),
        hofSliding($"toks", n).as("w"),
        array_distinct(hofShingles($"toks", n)).as("d"))
      withClue(s"n=$n: ") {
        got.exceptAll(want).count() shouldBe 0
        want.exceptAll(got).count() shouldBe 0
      }
    }
  }

  it should "honor the short-input contracts and null contracts" in {
    val df = Seq(
      (1L, Some(Seq("a", "b"))),
      (2L, Some(Seq.empty[String])),
      (3L, None))
      .toDF("id", "toks")
    val out = df.select($"id",
      graft.functions.TextFunctions.shinglesFromTokens($"toks", 3).as("s"),
      graft.functions.TextFunctions.slidingFromTokens($"toks", 3).as("w"))
      .orderBy("id").collect()
    out(0).getSeq[String](1) shouldBe Seq("a", "b") // fallback
    out(0).getSeq[String](2) shouldBe Seq.empty     // sliding: no span
    out(1).getSeq[String](1) shouldBe Seq.empty
    out(1).getSeq[String](2) shouldBe Seq.empty
    out(2).isNullAt(1) shouldBe true
    out(2).isNullAt(2) shouldBe true
  }

  it should "keep first-occurrence order in the distinct set" in {
    val df = Seq(Tuple1(Seq("x", "y", "x", "y", "x"))).toDF("toks")
    df.select(graft.functions.TextFunctions
        .shingleSetFromTokens($"toks", 2).as("d"))
      .as[Seq[String]].head() shouldBe Seq("x y", "y x")
  }

  "BigramPairs" should "match the HOF zip_with-of-slices form bitwise" in {
    // the exact pre-r17 BigramLm formulation, verbatim
    def hofPairs(toks: Column): Column = {
      val nm1 = org.apache.spark.sql.functions.size(toks) - 1
      zip_with(slice(toks, lit(1), nm1), slice(toks, lit(2), nm1),
        (a, b) => struct(a.as("prev"), b.as("term")))
    }
    def compiled(toks: Column): Column =
      graft.core.Graft.column(graft.functions.expressions.BigramPairs(
        graft.core.Graft.expression(toks)))
    // BigramLm's contract filters empty token arrays BEFORE the pair
    // stage (the HOF form throws on slice length −1 there; the compiled
    // form is total and returns empty — strictly more defined)
    val df = (0 until 300).map(i => (i.toLong, randTokens(12)))
      .toDF("id", "toks")
      .filter(org.apache.spark.sql.functions.size($"toks") > 0)
    val got = df.select($"id", explode(compiled($"toks")).as("p"))
      .select($"id", $"p.prev", $"p.term")
    val want = df.select($"id", explode(hofPairs($"toks")).as("p"))
      .select($"id", $"p.prev", $"p.term")
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
    // short inputs → empty (both slices empty); null input → null
    val edge = Seq((1L, Some(Seq("a"))), (2L, Some(Seq.empty[String])),
      (3L, None)).toDF("id", "toks")
    val rows = edge.select($"id", compiled($"toks").as("p"))
      .orderBy("id").collect()
    rows(0).getSeq[Any](1) shouldBe Seq.empty
    rows(1).getSeq[Any](1) shouldBe Seq.empty
    rows(2).isNullAt(1) shouldBe true
  }
}
