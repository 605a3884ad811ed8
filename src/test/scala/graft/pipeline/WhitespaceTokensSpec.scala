package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The compiled `WhitespaceTokens` expression must be BITWISE equal to
  * the HOF form it replaced (r16) — `tokens()` is the first map stage
  * of nearly every text gate, and every oracle replays the HOF
  * semantics (whitespace-run split, empties dropped) in DuckDB.
  */
class WhitespaceTokensSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r16 HOF form, verbatim. */
  private def hofTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  private val rng = new scala.util.Random(7)
  private val wsChars = " \t\n\f\r"

  private def randText(): String = {
    val sb = new StringBuilder
    for (_ <- 0 until rng.nextInt(40)) {
      if (rng.nextBoolean()) sb.append(wsChars(rng.nextInt(wsChars.length)))
      else sb.append(('a' + rng.nextInt(6)).toChar)
    }
    sb.toString
  }

  it should "match the HOF form bitwise on random mixed-whitespace text" in {
    val df = (0 until 500).map(i => (i.toLong, randText())).toDF("id", "text")
    val got = df.select($"id",
      graft.functions.TextFunctions.tokens($"text").as("t"))
    val want = df.select($"id", hofTokens($"text").as("t"))
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
  }

  it should "handle edge cases exactly like the HOF form" in {
    val rows = Seq(
      "",                        // empty -> []
      "   \t\n  ",               // all whitespace -> []
      "a",                       // single token, no delimiters
      "  lead", "trail  ",       // leading/trailing runs
      "ab\fc\rd",          // the rarer \s members split too
      "café naïve",    // multi-byte UTF-8 inside tokens
      "a\u00A0b",                // U+00A0 is NOT \s: one token
      "😀 x 😀", // non-BMP tokens
      "x\ty\nz")
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select($"id",
      graft.functions.TextFunctions.tokens($"text").as("t"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val want = df.select($"id", hofTokens($"text").as("t"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    got should contain theSameElementsInOrderAs want
    got(0) shouldBe Seq.empty
    got(1) shouldBe Seq.empty
    got(7) shouldBe Seq("a\u00A0b")
  }

  it should "propagate null and survive both eval paths" in {
    val df = Seq((1L, Some("a b")), (2L, None)).toDF("id", "text")
    // codegen path
    val out = df.select($"id",
      graft.functions.TextFunctions.tokens($"text").as("t"))
      .orderBy("id").collect()
    out(0).getSeq[String](1) shouldBe Seq("a", "b")
    out(1).isNullAt(1) shouldBe true
    // interpreted path (filter forces eval on the driver for literals)
    val e = graft.functions.expressions.WhitespaceTokens(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(" x  y ")))
    e.eval(null).asInstanceOf[
        org.apache.spark.sql.catalyst.util.GenericArrayData]
      .array.map(_.toString) shouldBe Array("x", "y")
  }

  it should "normalize the vertical-tab divergence out at ingestion" in {
    // \x0B is the one char Java \s and RE2 \s disagree on; after
    // normalizeWhitespace the engine tokenization and an RE2-lineage
    // replay agree on any corpus
    val df = Seq((1L, "a\u000Bb c"), (2L, "x\u000B\u000B"), (3L, "clean"))
      .toDF("id", "text")
    val out = df.select($"id", graft.functions.TextFunctions.tokens(
        graft.functions.TextFunctions.normalizeWhitespace($"text")).as("t"))
      .orderBy("id").collect()
    out(0).getSeq[String](1) shouldBe Seq("a", "b", "c")
    out(1).getSeq[String](1) shouldBe Seq("x")
    out(2).getSeq[String](1) shouldBe Seq("clean")
    // WITHOUT normalization the raw tokenizer splits on \x0B too (Java
    // semantics) — the helper changes the CORPUS, not the tokenizer
    df.filter($"id" === 1)
      .select(graft.functions.TextFunctions.tokens($"text"))
      .head().getSeq[String](0) shouldBe Seq("a", "b", "c")
  }
}
