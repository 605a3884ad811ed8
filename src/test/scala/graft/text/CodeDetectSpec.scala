package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Code detection: exact signal counting, score separation between code
  * and prose, empty/NULL handling, threshold flag.
  */
class CodeDetectSpec extends SparkSpec {
  import spark.implicits._

  private def row(text: String) =
    CodeDetect.score(Seq(Tuple1(text)).toDF("text"), "text")
      .collect().head

  "score" should "count the symbol alphabet exactly" in {
    val r = row("a{b}c;")
    r.getAs[Long]("n_chars_text") shouldBe 6L
    r.getAs[Long]("symbol_chars") shouldBe 3L
  }

  it should "count indented lines and total lines exactly" in {
    val r = row("x\n    y\n\tz")
    r.getAs[Long]("n_lines") shouldBe 3L
    r.getAs[Long]("indent_lines") shouldBe 2L
  }

  it should "count keyword occurrences with their boundary spaces" in {
    val r = row("def f\nreturn x\nthe returns were good")
    r.getAs[Long]("keyword_hits") shouldBe 2L // 'def ', 'return '
  }

  it should "separate code from prose" in {
    val code =
      """def quantize(xs):
        |    scale = max(abs(x) for x in xs)
        |    return [int(x * 127 / scale) for x in xs]
        |""".stripMargin
    val prose = "The quick brown fox jumps over the lazy dog. " +
      "It was the best of times, it was the worst of times."
    val c = row(code)
    val p = row(prose)
    c.getAs[Boolean]("is_code") shouldBe true
    p.getAs[Boolean]("is_code") shouldBe false
    c.getAs[Double]("code_score") should be > p.getAs[Double]("code_score")
  }

  it should "score empty and NULL text as zero, not code" in {
    val df = Seq(Some(""), None).map(Tuple1(_)).toDF("text")
    CodeDetect.score(df, "text").collect().foreach { r =>
      r.getAs[Double]("code_score") shouldBe 0.0
      r.getAs[Boolean]("is_code") shouldBe false
    }
  }

  it should "respect a custom threshold" in {
    val t = "x = 1;" // some symbols, no keywords/indent
    CodeDetect.score(Seq(Tuple1(t)).toDF("text"), "text", threshold = 1e9)
      .collect().head.getAs[Boolean]("is_code") shouldBe false
    CodeDetect.score(Seq(Tuple1(t)).toDF("text"), "text", threshold = 0.0)
      .collect().head.getAs[Boolean]("is_code") shouldBe true
  }

  it should "stay a map-only plan (no exchange)" in {
    val plan = CodeDetect.score(Seq(Tuple1("a")).toDF("text"), "text")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
