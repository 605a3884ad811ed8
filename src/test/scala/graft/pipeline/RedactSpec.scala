package graft.pipeline

import graft.SparkSpec
import graft.text.Redact

/** PII redaction: rule order (specific before general), correct counts,
  * and no re-counting of placeholder tokens.
  */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  "scrub" should "redact emails, IPs, and numbers with one count total" in {
    val df = Seq(
      (1L, "mail bob42@corp.example.org from 192.168.0.1 port 8080"),
      (2L, "no pii here"),
      (3L, "just 2 numbers: 7")
    ).toDF("id", "text")
    val out = Redact.scrub(df, "text")
      .select("id", "text_redacted", "n_redactions")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, "mail <EMAIL> from <IP> port <NUM>", 3L))
    out(1) shouldBe ((2L, "no pii here", 0L))
    out(2) shouldBe ((3L, "just <NUM> numbers: <NUM>", 2L))
  }

  it should "not re-count digits inside an already-redacted match" in {
    // the email eats its digits before the number rule runs
    val out = Redact.scrub(Seq((1L, "a1@b2.co")).toDF("id", "text"), "text")
      .select("text_redacted", "n_redactions")
      .as[(String, Long)].collect().head
    out shouldBe (("<EMAIL>", 1L))
  }

  it should "apply custom rules in order" in {
    val out = Redact.scrub(Seq((1L, "aaa bbb")).toDF("id", "text"),
      "text", rules = Seq("a+" -> "<A>", "b+" -> "<B>"))
      .select("text_redacted", "n_redactions")
      .as[(String, Long)].collect().head
    out shouldBe (("<A> <B>", 2L))
  }

  it should "run each rule's regex exactly once over the text (linear plan)" in {
    // over a parquet source (a LocalRelation constant-folds away), the
    // optimized plan must hold exactly rules.size regexp_replace and
    // rules.size regexp_extract_all expressions — the nested-expression
    // formulation duplicates the replace chain into every count, O(rules²)
    val dir = s"${sys.props("java.io.tmpdir")}/redact_plan_spec"
    Seq((1L, "a 1 b 2")).toDF("id", "text")
      .write.mode("overwrite").parquet(dir)
    val out = Redact.scrub(spark.read.parquet(dir), "text")
    def exprCount(name: String): Int = {
      var n = 0
      out.queryExecution.optimizedPlan.foreach { p =>
        p.expressions.foreach { root =>
          n += root.collect { case e if e.prettyName == name => e }.size
        }
      }
      n
    }
    exprCount("regexp_replace") shouldBe Redact.DefaultRules.size
    exprCount("regexp_extract_all") shouldBe Redact.DefaultRules.size
  }

  it should "reject an empty rule list" in {
    an[IllegalArgumentException] should be thrownBy
      Redact.scrub(Seq((1L, "x")).toDF("id", "text"), "text", Seq.empty)
  }

  it should "reject inputs that already carry an output column" in {
    an[IllegalArgumentException] should be thrownBy
      Redact.scrub(Seq((1L, "x", 0L)).toDF("id", "text", "n_redactions"),
        "text")
  }
}
