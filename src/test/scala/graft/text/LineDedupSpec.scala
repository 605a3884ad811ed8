package graft.text

import graft.SparkSpec

/** Line-level dedup: intra-doc keep-first semantics, cross-doc
  * boilerplate threshold, blank-line immunity, order preservation,
  * full-boilerplate doc disappearance.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  "dedupLinesWithinDoc" should "keep the first occurrence of each line" in {
    val df = Seq(
      (1L, "accept cookies\nreal content\naccept cookies\nmore content"),
      (2L, "only line")
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLinesWithinDoc(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out shouldBe Array(
      (1L, "accept cookies\nreal content\nmore content", 4L, 3L),
      (2L, "only line", 1L, 1L))
  }

  it should "collapse runs of blank lines like any other duplicate" in {
    val df = Seq((1L, "a\n\n\nb")).toDF("doc_id", "text")
    val out = LineDedup.dedupLinesWithinDoc(df, "doc_id", "text")
      .collect().head
    out.getString(1) shouldBe "a\n\nb"
    out.getLong(3) shouldBe 3L
  }

  it should "be a no-op on a document with all-distinct lines" in {
    val df = Seq((1L, "x\ny\nz")).toDF("doc_id", "text")
    val r = LineDedup.dedupLinesWithinDoc(df, "doc_id", "text")
      .collect().head
    r.getString(1) shouldBe "x\ny\nz"
  }

  private val pages = Seq(
    (1L, "nav home\nunique one\nfooter"),
    (2L, "nav home\nunique two\nfooter"),
    (3L, "nav home\nunique three\nfooter"),
    (4L, "unique four\nfooter"),
    (5L, "nav home\nfooter") // nothing but boilerplate at minDocs=3
  ).toDF("doc_id", "text")

  "dropBoilerplateLines" should "drop lines shared by >= minDocs docs, keep order" in {
    val out = LineDedup.dropBoilerplateLines(pages, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // "nav home" in 4 docs, "footer" in 5 -> both dropped
    out shouldBe Array(
      (1L, "unique one"),
      (2L, "unique two"),
      (3L, "unique three"),
      (4L, "unique four"))
  }

  it should "make docs reduced to nothing disappear" in {
    val ids = LineDedup.dropBoilerplateLines(pages, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect()
    ids should not contain 5L
  }

  it should "count distinct documents, not occurrences" in {
    // "spam" appears 3 times but in only 2 docs -> survives minDocs=3
    val df = Seq(
      (1L, "spam\nspam\nkeep a"),
      (2L, "spam\nkeep b"),
      (3L, "keep c")
    ).toDF("doc_id", "text")
    val out = LineDedup.dropBoilerplateLines(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(_.getString(1))
    out shouldBe Array("spam\nspam\nkeep a", "spam\nkeep b", "keep c")
  }

  it should "never drop blank lines regardless of frequency" in {
    val df = Seq(
      (1L, "a\n\nb"), (2L, "c\n\nd"), (3L, "e\n\nf")
    ).toDF("doc_id", "text")
    val out = LineDedup.dropBoilerplateLines(df, "doc_id", "text", 2)
      .orderBy("doc_id").collect().map(_.getString(1))
    out shouldBe Array("a\n\nb", "c\n\nd", "e\n\nf")
  }
}
