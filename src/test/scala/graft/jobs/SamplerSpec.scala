package graft.jobs

import graft.SparkSpec
import graft.jobs.landfill.Sampler
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class SamplerSpec extends SparkSpec {

  private val metaType = StructType(
    Sampler.MetaWhitelist.map(StructField(_, StringType)))
  private val msgSchema = StructType(Seq(
    StructField("meta", metaType), StructField("content", StringType)))

  private def msg(uri: String, content: String): Row =
    Row(Row.fromSeq(Sampler.MetaWhitelist.map {
      case "uri" => uri
      case "Host" => "incoming.telemetry.mozilla.org"
      case _ => null
    }), content)

  private def df(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), msgSchema)

  it should "parse telemetry and generic URI specs" in {
    val in = df(
      msg("/submit/telemetry/doc-1/main/Firefox/54.0/release/b1",
        """{"ver": 4, "payload": {}}"""),
      msg("/submit/eng-workflow/hgpush/1/doc-2", """{"x": 1}"""))
    val out = Sampler.transform(in)
    rowsOf(out, "namespace", "doc_type", "doc_version", "doc_id") shouldBe Set(
      Seq("telemetry", "main", "4", "doc-1"),
      Seq("eng-workflow", "hgpush", "1", "doc-2"))
  }

  it should "detect telemetry versions from the payload" in {
    val in = df(
      msg("/submit/telemetry/d1/main/F/54/r/b", "not json"),
      msg("/submit/telemetry/d2/main/F/54/r/b", """{"version": 2}"""),
      msg("/submit/telemetry/d3/main/F/54/r/b", """{"deviceinfo": {}}"""),
      msg("/submit/telemetry/d4/main/F/54/r/b", """{"v": 9}"""),
      msg("/submit/telemetry/d5/main/F/54/r/b", """{"other": true}"""))
    val out = Sampler.transform(in)
    rowsOf(out, "doc_id", "doc_version") shouldBe Set(
      Seq("d1", "0"), Seq("d2", "2"), Seq("d3", "3"), Seq("d4", "9"),
      Seq("d5", "1"))
  }

  it should "keep at most n documents per coordinate ordered by doc_id" in {
    val in = df((1 to 5).map(i =>
      msg(s"/submit/ns/t/1/doc-$i", "{}")): _*)
    val out = Sampler.transform(in, nDocuments = 3)
    out.count() shouldBe 3
    out.select("doc_id").collect().map(_.getString(0)).toSet shouldBe
      Set("doc-1", "doc-2", "doc-3")
  }

  // tests/test_landfill_sampler.py:114-123 — when every version marker is
  // present, precedence is ver > version > deviceinfo > v (matching the
  // moz_ingest telemetry.lua decoder the reference mirrors)
  it should "prefer ver over version over deviceinfo over v" in {
    val in = df(
      msg("/submit/telemetry/d1/main/F/54/r/b",
        """{"ver": 8, "version": 9, "v": 10, "deviceinfo": "foo"}"""),
      msg("/submit/telemetry/d2/main/F/54/r/b",
        """{"version": 9, "v": 10, "deviceinfo": "foo"}"""),
      msg("/submit/telemetry/d3/main/F/54/r/b",
        """{"v": 10, "deviceinfo": "foo"}"""))
    rowsOf(Sampler.transform(in), "doc_id", "doc_version") shouldBe Set(
      Seq("d1", "8"), Seq("d2", "9"), Seq("d3", "3"))
  }

  // tests/test_landfill_sampler.py:134-138 — identifiable meta fields
  // never reach the output; here that exclusion is STRUCTURAL (the meta
  // whitelist defines the carried schema, so Hostname/remote_addr/
  // X-Forwarded-For cannot exist downstream)
  it should "exclude identifiable meta fields by construction" in {
    val pii = Set("Hostname", "remote_addr", "X-Forwarded-For")
    (pii & Sampler.MetaWhitelist.toSet) shouldBe empty
    val out = Sampler.transform(df(msg("/submit/ns/t/1/d", "{}")))
    (pii & out.select("meta.*").columns.toSet) shouldBe empty
  }

  it should "drop rows with malformed URIs" in {
    val in = df(msg("/submit", "{}"), msg("/submit/ns", "{}"),
      msg("/submit/ns/t/1/d", "{}"))
    Sampler.transform(in).count() shouldBe 1
  }
}
