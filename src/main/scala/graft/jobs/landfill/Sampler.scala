package graft.jobs.landfill

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** landfill sampler: parse raw ingestion messages' URIs into
  * (namespace, doc_type, doc_version, doc_id) and keep the first
  * `nDocuments` per document coordinate (window top-N, SURVEY §2.6 W2).
  * Ported from mozetl/landfill/sampler.py:49-156.
  *
  * Spark-first: the reference's row-at-a-time Python `_process` /
  * `_detect_telemetry_version` become native column expressions —
  * split() for the URI, get_json_object for version sniffing (a valid
  * document is detected with `$` extraction instead of try/except
  * json.loads).
  */
object Sampler {

  /** sampler.py:27-37: meta fields preserved in the output. */
  val MetaWhitelist: Seq[String] = Seq(
    "Content-Length", "Date", "Host", "Timestamp", "Type", "User-Agent",
    "X-PingSender-Version", "args", "protocol", "uri")

  /** sampler.py:57-81: telemetry version detection from the payload.
    * NULL / unparseable → "0"; then ver / version / deviceinfo→"3" / v;
    * parseable-but-none-of-those → "1".
    */
  def detectTelemetryVersion(content: org.apache.spark.sql.Column) = {
    def js(path: String) = get_json_object(content, s"$$.$path")
    when(content.isNull, "0")
      .when(get_json_object(content, "$").isNull, "0")
      .when(js("ver").isNotNull, js("ver"))
      .when(js("version").isNotNull, js("version"))
      .when(js("deviceinfo").isNotNull, "3")
      .when(js("v").isNotNull, js("v"))
      .otherwise("1")
  }

  /** sampler.py:84-109: URI spec parsing.
    *   telemetry: /submit/telemetry/<doc_id>/<doc_type>/<app>/<ver>/<chan>/<build>
    *   generic:   /submit/<ns>/<doc_type>/<doc_version>/<doc_id>
    * Input frame needs meta.uri + content; emits the document coordinate
    * columns. Rows without namespace/doc_type/meta/content are dropped
    * (sampler.py:131 filter).
    */
  def parseDocuments(frame: DataFrame): DataFrame = {
    val parts = split(col("meta.uri"), "/")
    def p(i: Int) = try_element_at(parts, lit(i + 3)) // path[i] == uri.split[2+i]
    val isTelemetry = p(0) === "telemetry"
    frame
      .withColumn("namespace", p(0))
      .withColumn("doc_type", when(isTelemetry, p(2)).otherwise(p(1)))
      .withColumn("doc_version",
        when(isTelemetry, detectTelemetryVersion(col("content")))
          .otherwise(p(2)))
      .withColumn("doc_id", when(isTelemetry, p(1)).otherwise(p(3)))
      .filter(col("namespace").isNotNull && col("namespace") =!= "" &&
        col("doc_type").isNotNull && col("doc_type") =!= "" &&
        col("meta").isNotNull && col("content").isNotNull)
      .select("namespace", "doc_type", "doc_version", "doc_id", "meta",
        "content")
  }

  /** sampler.py:134-150: default doc_version, keep ≤ nDocuments per
    * (namespace, doc_type, doc_version) ordered by doc_id.
    */
  def sample(documents: DataFrame, nDocuments: Int = 1000): DataFrame = {
    val w = Window.partitionBy("namespace", "doc_type", "doc_version")
      .orderBy("doc_id")
    documents.na.fill("0", Seq("doc_version"))
      .withColumn("row_id", row_number().over(w))
      .where(col("row_id") <= nDocuments)
      .drop("row_id")
  }

  def transform(frame: DataFrame, nDocuments: Int = 1000): DataFrame =
    sample(parseDocuments(frame), nDocuments)
}
