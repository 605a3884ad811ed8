package graft.jobs.taar

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TAAR per-client profile export (the reference's DynamoDB loader),
  * ported from mozetl/taar/taar_dynamo.py.
  *
  * Sink redesign (SURVEY §2.2 K6): the reference abuses RDD `reduce` as a
  * side-effecting batch writer — a 4-tuple accumulator that flushes every
  * 200 records from inside the reduce lambda (taar_dynamo.py:135-296).
  * That makes writes non-restartable, double-fires on task retry, and
  * serializes the final merge on one node. The idiomatic Spark sink is
  * `foreachPartition` with per-partition batching: each executor flushes
  * its own batches of `batchSize`, errors accumulate per partition (bounded
  * at `maxErrors` like the reference), and there is no global reduce at
  * all. The `KeyValueSink` trait isolates the external store so tests
  * inject an in-memory sink.
  */
object Dynamo {

  /** taar_dynamo.py:44,280-296. */
  val BatchSize = 200
  val MaxErrors = 50

  /** taar_dynamo.py:322-395: latest row per client (W1), field subset,
    * JSON payload with client_id/start_date merged in, nulls dropped.
    *
    * Spark-first: the reference zips two RDDs row-by-row to re-attach
    * client_id to its JSON blob (taar_dynamo.py:374-395) — fragile
    * (zip requires identical partitioning) and crosses into Python. Here
    * the payload is built with to_json(struct(...)) in one pass;
    * to_json drops null fields, matching the reference's empty-value
    * filter for absent columns.
    */
  def extractTransform(datasetForDate: DataFrame,
      sampleRate: Double = 0.0): DataFrame = {
    val sampled =
      if (sampleRate != 0.0) datasetForDate.sample(withReplacement = false, sampleRate)
      else datasetForDate
    val w = Window.partitionBy("client_id")
      .orderBy(desc("subsession_start_date"))
    val latest = sampled
      .withColumn("clientid_rank", row_number().over(w))
      .where(col("clientid_rank") === 1).drop("clientid_rank")

    val payloadFields = Seq("city", "subsession_start_date",
      "subsession_length", "locale", "os", "places_bookmarks_count",
      "scalar_parent_browser_engagement_tab_open_event_count",
      "scalar_parent_browser_engagement_total_uri_count",
      "scalar_parent_browser_engagement_unique_domains_count",
      "active_addons", "disabled_addons_ids")

    // The reference strips every PYTHON-FALSY value from the payload
    // (taar_dynamo.py:163 `if value`), not just nulls: 0, 0.0, "", empty
    // arrays/maps and false all disappear. to_json only drops nulls, so
    // falsy values are nulled per-type first.
    def truthyOrNull(f: String): Column = {
      import org.apache.spark.sql.types._
      val c = col(f)
      val nulled = latest.schema(f).dataType match {
        case StringType     => when(c === "", lit(null)).otherwise(c)
        case _: NumericType => when(c === 0, lit(null)).otherwise(c)
        case _: ArrayType   => when(size(c) === 0, lit(null)).otherwise(c)
        case _: MapType     => when(size(c) === 0, lit(null)).otherwise(c)
        case BooleanType    => when(!c, lit(null)).otherwise(c)
        case _              => c
      }
      nulled.as(f)
    }

    latest
      // taar_dynamo.py:118-132 validity filter
      .where(col("client_id").isNotNull && col("client_id") =!= "" &&
        to_date(col("subsession_start_date")).isNotNull &&
        year(to_date(col("subsession_start_date"))) >= 1970)
      .select(
        col("client_id"),
        date_format(to_date(col("subsession_start_date")), "yyyyMMdd")
          .as("start_date"),
        to_json(struct(payloadFields.map(truthyOrNull): _*)).as("payload"))
  }

  /** External key-value store boundary (DynamoDB in the reference).
    * Implementations must be idempotent per (client_id) key — Spark task
    * retries may re-deliver a batch.
    */
  trait KeyValueSink extends Serializable {
    /** Write one batch; return ids that failed. */
    def putBatch(rows: Seq[(String, String, String)]): Seq[String]
  }

  /** Result mirror of the reference's accumulator tuple:
    * (records pushed, records seen, error ids ≤ MaxErrors).
    */
  case class LoadStats(pushed: Long, seen: Long, errors: Seq[String])

  /** foreachPartition batching load (replaces reduce-with-side-effects).
    * client_id is sha256-hex-hashed AT PUSH TIME, exactly where the
    * reference clobbers it (taar_dynamo.py:191-215 hash_client_ids inside
    * push_to_dynamo, via taar_utils.hash_telemetry_id) — raw telemetry
    * ids never reach the external store.
    */
  def load(rows: DataFrame, sink: KeyValueSink,
      batchSize: Int = BatchSize): LoadStats = {
    val spark = rows.sparkSession
    val pushedAcc = spark.sparkContext.longAccumulator("dynamo.pushed")
    val seenAcc = spark.sparkContext.longAccumulator("dynamo.seen")
    val errAcc = spark.sparkContext.collectionAccumulator[String]("dynamo.errors")
    rows.select(sha2(col("client_id"), 256).as("client_id"),
        col("start_date"), col("payload"))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        it.map(r => (r.getString(0), r.getString(1), r.getString(2)))
          .grouped(batchSize).foreach { batch =>
            val failed = sink.putBatch(batch)
            seenAcc.add(batch.size.toLong)
            pushedAcc.add((batch.size - failed.size).toLong)
            failed.take(MaxErrors).foreach(errAcc.add)
          }
      }
    LoadStats(pushedAcc.value, seenAcc.value,
      errAcc.value.toArray.map(_.toString).toSeq.take(MaxErrors))
  }
}
