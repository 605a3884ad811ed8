package graft.jobs.bhr

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Background-Hang-Reporter collection pipeline core, ported from
  * mozetl/bhr_collection/bhr_collection.py (the largest RDD job in the
  * reference).
  *
  * Spark-first: the reference's RDD stages become typed Datasets /
  * DataFrames —
  *  - hang extraction flatMap (bhr_collection.py:716-717) → Dataset.flatMap
  *  - (stack-key → (duration, count)) reduceByKey (789-795) → groupBy.agg
  *    with map-side combine
  *  - frame symbolication (853-861) keeps the reference's own DataFrame
  *    join shape: left join on (module, offset), collect per hang
  *  - usage-hours normalization (806-811) → broadcast join on build_date
  *    instead of a driver-collected dict.
  */
object BhrCollection {

  case class Hang(stack: Seq[String], duration: Double, thread: String,
      runnableName: String, process: String, buildDate: String,
      platform: String,
      // sorted (name, value) pairs — part of the aggregation key exactly
      // like the reference's tupleize_annotation_list (bhr_collection
      // .py:756-757, 782); defaulted so annotation-free fixtures stay terse
      annotations: Seq[(String, String)] = Seq.empty)

  /** Reference hang duration bounds (bhr_collection.py:772-775; configs at
    * :1163-1164 use 128/16000 ms, the job at :1283-1284 uses 128/65536).
    */
  val HangLowerBoundMs = 128.0
  val HangUpperBoundMs = 65536.0

  /** E4: explode pings into hang rows with a caller-provided extractor
    * (process_hangs is ping-format specific, bhr_collection.py:640-717).
    */
  def getAllHangs[P](pings: Dataset[P],
      processHangs: P => Seq[Hang]): Dataset[Hang] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Hang]
    pings.flatMap(processHangs)
  }

  /** A8: per-hang-key duration/count sums (merge_hang_data,
    * bhr_collection.py:789-795). The key includes the tupleized
    * annotations, and out-of-bounds durations are dropped BEFORE
    * aggregation (map_to_hang_data, :772-775) — a 5 ms noise hang or a
    * multi-hour outlier never reaches the profile.
    */
  def aggregateHangs(hangs: Dataset[Hang],
      lowerBoundMs: Double = HangLowerBoundMs,
      upperBoundMs: Double = HangUpperBoundMs): DataFrame =
    hangs.toDF()
      .filter(col("duration") >= lowerBoundMs &&
        col("duration") < upperBoundMs)
      .groupBy("stack", "thread", "runnableName", "buildDate", "platform",
        "annotations")
      .agg(sum("duration").as("total_duration"),
        count(lit(1)).cast("double").as("hang_count"))

  /** Per-build-date usage-hours normalization (process_hang_value,
    * bhr_collection.py:806-811): broadcast join, no driver dict.
    */
  def normalizeByUsageHours(aggregated: DataFrame,
      usageHours: DataFrame): DataFrame =
    aggregated.join(broadcast(usageHours), Seq("buildDate"))
      .withColumn("hangs_per_hour",
        col("total_duration") / col("usage_hours"))
      .withColumn("count_per_hour",
        col("hang_count") / col("usage_hours"))

  /** J3+A6 symbolication: frames (hang_id, module, offset) left-joined to
    * the symbol table on the composite key, re-collected per hang
    * (bhr_collection.py:846-875).
    */
  def symbolicateFrames(frames: DataFrame, modules: DataFrame): DataFrame =
    frames.join(modules, Seq("module", "offset"), "left_outer")
      .groupBy("hang_id")
      .agg(collect_list(struct(col("module"), col("offset"), col("symbol"),
        col("module_name"))).as("symbol_mapping"))

  /** Distinct module/offset pairs needing symbolication
    * (get_frames_by_module, bhr_collection.py:731-737).
    */
  def framesByModule(frames: DataFrame): DataFrame =
    frames.select("module", "offset").distinct()
      .groupBy("module").agg(collect_list("offset").as("offsets"))

  /** Bridge from the distributed aggregation to the driver-side
    * ProfileProcessor (the reference collects its reduceByKey output the
    * same way, bhr_collection.py:1090-1099). Stack entries are the
    * extractor's "lib\\breakpadId:frame" strings; the first ':' splits
    * lib from frame (lib parts never contain ':', frames may — e.g.
    * "js::Run").
    */
  def toSampleRows(aggregated: DataFrame)
      : Seq[ProfileProcessor.SampleRow] =
    aggregated.collect().toSeq.map { r =>
      val stack = r.getSeq[String](r.fieldIndex("stack")).map { s =>
        val i = s.indexOf(':')
        if (i < 0) (s, null: String)
        else (s.substring(i + 1), s.substring(0, i))
      }
      ProfileProcessor.SampleRow(
        stack = stack,
        runnableName = r.getAs[String]("runnableName"),
        threadName = r.getAs[String]("thread"),
        buildDate = r.getAs[String]("buildDate"),
        annotations = r.getSeq[org.apache.spark.sql.Row](
          r.fieldIndex("annotations"))
          .map(a => (a.getString(0), a.getString(1))),
        platform = r.getAs[String]("platform"),
        hangMs = r.getAs[Double]("total_duration"),
        hangCount = r.getAs[Double]("hang_count"))
    }
}
