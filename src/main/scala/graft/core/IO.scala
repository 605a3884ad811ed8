package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic table I/O for the engine's sinks/sources (SURVEY §2.2
  * K1-K4): parquet (default), partitioned JSON (landfill-style), and CSV
  * (the reference collects to the driver for CSV, utils.py:46-66 — here
  * it's a distributed write like everything else).
  */
object IO {

  def read(spark: SparkSession, path: String, format: String = "parquet",
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(format)
      .option("header", "true") // csv only; ignored elsewhere
    schema.fold(r.option("inferSchema", format == "csv"))(r.schema)
      .load(path)
  }

  /** Write with the engine's layout knobs: optional partition columns,
    * optional coalesce for output-file sizing (the reference's
    * coalesce(25)/repartition(1) heuristics), configurable mode.
    */
  def write(df: DataFrame, path: String, format: String = "parquet",
      mode: String = "overwrite", partitionBy: Seq[String] = Seq.empty,
      coalesceTo: Int = 0): Unit = {
    val sized = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    val w = sized.write.format(format).mode(mode).option("header", "true")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path)
  }

  /** ONE csv file at exactly `file` (header included) — the reference's
    * single-file report contract (utils.py:46-91 `write_csv`, which
    * collect()s every row through the driver and hands csv.writer the
    * result). Same output layout here, but the serialization stays
    * DISTRIBUTED: a single-partition executor task writes the file and
    * the driver only renames it into place. For small report frames (the
    * only sane use of a single csv) the one-task write is the cost the
    * contract demands; anything larger belongs in `write` part-files.
    */
  def writeSingleCsv(df: DataFrame, file: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = file + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    // Hadoop FS API, not java.io: the same rename works on local paths in
    // tests and on HDFS/S3A on a cluster
    val tmpPath = new Path(tmp)
    val fs = tmpPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    try {
      val part = fs.globStatus(new Path(tmp, "part-*.csv")).headOption
        .getOrElse(throw new java.io.IOException(
          s"no csv part file produced under $tmp"))
      val target = new Path(file)
      if (fs.exists(target)) fs.delete(target, false)
      if (!fs.rename(part.getPath, target))
        throw new java.io.IOException(s"rename to $file failed")
    } finally {
      fs.delete(tmpPath, true)
      ()
    }
  }
}
