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
}
