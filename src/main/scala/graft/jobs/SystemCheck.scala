package graft.jobs

import org.apache.spark.sql.SparkSession

/** System/integration check, ported from mozetl/system_check.py: print
  * environment versions, read a sample partition, compute describe()
  * statistics, write them back. Exercises the whole read→agg→write path
  * as a deployment smoke test.
  *
  * Run: sbt "runMain graft.jobs.SystemCheck <inputParquet> <outputDir>"
  */
object SystemCheck {

  def run(spark: SparkSession, inputPath: String,
      outputPath: String, describeCols: Seq[String]): Long = {
    println(s"Spark version: ${spark.version}")
    println(s"Scala version: ${scala.util.Properties.versionString}")
    val subset = spark.read.parquet(inputPath)
    val n = subset.count()
    println(s"Saw $n documents")
    val present = describeCols.filter(subset.columns.contains)
    val summary = subset.select(present.head, present.tail: _*).describe()
    summary.show()
    summary.write.mode("overwrite").parquet(outputPath)
    n
  }

  def main(args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    val spark = graft.core.Graft.localSession(4, "graft-system-check")
    try run(spark, in, out,
      Seq("memory_mb", "cpu_cores", "subsession_length", "l_quantity",
        "o_totalprice", "value"))
    finally spark.stop()
  }
}
