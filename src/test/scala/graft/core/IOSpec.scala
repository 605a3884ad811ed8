package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IOSpec extends SparkSpec {
  import spark.implicits._

  private val data = Seq(("a", 1L, 1.5), ("b", 2L, 2.5), ("a", 3L, 3.5))
    .toDF("k", "n", "v")

  it should "round-trip parquet, json and csv" in {
    val tmp = java.nio.file.Files.createTempDirectory("graft-io").toString
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      IO.write(data, s"$tmp/$fmt", fmt, coalesceTo = 1)
      // parquet/orc are self-describing; json/csv need the schema
      val back = IO.read(spark, s"$tmp/$fmt", fmt,
        schema = if (fmt == "parquet" || fmt == "orc") None
        else Some(data.schema))
      back.count() shouldBe 3
      back.agg(sum("n")).collect().head.getLong(0) shouldBe 6L
      // coalesceTo=1 → a single data file
      new java.io.File(s"$tmp/$fmt").listFiles()
        .count(_.getName.startsWith("part-")) shouldBe 1
    }
  }

  it should "write hive-partitioned layouts (landfill-style)" in {
    val tmp = java.nio.file.Files.createTempDirectory("graft-io-part").toString
    IO.write(data, s"$tmp/out", "json", partitionBy = Seq("k"))
    new java.io.File(s"$tmp/out").listFiles().map(_.getName)
      .filter(_.startsWith("k=")).sorted.toSeq shouldBe Seq("k=a", "k=b")
    IO.read(spark, s"$tmp/out", "json",
      Some(org.apache.spark.sql.types.StructType(data.schema.filterNot(_.name == "k"))))
      .count() shouldBe 3
  }

  it should "write one csv FILE at the exact target path (reference write_csv contract)" in {
    val tmp = java.nio.file.Files.createTempDirectory("graft-io-csv").toString
    val target = s"$tmp/report.csv"
    IO.writeSingleCsv(data.orderBy("n"), target)
    val f = new java.io.File(target)
    f.isFile shouldBe true
    // no tmpdir droppings left behind (the Hadoop local FS also writes a
    // hidden .crc checksum sidecar — normal, ignored)
    new java.io.File(tmp).list().filterNot(_.startsWith("."))
      .toSeq shouldBe Seq("report.csv")
    val lines = scala.io.Source.fromFile(f).getLines().toSeq
    lines.head shouldBe "k,n,v"
    lines.length shouldBe 4
    // overwrite is idempotent
    IO.writeSingleCsv(data.limit(1), target)
    scala.io.Source.fromFile(f).getLines().length shouldBe 2
  }

  it should "round-trip through ORC with full fidelity" in {
    // ORC is the second built-in columnar lake format; the IO layer's
    // format parameter must carry every logical type both directions
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc")
      .toString
    val data = spark.range(500).selectExpr(
      "id", "CAST(id % 7 AS STRING) AS s", "id * 1.5 AS d",
      "id % 2 = 0 AS b", "timestamp_micros(id * 1000000) AS ts",
      "array(id, id + 1) AS arr")
    IO.write(data, s"$tmp/t", format = "orc")
    val back = IO.read(spark, s"$tmp/t", format = "orc")
    // ORC surfaces everything nullable (standard) — names and logical
    // types must survive exactly
    back.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq shouldBe
      data.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq
    back.orderBy("id").collect() shouldBe
      data.orderBy("id").collect()
  }

  it should "estimate distinct counts within tolerance (approx HLL)" in {
    val ids = spark.range(100000).select((col("id") % 34567).as("k"))
    val approx = ids.agg(approx_count_distinct("k")).collect().head.getLong(0)
    math.abs(approx - 34567.0) / 34567.0 should be < 0.05
  }
}
