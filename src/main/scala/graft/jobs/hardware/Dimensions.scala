package graft.jobs.hardware

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hardware-report dimension preparation, ported from
  * mozetl/hardware_report/summarize_json.py:46-313 (vendor names, device
  * family/chipset lookup, OS arch inference, unit conversions).
  *
  * Spark-first: the reference runs prepare_data as a Python map over
  * driver-shaped dicts; here the same derivations are column expressions
  * (the device map joins in as a broadcast table, not a closure).
  */
object Dimensions {

  /** summarize_json.py:73-100 — GPU vendor id → name. */
  val VendorMap: Map[String, String] = Map(
    "0x1013" -> "Cirrus Logic", "0x1002" -> "AMD", "0x8086" -> "Intel",
    "0x5333" -> "S3 Graphics", "0x1039" -> "SIS", "0x1106" -> "VIA",
    "0x10de" -> "NVIDIA", "0x102b" -> "Matrox", "0x15ad" -> "VMWare",
    "0x80ee" -> "Oracle VirtualBox", "0x1414" -> "Microsoft Basic")

  def vendorNameFromId(id: Column): Column = {
    val chain = VendorMap.foldLeft(lit("Other")) { case (acc, (k, v)) =>
      when(id === k, v).otherwise(acc)
    }
    chain
  }

  /** summarize_json.py:46-70 — infer 32/64-bit OS. */
  def osArch(browserArch: Column, osName: Column, isWow64: Column): Column =
    when(browserArch === "x86-64", "x86-64")
      .when(osName === "Windows_NT" && isWow64, "x86-64")
      .otherwise("x86")

  /** Device map as a broadcastable frame (vendor_id, device_id, family,
    * chipset) — the reference fetches this from GPU db JSON files
    * (summarize_json.py:143-154); callers supply rows.
    */
  def deviceMapDf(spark: org.apache.spark.sql.SparkSession,
      entries: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    entries.toDF("vendor_id", "device_id", "family", "chipset")
  }

  /** invert_device_map (summarize_json.py:126-143): the raw gpu-db
    * layout (Vendor → Family → Chipset → [device ids], ids without the
    * 0x prefix) flattened to deviceMapDf rows with 0x-prefixed ids.
    */
  def invertDeviceMap(raw: Map[String, Map[String, Map[String, Seq[String]]]])
      : Seq[(String, String, String, String)] =
    (for {
      (vendor, families) <- raw.toSeq
      (family, chipsets) <- families
      (chipset, ids) <- chipsets
      id <- ids
    } yield (s"0x$vendor", s"0x$id", family, chipset)).sorted

  /** summarize_json.py:290-313 prepare_data as one projection + a
    * broadcast left join for the device family/chipset lookup.
    */
  def prepareData(pings: DataFrame, deviceMap: DataFrame): DataFrame = {
    // python round() is half-to-even — bround matches, round does not
    val cpuSpeed = bround(col("cpu_speed") / 1000.0, 1)
    pings
      .join(broadcast(deviceMap),
        pings("gfx0_vendor_id") === deviceMap("vendor_id") &&
          pings("gfx0_device_id") === deviceMap("device_id"),
        "left_outer")
      .select(
        col("browser_arch"),
        col("cpu_cores"),
        concat(col("cpu_cores").cast("string"), lit("_"),
          cpuSpeed.cast("string")).as("cpu_cores_speed"),
        col("cpu_vendor"),
        cpuSpeed.as("cpu_speed"),
        vendorNameFromId(col("gfx0_vendor_id")).as("gfx0_vendor_name"),
        coalesce(concat(col("family"), lit("-"), col("chipset")),
          lit("Unknown")).as("gfx0_model"),
        concat(col("screen_width").cast("string"), lit("x"),
          col("screen_height").cast("string")).as("resolution"),
        bround(col("memory_mb") / 1024.0).cast("int").as("memory_gb"),
        concat(col("os_name"), lit("-"), col("os_version")).as("os"),
        osArch(col("browser_arch"), col("os_name"), col("is_wow64"))
          .as("os_arch"),
        col("has_flash"))
  }

  /** The full aggregation dimension list (aggregate_data's
    * keys_to_aggregate, summarize_json.py:319-333).
    */
  val KeysToAggregate: Seq[String] = Seq(
    "browser_arch", "cpu_cores", "cpu_cores_speed", "cpu_vendor",
    "cpu_speed", "gfx0_vendor_name", "gfx0_model", "resolution",
    "memory_gb", "os", "os_arch", "has_flash")

  /** Pack the prepared row into the dimension map consumed by
    * HardwareReport.aggregateDimensions (values stringified to share the
    * map's common type).
    */
  def toDimensionsMap(prepared: DataFrame): DataFrame =
    prepared.select(map(
      KeysToAggregate.flatMap(d => Seq(lit(d), col(d).cast("string"))): _*)
      .as("dimensions"))
}
