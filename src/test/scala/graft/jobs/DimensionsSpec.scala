package graft.jobs

import graft.SparkSpec
import graft.core.PathFlatten
import graft.jobs.hardware.{Dimensions, HardwareReport}
import org.apache.spark.sql.functions.col

class DimensionsSpec extends SparkSpec {
  import spark.implicits._

  private val pings = Seq(
    // browser_arch, cpu_cores, cpu_speed, cpu_vendor, gfx vendor/device,
    // screen w/h, memory, os name/version, wow64, flash
    ("x86", 4L, 2400L, "GenuineIntel", "0x10de", "0x1401", 1920L, 1080L,
      8192L, "Windows_NT", "10.0", true, true),
    ("x86-64", 8L, 3200L, "AuthenticAMD", "0xdead", "0xbeef", 2560L, 1440L,
      16384L, "Darwin", "17.0", false, false))
    .toDF("browser_arch", "cpu_cores", "cpu_speed", "cpu_vendor",
      "gfx0_vendor_id", "gfx0_device_id", "screen_width", "screen_height",
      "memory_mb", "os_name", "os_version", "is_wow64", "has_flash")

  private val deviceMap = Dimensions.deviceMapDf(spark,
    Seq(("0x10de", "0x1401", "Maxwell", "GM206")))

  it should "prepare hardware dimensions with device-map lookup" in {
    val out = Dimensions.prepareData(pings, deviceMap)
    val r1 = out.filter(col("browser_arch") === "x86").collect().head
    r1.getAs[String]("gfx0_vendor_name") shouldBe "NVIDIA"
    r1.getAs[String]("gfx0_model") shouldBe "Maxwell-GM206"
    r1.getAs[String]("cpu_cores_speed") shouldBe "4_2.4"
    r1.getAs[String]("resolution") shouldBe "1920x1080"
    r1.getAs[Int]("memory_gb") shouldBe 8
    // 32-bit browser + WOW64 on Windows → 64-bit OS
    r1.getAs[String]("os_arch") shouldBe "x86-64"
    val r2 = out.filter(col("browser_arch") === "x86-64").collect().head
    r2.getAs[String]("gfx0_vendor_name") shouldBe "Other"
    r2.getAs[String]("gfx0_model") shouldBe "Unknown"
    r2.getAs[String]("os_arch") shouldBe "x86-64"
  }

  it should "feed the dimension aggregation end-to-end" in {
    val dims = Dimensions.toDimensionsMap(
      Dimensions.prepareData(pings, deviceMap))
    val agg = HardwareReport.aggregateDimensions(dims)
    rowsOf(agg.filter(col("dimension") === "gfx0_vendor_name"),
      "value", "count") shouldBe Set(Seq("NVIDIA", 1L), Seq("Other", 1L))
  }

  it should "invert the gpu-db layout into device-map rows" in {
    val raw = Map(
      "10de" -> Map(
        "Maxwell" -> Map("GM206" -> Seq("1401", "1402")),
        "Pascal" -> Map("GP104" -> Seq("1b80"))),
      "8086" -> Map("Gen9" -> Map("Skylake" -> Seq("1912"))))
    Dimensions.invertDeviceMap(raw) shouldBe Seq(
      ("0x10de", "0x1401", "Maxwell", "GM206"),
      ("0x10de", "0x1402", "Maxwell", "GM206"),
      ("0x10de", "0x1b80", "Pascal", "GP104"),
      ("0x8086", "0x1912", "Gen9", "Skylake"))
  }

  it should "assemble the end-to-end report with shares per dimension" in {
    val (n, report) = HardwareReport.assembleReport(
      pings.union(pings), deviceMap, countThreshold = 1)
    n shouldBe 4
    report("gfx0_vendor_name") shouldBe Map("NVIDIA" -> 0.5, "Other" -> 0.5)
    report("os") shouldBe Map("Windows_NT-10.0" -> 0.5, "Darwin-17.0" -> 0.5)
    report("os_arch") shouldBe Map("x86-64" -> 1.0)
    report("memory_gb") shouldBe Map("8" -> 0.5, "16" -> 0.5)
    report("cpu_cores") shouldBe Map("4" -> 0.5, "8" -> 0.5)
    report("has_flash") shouldBe Map("true" -> 0.5, "false" -> 0.5)
    report.keySet shouldBe Dimensions.KeysToAggregate.toSet
    // collapse: with a threshold above every count, all values fold to
    // Other with share 1.0 per dimension
    val (_, collapsed) = HardwareReport.assembleReport(
      pings, deviceMap, countThreshold = 5)
    collapsed("os") shouldBe Map("Other" -> 1.0)
  }

  it should "finalize and validate the weekly report entry" in {
    val report = Map(
      "browser_arch" -> Map("x86" -> 0.4, "x86-64" -> 0.6),
      "gfx0_vendor_name" -> Map("NVIDIA" -> 1.0))
    val f = HardwareReport.finalizeReport(report, "2018-09-09",
      brokenRatio = 0.01, inactiveRatio = 0.02)
    f.shares("browserArch_x86") shouldBe 0.4
    f.shares("gpuVendor_NVIDIA") shouldBe 1.0
    // validation fails: 10 of 12 property families have no shares at all
    HardwareReport.validateFinalizedData(f) shouldBe false
    // a complete report (every family summing to ~1.0) validates
    val complete = HardwareReport.finalizeReport(
      Dimensions.KeysToAggregate.map(k => k -> Map("v" -> 1.0)).toMap,
      "2018-09-09", 0.0, 0.0)
    HardwareReport.validateFinalizedData(complete) shouldBe true
    // an unknown property prefix fails loudly
    HardwareReport.validateFinalizedData(
      complete.copy(shares = complete.shares + ("bogus_x" -> 0.1))) shouldBe
      false
    // a family drifting past the tolerance fails
    HardwareReport.validateFinalizedData(
      complete.copy(shares =
        complete.shares + ("browserArch_v" -> 0.8))) shouldBe false
  }

  it should "name the longitudinal week like get_longitudinal_version" in {
    import java.time.LocalDate
    // Thursday and its Sunday both resolve to the week ending 09-15;
    // Saturday belongs to the PREVIOUS week (tests/hardware_report/
    // test_summarize_json.py:352-364)
    HardwareReport.longitudinalVersion(LocalDate.parse("2018-09-13")) shouldBe
      "longitudinal_v20180915"
    HardwareReport.longitudinalVersion(LocalDate.parse("2018-09-09")) shouldBe
      "longitudinal_v20180915"
    HardwareReport.longitudinalVersion(LocalDate.parse("2018-09-08")) shouldBe
      "longitudinal_v20180908"
  }

  it should "summarize distinct-client OS share like mozetl.main" in {
    import graft.jobs.analytics.Analytics
    val pings = Seq(("a", "windows"), ("b", "darwin"), ("c", "linux"),
      ("d", "windows"),
      // duplicates collapse before the histogram (test_main.py)
      ("a", "windows"), ("b", "darwin"))
      .toDF("client_id", "os")
    Analytics.osShare(pings) shouldBe
      Map("windows" -> 2L, "darwin" -> 1L, "linux" -> 1L)
  }

  it should "flag week-over-week share anomalies like check_output" in {
    val weeks = Map(
      20170101 -> Map("gfx_nv" -> 0.50, "gfx_amd" -> 0.30, "tiny" -> 0.005),
      20170108 -> Map("gfx_nv" -> 0.20, "gfx_amd" -> 0.31, "fresh" -> 0.40),
      // an even older week must be ignored (only the two most recent count)
      20161225 -> Map("gfx_nv" -> 0.99))
    val changes = HardwareReport.checkMostRecentChange(weeks,
      minChange = 0.3, minValue = 0.01, missingVal = 0.01)
    // nv dropped 60% → flagged with old/new values
    changes("gfx_nv").change shouldBe -0.6 +- 1e-9
    changes("gfx_nv").oldValue shouldBe 0.5
    // amd moved 3% → not flagged; tiny's old share < min_value → ignored
    changes.contains("gfx_amd") shouldBe false
    changes.contains("tiny") shouldBe false
    // a brand-new metric compares against missing_val and is flagged
    changes("fresh").change shouldBe 39.0 +- 1e-9
  }

  it should "consolidate weekly series with new data winning on reruns" in {
    val existing = Seq(
      "2017-01-01" -> Map("a" -> 1.0),
      "2017-01-08" -> Map("a" -> 2.0))
    val fresh = Seq(
      "2017-01-08" -> Map("a" -> 9.0), // rerun overwrites
      "2017-01-15" -> Map("a" -> 3.0))
    HardwareReport.consolidateWeekly(existing, fresh) shouldBe Seq(
      "2017-01-01" -> Map("a" -> 1.0),
      "2017-01-08" -> Map("a" -> 9.0),
      "2017-01-15" -> Map("a" -> 3.0))
  }

  it should "flatten slash paths into nested column selects" in {
    val nested = Seq((("win", "10"), 5L))
      .toDF("os", "count")
      .selectExpr("named_struct('name', os._1, 'version', os._2) AS system",
        "count")
    val flat = PathFlatten.flatten(nested,
      Seq("system/name", "system/version"))
    flat.columns.toSeq shouldBe Seq("system/name", "system/version")
    flat.collect().head.getString(0) shouldBe "win"
    PathFlatten.existingPaths(nested,
      Seq("system/name", "system/missing", "nope")) shouldBe
      Seq("system/name")
  }
}
