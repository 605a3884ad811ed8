package graft.jobs

import graft.SparkSpec
import graft.jobs.graphics.Dashboard
import org.apache.spark.sql.DataFrame

/** Panel-family coverage for the graphics dashboard
  * (graphics_telemetry_dashboard.py:448-1214): each case synthesizes
  * pings and asserts the panel's nested map, mirroring the reference's
  * per-panel outputs.
  */
object DashboardSpec {
  case class Monitor(screenWidth: Integer, screenHeight: Integer,
      refreshRate: Integer, scale: Integer)
  case class D3d11(status: String, version: String, warp: java.lang.Boolean,
      blacklisted: java.lang.Boolean, textureSharing: java.lang.Boolean)
  case class D2d(status: String, version: String)
  case class StatusOnly(status: String)
  case class Features(compositor: String, d3d11: D3d11, d2d: D2d,
      gpuProcess: StatusOnly, advancedLayers: StatusOnly)
  case class Cpu(count: Integer, extensions: Seq[String])
  case class Adapter(vendorID: String, deviceID: String,
      driverVersion: String, driverVendor: String)
  case class Raw(osName: String, osVersion: String,
      servicePackMajor: Integer, buildVersion: String,
      adapters: Seq[Adapter])
  case class Ping(
      OS: String = "Windows-10.0.0",
      OSName: String = "Windows",
      OSVersion: String = "10.0.0",
      FxVersion: String = "55",
      vendorID: String = "0x10de",
      deviceID: String = "0x10de/dev1",
      driverVersion: String = "0x10de/1.1",
      driverVendor: String = null,
      deviceAndDriver: String = "0x10de/dev1/1.1",
      arch: String = "x86-64",
      isWow64: java.lang.Boolean = false,
      memoryMB: java.lang.Long = 8000L,
      cpu: Cpu = Cpu(4, Seq("hasSSE2")),
      deviceReset: Seq[Long] = null,
      sanity: Seq[Long] = null,
      startup: Seq[Long] = null,
      monitors: Seq[Monitor] = null,
      features: Features = null,
      contentBackend: String = null,
      omtcEnabled: java.lang.Boolean = null,
      webglSuccess: Seq[Long] = null,
      webgl2Success: Seq[Long] = null,
      mediaDecoder: Seq[Long] = null,
      webglFailure: Map[String, Long] = null,
      webglAcclFailure: Map[String, Long] = null)
}

class DashboardSpec extends SparkSpec {
  import spark.implicits._
  import DashboardSpec._

  private def df(pings: Ping*): DataFrame = pings.toDS().toDF()

  behavior of "Dashboard.normalize"

  it should "derive OS labels and vendor-qualified keys like validate()" in {
    val raw = Seq(
      Raw("Windows_NT", "10.0", 0, "55.0.3",
        Seq(Adapter("0x10de", "dev1", "1.1", null))),
      Raw("Linux", "4.4", null, "54.0",
        Seq(Adapter("Intel Open Source Technology Center", "i915", "x", "mesa"))),
      Raw("Darwin", "17", null, "55.0", Seq(Adapter("0x8086", null, "2.0", null))),
      Raw("Windows_NT", "6.1", 1, null, // no build version → dropped
        Seq(Adapter("0x10de", "d", "1", null))),
      Raw("Windows_NT", "6.1", 1, "52.0", Seq.empty) // no adapter → dropped
    ).toDS().toDF()
    val out = Dashboard.normalize(raw)
    out.count() shouldBe 3
    val win = out.filter($"OS" === "Windows-10.0.0").collect().head
    win.getAs[String]("OS") shouldBe "Windows-10.0.0"
    win.getAs[String]("OSName") shouldBe "Windows"
    win.getAs[String]("OSVersion") shouldBe "10.0.0"
    win.getAs[String]("FxVersion") shouldBe "55"
    win.getAs[String]("deviceAndDriver") shouldBe "0x10de/dev1/1.1"
    val lin = out.filter($"OS" === "Linux").collect().head
    lin.getAs[String]("OSVersion") shouldBe null
    lin.getAs[String]("OS") shouldBe "Linux"
    // Intel OSTC merges into the PCI id (dashboard.py:196-199)
    lin.getAs[String]("vendorID") shouldBe "0x8086"
    lin.getAs[String]("deviceID") shouldBe "0x8086/i915"
    lin.getAs[String]("driverVendor") shouldBe "mesa"
    val mac = out.filter($"OS" === "Darwin-17").collect().head
    mac.getAs[String]("OS") shouldBe "Darwin-17"
    // missing adapter fields fall back to Unknown
    mac.getAs[String]("deviceID") shouldBe "0x8086/Unknown"
  }

  behavior of "Dashboard TDR panel"

  it should "cross-tabulate reset reasons and vendors both directions" in {
    val pings = df(
      Ping(deviceReset = Seq(0L, 2L, 0L, 1L, 0L, 0L, 0L, 0L)),
      Ping(deviceReset = Seq(0L, 3L, 0L, 0L, 0L, 0L, 0L, 0L), vendorID = "0x8086"),
      Ping(deviceReset = null))
    val tdr = Dashboard.tdrStatistics(pings)
    tdr.tdrPings shouldBe 2
    tdr.results shouldBe Seq(0L, 5L, 0L, 1L, 0L, 0L, 0L, 0L)
    tdr.reasonToVendor(1) shouldBe Map("0x10de" -> 2L, "0x8086" -> 3L)
    tdr.reasonToVendor(3) shouldBe Map("0x10de" -> 1L)
    tdr.vendorToReason("0x10de") shouldBe Map(1 -> 2L, 3 -> 1L)
    tdr.vendorToReason("0x8086") shouldBe Map(1 -> 3L)
  }

  behavior of "Dashboard system panel"

  it should "bucket memory, count cores, filter bogus CPU features, split os bits" in {
    val pings = df(
      Ping(memoryMB = 500L, cpu = Cpu(2, Seq("hasSSE2", "hasAVX"))),
      Ping(memoryMB = 3500L, cpu = Cpu(4, Seq("hasSSE2"))),
      Ping(memoryMB = 6000L, cpu = Cpu(4, Seq("hasSSE2", "hasARMv6"))), // bogus
      Ping(memoryMB = 40000L, cpu = Cpu(null, null)),
      Ping(memoryMB = 0L, arch = "x86", isWow64 = true),
      Ping(arch = "x86", isWow64 = false),
      Ping(arch = "arm"))
    val sys = Dashboard.systemStatistics(pings, pings)
    // 6000 and the two default-8000MB pings land in 4_to_8 (int(p/1000)
    // gives 6 and 8; the reference's x <= 8 branch)
    sys.memory shouldBe Map("less_1gb" -> 1L, "3" -> 1L, "4_to_8" -> 3L,
      "more_32" -> 1L)
    // the three default pings carry Cpu(4, Seq("hasSSE2"))
    sys.logicalCores shouldBe Map("2" -> 1L, "4" -> 5L, "unknown" -> 1L)
    sys.x86Total shouldBe 5 // 7 minus null-extensions minus ARMv6
    sys.x86Features("hasSSE2") shouldBe 5L
    sys.x86Features("hasAVX") shouldBe 1L
    sys.x86Features.contains("hasARMv6") shouldBe false
    sys.wow shouldBe Map("64" -> 4L, "32_on_64" -> 1L, "32" -> 1L,
      "unknown" -> 1L)
  }

  behavior of "Dashboard sanity panel"

  it should "classify outcomes by precedence and weight by bucket count" in {
    val pings = df(
      Ping(sanity = Seq(1L, 0L, 0L, 0L, 0L)), // PASSED(0)
      Ping(sanity = Seq(0L, 2L, 0L, 0L, 0L)), // FAILED_RENDER(1) weight 2
      Ping(sanity = Seq(0L, 1L, 0L, 1L, 0L)), // CRASHED(3) wins over render
      Ping(sanity = Seq(0L, 0L, 0L, 0L, 3L), vendorID = "0x8086",
        OS = "Windows-6.1.1", OSVersion = "6.1.1"), // TIMEDOUT(4)
      Ping(sanity = Seq(0L, 0L, 0L, 0L, 0L)), // nothing fired → excluded
      Ping(sanity = null))
    val s = Dashboard.sanityTestStatistics(pings)
    s.sanityTestPings shouldBe 4
    s.totalPings shouldBe 6
    s.results shouldBe Map("0" -> 1L, "1" -> 1L, "3" -> 1L, "4" -> 1L)
    s.byVendor(1) shouldBe Map("0x10de" -> 2L)
    s.byVendor(4) shouldBe Map("0x8086" -> 3L)
    s.byOs(4) shouldBe Map("Windows-6.1.1" -> 3L)
    s.byDevice(3) shouldBe Map("0x10de/dev1" -> 1L)
    s.windows shouldBe Map("10.0.0" -> 3L, "6.1.1" -> 1L)
  }

  behavior of "Dashboard startup panel"

  it should "sum startup guard outcomes elementwise" in {
    val pings = df(
      Ping(startup = Seq(5L, 0L, 1L, 0L)),
      Ping(startup = Seq(2L, 1L, 0L, 0L), OS = "Windows-6.1.1"),
      Ping(startup = null))
    val s = Dashboard.startupTestStatistics(pings)
    s.startupTestPings shouldBe 2
    s.results shouldBe Seq(7L, 1L, 1L, 0L)
    s.windows shouldBe Map("Windows-10.0.0" -> 1L, "Windows-6.1.1" -> 1L)
  }

  behavior of "Dashboard monitor panel"

  it should "count monitors and read the last monitor's rate/resolution" in {
    val pings = df(
      Ping(monitors = Seq(Monitor(1920, 1080, 60, 1))),
      Ping(monitors = Seq(Monitor(1920, 1080, 60, 1),
        Monitor(2560, 1440, 144, 1))),
      Ping(monitors = Seq(Monitor(0, 1080, 0, 1))), // → Unknown/Unknown
      Ping(monitors = Seq.empty),
      Ping(monitors = null))
    val m = Dashboard.monitorStatistics(pings)
    m.counts shouldBe Map("1" -> 2L, "2" -> 1L)
    m.refreshRates shouldBe Map("60" -> 1L, "144" -> 1L, "Unknown" -> 1L)
    m.resolutions shouldBe Map("1920x1080" -> 1L, "2560x1440" -> 1L,
      "Unknown" -> 1L)
  }

  behavior of "Dashboard mac panel"

  it should "report Darwin versions, retina scale, arch" in {
    val pings = df(
      Ping(OSName = "Darwin", OSVersion = "17",
        monitors = Seq(Monitor(2880, 1800, 60, 2)), arch = "x86-64"),
      Ping(OSName = "Darwin", OSVersion = "16", monitors = null, arch = "x86"),
      Ping()) // Windows — excluded
    val m = Dashboard.macStatistics(pings)
    m("versions") shouldBe Map("17" -> 1L, "16" -> 1L)
    m("retina") shouldBe Map("2" -> 1L, "unknown" -> 1L)
    m("arch") shouldBe Map("64" -> 1L, "32" -> 1L)
  }

  behavior of "Dashboard windows features panel"

  private val d3d11Ok = D3d11("available", "11.1", false, null, true)
  private val featOk = Features("d3d11", d3d11Ok, D2d("available", "1.1"),
    StatusOnly("available"), StatusOnly(null))

  it should "classify compositor, d3d11, warp, and blacklists" in {
    val pings = df(
      Ping(features = featOk, contentBackend = "Skia",
        mediaDecoder = Seq(1L, 2L, 0L)),
      // OMTC explicitly off → compositor "disabled"
      Ping(features = featOk.copy(compositor = "none"), omtcEnabled = false),
      // d3d11 + advanced layers available → "advanced_layers"
      Ping(features = featOk.copy(advancedLayers = StatusOnly("available"))),
      // WARP fallback from the blacklist
      Ping(features = featOk.copy(
        d3d11 = D3d11("available", "11.0", true, true, null))),
      // blacklisted status → device/driver/os blacklists
      Ping(features = featOk.copy(
        d3d11 = D3d11("blacklisted", null, false, null, null)),
        deviceID = "0x10de/devBad", driverVersion = "0x10de/9.9",
        OSVersion = "6.1.0"),
      Ping(features = featOk.copy(
        d3d11 = D3d11("blocked", null, false, null, null)),
        vendorID = "0xdead"),
      Ping(features = null)) // excluded
    val w = Dashboard.windowsFeatures(pings)
    w.all.count shouldBe 6
    // the warp/blacklisted/blocked rows keep compositor "d3d11" (the
    // compositor classifier only rewrites "none" and advanced-layers)
    w.all.compositors shouldBe Map("d3d11" -> 4L, "disabled" -> 1L,
      "advanced_layers" -> 1L)
    w.all.d3d11 shouldBe Map("11.1" -> 3L, "warp" -> 1L,
      "blacklisted" -> 1L, "blocked" -> 1L)
    w.all.warp shouldBe Map("blacklist" -> 1L)
    w.all.contentBackends shouldBe Map("Skia" -> 1L)
    w.all.mediaDecoders shouldBe Seq(1L, 2L, 0L)
    w.all.gpuProcess shouldBe Map("available" -> 6L)
    w.textureSharing shouldBe Map("true" -> 3L, "unknown" -> 1L)
    w.blacklistedDevices shouldBe Map("0x10de/devBad" -> 1L)
    w.blacklistedDrivers shouldBe Map("0x10de/9.9" -> 1L)
    w.blacklistedOs shouldBe Map("6.1.0" -> 1L)
    w.blockedVendors shouldBe Map("0xdead" -> 1L)
    // per-version: 10.0.0 has the d3d11 detail (major >= 6)
    w.byVersion("10.0.0").d3d11.nonEmpty shouldBe true
    w.byVersion.contains("6.2.0") shouldBe false // no pings at that version
  }

  behavior of "Dashboard linux and webgl panels"

  it should "report linux driver vendors and compositors" in {
    val pings = df(
      Ping(OSName = "Linux", driverVendor = "mesa", features = featOk),
      Ping(OSName = "Linux", driverVendor = null, features = null),
      Ping())
    val l = Dashboard.linuxStatistics(pings)
    l("driverVendors") shouldBe Map("mesa" -> 1L)
    l("compositors") shouldBe Map("d3d11" -> 1L)
  }

  it should "count webgl session outcomes without double counting" in {
    val pings = df(
      Ping(webglSuccess = Seq(0L, 3L), features = featOk), // success
      Ping(webglSuccess = Seq(1L, 5L)), // any failure → failure only
      Ping(webglSuccess = Seq(0L, 0L)), // neither
      Ping(webglSuccess = Seq(0L, 1L), OSName = "Darwin", OS = "Darwin-17"),
      Ping(webglSuccess = null))
    val o = Dashboard.webglOutcomes(pings, "webglSuccess")
    o.successCount shouldBe 2
    o.failureCount shouldBe 1
    o.successByOs shouldBe Map("Windows-10.0.0" -> 1L, "Darwin-17" -> 1L)
    // non-Windows compositor is unreliable → "unknown" (bug 1247148)
    o.successByCompositor shouldBe Map("d3d11" -> 1L, "unknown" -> 1L)
    o.failureByVendor shouldBe Map("0x10de" -> 1L)
  }

  it should "combine keyed webgl failure histograms" in {
    val pings = df(
      Ping(webglFailure = Map("FEATURE_FAILURE_A" -> 2L)),
      Ping(webglFailure = Map("FEATURE_FAILURE_A" -> 1L,
        "FEATURE_FAILURE_B" -> 4L)),
      Ping(webglFailure = null))
    val ids = Dashboard.webglFailureIds(pings)
    ids("status") shouldBe Map("FEATURE_FAILURE_A" -> 3L,
      "FEATURE_FAILURE_B" -> 4L)
    ids("acceleration_status") shouldBe Map.empty
  }

  behavior of "Dashboard device panel"

  it should "build the deviceAndDriver search database" in {
    val pings = df(Ping(), Ping(), Ping(deviceAndDriver = "0x8086/d2/2.0"))
    Dashboard.deviceStatistics(pings)("deviceAndDriver") shouldBe
      Map("0x10de/dev1/1.1" -> 2L, "0x8086/d2/2.0" -> 1L)
  }
}
