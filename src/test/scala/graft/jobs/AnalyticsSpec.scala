package graft.jobs

import graft.SparkSpec
import graft.jobs.analytics.Analytics
import graft.jobs.bhr.BhrCollection
import graft.jobs.hardware.HardwareReport
import org.apache.spark.sql.functions._
import java.time.LocalDate

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Analytics"

  it should "compute frequency and share maps" in {
    val df = Seq("a", "a", "b", "c").toDF("k")
    Analytics.frequencyMap(df, "k") shouldBe Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
    Analytics.shareMap(df, "k")("a") shouldBe 0.5
  }

  it should "collapse long tails into Other" in {
    val agg = Seq("win" -> Map("d3d11" -> 100L, "d3d9" -> 10L, "warp" -> 3L,
      "basic" -> 2L))
    Analytics.coalesceToNItems(agg, 2) shouldBe Seq(
      "win" -> Map("d3d11" -> 100L, "d3d9" -> 10L, "Other" -> 5L))
    // at or below maxItems → untouched
    Analytics.coalesceToNItems(Seq("x" -> Map("a" -> 1L)), 2) shouldBe
      Seq("x" -> Map("a" -> 1L))
  }

  it should "chunk date ranges weekly" in {
    val chunks = Analytics.weeklyChunks(
      LocalDate.parse("2017-01-01"), LocalDate.parse("2017-01-17"))
    chunks shouldBe Seq(
      (LocalDate.parse("2017-01-01"), LocalDate.parse("2017-01-08")),
      (LocalDate.parse("2017-01-08"), LocalDate.parse("2017-01-15")),
      (LocalDate.parse("2017-01-15"), LocalDate.parse("2017-01-17")))
  }

  it should "compute weekly trend shares" in {
    val df = Seq(("2017-01-01", "d3d11"), ("2017-01-01", "warp"),
      ("2017-01-08", "d3d11")).toDF("week", "compositor")
    val out = Analytics.weeklyShares(df, col("week"),
      col("compositor") === "d3d11")
    rowsOf(out, "week", "total", "matching") shouldBe Set(
      Seq("2017-01-01", 2L, 1L), Seq("2017-01-08", 1L, 1L))
  }

  behavior of "Dashboard"

  it should "compute general and per-version statistics in grouped passes" in {
    val pings = Seq(
      ("54", "Windows", "10.0", "0x10de", "dev1", "1.1"),
      ("54", "Windows", "7.0", "0x10de", "dev1", "1.2"),
      ("54", "Darwin", "17", "0x8086", "dev2", "2.0"),
      ("55", "Windows", "10.0", "0x8086", "dev2", "2.0"))
      .toDF("FxVersion", "OSName", "OSVersion", "vendorID", "deviceID",
        "driverVersion")
    val general = graft.jobs.graphics.Dashboard.generalStatistics(pings)
    general("devices") shouldBe Map("dev1" -> 2L, "dev2" -> 2L)
    val subset = graft.jobs.graphics.Dashboard.subsetStatistics(pings)
    subset("os") shouldBe Map("Windows" -> 3L, "Darwin" -> 1L)
    subset("windows") shouldBe Map("10.0" -> 2L, "7.0" -> 1L)
    val byFx = graft.jobs.graphics.Dashboard.statisticsByFxVersion(pings)
    byFx("54")("vendors") shouldBe Map("0x10de" -> 2L, "0x8086" -> 1L)
    byFx("55")("windows") shouldBe Map("10.0" -> 1L)
    byFx("55")("os") shouldBe Map("Windows" -> 1L)
  }

  behavior of "BhrCollection"

  it should "aggregate hang durations per key and normalize by usage hours" in {
    val hangs = Seq(
      BhrCollection.Hang(Seq("f1", "f2"), 1000.0, "Gecko", "r1", "parent",
        "20170101", "win"),
      BhrCollection.Hang(Seq("f1", "f2"), 500.0, "Gecko", "r1", "parent",
        "20170101", "win"),
      BhrCollection.Hang(Seq("f3"), 200.0, "Gecko", "r2", "parent",
        "20170101", "win"),
      // out-of-bounds durations are dropped pre-aggregation
      // (map_to_hang_data bounds): sub-128ms noise and huge outliers
      BhrCollection.Hang(Seq("f3"), 10.0, "Gecko", "r2", "parent",
        "20170101", "win"),
      BhrCollection.Hang(Seq("f3"), 1e6, "Gecko", "r2", "parent",
        "20170101", "win")).toDS()
    val agg = BhrCollection.aggregateHangs(hangs)
    agg.count() shouldBe 2
    val usage = Seq(("20170101", 10.0)).toDF("buildDate", "usage_hours")
    val norm = BhrCollection.normalizeByUsageHours(agg, usage)
    val r = norm.filter(
      org.apache.spark.sql.functions.size(col("stack")) === 2).collect().head
    r.getAs[Double]("hangs_per_hour") shouldBe 150.0
    r.getAs[Double]("count_per_hour") shouldBe 0.2
  }

  it should "symbolicate frames with a left join and per-hang collect" in {
    val frames = Seq((1L, "xul.dll", 100L), (1L, "xul.dll", 200L),
      (2L, "unknown.dll", 5L)).toDF("hang_id", "module", "offset")
    val modules = Seq(("xul.dll", 100L, "nsThread::Run", "xul"),
      ("xul.dll", 200L, "js::Interpret", "xul"))
      .toDF("module", "offset", "symbol", "module_name")
    val out = BhrCollection.symbolicateFrames(frames, modules)
    out.count() shouldBe 2
    val h2 = out.filter(col("hang_id") === 2).collect().head
    // unmatched frames survive with null symbols (left join)
    h2.getSeq[org.apache.spark.sql.Row](1).head.getAs[String]("symbol") shouldBe null
  }

  behavior of "HangExtraction"

  it should "extract, filter, and fork ForcePaint hangs from a ping" in {
    import graft.jobs.bhr.HangExtraction._
    val ping = Ping(
      buildId = "20170103120000",
      osName = "Windows_NT",
      modules = Seq(Module("xul.pdb", "ABC123")),
      hangs = Seq(
        RawHang(Seq(NativeFrame(0, "0x1f"), PseudoFrame("js::Run")),
          duration = 120.0, thread = "Gecko", process = "parent",
          annotations = Map.empty),
        RawHang(Seq(NativeFrame(5, "0x2f")), 80.0, "Gecko", "content",
          annotations = Map("PaintWhileInterruptingJS" -> "true")),
        RawHang(Seq(NativeFrame(0, "0x3f")), 50.0, "OtherThread", "parent",
          Map.empty),
        RawHang(Seq.empty, 10.0, "Gecko", "parent", Map.empty)))
    val hangs = processHangs(ping, Config(threadFilter = "Gecko"))
    // 1 plain + (1 annotated × 2 threads); off-thread + empty-stack dropped
    hangs.length shouldBe 3
    hangs.map(_.thread).sorted shouldBe
      Seq("Gecko", "Gecko", "Gecko_Child_ForcePaint")
    hangs.head.stack shouldBe Seq("xul.pdb\\ABC123:0x1f", "pseudo\\null:js::Run")
    // out-of-range module index → unresolved frame
    hangs(1).stack shouldBe Seq("?:0x2f")
    hangs.foreach(_.buildDate shouldBe "20170103")
  }

  behavior of "HardwareReport"

  private val pings = Seq(
    ("c1", "2017-01-02", "win", "10", "b1", Map("os" -> "win", "gpu" -> "nv")),
    ("c1", "2017-01-05", "win", "10", "b1", Map("os" -> "win", "gpu" -> "amd")),
    ("c2", "2017-01-03", null, "10", "b1", Map("os" -> "?", "gpu" -> "nv")),
    ("c3", "2016-12-01", "mac", "13", "b2", Map("os" -> "mac", "gpu" -> "intel")))
    .toDF("client_id", "activity_date", "os_name", "os_version", "build_id",
      "dimensions")

  it should "keep the latest valid ping per client" in {
    val out = HardwareReport.latestValidPerClient(pings,
      "2017-01-01", "2017-02-01")
    rowsOf(out, "client_id", "activity_date") shouldBe
      Set(Seq("c1", "2017-01-05"))
  }

  it should "validate broken/inactive ratios" in {
    val (br, ir) = HardwareReport.validateRatios(pings,
      "2017-01-01", "2017-02-01")
    br shouldBe 0.25
    ir shouldBe 0.25
    an[IllegalArgumentException] should be thrownBy
      HardwareReport.validateRatios(pings, "2099-01-01", "2099-02-01")
  }

  it should "count, collapse and finalize dimensions" in {
    val clients = Seq(
      Map("gpu" -> "nv", "os" -> "win"),
      Map("gpu" -> "nv", "os" -> "win"),
      Map("gpu" -> "amd", "os" -> "win")).toDF("dimensions")
    val agg = HardwareReport.aggregateDimensions(clients)
    val collapsed = HardwareReport.collapseBuckets(agg, countThreshold = 2)
    // reference keeps only counts STRICTLY above the threshold
    // (summarize_json.py:376 `v > count_threshold`): nv at exactly 2
    // collapses too
    rowsOf(collapsed, "dimension", "value", "count") shouldBe Set(
      Seq("gpu", "Other", 3L), Seq("os", "win", 3L))
    val fin = HardwareReport.finalizeData(collapsed, 3)
    fin.filter(col("value") === "win").collect().head
      .getAs[Double]("share") shouldBe 1.0
  }

  it should "collapse with full reference semantics (exclusions, 0x0, ~WxH, os-Other)" in {
    val agg = Seq(
      ("resolution", "0x0", 100L), // bug 1324014: straight to Other
      ("resolution", "1920x1080", 50L), // above threshold: kept
      ("resolution", "1366x768", 2L), // rare → ~1400x800, still rare → Other
      ("os", "Windows_NT-6.1", 2L), // rare → Windows_NT-Other ...
      ("os", "Windows_NT-6.2", 2L), // ... merged to 4 > 3: survives pass 2
      ("has_flash", "true", 1L) // EXCLUSION_LIST: kept at any count
    ).toDF("dimension", "value", "count")
    val out = HardwareReport.collapseBuckets(agg, countThreshold = 3)
    rowsOf(out, "dimension", "value", "count") shouldBe Set(
      Seq("resolution", "1920x1080", 50L),
      Seq("resolution", "Other", 102L),
      Seq("os", "Windows_NT-Other", 4L),
      Seq("has_flash", "true", 1L))
  }
}
