package graft.jobs.graphics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.jobs.analytics.Analytics

/** Graphics hardware dashboard statistics, ported from
  * mozetl/graphics/graphics_telemetry_dashboard.py.
  *
  * Spark-first: the reference runs ~30 RDD countByKey passes, one per
  * panel, re-filtering + repartitioning + caching per slice
  * (dashboard.py:426-433, 505-534, 1040-1076). Here every classifier
  * (compositor, d3d11 status, sanity outcome, memory bucket, …) is a
  * codegen'd Column expression and every panel is one grouped
  * aggregation — map-side combined, one small map to the driver. The
  * per-version / per-reason breakdowns come from grouping by
  * (version, dimension) instead of a driver loop over filtered RDDs.
  *
  * Expected ping schema (flattened, the output of `normalize` over raw
  * ping columns — reduce_pings/validate dashboard.py:151-260):
  * OS, OSName, OSVersion, FxVersion, vendorID, deviceID, driverVersion,
  * driverVendor, deviceAndDriver (strings); arch string; isWow64 boolean;
  * memoryMB long; cpu struct<count:int, extensions:array<string>>;
  * deviceReset array<long>[8]; sanity array<long>[5]; startup
  * array<long>[4]; monitors array<struct<screenWidth:int,
  * screenHeight:int, refreshRate:int, scale:int>>; features
  * struct<compositor:string, d3d11:struct<status,version:string,
  * warp,blacklisted,textureSharing:boolean>, d2d:struct<status,
  * version:string>, gpuProcess:struct<status:string>,
  * advancedLayers:struct<status:string>>; contentBackend string;
  * omtcEnabled boolean; webglSuccess/webgl2Success array<long>[2];
  * mediaDecoder array<long>[3]; webglFailure/webglAcclFailure
  * map<string,long>.
  */
object Dashboard {

  // ---------------------------------------------------------------------
  // Ping normalization (validate(), dashboard.py:151-207)
  // ---------------------------------------------------------------------

  /** Port of `validate` (dashboard.py:151-207): derive the OS triple, the
    * major Firefox version, and the vendor-qualified device/driver keys
    * from raw ping columns. Input columns: osName, osVersion,
    * servicePackMajor, buildVersion, adapters array<struct<vendorID,
    * deviceID, driverVersion, driverVendor:string>>. Rows without a build
    * version or a usable first adapter are dropped (the reference's
    * `valid` flag + filter).
    */
  def normalize(raw: DataFrame): DataFrame = {
    val name = coalesce(col("osName"), lit("w"))
    val version = coalesce(col("osVersion"), lit("0"))
    val spmaj = coalesce(col("servicePackMajor").cast("string"), lit("0"))
    val winVer = concat(version, lit("."), spmaj)
    // try_element_at: an empty adapter array must yield null (→ row
    // dropped below), not an ANSI index error
    val adapter = try_element_at(col("adapters"), lit(1))
    // Python truthiness, not just null: the reference's `obj.get(key) or
    // "Unknown"` (graphics_telemetry_dashboard.py:189) also maps EMPTY
    // strings to Unknown — telemetry "isn't guaranteed to be well-formed"
    def t(c: Column): Column =
      when(c.isNull || c === "", lit("Unknown")).otherwise(c)
    // Intel Open Source Technology Center reports its own vendor string;
    // merge with the PCI id it should report (dashboard.py:196-199)
    val vendorId = when(
      t(adapter.getField("vendorID")) === "Intel Open Source Technology Center",
      lit("0x8086")).otherwise(t(adapter.getField("vendorID")))
    raw
      // one withColumns call: "OSName" case-insensitively replaces the
      // raw osName column, so sequential withColumn calls would make the
      // later name/version predicates read the already-rewritten value
      .withColumns(Map(
        "OSName" -> when(name === "Windows_NT", "Windows").otherwise(name),
        "OSVersion" -> when(name === "Linux", lit(null).cast("string"))
          .when(name === "Windows_NT", winVer)
          .otherwise(version),
        "OS" -> when(name === "Linux", lit("Linux"))
          .when(name === "Windows_NT", concat(lit("Windows-"), winVer))
          .otherwise(concat(name, lit("-"), version))))
      .filter(col("buildVersion").isNotNull && col("buildVersion") =!= "")
      .withColumn("FxVersion", split(col("buildVersion"), "\\.").getItem(0))
      .filter(adapter.isNotNull)
      .withColumn("vendorID", vendorId)
      .withColumn("deviceID",
        concat(vendorId, lit("/"), t(adapter.getField("deviceID"))))
      .withColumn("driverVersion",
        concat(vendorId, lit("/"), t(adapter.getField("driverVersion"))))
      .withColumn("deviceAndDriver",
        concat(vendorId, lit("/"), t(adapter.getField("deviceID")),
          lit("/"), t(adapter.getField("driverVersion"))))
      .withColumn("driverVendor", adapter.getField("driverVendor"))
  }

  // ---------------------------------------------------------------------
  // Classifier columns (the reference's per-ping Python helpers)
  // ---------------------------------------------------------------------

  /** get_compositor (dashboard.py:897-908): "none" becomes "disabled"
    * when OMTC was explicitly turned off; d3d11 with available advanced
    * layers reports as "advanced_layers".
    */
  def compositorCol: Column = {
    val comp = coalesce(col("features").getField("compositor"), lit("none"))
    when(comp === "none" && !coalesce(col("omtcEnabled"), lit(true)),
        "disabled")
      .when(comp === "d3d11" && advancedLayersCol === "available",
        "advanced_layers")
      .otherwise(comp)
  }

  /** get_d3d11_status (dashboard.py:911-920): non-available status wins,
    * then WARP, then the feature version.
    */
  def d3d11StatusCol: Column = {
    val d3d11 = col("features").getField("d3d11")
    val status = coalesce(d3d11.getField("status"), lit("unknown"))
    when(d3d11.isNull, "unknown")
      .when(status =!= "available", status)
      .when(coalesce(d3d11.getField("warp"), lit(false)), "warp")
      .otherwise(coalesce(d3d11.getField("version"), lit("unknown")))
  }

  /** get_d2d_status (dashboard.py:931-938). */
  def d2dStatusCol: Column = {
    val d2d = col("features").getField("d2d")
    val status = coalesce(d2d.getField("status"), lit("unknown"))
    when(d2d.isNull, "unknown")
      .when(status =!= "available", status)
      .otherwise(coalesce(d2d.getField("version"), lit("unknown")))
  }

  /** get_warp_status (dashboard.py:923-928): only meaningful on WARP
    * pings — did the blacklist or a device failure push us to WARP?
    */
  def warpStatusCol: Column = {
    val bl = col("features").getField("d3d11").getField("blacklisted")
    when(bl.isNull, "unknown")
      .when(bl, "blacklist")
      .otherwise("device failure")
  }

  /** gpu_process_status (dashboard.py:948-952). */
  def gpuProcessCol: Column = {
    val status = col("features").getField("gpuProcess").getField("status")
    when(status.isNull || status === "", "none").otherwise(status)
  }

  /** advanced_layers_status (dashboard.py:959-963). */
  def advancedLayersCol: Column = {
    val al = col("features").getField("advancedLayers")
    when(al.isNull, "none").otherwise(al.getField("status"))
  }

  /** has_working_d3d11 (dashboard.py:941-945). */
  def workingD3d11: Column =
    coalesce(col("features").getField("d3d11").getField("status"), lit("")) ===
      "available"

  /** get_bucket memory bucketing (dashboard.py:536-549). */
  def memoryBucketCol(memoryMB: Column): Column = {
    val x = floor(memoryMB / 1000)
    when(x < 1, "less_1gb")
      .when(x <= 4, x.cast("int").cast("string"))
      .when(x <= 8, "4_to_8")
      .when(x <= 16, "8_to_16")
      .when(x <= 32, "16_to_32")
      .otherwise("more_32")
  }

  /** get_os_bits (dashboard.py:602-610): 64, 32-on-64 (WOW64), 32. */
  def osBitsCol: Column =
    when(coalesce(col("arch"), lit("unknown")) === "x86-64", "64")
      .when(col("arch") === "x86",
        when(coalesce(col("isWow64"), lit(false)), "32_on_64")
          .otherwise("32"))
      .otherwise("unknown")

  /** get_sanity_test_result (dashboard.py:640-653): outcome precedence
    * PASSED > CRASHED > FAILED_RENDER > FAILED_VIDEO > TIMEDOUT (the
    * reference deliberately checks CRASHED before the failure modes).
    * Null when no sanity histogram or no bucket fired. Values are the
    * reference's SANITY_TEST_* constants (0, 3, 1, 2, 4).
    */
  def sanityResultCol(sanity: Column): Column =
    when(sanity.isNull, lit(null).cast("int"))
      .when(element_at(sanity, 1) > 0, 0) // PASSED
      .when(element_at(sanity, 4) > 0, 3) // CRASHED
      .when(element_at(sanity, 2) > 0, 1) // FAILED_RENDER
      .when(element_at(sanity, 3) > 0, 2) // FAILED_VIDEO
      .when(element_at(sanity, 5) > 0, 4) // TIMEDOUT
      .otherwise(lit(null).cast("int"))

  // ---------------------------------------------------------------------
  // Shared helpers
  // ---------------------------------------------------------------------

  /** Elementwise sum of a fixed-width histogram array column — the
    * reference's `rdd.map(p -> p[key]).reduce(x + y)` as ONE map-side
    * combined aggregation (posexplode → groupBy(pos).sum).
    */
  def histogramSums(df: DataFrame, arr: Column, width: Int): Seq[Long] = {
    val sums = df.filter(arr.isNotNull)
      .select(posexplode(arr).as(Seq("pos", "n")))
      .groupBy("pos").agg(sum("n").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until width).map(i => sums.getOrElse(i, 0L))
  }

  /** Dict-valued combiner (dashboard.py:256-270) for map<string,long>
    * histogram columns: explode entries, one grouped sum.
    */
  def mapCombine(df: DataFrame, mapCol: Column): Map[String, Long] =
    df.filter(mapCol.isNotNull)
      .select(explode(mapCol).as(Seq("k", "n")))
      .groupBy("k").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  // ---------------------------------------------------------------------
  // Panels
  // ---------------------------------------------------------------------

  /** General panel: device and driver frequency maps
    * (dashboard.py:419-421).
    */
  def generalStatistics(pings: DataFrame): Map[String, Map[String, Long]] =
    Map(
      "devices" -> Analytics.frequencyMap(pings, "deviceID"),
      "drivers" -> Analytics.frequencyMap(pings, "driverVersion"))

  /** Per-subset panel: OS share, Windows-version share, vendor share
    * (dashboard.py:405-415).
    */
  def subsetStatistics(subset: DataFrame): Map[String, Map[String, Long]] = {
    val windows = subset.filter(col("OSName") === "Windows")
    Map(
      "os" -> Analytics.frequencyMap(subset, "OSName"),
      "windows" -> Analytics.frequencyMap(windows, "OSVersion"),
      "vendors" -> Analytics.frequencyMap(subset, "vendorID"))
  }

  /** The byFx breakdown (dashboard.py:423-433) as single grouped passes:
    * one (FxVersion × dimension) aggregation per panel, driver assembles
    * the nested map.
    */
  def statisticsByFxVersion(pings: DataFrame)
      : Map[String, Map[String, Map[String, Long]]] = {
    def nested(df: DataFrame, dim: String) =
      Analytics.nestedFrequency(df, "FxVersion", dim).toMap
    val os = nested(pings, "OSName")
    val vendors = nested(pings, "vendorID")
    val windows = nested(pings.filter(col("OSName") === "Windows"), "OSVersion")
    val byVersion = (os.keySet ++ vendors.keySet).map { fx =>
      fx -> Map(
        "os" -> os.getOrElse(fx, Map.empty),
        "windows" -> windows.getOrElse(fx, Map.empty),
        "vendors" -> vendors.getOrElse(fx, Map.empty))
    }.toMap
    // the reference always includes the whole-population slice under
    // "all" alongside the per-version keys (dashboard.py:424)
    byVersion + ("all" -> subsetStatistics(pings))
  }

  /** device-statistics (dashboard.py:448-450): the vendor/device/driver
    * composite key search database.
    */
  def deviceStatistics(pings: DataFrame): Map[String, Map[String, Long]] =
    Map("deviceAndDriver" -> Analytics.frequencyMap(pings, "deviceAndDriver"))

  /** tdr-statistics (dashboard.py:465-520). */
  case class TdrStatistics(
      tdrPings: Long,
      results: Seq[Long],
      reasonToVendor: Map[Int, Map[String, Long]],
      vendorToReason: Map[String, Map[Int, Long]])

  /** TDR analysis: total resets per reason plus the reason↔vendor cross
    * tabulation, both directions. The reference runs 1 reduce + 7
    * filtered passes × 2 directions (dashboard.py:496-510); here ONE
    * posexplode + grouped sum feeds both nested maps.
    */
  def tdrStatistics(windowsPings: DataFrame,
      numReasons: Int = 8): TdrStatistics = {
    val tdr = windowsPings.filter(col("deviceReset").isNotNull)
    val cross = tdr
      .select(col("vendorID"), posexplode(col("deviceReset")).as(Seq("reason", "n")))
      .filter(col("n") > 0)
      .groupBy("reason", "vendorID").agg(sum("n").as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val results = {
      val byReason = cross.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._3).sum }
      (0 until numReasons).map(i => byReason.getOrElse(i, 0L))
    }
    // reason 0 is "no reset" padding in the histogram; the cross maps
    // cover reasons 1.. as the reference's range(1, num_tdr_reasons)
    val crossNonZero = cross.filter(_._1 >= 1)
    TdrStatistics(
      tdrPings = tdr.count(),
      results = results,
      reasonToVendor = crossNonZero.groupBy(_._1).map { case (reason, vs) =>
        reason -> vs.map(v => v._2 -> v._3).toMap
      },
      vendorToReason = crossNonZero.groupBy(_._2).map { case (vendor, vs) =>
        vendor -> vs.map(v => v._1 -> v._3).toMap
      })
  }

  /** system-statistics (dashboard.py:527-616). */
  case class SystemStatistics(
      logicalCores: Map[String, Long],
      x86Total: Long,
      x86Features: Map[String, Long],
      memory: Map[String, Long],
      wow: Map[String, Long])

  def systemStatistics(generalPings: DataFrame,
      windowsPings: DataFrame): SystemStatistics = {
    val logicalCores = Analytics.frequencyMap(generalPings,
      coalesce(col("cpu").getField("count").cast("string"), lit("unknown")))
    // Firefox 39 could report CPU features that weren't present; ARMv6
    // on x86/64 marks those bogus pings (dashboard.py:558-563)
    val ext = col("cpu").getField("extensions")
    val cpuid = generalPings.filter(ext.isNotNull &&
      !array_contains(ext, "hasARMv6"))
    val x86Total = cpuid.count()
    val features = cpuid.select(explode(ext).as("f"))
      .groupBy("f").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val memory = Analytics.frequencyMap(
      generalPings.filter(col("memoryMB") > 0),
      memoryBucketCol(col("memoryMB")))
    val wow = Analytics.frequencyMap(windowsPings, osBitsCol)
    SystemStatistics(logicalCores, x86Total, features, memory, wow)
  }

  /** sanity-test-statistics (dashboard.py:638-763). */
  case class SanityTestStatistics(
      sanityTestPings: Long,
      totalPings: Long,
      results: Map[String, Long],
      byVendor: Map[Int, Map[String, Long]],
      byOs: Map[Int, Map[String, Long]],
      byDevice: Map[Int, Map[String, Long]],
      byDriver: Map[Int, Map[String, Long]],
      windows: Map[String, Long])

  /** Sanity-test outcomes. The reference loops the 4 failure outcomes ×
    * 4 dimensions as 16 filtered RDD passes + dict-combiner reduces
    * (dashboard.py:685-737); here one stack-unpivot + grouped sum covers
    * all of them, weighting each ping by its fired bucket count exactly
    * as `p[SANITY_TEST][value]` does. byDevice/byDriver keep the top-10 +
    * "Other" coalescing.
    */
  def sanityTestStatistics(windowsPings: DataFrame): SanityTestStatistics = {
    val classified = windowsPings
      .withColumn("sanity_result", sanityResultCol(col("sanity")))
      .filter(col("sanity_result").isNotNull)
    val results = Analytics.frequencyMap(classified, "sanity_result")
    val cross = classified.filter(col("sanity_result") >= 1)
      .withColumn("w", element_at(col("sanity"), col("sanity_result") + 1))
      .select(col("sanity_result"), col("w"), expr(
        "stack(4, 'vendor', vendorID, 'os', OS, 'device', deviceID, " +
          "'driver', driverVersion) AS (dim, k)"))
      .groupBy("dim", "sanity_result", "k").agg(sum("w").as("n"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    def byDim(dim: String): Map[Int, Map[String, Long]] =
      cross.filter(_._1 == dim).groupBy(_._2).map { case (v, rows) =>
        v -> rows.map(r => r._3 -> r._4).toMap
      }
    def top10(m: Map[Int, Map[String, Long]]): Map[Int, Map[String, Long]] =
      Analytics.coalesceToNItems(
        m.toSeq.map { case (k, v) => k.toString -> v }, 10)
        .map { case (k, v) => k.toInt -> v }.toMap
    SanityTestStatistics(
      sanityTestPings = classified.count(),
      totalPings = windowsPings.count(),
      results = results,
      byVendor = byDim("vendor"),
      byOs = byDim("os"),
      byDevice = top10(byDim("device")),
      byDriver = top10(byDim("driver")),
      windows = Analytics.frequencyMap(classified, "OSVersion"))
  }

  /** startup-test-statistics (dashboard.py:767-781): driver crash-guard
    * outcome sums + OS share.
    */
  case class StartupTestStatistics(
      startupTestPings: Long,
      results: Seq[Long],
      windows: Map[String, Long])

  def startupTestStatistics(generalPings: DataFrame,
      numOutcomes: Int = 4): StartupTestStatistics = {
    val st = generalPings.filter(col("startup").isNotNull)
    StartupTestStatistics(
      startupTestPings = st.count(),
      results = histogramSums(st, col("startup"), numOutcomes),
      windows = Analytics.frequencyMap(st, "OS"))
  }

  /** monitor-statistics (dashboard.py:793-846): per-ping monitor count,
    * plus refresh rate / resolution of the LAST monitor (the reference
    * indexes `monitors[count-1]` for pings with exactly `count`
    * monitors — i.e. the last element — via a per-count filtered-RDD
    * union; element_at(monitors, size) is the same value in one pass).
    */
  case class MonitorStatistics(
      counts: Map[String, Long],
      refreshRates: Map[String, Long],
      resolutions: Map[String, Long])

  def monitorStatistics(windowsPings: DataFrame): MonitorStatistics = {
    val withMon = windowsPings.filter(
      col("monitors").isNotNull && size(col("monitors")) > 0)
    val last = element_at(col("monitors"), size(col("monitors")))
    val rate = last.getField("refreshRate")
    val w = last.getField("screenWidth")
    val h = last.getField("screenHeight")
    MonitorStatistics(
      counts = Analytics.frequencyMap(withMon, size(col("monitors"))),
      refreshRates = Analytics.frequencyMap(withMon,
        when(rate > 1, rate.cast("string")).otherwise("Unknown")),
      resolutions = Analytics.frequencyMap(withMon,
        when(coalesce(w, lit(0)) === 0 || coalesce(h, lit(0)) === 0,
          lit("Unknown"))
          .otherwise(concat(w, lit("x"), h))))
  }

  /** mac-statistics (dashboard.py:856-885): Darwin version / retina
    * scale / architecture shares.
    */
  def macStatistics(generalPings: DataFrame): Map[String, Map[String, Long]] = {
    val mac = generalPings.filter(col("OSName") === "Darwin")
    val scale = coalesce(
      element_at(col("monitors"), 1).getField("scale").cast("string"),
      lit("unknown"))
    val arch = when(coalesce(col("arch"), lit("unknown")) === "x86-64", "64")
      .when(col("arch") === "x86", "32")
      .otherwise("unknown")
    Map(
      "versions" -> Analytics.frequencyMap(mac, "OSVersion"),
      "retina" -> Analytics.frequencyMap(mac, scale),
      "arch" -> Analytics.frequencyMap(mac, arch))
  }

  /** windows-features (dashboard.py:966-1105). */
  case class FeatureSlice(
      count: Long,
      compositors: Map[String, Long],
      contentBackends: Map[String, Long],
      d3d11: Map[String, Long],
      d2d: Map[String, Long],
      warp: Map[String, Long],
      mediaDecoders: Seq[Long],
      gpuProcess: Map[String, Long],
      advancedLayers: Map[String, Long])

  case class WindowsFeatureStatistics(
      all: FeatureSlice,
      textureSharing: Map[String, Long],
      byVersion: Map[String, FeatureSlice],
      blacklistedDevices: Map[String, Long],
      blacklistedDrivers: Map[String, Long],
      blacklistedOs: Map[String, Long],
      blockedVendors: Map[String, Long])

  /** Windows versions worth the per-version detail pass
    * (dashboard.py:980).
    */
  val ImportantWindowsVersions: Seq[String] =
    Seq("6.1.0", "6.1.1", "6.2.0", "6.3.0", "10.0.0")

  /** Compositor / blacklisting panel. Every classifier is a column; the
    * per-version breakdown reuses the same derived frame grouped by
    * (OSVersion, classifier) — the reference re-filters and repartitions
    * the RDD once per important version (dashboard.py:1040-1076).
    */
  def windowsFeatures(windowsPings: DataFrame): WindowsFeatureStatistics = {
    val feats = windowsPings.filter(col("features").isNotNull)
      .withColumn("compositor_c", compositorCol)
      .withColumn("d3d11_c", d3d11StatusCol)
      .withColumn("d2d_c", d2dStatusCol)
      .withColumn("gpu_process_c", gpuProcessCol)
      .withColumn("advanced_layers_c", advancedLayersCol)
    def slice(df: DataFrame): FeatureSlice = FeatureSlice(
      count = df.count(),
      compositors = Analytics.frequencyMap(df, "compositor_c"),
      contentBackends = Analytics.frequencyMap(
        df.filter(col("contentBackend").isNotNull), "contentBackend"),
      d3d11 = Analytics.frequencyMap(df, "d3d11_c"),
      d2d = Analytics.frequencyMap(df, "d2d_c"),
      warp = Analytics.frequencyMap(
        df.filter(col("d3d11_c") === "warp"), warpStatusCol),
      mediaDecoders = histogramSums(df, col("mediaDecoder"), 3),
      gpuProcess = Analytics.frequencyMap(df, "gpu_process_c"),
      advancedLayers = Analytics.frequencyMap(df, "advanced_layers_c"))
    val all = slice(feats)
    // one OSVersion frequency pass decides which important versions are
    // populated — replaces a limit(1).count() probe job per version (the
    // reference's feature_pings_by_os gate, dashboard.py:1040-1043)
    val versionCounts = Analytics.frequencyMap(feats, "OSVersion")
    val byVersion = ImportantWindowsVersions
      .filter(v => versionCounts.getOrElse(v, 0L) > 0)
      .map(v => v -> feats.filter(col("OSVersion") === v))
      .map { case (v, df) =>
        val s = slice(df)
        // pre-Vista versions skip the d3d11/d2d/warp detail
        // (dashboard.py:1056-1066 guards on major >= 6)
        if (v.split("\\.")(0).toInt >= 6) v -> s
        else v -> s.copy(d3d11 = Map.empty, d2d = Map.empty, warp = Map.empty)
      }.toMap
    val blacklisted = feats.filter(col("d3d11_c") === "blacklisted")
    val blocked = feats.filter(col("d3d11_c") === "blocked")
    WindowsFeatureStatistics(
      all = all,
      textureSharing = Analytics.frequencyMap(
        feats.filter(workingD3d11),
        coalesce(col("features").getField("d3d11").getField("textureSharing")
          .cast("string"), lit("unknown"))),
      byVersion = byVersion,
      blacklistedDevices = Analytics.frequencyMap(blacklisted, "deviceID"),
      blacklistedDrivers = Analytics.frequencyMap(blacklisted, "driverVersion"),
      blacklistedOs = Analytics.frequencyMap(blacklisted, "OSVersion"),
      blockedVendors = Analytics.frequencyMap(blocked, "vendorID"))
  }

  /** linux-statistics (dashboard.py:1113-1126). */
  def linuxStatistics(generalPings: DataFrame): Map[String, Map[String, Long]] = {
    val linux = generalPings.filter(col("OSName") === "Linux")
    Map(
      "driverVendors" -> Analytics.frequencyMap(
        linux.filter(col("driverVendor").isNotNull), "driverVendor"),
      "compositors" -> Analytics.frequencyMap(
        linux.filter(col("features").isNotNull), compositorCol))
  }

  /** webgl-statistics (dashboard.py:1133-1214). */
  case class WebGlOutcomes(
      successCount: Long,
      successByOs: Map[String, Long],
      successByCompositor: Map[String, Long],
      failureCount: Long,
      failureByOs: Map[String, Long],
      failureByVendor: Map[String, Long],
      failureByDevice: Map[String, Long],
      failureByDriver: Map[String, Long])

  /** Session-level WebGL success/failure shares for one CANVAS_*_SUCCESS
    * histogram column. A session counts as failure if bucket 0 fired;
    * success only if bucket 0 never fired and bucket 1 did (the
    * reference's no-double-count rule, dashboard.py:1160-1166).
    */
  def webglOutcomes(generalPings: DataFrame, histCol: String): WebGlOutcomes = {
    val hist = generalPings.filter(col(histCol).isNotNull)
    val failures = hist.filter(element_at(col(histCol), 1) > 0)
    val successes = hist.filter(element_at(col(histCol), 1) === 0 &&
      element_at(col(histCol), 2) > 0)
    // compositor data is only reliable on Windows (bug 1247148 note,
    // dashboard.py:1180-1184)
    val cc = when(col("OSName") =!= "Windows", lit("unknown"))
      .otherwise(compositorCol)
    WebGlOutcomes(
      successCount = successes.count(),
      successByOs = Analytics.frequencyMap(successes, "OS"),
      successByCompositor = Analytics.frequencyMap(successes, cc),
      failureCount = failures.count(),
      failureByOs = Analytics.frequencyMap(failures, "OS"),
      failureByVendor = Analytics.frequencyMap(failures, "vendorID"),
      failureByDevice = Analytics.frequencyMap(failures, "deviceID"),
      failureByDriver = Analytics.frequencyMap(failures, "driverVersion"))
  }

  /** The keyed-histogram failure-id maps (get_gl_statistics,
    * dashboard.py:1133-1150).
    */
  def webglFailureIds(generalPings: DataFrame): Map[String, Map[String, Long]] =
    Map(
      "status" -> mapCombine(generalPings, col("webglFailure")),
      "acceleration_status" -> mapCombine(generalPings, col("webglAcclFailure")))
}
