package graft.jobs

import graft.SparkSpec
import graft.jobs.taar._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

class TaarSpec extends SparkSpec {
  import MainSummaryFixture.{addonType, addon}

  private val cdSchema = StructType(Seq(
    StructField("client_id", StringType),
    StructField("submission_date_s3", StringType),
    StructField("channel", StringType),
    StructField("normalized_channel", StringType),
    StructField("app_name", StringType),
    StructField("locale", StringType),
    StructField("city", StringType),
    StructField("os", StringType),
    StructField("active_addons", ArrayType(addonType)),
    StructField("subsession_hours_sum", DoubleType),
    StructField("places_bookmarks_count_mean", DoubleType),
    StructField("scalar_parent_browser_engagement_tab_open_event_count_sum", DoubleType),
    StructField("scalar_parent_browser_engagement_total_uri_count_sum", DoubleType),
    StructField("scalar_parent_browser_engagement_unique_domains_count_mean", DoubleType),
    StructField("scalar_parent_browser_engagement_unique_domains_count_max", DoubleType)))

  private def cdRow(clientId: String, addons: Seq[Row],
      day: String = "20190101", locale: String = "en-US",
      os: String = "windows", hours: Double = 2.5): Row =
    Row(clientId, day, "release", "release", "Firefox", locale, "Berlin",
      os, addons, hours, 10.0, 5.0, 100.0, 7.0, 9.0)

  private def clientsDaily(rows: Row*): DataFrame = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), cdSchema)
    df.createOrReplaceTempView("clients_daily")
    df
  }

  private val wl = Seq("a@x", "b@x", "c@x", "d@x")

  it should "count co-installations per key addon (guidguid)" in {
    clientsDaily(
      cdRow("c1", Seq(addon("a@x"), addon("b@x"), addon("c@x"))),
      cdRow("c2", Seq(addon("a@x"), addon("b@x"))),
      cdRow("c3", Seq(addon("a@x"), addon("sys@only", isSystem = true))))
    val training = LiteGuidGuid.extractTelemetry(spark, wl)
    // c3 drops (only 1 valid addon)
    training.count() shouldBe 2
    val model = LiteGuidGuid.toModel(LiteGuidGuid.transform(training))
    model("a@x") shouldBe Map("b@x" -> 2L, "c@x" -> 1L)
    model("b@x") shouldBe Map("a@x" -> 2L, "c@x" -> 1L)
    model("c@x") shouldBe Map("a@x" -> 1L, "b@x" -> 1L)
  }

  // tests/test_taar_lite_guidguid.py MOCK_TELEMETRY_SAMPLE →
  // EXPECTED_GUID_GUID_DATA, verbatim — including the duplicate-guid
  // client ["guid-1", "guid-1"], whose key_all (position-identity
  // exclusion) yields a SELF-co-installation of n=2
  it should "reproduce the reference coinstallation counts with duplicate guids" in {
    import spark.implicits._
    val sample = Seq(
      Seq("test-guid-1", "test-guid-2", "test-guid-3"),
      Seq("test-guid-1", "test-guid-3"),
      Seq("test-guid-1", "test-guid-4"),
      Seq("test-guid-2", "test-guid-5", "test-guid-6"),
      Seq("test-guid-1", "test-guid-1")
    ).toDF("installed_addons")
    val model = LiteGuidGuid.toModel(LiteGuidGuid.transform(sample))
    model shouldBe Map(
      "test-guid-1" -> Map("test-guid-2" -> 1L, "test-guid-1" -> 2L,
        "test-guid-3" -> 2L, "test-guid-4" -> 1L),
      "test-guid-2" -> Map("test-guid-6" -> 1L, "test-guid-5" -> 1L,
        "test-guid-3" -> 1L, "test-guid-1" -> 1L),
      "test-guid-3" -> Map("test-guid-2" -> 1L, "test-guid-1" -> 2L),
      "test-guid-4" -> Map("test-guid-1" -> 1L),
      "test-guid-5" -> Map("test-guid-6" -> 1L, "test-guid-2" -> 1L),
      "test-guid-6" -> Map("test-guid-2" -> 1L, "test-guid-5" -> 1L))
  }

  it should "use the broadcast whitelist path for large lists with identical results" in {
    clientsDaily(
      cdRow("c1", Seq(addon("a@x"), addon("b@x"), addon("c@x"))),
      cdRow("c2", Seq(addon("a@x"), addon("b@x"))))
    val bigWl = wl ++ (1 to 2000).map(i => s"pad$i@x")
    val small = LiteGuidGuid.toModel(LiteGuidGuid.transform(
      LiteGuidGuid.extractTelemetry(spark, wl)))
    val big = LiteGuidGuid.toModel(LiteGuidGuid.transform(
      LiteGuidGuid.extractTelemetry(spark, bigWl)))
    big shouldBe small
  }

  // tests/test_taar_locale.py:92-119,342-377 — SAMPLE_CLIENT_DATA for
  // en-US clients 1-5 with the reference's good/bad1/bad2 addon templates
  // (bad1 = is_system, bad2 = user_disabled + signed_state 0), and both
  // expected record sets (range-limited and open-ended) copied verbatim
  it should "reproduce the reference client-addon extraction across day ranges" in {
    def good(id: String) =
      Row(id, false, s"name-$id", false, false, "1.0", 1L, "extension",
        false, false, 16000L, 16001L, 2L, false, false, true)
    def bad1(id: String) = // is_system
      Row(id, false, s"name-$id", false, false, "1.0", 1L, "extension",
        false, false, 16000L, 16001L, 2L, true, false, true)
    def bad2(id: String) = // user_disabled, unsigned
      Row(id, false, s"name-$id", true, false, "1.0", 1L, "extension",
        false, false, 16000L, 16001L, 0L, false, false, true)
    clientsDaily(
      cdRow("client-1", Seq(good("guid-1"), good("guid-5"), bad1("guid-bad1")), day = "20190115"),
      cdRow("client-1", Seq(good("guid-1"), good("guid-4"), bad1("guid-bad1")), day = "20190113"),
      cdRow("client-1", Seq(good("guid-1"), good("guid-3"), bad1("guid-bad1")), day = "20190112"),
      cdRow("client-1", Seq(good("guid-1"), bad1("guid-bad1")), day = "20190110"),
      cdRow("client-2", Seq(good("guid-2"), bad2("guid-bad2")), day = "20190114"),
      cdRow("client-2", Seq(good("guid-1"), bad2("guid-bad2")), day = "20190112"),
      cdRow("client-3", Seq(good("guid-1")), day = "20190109"),
      cdRow("client-4", Seq(good("guid-1"), good("guid-2")), day = "20190112"),
      cdRow("client-5", Seq(), day = "20190114"),
      cdRow("client-5", Seq(), day = "20190113"))
    // range limited on both ends: client-1 keeps 20190113, client-3 is
    // out of range, client-5 has no add-ons
    rowsOf(Locale.getClientAddons(spark, "20190112", Some("20190114")),
      "locale", "client_id", "addon") shouldBe Set(
      Seq("en-US", "client-1", "guid-1"), Seq("en-US", "client-1", "guid-4"),
      Seq("en-US", "client-2", "guid-2"),
      Seq("en-US", "client-4", "guid-1"), Seq("en-US", "client-4", "guid-2"))
    // earliest bound only: client-1 keeps its 20190115 record instead
    rowsOf(Locale.getClientAddons(spark, "20190112"),
      "locale", "client_id", "addon") shouldBe Set(
      Seq("en-US", "client-1", "guid-1"), Seq("en-US", "client-1", "guid-5"),
      Seq("en-US", "client-2", "guid-2"),
      Seq("en-US", "client-4", "guid-1"), Seq("en-US", "client-4", "guid-2"))
  }

  it should "rank addon install counts via SQL (guidranking)" in {
    clientsDaily(
      cdRow("c1", Seq(addon("a@x"), addon("b@x"))),
      cdRow("c2", Seq(addon("a@x"))))
    LiteGuidRanking.toModel(LiteGuidRanking.extractTelemetry(spark)) shouldBe
      Map("a@x" -> 2L, "b@x" -> 1L)
  }

  it should "dedup to the latest client day and build locale top-lists" in {
    clientsDaily(
      cdRow("c1", Seq(addon("a@x"), addon("b@x")), day = "20190101"),
      cdRow("c1", Seq(addon("a@x")), day = "20190105"),
      cdRow("c2", Seq(addon("b@x")), day = "20190103"),
      cdRow("c3", Seq(addon("c@x")), day = "20190103", locale = "de"))
    val ca = Locale.getClientAddons(spark, "20190101")
    // c1 keeps only its latest day's addons
    rowsOf(ca, "client_id", "addon") shouldBe Set(
      Seq("c1", "a@x"), Seq("c2", "b@x"), Seq("c3", "c@x"))
    val dict = Locale.generateDictionary(spark, wl, "20190101",
      numAddons = 2, seed = 7L)
    dict.keySet shouldBe Set("en-US", "de")
    dict("en-US").length shouldBe 2
    // weights are normalized relative proportions
    dict.values.foreach(_.foreach { case (_, w) => w should (be >= -1.0 and be <= 1.0) })
  }

  // tests/test_taar_locale.py:438-463 — with the reference's mock noise
  // (add the Laplace scale itself), expected grid values verbatim:
  // en-US scale 1/0.4 = 2.5, de scale 3/0.4 = 7.5, absent whitelist
  // add-ons surface with raw count 0
  it should "reproduce the reference noisy-count grid under mock noise" in {
    val counts = Seq(("en-US", "guid-1", 5L), ("en-US", "guid-2", 2L),
      ("en-US", "guid-3", 1L), ("de", "guid-1", 3L), ("de", "guid-2", 2L),
      ("de", "guid-3", 4L))
    val noisy = Locale.computeNoisyCounts(counts,
      Map("en-US" -> 1, "de" -> 3),
      Seq("guid-1", "guid-2", "guid-3", "guid-not-installed"),
      noise = (_, scale) => scale)
    noisy.toSet shouldBe Set(
      ("en-US", "guid-1", 7.5), ("en-US", "guid-2", 4.5),
      ("en-US", "guid-3", 3.5), ("en-US", "guid-not-installed", 2.5),
      ("de", "guid-1", 10.5), ("de", "guid-2", 9.5),
      ("de", "guid-3", 11.5), ("de", "guid-not-installed", 7.5))
  }

  // tests/test_taar_locale.py:510-520 — negative noised counts min-shift
  // to zero and weights normalize to 1 per locale, verbatim values
  it should "reproduce the reference top-addons normalization with a negative count" in {
    val counts = Seq(("en-US", "guid-1", 5.0), ("en-US", "guid-2", 2.0),
      ("en-US", "guid-3", 1.0), ("de", "guid-1", -1.0), ("de", "guid-2", 2.0),
      ("de", "guid-3", 4.0))
    val top = Locale.topAddonsByLocale(counts, 3)
    top.foreach { case (_, addons) => addons.map(_._2).sum shouldBe 1.0 }
    top shouldBe Map(
      "en-US" -> Seq(("guid-1", 0.8), ("guid-2", 0.2), ("guid-3", 0.0)),
      "de" -> Seq(("guid-3", 0.625), ("guid-2", 0.375), ("guid-1", 0.0)))
  }

  it should "add seeded Laplace noise over the full locale×whitelist grid" in {
    val noisy = Locale.computeNoisyCounts(
      Seq(("en", "a@x", 10L)), Map("en" -> 1), Seq("a@x", "b@x"), seed = 1L)
    noisy.map(t => (t._1, t._2)) shouldBe Seq(("en", "a@x"), ("en", "b@x"))
    val again = Locale.computeNoisyCounts(
      Seq(("en", "a@x", 10L)), Map("en" -> 1), Seq("a@x", "b@x"), seed = 1L)
    noisy shouldBe again // seeded determinism
    math.abs(noisy.head._3 - 10.0) should be < 50.0
  }

  it should "export latest-day client profiles through a batched sink (dynamo)" in {
    val schema = StructType(Seq(
      StructField("client_id", StringType),
      StructField("subsession_start_date", StringType),
      StructField("subsession_length", LongType),
      StructField("city", StringType),
      StructField("locale", StringType),
      StructField("os", StringType),
      StructField("places_bookmarks_count", LongType),
      StructField("scalar_parent_browser_engagement_tab_open_event_count", LongType),
      StructField("scalar_parent_browser_engagement_total_uri_count", LongType),
      StructField("scalar_parent_browser_engagement_unique_domains_count", LongType),
      StructField("active_addons", ArrayType(addonType)),
      StructField("disabled_addons_ids", ArrayType(StringType))))
    val rows = Seq(
      Row("c1", "2019-01-01", 100L, "Berlin", "de", "win", 1L, 2L, 3L, 4L,
        Seq(addon("a@x")), Seq("off@x")),
      Row("c1", "2019-01-03", 100L, "Berlin", "de", "win", 1L, 2L, 3L, 4L,
        Seq(addon("a@x")), Seq.empty[String]),
      Row("", "2019-01-01", 100L, null, null, null, null, null, null, null,
        null, null),
      Row("c2", "1601-01-01", 100L, "Oslo", "no", "mac", 1L, 2L, 3L, 4L,
        Seq(addon("b@x")), Seq.empty[String]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = Dynamo.extractTransform(df)
    // c1 deduped to latest day; empty client and pre-1970 dates dropped
    rowsOf(out, "client_id", "start_date") shouldBe
      Set(Seq("c1", "20190103"))

    object MemSink extends Dynamo.KeyValueSink {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      def putBatch(rows: Seq[(String, String, String)]): Seq[String] = {
        rows.foreach(r => seen.add(r._1)); Seq.empty
      }
    }
    val stats = Dynamo.load(out, MemSink, batchSize = 1)
    stats.pushed shouldBe 1L
    stats.seen shouldBe 1L
    stats.errors shouldBe empty
  }

  it should "cluster clients by addons and compute LR curves (similarity)" in {
    val users = clientsDaily(
      (1 to 12).map { i =>
        val addons =
          if (i % 2 == 0) Seq(addon("a@x"), addon("b@x"), addon("c@x"), addon("d@x"))
          else Seq(addon("e@y"), addon("f@y"), addon("g@y"), addon("a@x"))
        cdRow(s"c$i", addons, os = if (i % 2 == 0) "windows" else "mac",
          hours = 1.0 + i)
      }: _*)
    val samples = Similarity.getSamples(spark, "20190101")
    samples.count() shouldBe 12
    val addonsDf = Similarity.getAddonsPerClient(samples,
      wl ++ Seq("e@y", "f@y", "g@y"), 2)
    addonsDf.count() shouldBe 12
    val clusters = Similarity.computeClusters(addonsDf, 2, Some(42L))
    clusters.select("prediction").distinct().count() shouldBe 2
    // even/odd clients land in different clusters
    val byClient = clusters.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    byClient("c2") shouldBe byClient("c4")
    byClient("c1") shouldBe byClient("c3")
    byClient("c1") should not be byClient("c2")

    val features = samples.join(clusters, "client_id")
    val curves = Similarity.getLrCurves(spark, features, Seq(0, 1),
      kernelBandwidth = 0.1, numPdfPoints = 10, randomSeed = Some(42L))
    curves.length should be <= 10
    curves.length should be > 0
  }

  it should "compute CostLLR and fit ensemble weights" in {
    val cllr = new Ensemble.CostLLR
    val v = cllr.evalcllr(Seq("a" -> 0.8, "b" -> 0.1), Seq("a"))
    v should be > 0.0
    cllr.total shouldBe v

    object Rec extends Ensemble.Recommender {
      def recommend(info: Map[String, Any], limit: Int): Seq[(String, Double)] =
        info("installed_addons").asInstanceOf[Seq[String]]
          .take(limit).map(_ -> 0.5)
    }
    val rows = (1 to 40).map(i =>
      Map[String, Any]("installed_addons" -> Seq("a", "b", "c")))
    val stacked = rows.flatMap(r =>
      Ensemble.toStackedRow(Seq(Rec, Rec, Rec), r))
    stacked should not be empty
    import spark.implicits._
    val df = spark.createDataFrame(stacked)
    val coefs = Ensemble.computeRegression(spark, Seq(df), 0.1, 0.0)
    coefs.keySet shouldBe Ensemble.PredictorOrder.toSet
  }

  it should "parse and guard the editorial whitelist" in {
    import graft.jobs.taar.UpdateWhitelist._
    val rows = (1 to 150).map(i => EditorialRow(Some(s"g$i@x"))) ++
      Seq(EditorialRow(None), EditorialRow(Some("")), EditorialRow(Some("null")),
        EditorialRow(Some("g1@x"))) // dup
    val guids = parseRows(rows)
    guids.length shouldBe 150
    guids shouldBe guids.sorted
    an[ShortWhitelistError] should be thrownBy
      parseRows(Seq(EditorialRow(Some("only@one"))))
    parseRows(Seq(EditorialRow(Some("only@one"))),
      allowShortGuidList = true) shouldBe Seq("only@one")
  }

  it should "filter AMO addons into whitelists" in {
    import graft.jobs.taar.AmoWhitelist._
    val now = java.time.LocalDate.parse("2019-06-01")
    val addons = Seq(
      AmoAddon("good@x", isFeatured = true, currentVersionHasFiles = true,
        currentVersionIsWebextension = true, averageRating = 4.5,
        firstCreateDate = Some(java.time.LocalDate.parse("2018-01-01"))),
      AmoAddon("young@x", isFeatured = false, currentVersionHasFiles = true,
        currentVersionIsWebextension = true, averageRating = 5.0,
        firstCreateDate = Some(java.time.LocalDate.parse("2019-05-20"))),
      AmoAddon("lowrated@x", isFeatured = false, currentVersionHasFiles = true,
        currentVersionIsWebextension = true, averageRating = 2.0,
        firstCreateDate = Some(java.time.LocalDate.parse("2018-01-01"))),
      AmoAddon("legacy@x", isFeatured = true, currentVersionHasFiles = true,
        currentVersionIsWebextension = false, averageRating = 5.0,
        firstCreateDate = Some(java.time.LocalDate.parse("2018-01-01"))),
      AmoAddon(PioneerGuid, isFeatured = false, currentVersionHasFiles = true,
        currentVersionIsWebextension = true, averageRating = 5.0,
        firstCreateDate = Some(java.time.LocalDate.parse("2018-01-01"))))
    val out = transform(addons, now)
    out("whitelist").map(_.guid) shouldBe Seq("good@x")
    out("featured").map(_.guid) shouldBe Seq("good@x", "legacy@x")
    out("featured_whitelist").map(_.guid) shouldBe Seq("good@x")
  }

  it should "split folds that partition the dataset" in {
    import spark.implicits._
    val data = (1 to 100).map(i => (s"c$i", i)).toDF("client_id", "n")
    val folds = Ensemble.crossValidationSplit(data, 4, seed = Some(42L))
    folds.map(_.count()).sum shouldBe 100L
  }
}
