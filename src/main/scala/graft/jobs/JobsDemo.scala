package graft.jobs

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Executable usage example: drives every ported mozetl job end-to-end on
  * small inline fixtures and prints result shapes. This is the library's
  * "does it run" surface — the per-operator correctness lives in the specs
  * and the driver gate queries.
  *
  * Run: sbt "runMain graft.jobs.JobsDemo"
  */
object JobsDemo {

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession(4, "graft-jobs-demo")
    import spark.implicits._

    graft.core.GraftExtensions.register(spark)
    println("[jobs-demo] graft_polyhash('ab') = " +
      spark.sql("SELECT graft_polyhash('ab')").collect().head.getLong(0))

    def show(name: String, n: Long, cols: Int): Unit =
      println(f"[jobs-demo] $name%-28s rows=$n%-6d cols=$cols")

    // --- clients_daily ---------------------------------------------------
    val ms = fixtures.mainSummary(spark)
    val withSearches = clientsdaily.Rollup.extractSearchCounts(ms)
    val daily = clientsdaily.Rollup.toProfileDayAggregates(withSearches)
    show("clients_daily", daily.count(), daily.columns.length)

    // --- experiments_daily ----------------------------------------------
    val expDaily = experiments.ExperimentsDaily
      .toExperimentProfileDayAggregates(
        clientsdaily.Rollup.extractSearchCounts(
          experiments.ExperimentsDaily.loadFilter(
            ms.withColumn("experiment_id", lit("exp-1"))
              .withColumn("experiment_branch", lit("control")))))
    show("experiments_daily", expDaily.count(), expDaily.columns.length)

    // --- search_clients_daily / search_aggregates ------------------------
    val scd = search.SearchAggregates.searchClientsDaily(ms)
    show("search_clients_daily", scd.count(), scd.columns.length)
    val sa = search.SearchAggregates.searchAggregates(ms)
    show("search_aggregates", sa.count(), sa.columns.length)

    // --- addon_aggregates ------------------------------------------------
    val aa = addons.AddonAggregates.run(ms)
    show("addon_aggregates", aa.count(), aa.columns.length)

    // --- sync bookmark validation ---------------------------------------
    fixtures.syncSummary(spark).createOrReplaceTempView("sync_summary")
    val (problems, aggs) = sync.BookmarkValidation.transform(spark)
    show("bmk_validation_problems", problems.count(), problems.columns.length)
    show("bmk_total_per_day", aggs.count(), aggs.columns.length)

    // --- landfill sampler ------------------------------------------------
    val lf = landfill.Sampler.transform(fixtures.landfill(spark), 100)
    show("landfill_sample", lf.count(), lf.columns.length)

    // --- taar family -----------------------------------------------------
    fixtures.clientsDaily(spark).createOrReplaceTempView("clients_daily")
    val wl = Seq("a@x", "b@x", "c@x")
    val gg = taar.LiteGuidGuid.transform(
      taar.LiteGuidGuid.extractTelemetry(spark, wl))
    show("taar_lite_guidguid", gg.count(), gg.columns.length)
    val gr = taar.LiteGuidRanking.extractTelemetry(spark)
    show("taar_lite_guidranking", gr.count(), gr.columns.length)
    val localeDict = taar.Locale.generateDictionary(spark, wl, "20190101",
      numAddons = 3, seed = 42L)
    println(s"[jobs-demo] taar_locale                  locales=${localeDict.size}")

    // --- graphics/hardware/bhr analytics cores ---------------------------
    val freq = analytics.Analytics.frequencyMap(
      fixtures.clientsDaily(spark), "locale")
    println(s"[jobs-demo] graphics_frequency           keys=${freq.size}")
    val gfxPings = Seq(("54", "Windows", "10.0", "0x10de", "d1", "v1"),
      ("55", "Darwin", "17", "0x8086", "d2", "v2"))
      .toDF("FxVersion", "OSName", "OSVersion", "vendorID", "deviceID",
        "driverVersion")
    val byFx = graphics.Dashboard.statisticsByFxVersion(gfxPings)
    println(s"[jobs-demo] graphics_dashboard           fx_versions=${byFx.size}")
    val pings = Seq(
      ("x86", 4L, 2400L, "GenuineIntel", "0x10de", "0x1401", 1920L, 1080L,
        8192L, "Windows_NT", "10.0", true, true),
      ("x86-64", 8L, 3200L, "AuthenticAMD", "0x8086", "0x0042", 2560L,
        1440L, 16384L, "Darwin", "17.0", false, false))
      .toDF("browser_arch", "cpu_cores", "cpu_speed", "cpu_vendor",
        "gfx0_vendor_id", "gfx0_device_id", "screen_width", "screen_height",
        "memory_mb", "os_name", "os_version", "is_wow64", "has_flash")
    val prepared = hardware.Dimensions.prepareData(pings,
      hardware.Dimensions.deviceMapDf(spark,
        Seq(("0x10de", "0x1401", "Maxwell", "GM206"))))
    val hw = hardware.HardwareReport.finalizeData(
      hardware.HardwareReport.collapseBuckets(
        hardware.HardwareReport.aggregateDimensions(
          hardware.Dimensions.toDimensionsMap(prepared)), 1), 2)
    show("hardware_report", hw.count(), hw.columns.length)
    val rollupTmp = java.nio.file.Files.createTempDirectory("graft-demo").toString
    ms.write.mode("overwrite")
      .parquet(s"$rollupTmp/ms/submission_date_s3=20170101")
    val rollupOut = search.Rollups.searchClientsDailyEtl(spark, "20170101",
      s"$rollupTmp/ms", s"$rollupTmp/out")
    println(s"[jobs-demo] search_rollup_etl            wrote=$rollupOut " +
      s"rows=${spark.read.parquet(rollupOut).count()}")
    import bhr.HangExtraction._
    // ping models carry an ADT stack → Kryo-encoded Dataset (production
    // pings arrive as JSON strings parsed inside the flatMap instead)
    implicit val pingEnc: org.apache.spark.sql.Encoder[Ping] =
      org.apache.spark.sql.Encoders.kryo[Ping]
    val bhrPings = spark.createDataset(Seq(Ping("20190101120000",
      "Windows_NT", Seq(Module("xul.pdb", "ABC")),
      Seq(RawHang(Seq(NativeFrame(0, "0x1f")), 10.0, "Gecko", "parent",
        Map.empty),
        RawHang(Seq(PseudoFrame("js::Run")), 5.0, "Gecko", "parent",
          Map("PaintWhileInterruptingJS" -> "1"))))))
    val hangs = bhr.BhrCollection.getAllHangs(bhrPings,
      (p: Ping) => processHangs(p, Config(threadFilter = "Gecko")))
    val bhrAgg = bhr.BhrCollection.aggregateHangs(hangs)
    show("bhr_hang_aggregate", bhrAgg.count(), bhrAgg.columns.length)
    // driver-side profile assembly over the collected aggregation
    val processor = new bhr.ProfileProcessor(
      bhr.ProfileProcessor.Config(uuid = "jobs-demo"))
    processor.ingest(bhr.BhrCollection.toSampleRows(bhrAgg))
    val profile = processor.processIntoProfile()
    println(s"[jobs-demo] bhr_profile_processor        " +
      s"threads=${profile.threads.size} " +
      s"samples=${profile.threads.map(_.sampleTable.length).sum}")

    // --- round-5 panel families / trends / report assembly ---------------
    val rawGfx = Seq(
      (("Windows_NT": String), "10.0", 0: Integer, "55.0.3"),
      ("Darwin", "17", null: Integer, "54.0"))
      .toDF("osName", "osVersion", "servicePackMajor", "buildVersion")
      .withColumn("adapters", org.apache.spark.sql.functions.expr(
        "array(named_struct('vendorID', '0x10de', 'deviceID', 'dev', " +
          "'driverVersion', '1.1', 'driverVendor', CAST(NULL AS STRING)))"))
      .withColumn("memoryMB", org.apache.spark.sql.functions.lit(8000L))
      .withColumn("arch", org.apache.spark.sql.functions.lit("x86-64"))
      .withColumn("isWow64", org.apache.spark.sql.functions.lit(false))
      .withColumn("cpu", org.apache.spark.sql.functions.expr(
        "named_struct('count', 4, 'extensions', array('hasSSE2'))"))
      .withColumn("deviceReset", org.apache.spark.sql.functions.expr(
        "array(0L, 1L, 0L, 0L, 0L, 0L, 0L, 0L)"))
      .withColumn("sanity", org.apache.spark.sql.functions.expr(
        "array(1L, 0L, 0L, 0L, 0L)"))
      .withColumn("startup", org.apache.spark.sql.functions.expr(
        "array(1L, 0L, 0L, 0L)"))
      .withColumn("monitors", org.apache.spark.sql.functions.expr(
        "array(named_struct('screenWidth', 1920, 'screenHeight', 1080, " +
          "'refreshRate', 60, 'scale', 1))"))
      .withColumn("features", org.apache.spark.sql.functions.expr(
        "named_struct('compositor', 'd3d11', " +
          "'d3d11', named_struct('status', 'available', 'version', '11.1', " +
          "'warp', false, 'blacklisted', CAST(NULL AS BOOLEAN), " +
          "'textureSharing', true), " +
          "'d2d', named_struct('status', 'available', 'version', '1.1'), " +
          "'gpuProcess', named_struct('status', 'available'), " +
          "'advancedLayers', named_struct('status', CAST(NULL AS STRING)))"))
      .withColumn("omtcEnabled", org.apache.spark.sql.functions.lit(true))
    val normalized = graphics.Dashboard.normalize(rawGfx).cache()
    val winPings = normalized.where("OSName = 'Windows'")
    val tdr = graphics.Dashboard.tdrStatistics(winPings)
    val sys5 = graphics.Dashboard.systemStatistics(normalized, winPings)
    val sanity = graphics.Dashboard.sanityTestStatistics(winPings)
    println(s"[jobs-demo] graphics_panels              " +
      s"tdrPings=${tdr.tdrPings} memBuckets=${sys5.memory.size} " +
      s"sanity=${sanity.sanityTestPings} " +
      s"monitors=${graphics.Dashboard.monitorStatistics(winPings).counts.size}")
    val trendSeries = graphics.Trends.updateAll(
      series = Map.empty,
      today = java.time.LocalDate.parse("2017-01-18"),
      firstValidDate = java.time.LocalDate.parse("2017-01-04"),
      pingsForWeek = (_, _) => normalized)
    println(s"[jobs-demo] graphics_trends              " +
      s"trends=${trendSeries.size} " +
      s"points=${trendSeries.values.map(_.points.size).sum}")
    val (hwCount, hwReport) = hardware.HardwareReport.assembleReport(
      pings, hardware.Dimensions.deviceMapDf(spark,
        Seq(("0x10de", "0x1401", "Maxwell", "GM206"))))
    println(s"[jobs-demo] hardware_report_assembled    " +
      s"clients=$hwCount dimensions=${hwReport.size}")
    normalized.unpersist()

    // --- multimodal plumbing --------------------------------------------
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "fake-image-bytes".getBytes, "image/png", null),
        Row(2L, "fake-audio-bytes-longer".getBytes, "audio/wav", null)), 1),
      graft.multimodal.Multimodal.mediaSchema)
    val mm = graft.multimodal.Multimodal.decodeMeta(media)
    show("multimodal_decode", mm.count(), mm.columns.length)

    // --- corpus curation pipeline ---------------------------------------
    val corpus = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the old barn"),
      (2L, "the quick brown fox jumps over a lazy dog near the old shed"),
      (3L, "a completely different document about the weather and a storm"),
      (4L, "short")).toDF("doc_id", "text")
    val quality = graft.text.QualityRules.gopherQuality(
      corpus, "doc_id", "text", minWords = 6)
    show("gopher_quality", quality.filter($"keep" === 1).count(),
      quality.columns.length)
    val clusters = graft.dedup.Components.nearDupClusters(
      corpus, "doc_id", "text", bands = 8, threshold = 0.5)
    show("neardup_clusters", clusters.filter($"keep" === 1).count(),
      clusters.columns.length)
    val hits = graft.text.Bm25.topK(corpus, "doc_id", "text",
      Seq("fox", "weather"), k = 2)
    show("bm25_topk", hits.count(), hits.columns.length)
    val clean = graft.text.Contamination.decontaminate(
      corpus, "doc_id", "text", probe = Seq("about the weather"))
    show("decontaminate", clean.count(), clean.columns.length)

    // --- time-series / product analytics operators -----------------------
    val clicks = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), "signup", 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "view", 2.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), "purchase", 9.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-08 09:00:00"), "signup", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val filled = graft.operators.GapFill.carryForwardResample(
      clicks, "event_type", "ts", "value", unit = "hour")
    show("gapfill_resample", filled.count(), filled.columns.length)
    val smoothed = graft.operators.Ewma.latest(
      filled, "event_type", "bucket", "value_sum", alpha = 0.3)
    show("ewma_latest", smoothed.count(), smoothed.columns.length)
    val funnel = graft.operators.Funnel.report(clicks, "user_id",
      "event_type", "ts", Seq("signup", "view", "purchase"))
    show("funnel_report", funnel.count(), funnel.columns.length)
    val cohorts = graft.operators.Retention.cohorts(
      clicks, "user_id", "ts", periodDays = 7)
    show("retention_cohorts", cohorts.count(), cohorts.columns.length)
    val splits = graft.core.Splits.assign(corpus, "doc_id", salt = "demo")
    show("dataset_split", splits.count(), splits.columns.length)

    // --- wave-2 pipeline operators ---------------------------------------
    val packed = graft.text.Packing.concatChunk(
      corpus, "doc_id", "text", seqLen = 8, nShards = 2)
    show("seq_pack", packed.count(), packed.columns.length)
    val chunkDedup = graft.text.ChunkDedup.dedupChunks(
      corpus, "doc_id", "text", chunkTokens = 4)
    show("chunk_dedup", chunkDedup.count(), chunkDedup.columns.length)
    val langCorpus = corpus.withColumn("lang",
      when($"doc_id" <= 2, "en").otherwise("de"))
    val mixed = graft.core.Splits.temperatureSample(
      langCorpus, "doc_id", "lang")
    show("temperature_mix", mixed.count(), mixed.columns.length)
    val scrubbed = graft.text.Redact.scrub(
      Seq((1L, "reach me at me@example.com or 10.0.0.1")).toDF("id", "text"),
      "text")
    show("pii_redact", scrubbed.count(), scrubbed.columns.length)
    val corpusProfile = graft.text.CorpusStats.byStratum(
      langCorpus.withColumn("source", lit("demo")), "text", "lang", "source")
    show("corpus_stats", corpusProfile.count(), corpusProfile.columns.length)
    val rep = graft.text.QualityRules.dupNgramCoverage(
      corpus, "doc_id", "text", n = 2)
    show("dup_ngram_coverage", rep.count(), rep.columns.length)
    val trans = graft.operators.Transitions.matrix(
      clicks, "user_id", "event_type", "ts")
    show("markov_transitions", trans.count(), trans.columns.length)
    val pr = graft.graph.PageRank.ranks(
      Seq(("a", "b"), ("b", "a"), ("c", "a")).toDF("src", "dst"),
      "src", "dst", 2)
    show("pagerank", pr.count(), pr.columns.length)
    val hh = corpus
      .select(explode(graft.functions.TextFunctions.tokens($"text"))
        .as("tok"))
      .agg(graft.functions.TextFunctions.freqSketch($"tok", 5).as("top"))
    show("freq_sketch", hh.count(), hh.columns.length)

    // --- round-8 second wave ---------------------------------------------
    val kmv = corpus
      .agg(graft.functions.TextFunctions.kmvSample($"text", 8).as("s"))
      .select($"s.est_distinct")
    show("kmv_sample", kmv.count(), kmv.columns.length)
    val benchDocs = corpus.limit(1).select($"doc_id", $"text")
    val decon = graft.text.Contamination.ngramOverlapJoin(
      corpus, "doc_id", "text", benchDocs, "text", n = 2)
    show("contam_join", decon.count(), decon.columns.length)
    val card = graft.core.Profile.profile(corpus)
    show("dataset_profile", card.count(), card.columns.length)
    val zo = graft.core.Layout.zorderLayout(
      clicks.select($"user_id", $"value"), "user_id", "value",
      bits = 4, nBuckets = 4)
    show("zorder_layout", zo.count(), zo.columns.length)
    val bloomed = graft.dedup.NearDup.incrementalDedupBloom(
      corpus, "doc_id", "text",
      corpus.limit(2), "text", numBits = 1 << 10)
    show("bloom_ingest", bloomed.count(), bloomed.columns.length)
    val vecs = (0 until 12).map(i =>
      (i.toLong, (0 until 16).map(d =>
        (if (d % 3 == i % 3) 1.0f else 0.1f) + d * 0.01f))).toDF(
      "vec_id", "embedding")
    val projected = graft.similarity.Projection.projectedTopK(
      vecs, vecs.filter($"vec_id" < 3), "vec_id", "embedding",
      k = 3, inDim = 16, outDim = 4)
    show("ann_projected", projected.count(), projected.columns.length)
    val labeled = langCorpus.withColumn("source", lit("demo"))
    val nbPred = graft.text.NbClassifier.trainScore(
      labeled, "doc_id", "lang", "text", numBuckets = 64)
    show("nb_classifier", nbPred.count(), nbPred.columns.length)
    val aucRow = graft.operators.Auc.auc(
      nbPred.withColumn("hit", $"pred" === "en"),
      "score_lw", "hit")
    show("auc", aucRow.count(), aucRow.columns.length)
    val dimHist = Seq((1L, "bronze", "2020-01-01", null: String),
      (2L, "gold", "2020-01-01", null: String))
      .toDF("k", "tier", "valid_from", "valid_to")
    val dimUpd = Seq((2L, "silver"), (3L, "bronze")).toDF("k", "tier")
    val dim = graft.operators.Scd.merge2(
      dimHist, dimUpd, Seq("k"), Seq("tier"), "2024-06-01")
    show("scd2_merge", dim.count(), dim.columns.length)
    val dimThen = graft.operators.Scd.asOf(dim, "2022-01-01")
    show("scd2_asof", dimThen.count(), dimThen.columns.length)
    val rho = graft.operators.RankCorr.spearman(
      clicks.withColumn("v2", $"value" * 2 + $"user_id"), "value", "v2")
    show("spearman", rho.count(), rho.columns.length)
    val feats = graft.text.FeatureSelect.chiSquareTopTerms(
      labeled, "lang", "text", k = 3)
    show("chi2_features", feats.count(), feats.columns.length)
    val ci = graft.operators.Bootstrap.poissonMeans(
      clicks.withColumn("vi", ($"value" * 1000).cast("long")),
      "user_id", "vi", nResamples = 8, salt = "demo")
    show("bootstrap", ci.count(), ci.columns.length)
    val nbModel = graft.text.NbClassifier.train(labeled, "lang", "text", 64)
    val compiled = graft.text.NbClassifier.compile(nbModel, 64)
    val served = graft.text.NbClassifier.scoreCompiled(
      labeled.select($"doc_id", $"text"), "doc_id", "text", compiled)
    show("nb_compiled", served.count(), served.columns.length)
    val ap = graft.operators.Auc.averagePrecision(
      nbPred.withColumn("hit", $"pred" === "en"), "score_lw", "hit")
    show("avg_precision", ap.count(), ap.columns.length)
    val rz = graft.operators.Anomaly.robustZ(
      clicks.select($"event_type", $"value"), Seq("event_type"), "value")
    show("robust_z", rz.count(), rz.columns.length)
    val ws = graft.core.Splits.weightedSample(
      labeled.withColumn("w", length($"text").cast("long")),
      "doc_id", "w", k = 2, salt = "demo", strataCols = Seq("lang"))
    show("weighted_sample", ws.count(), ws.columns.length)
    val drift = graft.text.Divergence.jsTokens(
      labeled.filter($"lang" === "en"), labeled.filter($"lang" =!= "en"),
      "text")
    show("js_divergence", drift.count(), drift.columns.length)
    val psiRow = graft.text.Divergence.psi(
      clicks.filter($"user_id" % 2 === 0)
        .withColumn("vi", ($"value" * 100).cast("long")),
      clicks.filter($"user_id" % 2 === 1)
        .withColumn("vi", ($"value" * 100).cast("long")), "vi", bins = 5)
    show("psi", psiRow.count(), psiRow.columns.length)

    spark.stop()
  }

  /** Inline fixture frames (mirrors the spec fixtures). */
  object fixtures {
    import MainSummaryFixture._

    def mainSummary(spark: SparkSession) = {
      val snippets = Seq(
        Map[String, Any]("document_id" -> "d1"),
        Map[String, Any]("document_id" -> "d2", "subsession_counter" -> 2L,
          "scalar_parent_browser_search_ad_clicks" ->
            Map("google" -> 2L)),
        Map[String, Any]("document_id" -> "d3", "client_id" -> "b",
          "search_counts" -> null))
      val rows = snippets.map { sn =>
        val merged = base ++ sn
        Row.fromSeq(schema.fields.toSeq.map(f =>
          merged.getOrElse(f.name, null)))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    }

    def syncSummary(spark: SparkSession) = {
      val problemType = StructType(Seq(StructField("name", StringType),
        StructField("count", LongType)))
      val validationType = StructType(Seq(
        StructField("version", LongType), StructField("checked", LongType),
        StructField("took", LongType),
        StructField("problems", ArrayType(problemType))))
      val engineType = StructType(Seq(
        StructField("name", StringType), StructField("status", StringType),
        StructField("failure_reason",
          StructType(Seq(StructField("name", StringType)))),
        StructField("validation", validationType)))
      val syncSchema = StructType(Seq(
        StructField("app_build_id", StringType),
        StructField("app_version", StringType),
        StructField("app_display_version", StringType),
        StructField("app_name", StringType),
        StructField("app_channel", StringType),
        StructField("uid", StringType),
        StructField("device_id", StringType),
        StructField("when", LongType),
        StructField("failure_reason",
          StructType(Seq(StructField("name", StringType)))),
        StructField("status",
          StructType(Seq(StructField("sync", StringType)))),
        StructField("engines", ArrayType(engineType)),
        StructField("submission_date_s3", StringType)))
      val rows = Seq(
        Row("b1", "54.0", "54.0", "Firefox", "release", "u1", "dev1",
          1483228800000L, null, Row("success"),
          Seq(Row("bookmarks", "ok", null,
            Row(1L, 100L, 5L, Seq(Row("missing", 2L))))), "20170101"))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), syncSchema)
    }

    def landfill(spark: SparkSession) = {
      val metaType = StructType(
        landfill_.MetaWhitelist.map(StructField(_, StringType)))
      val s = StructType(Seq(StructField("meta", metaType),
        StructField("content", StringType)))
      val rows = Seq(
        Row(Row.fromSeq(landfill_.MetaWhitelist.map {
          case "uri" => "/submit/telemetry/doc-1/main/Firefox/54.0/release/b1"
          case _ => null
        }), """{"ver": 4}"""),
        Row(Row.fromSeq(landfill_.MetaWhitelist.map {
          case "uri" => "/submit/eng-workflow/hgpush/1/doc-2"
          case _ => null
        }), """{"x": 1}"""))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s)
    }
    private val landfill_ = graft.jobs.landfill.Sampler

    def clientsDaily(spark: SparkSession) = {
      val s = StructType(Seq(
        StructField("client_id", StringType),
        StructField("submission_date_s3", StringType),
        StructField("channel", StringType),
        StructField("normalized_channel", StringType),
        StructField("app_name", StringType),
        StructField("locale", StringType),
        StructField("active_addons", ArrayType(addonType))))
      val rows = Seq(
        Row("c1", "20190101", "release", "release", "Firefox", "en-US",
          Seq(addon("a@x"), addon("b@x"))),
        Row("c2", "20190102", "release", "release", "Firefox", "de",
          Seq(addon("a@x"), addon("c@x"))))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s)
    }
  }
}
