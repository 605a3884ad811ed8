package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end composite scaling probe: the `curate → mix → pack` CLI
  * pipeline timed as ONE composition at base SF and at
  * `SPARK_GRAFT_SCALE_FACTOR`× — the measurement every per-gate probe
  * (ScaleProbe) structurally cannot give. Per-gate probes time operators
  * in isolation with a cleared cache between runs; a real 100 TB
  * training-data run chains stages THROUGH STORAGE (each stage reads the
  * previous stage's parquet), so cross-stage effects — the persist() in
  * curate, shuffle files accumulating across stages, the scan of a
  * just-written intermediate — only show up in a composed run.
  *
  * Stages mirror `cli.Main`'s pipeline verbatim (same operators, same
  * defaults, intermediates written to disk exactly as the CLI does):
  *   1. curate  — Gopher quality gate → probe decontamination (the t08
  *                fixture trigrams) → MinHash-LSH near-dup keep-one
  *                (`Components.nearDupClusters`) → curated parquet;
  *   2. mix     — temperature rebalance over `lang` (1 halving) +
  *                train/val/test split stamps → mixed parquet;
  *   3. pack    — deterministic shard-and-chunk into seqLen-2048
  *                training rows (`Packing.concatChunk`) → packed parquet.
  *
  * Recorded per stage AND per scale: wall seconds, completed stage
  * count, total shuffle-write MB, and the PEAK single-stage
  * shuffle-write MB (the number that bounds per-executor spill at
  * 1000 executors — a composition whose total is modest can still hide
  * one stage that shuffles the corpus). Corpus synthesis is ScaleProbe's
  * copy-disjoint documents scheme (per-copy token rename — shingle
  * spaces disjoint across copies, so near-dup candidate density stays
  * base-real instead of growing factor²).
  */
object PipelineProbe {

  private def loadAvg1m(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").head.toDouble
    catch { case scala.util.control.NonFatal(_) => -1.0 }

  private def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(1L << 24).selectExpr("sum(xxhash64(id) % 1024)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Per-stage shuffle-write accounting with a running peak. */
  private class StageShuffles extends org.apache.spark.scheduler.SparkListener {
    val stages = new java.util.concurrent.atomic.AtomicLong
    val writeBytes = new java.util.concurrent.atomic.AtomicLong
    val peakStageWrite = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        val w = m.shuffleWriteMetrics.bytesWritten
        writeBytes.addAndGet(w)
        peakStageWrite.accumulateAndGet(w, Math.max(_: Long, _: Long))
      }
      ()
    }
    def snapshot: (Long, Long, Long) =
      (stages.get, writeBytes.get, peakStageWrite.get)
  }

  final case class StageRecord(name: String, sec: Double, stages: Long,
      shuffleMb: Double, peakStageMb: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val workDir = sys.env.getOrElse("SPARK_GRAFT_PIPE_DIR",
      "/tmp/graft_pipe_probe")
    require(factor >= 2, s"factor must be >= 2: $factor")

    val spark = graft.core.Graft.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-pipeline-probe")
        .config("spark.ui.enabled", "false"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- synthesize the factor x documents corpus: ScaleProbe's
    // copy-disjoint token-rename scheme, REFINED for a quality-gated
    // pipeline — the plain every-token suffix ("c1") adds a digit and
    // erases stopwords, so Gopher's alpha-fraction and stop-hits rules
    // rejected every copy >= 0 wholesale and the downstream stages
    // measured base-sized survivors (the first 10x/32x runs of this
    // probe recorded exactly that: flat mix/pack shuffle at both
    // scales). The refined rename is ALPHABETIC (2 letters per copy)
    // and SKIPS the five Gopher stop markers, so quality features
    // (word count, alpha fraction, stop hits, bigram structure) are
    // copy-invariant while shingle spaces stay disjoint: every
    // non-stopword token carries the copy tag, so any 3-gram with one
    // non-stopword differs across copies, and within-copy similarity
    // structure is bijectively preserved. Survivor counts per stage
    // ride in the JSON so a reader can check scaled ~ factor x base.
    val marker = java.nio.file.Paths.get(s"$workDir/_graft_synth")
    val synthVersion = "v2:alphaTokenSuffixSkipStops"
    val stamp = s"$synthVersion|$sfDir|$factor"
    val reuse = sys.env.get("SPARK_GRAFT_SCALE_REUSE").contains("1") &&
      java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == stamp
    if (!reuse) java.nio.file.Files.deleteIfExists(marker)
    val baseDocs = spark.read.parquet(s"$sfDir/documents.parquet")
    if (!reuse) {
      (0 until factor).map { i =>
        if (i == 0) baseDocs
        else {
          val sfx = "" + ('a' + (i - 1) / 26).toChar +
            ('a' + (i - 1) % 26).toChar
          baseDocs
            .withColumn("doc_id",
              col("doc_id") + lit(i.toLong * 100000000L))
            .withColumn("text",
              regexp_replace(col("text"),
                "(?i)(?<!\\S)(?!(?:the|a|and|of|is)(?!\\S))(\\S+)",
                "$1" + sfx))
        }
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$workDir/documents.parquet")
      Option(marker.getParent)
        .foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(marker, stamp.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    }

    val listener = new StageShuffles
    spark.sparkContext.addSparkListener(listener)

    def timedStage(name: String)(job: () => Unit): StageRecord = {
      org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(
        spark.sparkContext)
      val (s0, w0, _) = listener.snapshot
      listener.peakStageWrite.set(0L)
      val t0 = System.nanoTime()
      job()
      val el = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(
        spark.sparkContext)
      val (s1, w1, peak) = listener.snapshot
      StageRecord(name, el, s1 - s0, (w1 - w0) / 1048576.0,
        peak / 1048576.0)
    }

    /** The composed pipeline over `docsPath`, intermediates under `out`.
      * Returns the per-stage records (total = their sum + nothing else:
      * each stage reads the previous stage's PARQUET, like the CLI).
      */
    def pipeline(docsPath: String, out: String): Seq[StageRecord] = {
      val curatedP = s"$out/curated.parquet"
      val mixedP = s"$out/mixed.parquet"
      val packedP = s"$out/packed.parquet"
      val cur = timedStage("curate") { () =>
        val docs = spark.read.parquet(docsPath)
        val quality = graft.text.QualityRules.gopherQuality(
            docs, "doc_id", "text", minWords = 40L)
          .filter(col("keep") === 1).select(col("doc_id"))
        val qualified = docs.join(quality, Seq("doc_id"))
        val decontaminated = graft.text.Contamination.decontaminate(
          qualified, "doc_id", "text",
          graft.queries.PipelineQueries.ContaminationProbe, n = 3)
        val survivors = decontaminated.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val keepers = graft.dedup.Components.nearDupClusters(
              survivors, "doc_id", "text", bands = 4, threshold = 0.8)
            .filter(col("keep") === 1).select(col("doc_id"))
          survivors.join(keepers, Seq("doc_id"))
            .write.mode("overwrite").parquet(curatedP)
        } finally { survivors.unpersist(); () }
      }
      val mix = timedStage("mix") { () =>
        val mixed = graft.core.Splits.temperatureSample(
          spark.read.parquet(curatedP), "doc_id", "lang",
          halvings = 1, salt = "probe")
        graft.core.Splits.assign(mixed, "doc_id", salt = "probe",
            valPermille = 10, testPermille = 10)
          .write.mode("overwrite").parquet(mixedP)
      }
      val pack = timedStage("pack") { () =>
        graft.text.Packing.concatChunk(
            spark.read.parquet(mixedP), "doc_id", "text",
            seqLen = 2048, nShards = 32, salt = "probe")
          .write.mode("overwrite").parquet(packedP)
      }
      Seq(cur, mix, pack)
    }

    val loadStart = loadAvg1m()
    calibrate(spark); calibrate(spark)
    val calStart = calibrate(spark)
    // warmup at base (codegen/JIT shared by both scales), then timed runs
    pipeline(s"$sfDir/documents.parquet", s"$workDir/warm")
    val baseRows = pipeline(s"$sfDir/documents.parquet", s"$workDir/base")
    val scaledRows = pipeline(s"$workDir/documents.parquet",
      s"$workDir/scaled")
    val calEnd = calibrate(spark)
    val loadEnd = loadAvg1m()

    // survivor counts per stage — OUTSIDE the timed windows; these make
    // the scaled-really-is-factor-x claim checkable from the artifact
    // (the v1 synthesis failure mode: quality rejected all copies >= 1
    // and the downstream stages silently measured base-sized frames)
    def counts(out: String): String =
      Seq("curated", "mixed", "packed").map { n =>
        s""""$n":${spark.read.parquet(s"$out/$n.parquet").count()}"""
      }.mkString("{", ",", "}")
    val baseCounts = counts(s"$workDir/base")
    val scaledCounts = counts(s"$workDir/scaled")

    def f3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    def stagesJson(rows: Seq[StageRecord], rowCounts: String): String =
      rows.map { r =>
        s""""${r.name}":{"sec":${f3(r.sec)},"stages":${r.stages},""" +
          s""""shuffle_mb":${f3(r.shuffleMb)},""" +
          s""""peak_stage_shuffle_mb":${f3(r.peakStageMb)}}"""
      }.mkString("{", ",",
        s""","rows":$rowCounts,"total_sec":${f3(rows.map(_.sec).sum)}}""")
    val ratio = scaledRows.map(_.sec).sum /
      math.max(baseRows.map(_.sec).sum, 1e-9)
    val json =
      s"""{"metric":"pipeline_probe","factor":$factor,"sf":"$sfDir",""" +
        s""""load":{"start":${f3(loadStart)},"end":${f3(loadEnd)}},""" +
        s""""calibration":{"start":${f3(calStart)},"end":${f3(calEnd)}},""" +
        s""""base":${stagesJson(baseRows, baseCounts)},""" +
        s""""scaled":${stagesJson(scaledRows, scaledCounts)},""" +
        s""""total_ratio":${f3(ratio)}}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "bench_local/r18_pipeline_probe.json")
    val p = java.nio.file.Paths.get(out)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
