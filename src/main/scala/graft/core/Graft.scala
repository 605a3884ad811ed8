package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core session/table plumbing for the graft engine.
  *
  * Suppresses _SUCCESS markers like the reference
  * (mozetl/clientsdaily/rollup.py:192-193); pins UTC as an engine convention
  * (the reference never sets a timezone, which its own tests flag as a
  * hazard — tests/test_clientsdaily.py:62-118). Designed for a
  * multi-executor cluster: AQE on, shuffle partitions sized to the
  * parallelism at hand rather than the 200 default.
  */
object Graft {

  /** All driver-provided test tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Configure a builder with the engine's standard settings. Safe for both
    * local[*] testing and cluster deployment (nothing here is local-only).
    *
    * `spark.sql.extensions` supports a comma-separated list; a value set
    * via `--conf` / spark-defaults (visible as a system property) is
    * PRESERVED with GraftExtensions appended. A value set on the builder
    * itself before calling configure() cannot be read back (Builder has no
    * getter) — pass it via `extraExtensions` instead.
    */
  def configure(b: SparkSession.Builder, shufflePartitions: Int,
      extraExtensions: Seq[String] = Nil): SparkSession.Builder = {
    val extensions =
      (sys.props.get("spark.sql.extensions").toSeq.flatMap(_.split(','))
        .map(_.trim).filter(_.nonEmpty) ++
        extraExtensions :+ "graft.core.GraftExtensions").distinct.mkString(",")
    b.config("spark.sql.session.timeZone", "UTC")
      // engine extensions: native SQL functions + optimizer rules (the
      // RangeJoinRewrite rule is inert until its width conf is set) —
      // loading them here means every session, test or cluster, runs the
      // same injection path as --conf spark.sql.extensions=...
      .config("spark.sql.extensions", extensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // Parquet TIMESTAMP(NANOS) (e.g. pandas-written events.ts) is
      // otherwise unreadable by Spark; surface it as a long and let
      // readers normalize (GateQuery.table does timestamp_micros(ns div 1000)).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
  }

  /** Local session for tests / benches. */
  def localSession(cores: Int, appName: String = "graft"): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName(appName),
      shufflePartitions = cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Read one driver-provided table from an sf directory.
    *
    * Single-parquet per table here; on a real deployment these would be
    * date-partitioned directories — Catalyst partition pruning applies
    * either way (SURVEY.md §4: PruneFileSourcePartitions).
    */
  def table(spark: SparkSession, sfDir: String, name: String,
      mergeSchema: Boolean = false): DataFrame = {
    // mergeSchema mirrors the reference's evolving-schema reads
    // (mozetl/clientsdaily/rollup.py:23 et al.)
    val df = spark.read.option("mergeSchema", mergeSchema.toString)
      .parquet(s"$sfDir/$name.parquet")
    normalizeTable(df, name)
  }

  /** Timestamp columns of the driver test tables, normalized on read.
    * Keyed by table name so reads of caller-owned tables pass through
    * untouched; a listed column absent from a given file is skipped
    * (mergeSchema / projection reads).
    */
  private val timestampColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  /** Absorb parquet timestamp-encoding drift for the known test tables:
    * the testdata writer has already shipped both TIMESTAMP(NANOS)
    * (reads as long under nanosAsLong) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=0) (reads as TIMESTAMP_NTZ) for the same column
    * across rounds. A 100 TB lake holds mixed-vintage files, so the
    * reader normalizes from the LOADED schema (graft.queries.GateQuery
    * .normalizeTs) instead of assuming one writer vintage.
    */
  def normalizeTable(df: DataFrame, name: String): DataFrame =
    timestampColumns.getOrElse(name, Nil)
      .filter(df.columns.contains)
      .foldLeft(df) { (d, c) =>
        d.withColumn(c, graft.queries.GateQuery.normalizeTs(d, c))
      }

  /** Register every test table as a temp view (for spark.sql-style queries,
    * mirroring the reference's catalog-table access — SURVEY.md §2.1 S3).
    * Tables missing from a given sf dir are skipped.
    */
  /** Session-conf key recording which sfDir the temp views currently
    * point at — registerAll is idempotent DDL, so re-invocations for the
    * SAME directory skip the per-table existence probes and parquet
    * schema reads (10 footer-read jobs per call; a catalog registers a
    * table once, it does not re-infer schemas per query). A different
    * directory re-registers everything.
    */
  private val RegisteredDirKey = "graft.registerAll.dir"

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    if (spark.conf.getOption(RegisteredDirKey).contains(sfDir) &&
      tableNames.forall(spark.catalog.tableExists)) return
    tableNames.foreach { n =>
      // Hadoop FS existence probe, not java.io.File: sfDir may be an
      // hdfs:// or s3a:// URI on a cluster (java.io would silently skip
      // every table there)
      val p = new org.apache.hadoop.fs.Path(s"$sfDir/$n.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        table(spark, sfDir, n).createOrReplaceTempView(n)
    }
    spark.conf.set(RegisteredDirKey, sfDir)
  }

  /** Query signature used by the driver contract. */
  type Q = (SparkSession, String) => DataFrame

  /** Bridges for custom Catalyst expressions (Spark 4 hides the
    * Column(expr) constructor behind the classic converter).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)
}
