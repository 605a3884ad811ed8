package graft.jobs.symbolication

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Modules-with-missing-symbols report
  * (mozetl/symbolication/modules_with_missing_symbols.py:52-100,120-167).
  *
  * The reference reads BigQuery `socorro_crash_v2`, explodes each crash's
  * module list, dedups (uuid, module), counts crash reports per
  * (filename, version, debug_id, debug_file), keeps modules above a crash
  * threshold, then classifies each module for the weekly report (Firefox
  * module with/without debug id, OS module, other) and drops Firefox
  * modules older than the symbol server's 2-year retention.
  *
  * This port keeps every aggregation distributed (the reference's
  * rdd.map/reduceByKey chain at :70-84 becomes explode → dropDuplicates →
  * groupBy.count, all map-side-combinable); only the final small report
  * is collected. The BigQuery source is a parquet fixture per SURVEY S6;
  * the SES email sink (K7) is out of scope — the report DataFrame is the
  * product.
  *
  * Expected crash schema: uuid, product, modules:
  * array<struct<filename, version, debug_id, debug_file,
  * missing_symbols: boolean>>.
  */
object MissingSymbols {

  /** Crash-report counts per distinct module build — the reference's
    * filter + dedup + reduceByKey (:63-84). A crash counts once per
    * module even if the module appears twice in its list.
    */
  def moduleCounts(crashes: DataFrame, knownModules: Set[String]): DataFrame = {
    val known = knownModules.map(_.toLowerCase).toSeq
    crashes
      .filter(col("product") === "Firefox")
      .select(col("uuid"), explode(col("modules")).as("module"))
      .dropDuplicates("uuid", "module")
      .select(col("uuid"), col("module.*"))
      .filter(col("missing_symbols") &&
        !lower(col("filename")).isin(known: _*) &&
        !col("filename").contains("(deleted)"))
      .groupBy("filename", "version", "debug_id", "debug_file")
      .agg(count(lit(1)).as("n_crashes"))
  }

  /** Modules above the report threshold, most-crashing first
    * (`count > 70` at :92-99).
    */
  def topMissing(counts: DataFrame, minCrashes: Long = 70): DataFrame =
    counts.filter(col("n_crashes") > minCrashes)
      .orderBy(desc("n_crashes"), asc("filename"), asc("version"))

  /** True for Firefox modules whose major version fell out of the symbol
    * server's 2-year retention (is_old_firefox_module, :120-145).
    */
  def isOldFirefoxModule(firefoxModules: Set[String],
      oldMajorVersions: Seq[String]): Column = {
    val isFirefox =
      lower(col("filename")).isin(firefoxModules.map(_.toLowerCase).toSeq: _*)
    val isOld = oldMajorVersions
      .map(v => col("version").startsWith(v + "."))
      .foldLeft(lit(false))(_ || _)
    isFirefox && col("version").isNotNull && col("version") =!= "" && isOld
  }

  /** Report color classification (:185-199): Firefox module with debug id
    * → "firefox" (red), without → "firefox-no-debug-id" (orange), OS
    * module → "os" (blue), anything else → "other".
    */
  def classify(firefoxModules: Set[String],
      windowsModules: Set[String]): Column = {
    val lname = lower(col("filename"))
    when(lname.isin(firefoxModules.map(_.toLowerCase).toSeq: _*),
      when(col("debug_id").isNotNull && col("debug_id") =!= "", "firefox")
        .otherwise("firefox-no-debug-id"))
      .when(lname.isin(windowsModules.map(_.toLowerCase).toSeq: _*), "os")
      .otherwise("other")
  }

  /** End-to-end report frame: counts → threshold → old-version drop →
    * classification. Pure column expressions — the symbol-server probe is
    * deliberately NOT part of the plan (see `finalizeReport`).
    */
  def report(crashes: DataFrame, knownModules: Set[String],
      firefoxModules: Set[String], windowsModules: Set[String],
      oldMajorVersions: Seq[String], minCrashes: Long = 70): DataFrame =
    topMissing(moduleCounts(crashes, knownModules), minCrashes)
      .filter(!isOldFirefoxModule(firefoxModules, oldMajorVersions))
      .withColumn("category", classify(firefoxModules, windowsModules))
      .select("filename", "version", "debug_id", "debug_file", "n_crashes",
        "category")

  /** One finished report row; `symbolsNowAvailable` is the result of the
    * symbol-server probe.
    */
  case class ReportRow(filename: String, version: String, debugId: String,
      nCrashes: Long, category: String, symbolsNowAvailable: Boolean)

  /** Collect the (≤ ~100-row) report and evaluate the symbol-server
    * availability probe on the DRIVER — exactly where the reference runs
    * its HEAD requests (modules_with_missing_symbols.py:148-161). Keeping
    * the probe out of the distributed plan avoids a per-row network call
    * inside executors (and removes the engine's last UDF call site);
    * `symbolsNowAvailable(debugFile, debugId)` is injected so tests stay
    * hermetic.
    *
    * DELIBERATE DIVERGENCE: the reference defines
    * `are_symbols_available(debug_file, debug_id)` but CALLS it with the
    * arguments swapped (modules_with_missing_symbols.py:166 vs :147), so
    * its probe URL interpolates debug_id where the file belongs and the
    * HEAD always misses — every reference report row says unavailable.
    * This port passes (debug_file, debug_id) in the declared order; the
    * '(*)' flags can therefore differ from (be more truthful than) the
    * reference's output.
    */
  def finalizeReport(reportDf: DataFrame,
      symbolsNowAvailable: (String, String) => Boolean = (_, _) => false)
      : Seq[ReportRow] =
    reportDf.collect().toSeq.map { r =>
      ReportRow(
        filename = r.getAs[String]("filename"),
        version = r.getAs[String]("version"),
        debugId = r.getAs[String]("debug_id"),
        nCrashes = r.getAs[Long]("n_crashes"),
        category = r.getAs[String]("category"),
        symbolsNowAvailable = symbolsNowAvailable(
          r.getAs[String]("debug_file"), r.getAs[String]("debug_id")))
    }
}
