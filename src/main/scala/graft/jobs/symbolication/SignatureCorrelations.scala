package graft.jobs.symbolication

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Top-crash-signature attribute correlations
  * (mozetl/symbolication/top_signatures_correlations.py:103-196, which
  * orchestrates crashcorrelations' find_deviations).
  *
  * Semantics: take the top-N crash signatures by report count, then for
  * each (signature, attribute=value) item compare the item's frequency
  * inside the signature's crashes against its frequency across ALL
  * crashes; items whose 2×2 contingency deviates (chi-square above the
  * p<0.05 critical value) are the signature's "correlations". Signatures
  * whose deviating items include an over-represented Addon attribute are
  * collected as addon-related (:151-170).
  *
  * Spark-first shape: one unpivot pass turns each crash row into
  * (signature, attr, value) items; two groupBy.counts (per-signature and
  * reference) meet in a single join on (attr, value). No per-signature
  * loop — the reference iterates signatures on the driver; here every
  * signature is scored in the same distributed pass.
  */
object SignatureCorrelations {

  /** Chi-square 2×2 critical value at p = 0.05. */
  val Chi2Critical: Double = 3.841

  /** Top `n` signatures by crash count (download_data.get_top analogue). */
  def topSignatures(crashes: DataFrame, n: Int): DataFrame =
    crashes.groupBy("signature").agg(count(lit(1)).as("total_group"))
      .orderBy(desc("total_group"), asc("signature"))
      .limit(n)

  /** (signature, attr, value) items — one row per crash × attribute.
    * Attributes are stringified so heterogeneous columns share a common
    * type; null attribute values drop (a crash without the attribute
    * contributes no item, matching the reference's set-of-items model).
    * Packed into one map column and exploded — the earlier
    * stringify-every-column-then-unpivot form carried an extra |attrs|-
    * wide projection through the fan-out; the map explode fans out the
    * same bytes with a single narrow projection (at 100× scale the fact
    * table is multiplied by |attrs| either way, but only once here).
    */
  def items(crashes: DataFrame, attrs: Seq[String]): DataFrame =
    crashes.select(col("signature"),
        explode(map(attrs.flatMap(a =>
          Seq(lit(a), col(a).cast("string"))): _*)).as(Seq("attr", "value")))
      .filter(col("value").isNotNull)

  /** Deviating items for the top-N signatures.
    *
    * Output per (signature, attr, value): count_group / total_group,
    * count_reference / total_reference, both proportions, and the
    * chi-square statistic of the group-vs-rest contingency table. Only
    * rows with chi2 > Chi2Critical and at least `minCountGroup` in-group
    * occurrences survive (crashcorrelations prunes the same way: a
    * significance test plus a support floor).
    */
  def deviations(crashes: DataFrame, attrs: Seq[String], topN: Int,
      minCountGroup: Long = 5): DataFrame = {
    val top = topSignatures(crashes, topN)
    val it = items(crashes, attrs)
    val refCounts = it.groupBy("attr", "value")
      .agg(count(lit(1)).as("count_reference"))
    val groupCounts = it
      .join(broadcast(top), Seq("signature"))
      .groupBy("signature", "total_group", "attr", "value")
      .agg(count(lit(1)).as("count_group"))
    val totalRef = crashes.agg(count(lit(1)).as("total_reference"))

    val joined = groupCounts
      .join(refCounts, Seq("attr", "value"))
      .crossJoin(broadcast(totalRef))
    // 2×2 contingency: group vs rest-of-reference, item vs no-item
    val a = col("count_group").cast("double")
    val b = (col("total_group") - col("count_group")).cast("double")
    val c = (col("count_reference") - col("count_group")).cast("double")
    val d = (col("total_reference") - col("total_group") -
      col("count_reference") + col("count_group")).cast("double")
    val n = col("total_reference").cast("double")
    // degenerate contingency tables (item present in every crash, or a
    // top signature spanning the whole corpus) zero the denominator:
    // under ANSI that division throws, without ANSI it yields null and
    // silently drops the maximally-correlated item — treat it as
    // maximally significant instead
    val denom = (a + b) * (c + d) * (a + c) * (b + d)
    val chi2 = when(denom =!= 0.0, n * pow(a * d - b * c, 2) / denom)
      .otherwise(lit(Double.PositiveInfinity))
    joined
      .withColumn("p_group", a / col("total_group"))
      .withColumn("p_reference",
        col("count_reference") / col("total_reference"))
      .withColumn("chi2", chi2)
      .filter(col("chi2") > Chi2Critical &&
        col("count_group") >= minCountGroup)
      .select("signature", "attr", "value", "count_group", "total_group",
        "count_reference", "total_reference", "p_group", "p_reference",
        "chi2")
  }

  /** Signatures with an over-represented Addon attribute among their
    * deviations (:151-170: `"Addon" in elem` and group proportion above
    * reference proportion).
    */
  def addonRelated(devs: DataFrame): DataFrame =
    devs.filter(col("attr").contains("Addon") &&
        col("p_group") > col("p_reference"))
      .groupBy("signature")
      .agg(sort_array(collect_list(struct(
        col("attr"), col("value"), col("count_group"), col("chi2"))))
        .as("addons"),
        first("total_group").as("total"))
      .orderBy("signature")

  /** K5-style JSON artifacts: one file per signature (the reference names
    * them sha1(signature).json.gz, :177-184) plus the addon-related
    * roll-up — written with the engine's JSON sink, partitioned by the
    * signature digest rather than collected on the driver.
    */
  def writeReports(devs: DataFrame, outDir: String): Unit =
    devs.withColumn("sig_digest", sha1(col("signature")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("sig_digest")
      .json(outDir)

  /** Driver-level run: deviations + addon roll-up, as the cli surface. */
  def run(crashes: DataFrame, attrs: Seq[String], topN: Int)
      : (DataFrame, DataFrame) = {
    val devs = deviations(crashes, attrs, topN)
    (devs, addonRelated(devs))
  }
}
