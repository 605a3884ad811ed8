package graft.jobs.addons

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** addon_aggregates: per-(client, channel, version, locale) add-on
  * indicator rollup, ported from mozetl/addon_aggregates/addon_aggregates.py.
  *
  * Scale note: the reference loops 100 sample_id sub-jobs with
  * repartition(1) each (addon_aggregates.py:196-202) to control output
  * file size; on a real cluster the same layout falls out of
  * `df.repartition(n, col("sample_id")).write.partitionBy("sample_id")` in
  * one pass — `aggregate` here is layout-agnostic, the writer decides.
  */
object AddonAggregates {

  val MsFields: Seq[String] = Seq("client_id", "normalized_channel",
    "app_version", "locale", "sample_id", "profile_creation_date")

  val AddonFields: Seq[String] = Seq("addons.addon_id",
    "addons.foreign_install", "addons.is_system", "addons.is_web_extension",
    "addons.install_day")

  /** addon_aggregates.py:66-77: explode active_addons, major app version. */
  def explodeAddons(ms: DataFrame): DataFrame =
    ms.select(MsFields.map(col) :+ explode(col("active_addons")).as("addons"): _*)
      .select((MsFields ++ AddonFields).map(col): _*)
      .withColumn("app_version", substring(col("app_version"), 1, 2))

  /** addon_aggregates.py:80-117: indicator columns. */
  def addAddonColumns(df: DataFrame): DataFrame =
    df.withColumn("is_self_install",
      when(col("addon_id").isNotNull &&
        !col("is_system") && !col("foreign_install") &&
        !col("addon_id").like("%mozilla%") &&
        !col("addon_id").like("%cliqz%") &&
        !col("addon_id").like("%@unified-urlbar%"), 1).otherwise(0))
      .withColumn("is_shield_addon",
        when(col("addon_id").like("%@shield.mozilla%"), 1).otherwise(0))
      .withColumn("is_foreign_install",
        when(col("foreign_install"), 1).otherwise(0))
      .withColumn("is_system", when(col("is_system"), 1).otherwise(0))
      .withColumn("is_web_extension",
        when(col("is_web_extension"), 1).otherwise(0))

  /** addon_aggregates.py:120-168: distinct + rollup with date-formatted
    * epoch-day conversions.
    */
  def aggregateAddons(df: DataFrame): DataFrame =
    df.distinct()
      .groupBy("client_id", "normalized_channel", "app_version", "locale")
      .agg(
        sum("is_self_install").as("n_self_installed_addons"),
        sum("is_shield_addon").as("n_shield_addons"),
        sum("is_foreign_install").as("n_foreign_installed_addons"),
        sum("is_system").as("n_system_addons"),
        sum("is_web_extension").as("n_web_extensions"),
        min(when(col("is_self_install") === 1,
          date_format(from_unixtime(col("install_day") * 60 * 60 * 24),
            "yyyyMMdd"))).as("first_addon_install_date"),
        date_format(from_unixtime(min("profile_creation_date") * 60 * 60 * 24),
          "yyyyMMdd").as("profile_creation_date"))

  /** Full per-day pipeline (addon_aggregates.py main). */
  def run(msDay: DataFrame): DataFrame =
    aggregateAddons(addAddonColumns(explodeAddons(msDay)))
}
