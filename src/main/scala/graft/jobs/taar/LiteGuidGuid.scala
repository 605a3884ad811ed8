package graft.jobs.taar

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TAAR-lite GUID→GUID co-installation model, ported from
  * mozetl/taar/taar_lite_guidguid.py.
  *
  * Spark-first redesign: the reference drops to RDD lambdas for add-on
  * validity filtering (taar_lite_guidguid.py:49-70) and the `key_all`
  * pair expansion (123-130). Both are higher-order array functions here —
  * the whole pipeline stays in codegen until the pair-count shuffle, which
  * is the only unavoidable wide op. The manual broadcast-variable
  * semi-join (line 105) becomes an `array_contains` filter against a
  * whitelist column: a plan literal for small lists, a broadcast
  * single-row frame beyond LiteralWhitelistMax entries.
  */
object LiteGuidGuid {

  /** Above this size a literal whitelist array stops being free: the plan
    * (and every task binary) carries it. Larger lists ride in as a
    * broadcast single-row frame instead (see whitelisted()).
    */
  val LiteralWhitelistMax = 1000

  /** taar_lite_guidguid.py:29-46 validity predicate, as an array filter
    * over the active_addons struct array, intersected with the whitelist
    * column.
    */
  private def validAddonIds(wl: Column) = {
    val valid = expr("""filter(active_addons, a ->
        NOT (a.is_system OR a.app_disabled OR a.type != 'extension'
             OR a.user_disabled OR a.foreign_install)
        AND a.addon_id != 'pioneer-opt-in@mozilla.org')""")
    // fully qualified: this object's own `transform` would shadow the HOF
    filter(org.apache.spark.sql.functions.transform(
      valid, a => a.getField("addon_id")), id => array_contains(wl, id))
  }

  /** Attach the whitelist to `df` as a column named `__wl`: a plan literal
    * for small lists, a broadcast single-row cross join for large ones
    * (constant plan size, one tiny broadcast — the DataFrame analogue of
    * the reference's sc.broadcast set, taar_lite_guidguid.py:105).
    */
  private def withWhitelist(df: DataFrame, whitelist: Seq[String]): DataFrame =
    if (whitelist.length <= LiteralWhitelistMax)
      df.withColumn("__wl", array(whitelist.map(lit): _*))
    else {
      import df.sparkSession.implicits._
      df.crossJoin(broadcast(Seq(whitelist).toDF("__wl")))
    }

  /** taar_lite_guidguid.py:81-97: coarse release-channel sample. */
  def getInitialSample(spark: SparkSession): DataFrame =
    spark.table("clients_daily")
      .where("active_addons IS NOT null")
      .where("size(active_addons) > 1")
      .where("channel = 'release'")
      .where("normalized_channel = 'release'")
      .where("app_name = 'Firefox'")
      .selectExpr("client_id", "active_addons")

  /** taar_lite_guidguid.py:49-70: per-client whitelisted add-on id lists,
    * keeping clients with more than one valid add-on.
    */
  def getAddonsPerClient(whitelist: Seq[String], usersDf: DataFrame): DataFrame =
    withWhitelist(usersDf, whitelist)
      .select(col("client_id"), validAddonIds(col("__wl")).as("addon_ids"))
      .filter(size(col("addon_ids")) > 1)

  /** Training frame: one `installed_addons` array per client
    * (taar_lite_guidguid.py:100-120; the reference's join back to the
    * sample only re-attaches columns it immediately drops, so the join is
    * elided — same output schema).
    */
  def extractTelemetry(spark: SparkSession, whitelist: Seq[String]): DataFrame =
    getAddonsPerClient(whitelist, getInitialSample(spark))
      .selectExpr("addon_ids as installed_addons")

  /** taar_lite_guidguid.py:123-182: key_all pair expansion + pair counts +
    * per-key collapse. key_all excludes the key add-on BY POSITION
    * (`b is not i` — object identity), not by value: a client reporting
    * the same guid twice pairs each occurrence with the other, yielding a
    * self-co-installation count (tests/test_taar_lite_guidguid.py expects
    * guid-1×2 → (guid-1, guid-1, n=2)). posexplode + an indexed filter
    * reproduces that exactly; an `array_remove` would drop ALL equal
    * occurrences and silently lose those pairs.
    */
  def transform(longitudinalAddons: DataFrame): DataFrame =
    longitudinalAddons
      .select(col("installed_addons"),
        posexplode(col("installed_addons")).as(Seq("pos", "key_addon")))
      .select(col("key_addon"),
        explode(expr("filter(installed_addons, (b, j) -> j != pos)"))
          .as("coinstalled_addon"))
      .groupBy("key_addon", "coinstalled_addon").count()
      .groupBy("key_addon")
      .agg(collect_list(struct(col("coinstalled_addon").as("id"),
        col("count").as("n"))).as("coinstallation_counts"))

  /** taar_lite_guidguid.py:186-199: driver-side JSON model shape. */
  def toModel(result: DataFrame): Map[String, Map[String, Long]] =
    result.collect().map { row =>
      val key = row.getString(0)
      val counts = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      key -> counts
    }.toMap
}
