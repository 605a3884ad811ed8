package graft.jobs.taar

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AMO extended-addons-database marshalling
  * (mozetl/taar/taar_amodump.py:51-75, 91-99).
  *
  * The reference crawls the addons.mozilla.org REST API page by page and
  * coerces each record through its JSONSchema `meta` tables
  * (AMOAddonFile / AMOAddonVersion / AMOAddonInfo). The crawl itself is a
  * driver-side HTTP concern (SURVEY S7, out of scope); the engine-side
  * piece is the typed marshalling — reproduced here as an explicit Spark
  * schema over a JSON dump file (S4), so malformed records null out
  * field-by-field exactly like the reference's coercion.
  */
object AmoDump {

  /** AMOAddonFile.meta (taar_amodump.py:55-57). */
  val fileType: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("platform", StringType),
    StructField("status", StringType),
    StructField("is_webextension", BooleanType)))

  /** AMOAddonInfo.meta (taar_amodump.py:63-76) + the crawl-derived
    * `first_create_date` and `is_featured` fields the whitelist
    * classifier consumes (taar_amowhitelist.py:65-112).
    */
  val schema: StructType = StructType(Seq(
    StructField("guid", StringType),
    StructField("categories", MapType(StringType, ArrayType(StringType))),
    StructField("default_locale", StringType),
    StructField("description", MapType(StringType, StringType)),
    StructField("name", MapType(StringType, StringType)),
    StructField("current_version",
      StructType(Seq(StructField("files", ArrayType(fileType))))),
    StructField("ratings", MapType(StringType, DoubleType)),
    StructField("summary", MapType(StringType, StringType)),
    StructField("tags", ArrayType(StringType)),
    StructField("weekly_downloads", LongType),
    StructField("first_create_date", StringType),
    StructField("is_featured", BooleanType)))

  /** fetch_addons' final filter (taar_amodump.py:94-99): records without a
    * first_create_date are dropped from the database.
    */
  def parse(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)
      .filter(col("first_create_date").isNotNull)

  /** Bridge into the 3-stage whitelist classifier's record shape
    * (AmoWhitelist.AmoAddon): featured flag, has-files /
    * any-webextension-file from the version struct, average rating.
    * Driver-side by design — the dump is a few-MB side input (S8).
    */
  def toClassifierInput(dump: DataFrame): Seq[AmoWhitelist.AmoAddon] =
    dump.select(
      col("guid"),
      coalesce(col("is_featured"), lit(false)).as("is_featured"),
      (size(col("current_version.files")) > 0).as("has_files"),
      // the reference tests ONLY the first file's flag
      // (taar_amowhitelist.py:88 current_version_files[0]), not any-of —
      // an addon listing [legacy, webextension] is rejected there
      coalesce(col("current_version.files").getItem(0)
        .getField("is_webextension"), lit(false)).as("is_webext"),
      coalesce(element_at(col("ratings"), "average"), lit(0.0)).as("rating"),
      col("first_create_date"))
      .collect().toSeq.map { r =>
        AmoWhitelist.AmoAddon(
          guid = r.getString(0),
          isFeatured = r.getBoolean(1),
          currentVersionHasFiles = !r.isNullAt(2) && r.getBoolean(2),
          currentVersionIsWebextension = r.getBoolean(3),
          averageRating = r.getDouble(4),
          firstCreateDate = Option(r.getString(5))
            .flatMap(s => scala.util.Try(
              java.time.LocalDate.parse(s.take(10))).toOption))
      }

  /** extended_addons_database artifact: guid-keyed JSON, one object per
    * add-on (taar_amodump.py:91-99 + taar_utils.store_json_to_s3) —
    * written distributed as JSON lines keyed by guid rather than one
    * driver-side dict.
    */
  def writeDatabase(dump: DataFrame, path: String): Unit =
    dump.coalesce(1).write.mode("overwrite").json(path)
}
