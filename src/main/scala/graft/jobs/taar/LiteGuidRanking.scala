package graft.jobs.taar

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TAAR-lite GUID install ranking, ported from
  * mozetl/taar/taar_lite_guidranking.py:21-50.
  */
object LiteGuidRanking {

  /** taar_lite_guidranking.py:22-39 — verbatim SQL over clients_daily. */
  def extractTelemetry(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT
          addon_row.addon_id as addon_guid,
          count(*) as install_count
      FROM
          (SELECT
              explode(active_addons) as addon_row
          FROM
              clients_daily
          WHERE
              channel='release' AND
              app_name='Firefox' and
              size(active_addons) > 0
          )
          GROUP BY addon_row.addon_id
      """)

  /** taar_lite_guidranking.py:42-50: driver-side model dict. */
  def toModel(frame: DataFrame): Map[String, Long] =
    frame.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
}
