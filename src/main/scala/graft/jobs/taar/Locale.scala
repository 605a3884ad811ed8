package graft.jobs.taar

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TAAR top-add-ons-per-locale with differential privacy, ported from
  * mozetl/taar/taar_locale.py.
  *
  * The window queries (W1 latest-day dedup, W3 per-client counts, W4
  * randomized subsampling rank) run in Spark; the Laplace-noise expansion
  * and top-N normalization are driver-side Scala over a few thousand
  * (locale × whitelist) cells, exactly as the reference keeps them in
  * pandas/numpy (taar_locale.py:176-237) — seeded here for test stability.
  */
object Locale {

  /** taar_locale.py:31. */
  val Epsilon = 0.4

  /** taar_locale.py:46-101: most-recent clients_daily row per client →
    * exploded, validity-filtered add-ons by locale.
    */
  def getClientAddons(spark: SparkSession, startDate: String,
      endDate: Option[String] = None): DataFrame = {
    val endDateFilter =
      endDate.map(d => s"AND submission_date_s3 <= '$d'").getOrElse("")
    spark.sql(s"""
      WITH sample AS (
          SELECT client_id, submission_date_s3, locale, active_addons
          FROM clients_daily
          WHERE app_name='Firefox'
            AND channel='release'
            AND submission_date_s3 >= '$startDate'
            $endDateFilter
            AND client_id IS NOT NULL
      ),
      sample_dedup AS (
          SELECT client_id, locale, explode(active_addons) AS addon_info
          FROM (
              SELECT *,
                  row_number() OVER (
                      PARTITION BY client_id
                      ORDER BY submission_date_s3 DESC
                  ) AS idx
              FROM sample
          )
          WHERE idx = 1
      )
      SELECT locale, client_id, addon_info.addon_id as addon
      FROM sample_dedup
      WHERE addon_info.blocklisted = FALSE
        AND addon_info.type = 'extension'
        AND addon_info.signed_state = 2
        AND addon_info.user_disabled = FALSE
        AND addon_info.app_disabled = FALSE
        AND addon_info.is_system = FALSE
        AND locale <> 'null'
        AND addon_info.addon_id IS NOT NULL
      """)
  }

  /** taar_locale.py:247-253: 1 add-on per client per observed locale. */
  def getAddonLimitsByLocale(clientAddons: DataFrame): Map[String, Int] =
    clientAddons.select("locale").distinct().collect()
      .map(_.getString(0) -> 1).toMap

  /** taar_locale.py:104-178: whitelist-restrict, then keep a random subset
    * of each client's add-ons up to the per-locale limit (the W3/W4
    * count-over + RAND()-ordered row_number pattern).
    */
  def limitClientAddons(spark: SparkSession, clientAddons: DataFrame,
      addonLimits: Map[String, Int], whitelist: Seq[String]): DataFrame = {
    import spark.implicits._
    val limitsDf = addonLimits.toSeq.toDF("locale", "client_max_addons")
    clientAddons.join(limitsDf, Seq("locale"), "inner")
      .where(col("addon").isin(whitelist.map(_.asInstanceOf[Any]): _*))
      .createOrReplaceTempView("client_addons")
    spark.sql("""
      WITH addons AS (
          SELECT *,
              COUNT(client_id) OVER (PARTITION BY client_id) AS num_client_addons
          FROM client_addons
      ),
      shuffle_ord AS (
          SELECT *,
              CASE WHEN num_client_addons > client_max_addons THEN RAND()
                   ELSE NULL END AS ord
          FROM addons
      )
      SELECT client_id, locale, addon
      FROM (
          SELECT *,
              row_number() OVER (PARTITION BY client_id ORDER BY ord) AS idx
          FROM shuffle_ord
      )
      WHERE idx <= client_max_addons
      """)
  }

  /** Seeded Laplace sample via inverse CDF: μ − b·sgn(u)·ln(1−2|u|). */
  private[taar] def laplace(rng: scala.util.Random, scale: Double): Double = {
    val u = rng.nextDouble() - 0.5
    -scale * math.signum(u) * math.log(1 - 2 * math.abs(u))
  }

  /** taar_locale.py:181-237: expand counts to the full locale × whitelist
    * grid and add Laplace noise of scale limit/ε. Driver-side on purpose
    * (grid is ~10³ cells; RNG control beats distributing this).
    */
  def computeNoisyCounts(localeAddonCounts: Seq[(String, String, Long)],
      addonLimits: Map[String, Int], whitelist: Seq[String],
      eps: Double = Epsilon, seed: Long = 42L,
      // injectable like the reference's monkeypatchable `rlaplace`
      // (tests/test_taar_locale.py mock_rlaplace returns the scale itself)
      noise: (scala.util.Random, Double) => Double = laplace)
      : Seq[(String, String, Double)] = {
    val rng = new scala.util.Random(seed)
    val observed = localeAddonCounts
      .map { case (l, a, c) => (l, a) -> c.toDouble }.toMap
    for {
      locale <- addonLimits.keys.toSeq.sorted
      scale = addonLimits(locale).toDouble / eps
      addon <- whitelist
    } yield (locale, addon,
      observed.getOrElse((locale, addon), 0.0) + noise(rng, scale))
  }

  /** taar_locale.py:292-317: per-locale min-shift normalization + top-N. */
  def topAddonsByLocale(noisyCounts: Seq[(String, String, Double)],
      numAddons: Int): Map[String, Seq[(String, Double)]] =
    noisyCounts.groupBy(_._1).map { case (locale, rows) =>
      val counts = rows.map(r => r._2 -> r._3)
      val minC = counts.map(_._2).min
      val shifted = counts.map { case (a, c) => a -> (c - minC) }
      val total = shifted.map(_._2).sum
      val rel =
        if (total == 0) shifted
        else shifted.map { case (a, c) => a -> c / total }
      locale -> rel.sortBy { case (a, c) => (-c, a) }.take(numAddons)
    }

  /** Full pipeline against a registered clients_daily view. */
  def generateDictionary(spark: SparkSession, whitelist: Seq[String],
      startDate: String, numAddons: Int,
      seed: Long = 42L): Map[String, Seq[(String, Double)]] = {
    val clientAddons = getClientAddons(spark, startDate)
    val limits = getAddonLimitsByLocale(clientAddons)
    val limited = limitClientAddons(spark, clientAddons, limits, whitelist)
    val counts = limited.groupBy("locale", "addon").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val noisy = computeNoisyCounts(counts, limits, whitelist, Epsilon, seed)
    topAddonsByLocale(noisy, numAddons)
  }
}
