package graft.jobs.taar

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TAAR ensemble-weight trainer, ported from mozetl/taar/taar_ensemble.py:
  * mask one installed add-on per client, score the rest with each base
  * recommender, summarize match quality with CostLLR, and fit a weighted
  * logistic regression over the stacked per-recommender scores; its
  * coefficients are the ensemble weights.
  *
  * The three production recommenders are injected behind `Recommender`
  * (the reference's tests do exactly this — tests/test_taar_ensemble.py:60-93;
  * the real ones live in a separate service package there too).
  */
object Ensemble {

  val PredictorOrder: Seq[String] = Seq("collaborative", "similarity", "locale")

  /** A base recommender: client info → ranked (guid, weight) list. */
  trait Recommender extends Serializable {
    def recommend(clientInfo: Map[String, Any], limit: Int): Seq[(String, Double)]
  }

  /** taar_ensemble.py:52-77: latest valid clients_daily row per client. */
  def getDf(spark: SparkSession, dateFrom: String): DataFrame =
    spark.sql("SELECT * FROM clients_daily")
      .where("active_addons IS NOT null")
      .where("size(active_addons) > 2")
      .where("size(active_addons) < 100")
      .where("channel = 'release'")
      .where("app_name = 'Firefox'")
      .where(s"submission_date_s3 >= $dateFrom")
      .selectExpr(
        "client_id as client_id",
        "active_addons as active_addons",
        "city as geo_city",
        "subsession_hours_sum as subsession_length",
        "locale as locale",
        "os as os",
        "row_number() OVER (PARTITION BY client_id ORDER BY submission_date_s3 desc) as rn",
        "places_bookmarks_count_mean AS bookmark_count",
        "scalar_parent_browser_engagement_tab_open_event_count_sum AS tab_open_count",
        "scalar_parent_browser_engagement_total_uri_count_sum AS total_uri",
        "scalar_parent_browser_engagement_unique_domains_count_max AS unique_tlds")
      .where("rn = 1")
      .drop("rn")

  /** taar_ensemble.py:85-110 — the sort-by-install-day UDF replaced by
    * native array_sort over (install_day, addon_id) structs.
    */
  def getAddonsPerClient(usersDf: DataFrame,
      minimumAddonsCount: Int): DataFrame = {
    val valid = expr("""filter(active_addons, a ->
        NOT (a.is_system OR a.app_disabled OR a.type != 'extension'
             OR a.user_disabled OR a.foreign_install)
        AND a.install_day IS NOT NULL)""")
    val sortedIds = expr(
      s"""transform(
            array_sort(transform(${"__valid"},
              a -> struct(a.install_day as d, a.addon_id as id))),
            s -> s.id)""")
    usersDf.withColumn("__valid", valid)
      .select(col("client_id"), sortedIds.as("addon_ids"))
      .filter(size(col("addon_ids")) > minimumAddonsCount)
  }

  /** taar_ensemble.py:450-456. */
  def extract(spark: SparkSession, dateFrom: String,
      minInstalledAddons: Int): DataFrame = {
    val clients = getDf(spark, dateFrom)
    getAddonsPerClient(clients, minInstalledAddons)
      .join(clients, Seq("client_id"), "inner")
  }

  /** taar_ensemble.py:417-432: uniform random k-fold assignment. */
  def crossValidationSplit(dataset: DataFrame, kFolds: Int,
      seed: Option[Long] = None): Seq[DataFrame] = {
    val h = 1.0 / kFolds
    val df = dataset.select(col("*"),
      seed.map(s => rand(s)).getOrElse(rand()).as("rand"))
    (0 until kFolds).map { i =>
      df.filter(col("rand") >= i * h && col("rand") < (i + 1) * h).cache()
    }
  }

  /** CostLLR (taar_ensemble.py:363-414): log-likelihood-ratio cost of a
    * recommendation list against the masked truth.
    */
  final class CostLLR {
    private var _total = 0.0
    def total: Double = _total

    private def negLogSig(logOdds: Seq[Double]): Seq[Double] =
      logOdds.map(x => math.log(1 + math.exp(-x)))

    private def cllr(onTarget: Seq[Double], offTarget: Seq[Double]): Double = {
      val on = onTarget.map(math.log).filterNot(_.isNaN)
      val off = offTarget.map(math.log).filterNot(_.isNaN)
      def mean(xs: Seq[Double]) = xs.sum / xs.size
      val c1 = mean(negLogSig(on)) / math.log(2)
      val c2 = mean(negLogSig(off.map(-_))) / math.log(2)
      (c1 + c2) / 2
    }

    def evalcllr(recommendations: Seq[(String, Double)],
        unmasked: Seq[String]): Double = {
      val on = recommendations.collect {
        case (g, w) if unmasked.contains(g) => w }
      val off = recommendations.collect {
        case (g, w) if !unmasked.contains(g) => w }
      val tmp0 = try cllr(on, off) catch { case _: Exception => Double.NaN }
      val tmp = if (tmp0.isNaN) 0.0 else tmp0
      _total += tmp
      tmp
    }
  }

  case class StackedRow(label: Int, weight: Double,
      features: org.apache.spark.ml.linalg.Vector)

  /** taar_ensemble.py:235-266: mask the last installed add-on, score the
    * client with each recommender, emit the stacked cllr feature row.
    */
  def toStackedRow(recommenders: Seq[Recommender],
      clientInfo: Map[String, Any]): Option[StackedRow] =
    try {
      val installed = clientInfo("installed_addons")
        .asInstanceOf[Seq[String]]
      val expected = Seq(installed.last)
      val unmasked = clientInfo +
        ("installed_addons" -> installed.dropRight(1))
      val cLLR = new CostLLR
      val feats = recommenders
        .map(r => cLLR.evalcllr(r.recommend(unmasked, 4), expected))
      Some(StackedRow(if (cLLR.total > 0.0) 1 else 0, 1.0,
        Vectors.dense(feats.toArray)))
    } catch { case _: Exception => None }

  /** taar_ensemble.py:273-306: leave-one-fold-out stacking. */
  def buildStackedDatasets(spark: SparkSession, folds: Seq[DataFrame],
      recommenders: Seq[Recommender],
      rowToInfo: org.apache.spark.sql.Row => Map[String, Any]): Seq[DataFrame] = {
    import spark.implicits._
    folds.indices.map { i =>
      val trainSets = folds.indices.filter(_ != i).map(folds)
      trainSets.map(df =>
        df.rdd.flatMap(r => toStackedRow(recommenders, rowToInfo(r))))
        .reduce(_ union _).toDF()
    }
  }

  /** taar_ensemble.py:459-493: weighted LR over the stacked folds. */
  def computeRegression(spark: SparkSession, stacked: Seq[DataFrame],
      regParam: Double, elasticNetParam: Double): Map[String, Double] = {
    val df0 = stacked.reduce(_ union _)
    val blor = new LogisticRegression()
      .setMaxIter(50).setRegParam(regParam)
      .setWeightCol("weight").setElasticNetParam(elasticNetParam)
    val model = blor.fit(df0)
    PredictorOrder.zip(model.coefficients.toArray).toMap
  }
}
