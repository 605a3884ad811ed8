package graft.jobs.taar

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.BisectingKMeans
import org.apache.spark.ml.feature.{HashingTF, IDF}
import org.apache.spark.mllib.stat.KernelDensity
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** TAAR similarity-based donor model, ported from
  * mozetl/taar/taar_similarity.py: cluster clients by add-on features
  * (HashingTF → IDF → BisectingKMeans), sample donors per cluster, and
  * estimate intra/inter-cluster similarity likelihood-ratio curves via KDE.
  *
  * Spark-first notes: the per-client add-on extraction is a higher-order
  * array expression (the reference round-trips through Python RDD lambdas,
  * taar_similarity.py:88-124); similarity scoring uses a typed Dataset of
  * feature rows instead of pickled Row pairs. MLlib stages are the same
  * classes by name (Scala is their native API).
  */
object Similarity {

  /** taar_similarity.py:30-37. */
  val CategoricalFeatures: Seq[String] = Seq("city", "locale", "os")
  val ContinuousFeatures: Seq[String] = Seq("subsession_hours_sum",
    "bookmark_count", "tab_open_count", "total_uri", "unique_tlds")

  /** taar_similarity.py:44-85: latest valid clients_daily row per client. */
  def getSamples(spark: SparkSession, dateFrom: String): DataFrame =
    spark.sql("SELECT * FROM clients_daily")
      .where("client_id IS NOT null")
      .where("active_addons IS NOT null")
      .where("size(active_addons) > 2")
      .where("size(active_addons) < 100")
      .where("channel = 'release'")
      .where("app_name = 'Firefox'")
      .where(s"submission_date_s3 >= $dateFrom")
      .selectExpr(
        "client_id as client_id",
        "active_addons as active_addons",
        "city as city",
        "cast(subsession_hours_sum as double)",
        "locale as locale",
        "os as os",
        "places_bookmarks_count_mean AS bookmark_count",
        "scalar_parent_browser_engagement_tab_open_event_count_sum AS tab_open_count",
        "scalar_parent_browser_engagement_total_uri_count_sum AS total_uri",
        "scalar_parent_browser_engagement_unique_domains_count_mean AS unique_tlds",
        "row_number() OVER (PARTITION BY client_id ORDER BY submission_date_s3 desc) as rn")
      .where("rn = 1")
      .drop("rn")

  /** taar_similarity.py:88-124 as a native array expression. */
  def getAddonsPerClient(usersDf: DataFrame, whitelist: Seq[String],
      minimumAddonsCount: Int): DataFrame = {
    val wl = array(whitelist.map(lit): _*)
    val valid = expr("""filter(active_addons, a ->
        NOT (a.is_system OR a.app_disabled OR a.type != 'extension'
             OR a.user_disabled OR a.foreign_install))""")
    val ids = filter(transform(valid, a => a.getField("addon_id")),
      id => array_contains(wl, id))
    usersDf.select(col("client_id"), ids.as("addon_ids"))
      .filter(size(col("addon_ids")) > minimumAddonsCount)
  }

  /** taar_similarity.py:127-143: the ML pipeline, same stages natively. */
  def computeClusters(addonsDf: DataFrame, numClusters: Int,
      randomSeed: Option[Long]): DataFrame = {
    val hashing = new HashingTF()
      .setInputCol("addon_ids").setOutputCol("hashed_features")
    val idf = new IDF()
      .setInputCol("hashed_features").setOutputCol("features").setMinDocFreq(1)
    val bkm = new BisectingKMeans().setK(numClusters)
    randomSeed.foreach(bkm.setSeed)
    val model = new Pipeline()
      .setStages(Array(hashing, idf, bkm)).fit(addonsDf)
    model.transform(addonsDf).select("client_id", "prediction")
  }

  /** taar_similarity.py:146-175: proportional per-cluster donor sampling. */
  def getDonorPools(clustersDf: DataFrame, numDonors: Int,
      randomSeed: Option[Long]): (Seq[Int], DataFrame) = {
    val histogram = clustersDf.groupBy("prediction").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = histogram.map(_._2).sum.toDouble
    val fractions = histogram.map { case (c, n) => c -> n / total }.toMap
    val donor = randomSeed match {
      case Some(s) => clustersDf.stat.sampleBy("prediction", fractions, s)
      case None => clustersDf.stat.sampleBy("prediction", fractions,
        scala.util.Random.nextLong())
    }
    val sampleSize = donor.count()
    val pool = donor.sample(withReplacement = false,
      numDonors.toDouble / sampleSize, randomSeed.getOrElse(0L))
    (histogram.map(_._1).toSeq, pool)
  }

  /** taar_similarity.py:178-207. */
  def getDonors(spark: SparkSession, numClusters: Int, numDonors: Int,
      addonWhitelist: Seq[String], dateFrom: String,
      randomSeed: Option[Long] = None): (Seq[Int], DataFrame) = {
    val users = getSamples(spark, dateFrom)
    val addons = getAddonsPerClient(users, addonWhitelist, 2).cache()
    val clusters = computeClusters(addons, numClusters, randomSeed)
    val (clusterIds, donors) = getDonorPools(clusters, numDonors, randomSeed)
    (clusterIds,
      users.join(donors, "client_id")
        .drop("active_addons")
        .join(addons, Seq("client_id"), "left")
        .drop("client_id")
        .withColumnRenamed("addon_ids", "active_addons"))
  }

  /** Feature tuple for driver/executor-side similarity math. */
  case class FeatureRow(categorical: Seq[String], continuous: Seq[Double],
      prediction: Int)

  def toFeatureRow(r: Row): FeatureRow = FeatureRow(
    CategoricalFeatures.map(f =>
      Option(r.getAs[Any](f)).map(_.toString).getOrElse("")),
    ContinuousFeatures.map(f => Option(r.getAs[Any](f)).map {
      case n: Number => n.doubleValue()
      case other => other.toString.toDouble
    }.getOrElse(0.0)),
    r.getAs[Int]("prediction"))

  /** scipy.spatial.distance.hamming: fraction of disagreeing positions. */
  def hammingDistance(a: Seq[String], b: Seq[String]): Double =
    a.zip(b).count { case (x, y) => x != y }.toDouble / a.length

  /** scipy.spatial.distance.canberra (0/0 terms contribute 0). */
  def canberraDistance(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) =>
      val d = math.abs(x) + math.abs(y)
      if (d == 0) 0.0 else math.abs(x - y) / d
    }.sum

  /** taar_similarity.py:216-246. */
  def similarityFunction(x: FeatureRow, y: FeatureRow): Double = {
    val jd = hammingDistance(x.categorical, y.categorical)
    val jc = canberraDistance(x.continuous, y.continuous)
    math.abs((jc + 0.001) * jd)
  }

  /** taar_similarity.py:249-255: positional pairing without a cartesian
    * product (zipWithIndex + index join).
    */
  def nonCartesianPairs[A: scala.reflect.ClassTag, B: scala.reflect.ClassTag](
      first: org.apache.spark.rdd.RDD[A],
      second: org.apache.spark.rdd.RDD[B]): org.apache.spark.rdd.RDD[(A, B)] =
    first.zipWithIndex().map(_.swap)
      .join(second.zipWithIndex().map(_.swap))
      .map(_._2)

  /** taar_similarity.py:260-342: intra/inter cluster similarity scores →
    * KDE-sampled likelihood-ratio curves.
    */
  def getLrCurves(spark: SparkSession, featuresDf: DataFrame,
      clusterIds: Seq[Int], kernelBandwidth: Double, numPdfPoints: Int,
      randomSeed: Option[Long] = None): Seq[(Double, (Double, Double))] = {
    val sc = spark.sparkContext
    val features = featuresDf.rdd.map(toFeatureRow)
    var same = sc.emptyRDD[Double]
    var different = sc.emptyRDD[Double]
    for (cluster <- clusterIds) {
      val current = features.filter(_.prediction == cluster)
      val others = features.filter(_.prediction != cluster)
      val Array(h1, h2) = current.randomSplit(Array(0.5, 0.5),
        randomSeed.getOrElse(scala.util.Random.nextLong()))
      same = same.union(
        nonCartesianPairs(h1, h2).map { case (a, b) => similarityFunction(a, b) })
      different = different.union(
        nonCartesianPairs(current, others)
          .map { case (a, b) => similarityFunction(a, b) })
    }
    val all = same.union(different)
    val (minS, maxS) = (all.min(), all.max())
    val step = math.abs(minS - maxS) / numPdfPoints
    val index = Iterator.iterate(minS)(_ + step)
      .takeWhile(_ < maxS).take(numPdfPoints).toArray
    def kde(sample: org.apache.spark.rdd.RDD[Double]) =
      new KernelDensity().setSample(sample)
        .setBandwidth(kernelBandwidth).estimate(index)
    val numerator = kde(same)
    val denominator = kde(different)
    index.toSeq.zip(numerator.zip(denominator).toSeq)
  }
}
