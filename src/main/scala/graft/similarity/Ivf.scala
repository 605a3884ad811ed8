package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors: partition the
  * corpus into `nlist` Voronoi cells via k-means, then search only the
  * `nprobe` cells closest to each query.
  *
  * The complementary scale path to `Ann.lshTopK`: IVF adapts to the data
  * distribution (cells follow density; recall degrades gracefully with
  * nprobe), where hyperplane LSH is data-independent. At 100 TB the
  * corpus is stored PARTITIONED BY cell id, so a query with nprobe=8
  * touches 8/nlist of the data — partition pruning does the rest.
  *
  * All list assignment/scoring is double-precision column math (dot
  * products via Ann.dot); only centroid training uses MLlib KMeans.
  */
object Ivf {

  case class Model(centroids: Seq[(Int, Array[Double])])

  /** Train cell centroids with seeded k-means over the corpus vectors. */
  def train(corpus: DataFrame, vecCol: String, nlist: Int,
      seed: Long = 42L): Model = {
    val feat = corpus.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
    val model = km.fit(feat)
    Model(model.clusterCenters.zipWithIndex
      .map { case (v, i) => i -> v.toArray }.toSeq)
  }

  /** Broadcastable centroid frame: (cid, centroid array<double>). */
  private def centroidDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.centroids.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "centroid")
  }

  /** Assign each row to its nearest centroid: broadcast the (small)
    * centroid table, score every (row, centroid) pair map-side, keep the
    * argmin with max_by — no shuffle of the corpus, one partial-agg pass.
    */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val cents = centroidDf(df.sparkSession, model)
    val dist2 = {
      // squared L2: |v|² - 2·v·c + |c|² ; rank only needs v·c and |c|²
      Ann.dot(col("centroid"), col("centroid")) -
        lit(2.0) * Ann.dot(col("vec"), col("centroid"))
    }
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .join(broadcast(cents))
      .select(col("id"), col("vec"), col("cid"), dist2.as("rel_dist"))
      .groupBy("id", "vec")
      .agg(expr("min_by(cid, rel_dist)").as("cid"))
      .select(col("id"), col("cid"), col("vec"))
  }

  /** Approximate top-k: probe the `nprobe` nearest cells per query, exact
    * cosine rank within the probed cells.
    */
  def search(assignedCorpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: Model, k: Int, nprobe: Int): DataFrame = {
    val spark = assignedCorpus.sparkSession
    val cents = centroidDf(spark, model)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    // rank cells per query, keep nprobe
    val relDist = Ann.dot(col("centroid"), col("centroid")) -
      lit(2.0) * Ann.dot(col("qvec"), col("centroid"))
    val probeW = Window.partitionBy("qid").orderBy("rel_dist", "cid")
    val probes = q.join(broadcast(cents))
      .select(col("qid"), col("qvec"), col("cid"), relDist.as("rel_dist"))
      .withColumn("prb", row_number().over(probeW))
      .filter(col("prb") <= nprobe)
      .select("qid", "qvec", "cid")
    // search only the probed cells
    val scored = probes.join(assignedCorpus, Seq("cid"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        Ann.cosine(col("qvec"), col("vec")).as("cosine_sim"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine_sim"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine_sim")
  }

  /** Convenience end-to-end: train + assign + search. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int, nprobe: Int,
      seed: Long = 42L): DataFrame = {
    val model = train(corpus, vecCol, nlist, seed)
    val assigned = assign(corpus, idCol, vecCol, model)
    search(assigned, queries, idCol, vecCol, model, k, nprobe)
  }
}
