package graft.similarity

import graft.SparkSpec

/** Exact-integer k-means: cluster recovery, deterministic seeding and
  * ties, exact distances, empty-cluster carry, partition invariance.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private val twoBlobs = Seq(
    (1L, Seq(0.0f, 0.0f)),
    (2L, Seq(0.1f, 0.0f)),
    (3L, Seq(1.0f, 1.0f)),
    (4L, Seq(0.9f, 1.0f))
  ).toDF("vec_id", "embedding")

  "fitPredict" should "separate two blobs even from same-blob seeds" in {
    val m = Kmeans.fitPredict(twoBlobs, "vec_id", "embedding", k = 2,
        rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    m(1L) shouldBe m(2L)
    m(3L) shouldBe m(4L)
    m(1L) should not be m(3L)
  }

  it should "report the exact integer squared distance to the final centroid" in {
    // after 2 rounds the cluster-0 centroid is mean([0,0],[0.1,0]) =
    // [50000, 0] micro-units; vec 1 sits 50000^2 away
    val d = Kmeans.fitPredict(twoBlobs, "vec_id", "embedding", 2, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    d(1L) shouldBe 50000L * 50000L
  }

  it should "put everything in cluster 0 at k = 1" in {
    val out = Kmeans.fitPredict(twoBlobs, "vec_id", "embedding", 1, 1)
      .select("cluster").as[Long].collect()
    all(out) shouldBe 0L
  }

  it should "break equidistant assignments to the lowest centroid id" in {
    // seeds [0] and [2]; the point at [1] is equidistant -> cluster 0
    val df = Seq((1L, Seq(0.0f)), (2L, Seq(2.0f)), (3L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val m = Kmeans.fitPredict(df, "vec_id", "embedding", 2, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    m(3L) shouldBe 0L
  }

  it should "carry an empty cluster's centroid forward" in {
    // both points sit at the first seed; the second centroid keeps its
    // seed position and stays assignable
    val df = Seq((1L, Seq(0.0f)), (2L, Seq(0.0f))).toDF("vec_id", "embedding")
    val out = Kmeans.fitPredict(df, "vec_id", "embedding", 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (_, c, d) => (c, d) shouldBe ((0L, 0L)) }
  }

  it should "be invariant under repartitioning" in {
    val a = Kmeans.fitPredict(twoBlobs, "vec_id", "embedding", 2, 2)
      .orderBy("vec_id").collect().map(_.toSeq)
    val b = Kmeans.fitPredict(twoBlobs.repartition(7), "vec_id",
        "embedding", 2, 2)
      .orderBy("vec_id").collect().map(_.toSeq)
    a shouldBe b
  }

  it should "reject invalid parameters" in {
    an[IllegalArgumentException] should be thrownBy
      Kmeans.fitPredict(twoBlobs, "vec_id", "embedding", 0, 1)
    an[IllegalArgumentException] should be thrownBy
      Kmeans.fitPredict(twoBlobs, "vec_id", "embedding", 2, 0)
  }
}
