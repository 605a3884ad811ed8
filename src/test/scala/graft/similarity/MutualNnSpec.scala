package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mutual-NN filter: reciprocity requirement, hub suppression, pair
  * orientation, composed IVF path determinism.
  */
class MutualNnSpec extends SparkSpec {
  import spark.implicits._

  "pairs" should "keep only reciprocated top-1 matches, once, " +
      "oriented a < b" in {
    // a<->b mutual; c points at a but a does not point back
    val top1 = Seq((1L, 1, 2L), (2L, 1, 1L), (3L, 1, 1L))
      .toDF("qid", "rank", "nid")
    val got = MutualNn.pairs(top1).as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 2L))
  }

  it should "ignore rank > 1 rows" in {
    val topK = Seq((1L, 1, 2L), (1L, 2, 3L), (2L, 1, 1L), (3L, 1, 1L),
      (3L, 2, 2L)).toDF("qid", "rank", "nid")
    MutualNn.pairs(topK).count() shouldBe 1L
  }

  "ivfMutualTopOne" should "find planted twin pairs and suppress hubs" in {
    // two tight twin pairs far apart + one midpoint hub vector
    def vec(base: Double, jitter: Double): Seq[Float] =
      (0 until 8).map(i => (if (i == 0) base + jitter else base).toFloat)
    val rows = Seq(
      (1L, vec(10.0, 0.0)), (2L, vec(10.0, 0.1)),
      (3L, vec(-10.0, 0.0)), (4L, vec(-10.0, 0.1)))
    val df = rows.toDF("vec_id", "embedding")
    val got = MutualNn.ivfMutualTopOne(df, "vec_id", "embedding",
        nlist = 2, nprobe = 2)
      .as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 2L), (3L, 4L))
  }

  "hierMutualTopOne" should "find planted twin pairs through the two-level path" in {
    def vec(base: Double, jitter: Double): Seq[Float] =
      (0 until 8).map(i => (if (i == 0) base + jitter else base).toFloat)
    val rows = Seq(
      (1L, vec(10.0, 0.0)), (2L, vec(10.0, 0.1)),
      (3L, vec(-10.0, 0.0)), (4L, vec(-10.0, 0.1)))
    val df = rows.toDF("vec_id", "embedding")
    val got = MutualNn.hierMutualTopOne(df, "vec_id", "embedding",
        nlist = 2, nsuper = 2, nprobe = 2, wassign = 2, wprobe = 2)
      .as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 2L), (3L, 4L))
  }

  it should "match the flat path when the hierarchy is exhaustive" in {
    val rows = (1L to 40L).map(i =>
      (i, (0 until 8).map(d => math.sin(i * 7.0 + d).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    // wassign/wprobe = nsuper ranks every leaf — identical pruning to
    // flat IVF, same quantized kernel, so pairs agree exactly
    val flat = MutualNn.ivfMutualTopOne(df, "vec_id", "embedding",
      nlist = 4, nprobe = 2).as[(Long, Long)].collect().toSet
    val hier = MutualNn.hierMutualTopOne(df, "vec_id", "embedding",
      nlist = 4, nsuper = 2, nprobe = 2, wassign = 2, wprobe = 2)
      .as[(Long, Long)].collect().toSet
    hier shouldBe flat
  }

  it should "be invariant under repartitioning" in {
    val rows = (1L to 40L).map(i =>
      (i, (0 until 8).map(d => math.sin(i * 7.0 + d).toFloat)))
    val a = MutualNn.ivfMutualTopOne(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 4, 2).as[(Long, Long)].collect().toSet
    val b = MutualNn.ivfMutualTopOne(
      rows.toDF("vec_id", "embedding").repartition(7),
      "vec_id", "embedding", 4, 2).as[(Long, Long)].collect().toSet
    a shouldBe b
  }
}
