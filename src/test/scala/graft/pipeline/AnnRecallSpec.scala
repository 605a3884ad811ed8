package graft.pipeline

import graft.SparkSpec
import graft.similarity.{Ann, Ivf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@k for the approximate ANN paths against the exact baseline on
  * a 10× corpus with SKEWED clusters (cluster sizes 5…~200) — evidence
  * that the documented recall levers (`tables` OR-amplification for LSH,
  * `nprobe` for IVF; Ann.scala:80-83, Ivf.scala:96-98) deliver at scale
  * and degrade monotonically when turned down. Fixed seeds throughout.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16
  private val K = 10

  /** 900 vectors in 12 clusters with power-law-ish sizes: cluster j has
    * ~5·1.35^j members, so the largest holds ~200 vectors — the skew an
    * even-bucket analysis would miss.
    */
  private lazy val corpus: DataFrame = {
    val rng = new scala.util.Random(1234)
    val sizes = (0 until 12).map(j => math.max(5, (5 * math.pow(1.35, j)).toInt))
    var id = -1L
    val rows = sizes.zipWithIndex.flatMap { case (n, j) =>
      // cluster center: a random unit-ish direction, fixed per cluster
      val center = Array.fill(Dim)(rng.nextGaussian())
      (0 until n).map { _ =>
        id += 1
        (id, center.map(v => (v + rng.nextGaussian() * 0.15).toFloat).toSeq)
      }
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private lazy val queries: DataFrame = corpus.filter($"vec_id" % 90 === 0)

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact: Set[(Long, Long)] =
    topkSet(Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", K))

  private def recall(approx: Set[(Long, Long)]): Double =
    approx.intersect(exact).size.toDouble / exact.size

  it should "reach recall >= 0.9 with LSH OR-amplification at full tables" in {
    val lsh = topkSet(Ann.lshTopK(corpus, queries, "vec_id", "embedding",
      K, dim = Dim, planes = 6, tables = 8))
    recall(lsh) should be >= 0.9
  }

  it should "lose recall monotonically as LSH tables are removed" in {
    val many = recall(topkSet(Ann.lshTopK(corpus, queries, "vec_id",
      "embedding", K, dim = Dim, planes = 6, tables = 8)))
    val few = recall(topkSet(Ann.lshTopK(corpus, queries, "vec_id",
      "embedding", K, dim = Dim, planes = 6, tables = 1)))
    many should be >= few
    // a single table over 6 planes cannot cover every cluster boundary
    few should be < 1.0
  }

  it should "reach recall >= 0.9 with IVF at nprobe=4 over skewed cells" in {
    val model = Ivf.train(corpus, "embedding", nlist = 12, seed = 42L)
    val assigned = Ivf.assign(corpus, "vec_id", "embedding", model).cache()
    val r4 = recall(topkSet(Ivf.search(assigned, queries, "vec_id",
      "embedding", model, K, nprobe = 4)))
    r4 should be >= 0.9
    // nprobe is the recall lever: probing fewer cells can only lose pairs
    val r1 = recall(topkSet(Ivf.search(assigned, queries, "vec_id",
      "embedding", model, K, nprobe = 1)))
    r4 should be >= r1
    assigned.unpersist()
  }
}
