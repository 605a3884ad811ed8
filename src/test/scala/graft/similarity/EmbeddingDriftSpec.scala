package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Centroid drift: aligned/opposed/orthogonal centroids, quantization
  * of sums (not means), empty-side NULL, partition invariance.
  */
class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Boolean, Seq[Float])]) =
    EmbeddingDrift.centroidCosine(
        rows.toDF("label", "snap_a", "embedding"),
        "label", "snap_a", "embedding")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(6)) Double.NaN else r.getDouble(6))).toMap

  "centroidCosine" should "score identical centroids at 1" in {
    val v = Seq(1.0f, 2.0f, 3.0f)
    val m = run(Seq(("x", true, v), ("x", true, v), ("x", false, v)))
    m("x")._3 shouldBe 1.0 +- 1e-9
    m("x")._1 shouldBe 2L
    m("x")._2 shouldBe 1L
  }

  it should "score opposed centroids at -1 and orthogonal at 0" in {
    val m = run(Seq(
      ("opp", true, Seq(1f, 0f)), ("opp", false, Seq(-2f, 0f)),
      ("ort", true, Seq(1f, 0f)), ("ort", false, Seq(0f, 3f))))
    m("opp")._3 shouldBe -1.0 +- 1e-9
    m("ort")._3 shouldBe 0.0 +- 1e-9
  }

  it should "compare centroids of sums, robust to snapshot size" in {
    // snapshot A has 10 copies, B has 1 — same direction, cos = 1
    val rows = (1 to 10).map(_ => ("s", true, Seq(2f, 1f))) :+
      (("s", false, Seq(2f, 1f)))
    run(rows)("s")._3 shouldBe 1.0 +- 1e-9
  }

  it should "emit NULL when a side is empty or all zeros" in {
    val m = run(Seq(("e", true, Seq(1f, 2f)),
      ("z", true, Seq(1f, 0f)), ("z", false, Seq(0f, 0f))))
    m("e")._3.isNaN shouldBe true // no B side
    m("z")._3.isNaN shouldBe true // zero norm
  }

  it should "be invariant under repartitioning" in {
    val rows = (1 to 80).map(i => ("g", i % 2 == 0,
      Seq.tabulate(8)(d => (math.sin(i * 3.0 + d) * 2).toFloat)))
    val a = run(rows)
    val b = EmbeddingDrift.centroidCosine(
        rows.toDF("label", "snap_a", "embedding").repartition(7),
        "label", "snap_a", "embedding")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(6))).toMap
    a("g")._3 shouldBe b("g")._3
  }

  private def runPairs(rows: Seq[(String, Seq[Float])]) =
    EmbeddingDrift.centroidPairCosine(
        rows.toDF("label", "embedding"), "label", "embedding")
      .orderBy("group_a", "group_b").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))))

  "centroidPairCosine" should "emit one row per unordered pair with exact sums" in {
    // a: sum (3, 0) milli 3000,0 ; b: sum (0, 4) -> 0,4000 ; c: (1, 1)
    val got = runPairs(Seq(
      ("a", Seq(1f, 0f)), ("a", Seq(2f, 0f)),
      ("b", Seq(0f, 4f)), ("c", Seq(1f, 1f))))
    got.map(_._1) shouldBe Array(("a", "b"), ("a", "c"), ("b", "c"))
    val ab = got(0)._2
    ab._1 shouldBe 0L // orthogonal centroids
    ab._2 shouldBe 3000L * 3000L
    ab._3 shouldBe 4000L * 4000L
    ab._4 shouldBe 0.0
    val ac = got(1)._2
    ac._4 shouldBe (3000.0 * 1000.0) /
      (math.sqrt(9000000.0) * math.sqrt(2000000.0))
  }

  it should "emit NULL cosine for zero-norm groups" in {
    val got = runPairs(Seq(("a", Seq(0f, 0f)), ("b", Seq(1f, 0f))))
    got.head._2._4.isNaN shouldBe true
  }

  it should "be invariant under repartitioning" in {
    val rows = (1 to 90).map(i => (s"l${i % 4}",
      Seq.tabulate(6)(d => (math.cos(i * 2.0 + d)).toFloat)))
    val a = runPairs(rows)
    val b = EmbeddingDrift.centroidPairCosine(
        rows.toDF("label", "embedding").repartition(7),
        "label", "embedding")
      .orderBy("group_a", "group_b").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))))
    a shouldBe b
  }
}
