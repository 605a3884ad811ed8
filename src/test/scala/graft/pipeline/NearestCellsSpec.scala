package graft.pipeline

import graft.SparkSpec
import graft.core.Graft
import graft.functions.expressions.{CentroidTable, NearestCells, NearestCellsTwoLevel}
import graft.similarity.{Ivf, IvfHier}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The compiled cell-rank expressions must be BITWISE equal to the HOF
  * formulations they replaced (r15) — every IVF gate oracle (d06, d07,
  * d10, d11, d29, d32, d34, q83) replays the HOF semantics in DuckDB,
  * so any divergence here is a gate break.
  */
class NearestCellsSpec extends SparkSpec {
  import spark.implicits._

  private case class Cent(cnorm: Double, cid: Int, cvec: Seq[Double])

  private val rng = new scala.util.Random(13)

  private def randVec(dim: Int): Array[Float] =
    Array.fill(dim)(rng.nextFloat() * 4.0f - 2.0f)

  private def randModel(nlist: Int, dim: Int): Ivf.Model =
    Ivf.Model((0 until nlist).map(i =>
      i -> Array.fill(dim)(rng.nextDouble() * 4.0 - 2.0)))

  /** The pre-r15 HOF rank: array_sort over transform of a typedLit
    * centroid table, sliced to n — kept here as the semantic pin.
    */
  private def hofTopCells(vec: Column, model: Ivf.Model, n: Int): Column = {
    val centLit = typedLit(model.centroids.sortBy(_._1).map { case (cid, v) =>
      Cent(v.foldLeft(0.0)((acc, x) => acc + x * x), cid, v.toSeq)
    })
    transform(
      slice(array_sort(transform(centLit, c =>
        struct(
          (c.getField("cnorm") - lit(2.0) *
            graft.similarity.Ann.dot(vec, c.getField("cvec"))).as("rel_dist"),
          c.getField("cid").as("cid")))), 1, n),
      x => x.getField("cid"))
  }

  private def compiledTopCells(vec: Column, model: Ivf.Model, n: Int): Column =
    Graft.column(NearestCells(Graft.expression(vec),
      CentroidTable(model.centroids), n))

  behavior of "NearestCells"

  it should "match the HOF rank bitwise on random float vectors" in {
    val model = randModel(nlist = 17, dim = 12)
    val df = (0 until 200).map(i => (i.toLong, randVec(12).toSeq))
      .toDF("id", "vec")
    for (n <- Seq(1, 3, 17, 25)) {
      val got = df.select($"id",
        compiledTopCells($"vec", model, n).as("cells"))
      val want = df.select($"id", hofTopCells($"vec", model, n).as("cells"))
      got.exceptAll(want).count() shouldBe 0
      want.exceptAll(got).count() shouldBe 0
      // n above nlist caps at nlist
      got.select(org.apache.spark.sql.functions.size($"cells")).as[Int].collect()
        .foreach(_ shouldBe math.min(n, 17))
    }
  }

  it should "break rel-dist ties on ascending cid" in {
    // two identical centroids -> identical rel_dist; cid must decide
    val v = Array(1.0, 2.0)
    val model = Ivf.Model(Seq(5 -> v, 2 -> v, 9 -> Array(50.0, 50.0)))
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "vec")
    val cells = df.select(compiledTopCells($"vec", model, 2).as("c"))
      .as[Seq[Int]].head()
    cells shouldBe Seq(2, 5)
  }

  it should "return null for a null vector and poison null elements" in {
    val model = randModel(3, 4)
    val df = Seq(
      (1L, Some(Seq[java.lang.Float](1.0f, 2.0f, 3.0f, 4.0f))),
      (2L, None),
      (3L, Some(Seq[java.lang.Float](1.0f, null, 3.0f, 4.0f))))
      .toDF("id", "vec")
    val out = df.select($"id", compiledTopCells($"vec", model, 1).as("c"))
      .orderBy("id").collect()
    out(0).isNullAt(1) shouldBe false
    out(1).isNullAt(1) shouldBe true
    out(2).isNullAt(1) shouldBe true
  }

  behavior of "Ivf.assign and Ivf.probes (compiled rank)"

  it should "assign identically to the HOF argmin on the embeddings shape" in {
    val df = (0 until 150).map(i => (i.toLong, randVec(16).toSeq))
      .toDF("vec_id", "embedding")
    val model = Ivf.sampleCentroids(df, "vec_id", "embedding", nlist = 11)
    val got = Ivf.assign(df, "vec_id", "embedding", model)
      .select($"id", $"cid")
    val want = df.select($"vec_id".as("id"),
      hofTopCells($"embedding", model, 1).getItem(0).as("cid"))
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
  }

  it should "probe identically to the pre-r15 window rank" in {
    val df = (0 until 80).map(i => (i.toLong, randVec(10).toSeq))
      .toDF("vec_id", "embedding")
    val model = randModel(nlist = 9, dim = 10)
    val got = Ivf.probes(df, "vec_id", "embedding", model, nprobe = 3)
      .select("qid", "cid")
    // the old formulation: broadcast centroid join + row_number window
    val cents = model.centroids.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "centroid")
    val relDist = graft.similarity.Ann.dot($"centroid", $"centroid") -
      lit(2.0) * graft.similarity.Ann.dot($"qvec", $"centroid")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy("rel_dist", "cid")
    val want = df.select($"vec_id".as("qid"), $"embedding".as("qvec"))
      .join(broadcast(cents))
      .select($"qid", $"cid", relDist.as("rel_dist"))
      .withColumn("prb", row_number().over(w))
      .filter($"prb" <= 3)
      .select("qid", "cid")
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
  }

  behavior of "NearestCellsTwoLevel"

  it should "equal the two composed flat stages on the hier model" in {
    val df = (0 until 120).map(i => (i.toLong, randVec(8).toSeq))
      .toDF("vec_id", "embedding")
    val flat = Ivf.sampleCentroids(df, "vec_id", "embedding", nlist = 12)
    val h = IvfHier.hierarchy(flat, nsuper = 4)
    for ((w, n) <- Seq((1, 1), (2, 3), (4, 12))) {
      val supers = CentroidTable(h.supers)
      val leafTables = h.supers.sortBy(_._1).map { case (sid, _) =>
        CentroidTable(h.leaves.centroids.filter { case (cid, _) =>
          h.leafSid(cid) == sid
        })
      }.toArray
      val fused = df.select($"vec_id".as("id"),
        Graft.column(NearestCellsTwoLevel(Graft.expression($"embedding"),
          supers, leafTables, w, n)).as("cells"))
      // reference: rank supers flat, gather those sids' leaves into one
      // restricted table per sid-set, rank flat — computed driver-side
      val rows = df.collect().map { r =>
        val id = r.getLong(0)
        val q = r.getSeq[Float](1).map(_.toDouble).toArray
        def rel(c: Array[Double]) = {
          var acc = 0.0; var i = 0
          while (i < c.length) { acc += q(i) * c(i); i += 1 }
          c.foldLeft(0.0)((a, x) => a + x * x) - 2.0 * acc
        }
        val sids = h.supers.map { case (sid, sv) => (rel(sv), sid) }
          .sorted.take(w).map(_._2).toSet
        val cells = h.leaves.centroids
          .filter { case (cid, _) => sids(h.leafSid(cid)) }
          .map { case (cid, cv) => (rel(cv), cid) }
          .sorted.take(n).map(_._2)
        (id, cells)
      }.toSeq
      val want = rows.toDF("id", "cells")
      fused.exceptAll(want).count() shouldBe 0
      want.exceptAll(fused).count() shouldBe 0
    }
  }

  it should "keep assignHier at wassign = nsuper bit-identical to flat assign" in {
    val df = (0 until 100).map(i => (i.toLong, randVec(8).toSeq))
      .toDF("vec_id", "embedding")
    val flat = Ivf.sampleCentroids(df, "vec_id", "embedding", nlist = 10)
    val h = IvfHier.hierarchy(flat, nsuper = 3)
    val hier = IvfHier.assignHier(df, "vec_id", "embedding", h, wassign = 3)
      .select("id", "cid")
    val plain = Ivf.assign(df, "vec_id", "embedding", flat)
      .select("id", "cid")
    hier.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(hier).count() shouldBe 0
  }
}
