package graft.pipeline

import graft.SparkSpec
import graft.core.Graft
import graft.functions.expressions.{AdcDot, CentroidTable, PqEncode, PqQueryTable}
import graft.similarity.{Ann, Pq}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The compiled PQ kernels must be BITWISE equal to the HOF
  * formulations they replaced (r15) — the d33/d34/d35 oracles replay
  * the HOF semantics in DuckDB, so any divergence is a gate break.
  */
class PqExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private case class PqCent(sqnorm: Double, r: Int, cvec: Seq[Double])

  private val rng = new scala.util.Random(17)

  private def randBooks(m: Int, ds: Int, ksub: Int)
      : Seq[Seq[(Int, Array[Double])]] =
    Seq.fill(m)((0 until ksub).map(r =>
      r -> Array.fill(ds)(rng.nextDouble() * 2 - 1)))

  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def bookLit(books: Seq[Seq[(Int, Array[Double])]]): Column =
    typedLit(books.map(_.sortBy(_._1).map { case (r, c) =>
      PqCent(dotD(c, c), r, c.toSeq)
    }))

  private def tables(books: Seq[Seq[(Int, Array[Double])]])
      : Array[CentroidTable] =
    books.map(b => CentroidTable(b.map { case (r, c) => r -> c })).toArray

  it should "encode bitwise-identically to the HOF argmin + csqn fold" in {
    val m = 4; val ds = 4; val ksub = 7
    val books = randBooks(m, ds, ksub)
    val df = (0 until 150).map(i =>
      (i.toLong, Seq.fill(m * ds)(rng.nextDouble() * 2 - 1)))
      .toDF("id", "vec")
    val compiled = df.select($"id", Graft.column(PqEncode(
        Graft.expression($"vec"), tables(books))).as("e"))
      .select($"id", $"e.code".as("code"), $"e.csqn".as("csqn"))
    // the pre-r15 HOF form, verbatim
    val sub = (j: Column) => slice($"vec", j * lit(ds) + lit(1), lit(ds))
    val best = transform(sequence(lit(0), lit(m - 1)), j =>
      array_min(transform(element_at(bookLit(books), j + lit(1)), c =>
        struct(
          (c.getField("sqnorm") - lit(2.0) *
            Ann.dot(sub(j), c.getField("cvec"))).as("rel_dist"),
          c.getField("r").as("r"),
          c.getField("sqnorm").as("sqnorm")))))
    val want = df.withColumn("__b", best)
      .select($"id",
        transform($"__b", b => b.getField("r")).as("code"),
        aggregate($"__b", lit(0.0),
          (acc, b) => acc + b.getField("sqnorm")).as("csqn"))
    compiled.exceptAll(want).count() shouldBe 0
    want.exceptAll(compiled).count() shouldBe 0
  }

  it should "build query tables and fold ADC dots bitwise-identically" in {
    val m = 3; val ds = 5; val ksub = 6
    val books = randBooks(m, ds, ksub)
    val df = (0 until 80).map(i =>
      (i.toLong, Seq.fill(m * ds)(rng.nextDouble() * 2 - 1),
        Seq.fill(m)(rng.nextInt(ksub))))
      .toDF("id", "qvec", "code")
    val sub = (j: Column) => slice($"qvec", j * lit(ds) + lit(1), lit(ds))
    val qtabHof = transform(sequence(lit(0), lit(m - 1)), j =>
      transform(element_at(bookLit(books), j + lit(1)), c =>
        Ann.dot(sub(j), c.getField("cvec"))))
    val qtabCompiled = Graft.column(PqQueryTable(
      Graft.expression($"qvec"), tables(books)))
    val gotTab = df.select($"id", qtabCompiled.as("qtab"))
    val wantTab = df.select($"id", qtabHof.as("qtab"))
    gotTab.exceptAll(wantTab).count() shouldBe 0
    wantTab.exceptAll(gotTab).count() shouldBe 0

    val foldHof = aggregate(zip_with(qtabHof, $"code",
      (t, c) => element_at(t, c + lit(1))), lit(0.0), (acc, x) => acc + x)
    val foldCompiled = Graft.column(AdcDot(
      Graft.expression(qtabCompiled), Graft.expression($"code")))
    val gotF = df.select($"id", foldCompiled.as("s"))
    val wantF = df.select($"id", foldHof.as("s"))
    gotF.exceptAll(wantF).count() shouldBe 0
    wantF.exceptAll(gotF).count() shouldBe 0
  }

  it should "pack sign bits and fold Hamming distances like the HOF forms" in {
    val bits = 48 // two words: 32 + 16
    val df = (0 until 120).map(i =>
      (i.toLong, Seq.fill(bits)(rng.nextDouble() * 2 - 1),
        Seq.fill(bits)(rng.nextDouble() * 2 - 1)))
      .toDF("id", "pa", "pb")
    def hofPack(pcol: Column): Column =
      transform(sequence(lit(0), lit(1)), w =>
        aggregate(slice(pcol, w * lit(32) + lit(1), lit(32)),
          lit(0L), (acc, p) =>
            acc * lit(2L) + when(p > lit(0.0), lit(1L)).otherwise(lit(0L))))
    def hofHam(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
        lit(0L), (acc, c) => acc + c.cast("long"))
    val packA = Graft.column(graft.functions.expressions.PackBits(
      Graft.expression($"pa"), bits))
    val packB = Graft.column(graft.functions.expressions.PackBits(
      Graft.expression($"pb"), bits))
    val got = df.select($"id", packA.as("ca"), packB.as("cb"))
      .select($"id", $"ca", $"cb",
        Graft.column(graft.functions.expressions.HammingWords(
          Graft.expression($"ca"), Graft.expression($"cb"))).as("hd"))
    val want = df.select($"id", hofPack($"pa").as("ca"),
        hofPack($"pb").as("cb"))
      .select($"id", $"ca", $"cb", hofHam($"ca", $"cb").as("hd"))
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
  }

  it should "quantize bitwise-identically to the HOF amax fold + transform" in {
    val df = ((0 until 120).map(i =>
      (i.toLong, Seq.fill(10)(rng.nextDouble() * 4 - 2))) ++
      Seq((900L, Seq.fill(10)(0.0)))) // zero vector -> all-zero, no divide
      .toDF("id", "v")
    val got = graft.similarity.Quantize.scalarQuantize(df, "id", "v")
    val amaxHof = aggregate($"v", lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val want = df.withColumn("amax", amaxHof)
      .select($"id",
        when($"amax" === 0.0, transform($"v", _ => lit(0.0)))
          .otherwise(transform($"v",
            x => floor(x * lit(127.0) / $"amax" + lit(0.5)).cast("double")))
          .as("qvec"),
        $"amax")
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
  }

  it should "keep Pq.topK equal to itself under float inputs and stay map-only on encode" in {
    val corpus = (0 until 60).map(i =>
      (i.toLong, Seq.fill(8)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val out = Pq.topK(corpus, corpus.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 3, m = 4, ksub = 8, shortlist = 60)
    // shortlist = corpus → exact == brute (the PqSpec property, re-run
    // through the compiled kernels)
    val brute = Ann.bruteForceTopK(corpus, corpus.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 3)
    val oset = out.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bset = brute.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    oset shouldBe bset
    val cb = Pq.sampleCodebooks(corpus, "vec_id", "embedding", 4, 8)
    graft.core.Bucketing.hasShuffle(
      Pq.encode(corpus, "vec_id", "embedding", cb)) shouldBe false
  }
}
