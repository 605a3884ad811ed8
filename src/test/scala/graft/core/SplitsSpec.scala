package graft.core

import graft.SparkSpec
import graft.core.{Splits => S}

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1L to 500L).toDF("id")

  it should "assign deterministically and stably under corpus growth" in {
    val full = S.assign(ids, "id", salt = "s").select("id", "split")
      .as[(Long, String)].collect().toMap
    val again = S.assign(ids, "id", salt = "s").select("id", "split")
      .as[(Long, String)].collect().toMap
    again shouldBe full
    // a document keeps its split when new data arrives
    val subset = S.assign((1L to 100L).toDF("id"), "id", salt = "s")
      .select("id", "split").as[(Long, String)].collect().toMap
    subset.foreach { case (id, sp) => full(id) shouldBe sp }
  }

  it should "produce disjoint covering splits near the target fractions" in {
    val n = ids.count()
    val tr = S.train(ids, "id").count()
    val va = S.validation(ids, "id").count()
    val te = S.test(ids, "id").count()
    tr + va + te shouldBe n
    va.toDouble / n should be < 0.05 // 10‰ target, loose bound
    te.toDouble / n should be < 0.05
  }

  it should "re-split independently under a different salt" in {
    // compare the full permille buckets, not the coarse 3-way label: with
    // ~10 expected val/test rows per salt, two salts can (and did, after
    // the domain-separation suffix shifted the hashes) coincide on the
    // 3-way map by chance while the underlying buckets are independent
    val a = S.assign(ids, "id", salt = "a").select("id", "split_bucket")
      .as[(Long, Long)].collect().toMap
    val b = S.assign(ids, "id", salt = "b").select("id", "split_bucket")
      .as[(Long, Long)].collect().toMap
    a should not be b
  }

  it should "domain-separate assign's hash from the sampling hash" in {
    // the natural call: sample, then split with the SAME salt. Without
    // domain separation every survivor of a damped stratum has
    // bucket < rate, so rate <= test+val permille would leave train EMPTY.
    val docs = (1L to 2000L).map(i => (i, "big")).toDF("id", "lang")
    val sampled = S.stratifiedSample(docs, "id", "lang",
      Map("big" -> 100), defaultPermille = 1000, salt = "s")
    val splits = S.assign(sampled, "id", salt = "s",
      valPermille = 50, testPermille = 50)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // survivors (~200) must be dominated by train, not val/test
    splits.getOrElse("train", 0L) should be > 0L
    splits.getOrElse("train", 0L).toDouble /
      splits.values.sum should be > 0.8
  }

  it should "consume per-stratum budgets in deterministic hash order" in {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L),
      (4L, "b", 100L), (5L, "b", 1L)).toDF("id", "lang", "wt")
    val kept = S.budgetSample(docs, "id", "lang", "wt",
      Map("a" -> 20L), defaultBudget = 50L, salt = "x")
    // stratum a: budget 20 keeps exactly the first two docs in hash
    // order; stratum b: PREFIX-cut semantics — the overweight doc's 100
    // stays in the running sum even though it is dropped, so whether b
    // keeps doc 5 depends only on the hash order; total kept weight ≤ 50
    // either way
    val a = kept.filter("lang = 'a'").count()
    a shouldBe 2L
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    val bw = kept.filter("lang = 'b'")
      .agg(coalesce(sum("wt"), lit(0L))).as[Long].collect().head
    bw should be <= 50L
    // deterministic: identical survivors on a re-run
    kept.select("id").as[Long].collect().toSet shouldBe
      S.budgetSample(docs, "id", "lang", "wt", Map("a" -> 20L), 50L, "x")
        .select("id").as[Long].collect().toSet
  }

  it should "sample strata at their own deterministic rates" in {
    val docs = (1L to 1000L).map(i =>
      (i, if (i % 2 == 0) "common" else "rare")).toDF("id", "lang")
    val kept = S.stratifiedSample(docs, "id", "lang",
      Map("common" -> 100), defaultPermille = 1000)
    val counts = kept.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    counts("rare") shouldBe 500L // default keeps everything
    counts("common").toDouble should be (50.0 +- 30.0) // ~10% of 500
    // deterministic: identical survivors on a re-run
    kept.select("id").as[Long].collect().toSet shouldBe
      S.stratifiedSample(docs, "id", "lang", Map("common" -> 100), 1000)
        .select("id").as[Long].collect().toSet
  }

  it should "reject invalid permille settings" in {
    an[IllegalArgumentException] should be thrownBy
      S.assign(ids, "id", valPermille = 600, testPermille = 600)
  }

  it should "flatten a skewed distribution with temperature sampling" in {
    val docs = ((1L to 900L).map(i => (i, "common")) ++
      (901L to 1000L).map(i => (i, "rare"))).toDF("id", "lang")
    val kept = S.temperatureSample(docs, "id", "lang")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    kept("rare") shouldBe 100L // rarest stratum kept whole
    // rate = floor(1000*sqrt(100/900)) = 333‰ → ~300 of 900
    kept("common").toDouble should be(300.0 +- 60.0)
    // halvings = 0 flattens exactly toward the min count
    val flat = S.temperatureSample(docs, "id", "lang", halvings = 0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    flat("common").toDouble should be(100.0 +- 40.0)
    // deterministic: identical survivors on a re-run
    S.temperatureSample(docs, "id", "lang").select("id")
      .as[Long].collect().toSet shouldBe
      S.temperatureSample(docs, "id", "lang").select("id")
        .as[Long].collect().toSet
  }

  it should "clamp extreme-skew rates to 1‰ instead of flooring to zero" in {
    // halvings=0, counts 2000 vs 1: raw rate floor(1000/2000) = 0 → clamp 1
    val docs = ((1L to 2000L).map(i => (i, "big")) :+ (9999L -> "tiny"))
      .toDF("id", "lang")
    val kept = S.temperatureSample(docs, "id", "lang", halvings = 0)
      .select("id").as[Long].collect().toSet
    // exactly the survivors a literal 1‰/1000‰ stratified sample keeps
    val expect = S.stratifiedSample(docs, "id", "lang",
        Map("big" -> 1), defaultPermille = 1000)
      .select("id").as[Long].collect().toSet
    kept shouldBe expect
    kept should contain(9999L)
  }
  behavior of "Splits.weightedSample"

  it should "sample deterministically under any partitioning" in {
    val df = (1L to 300L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val a = S.weightedSample(df, "id", "w", k = 20, salt = "ws")
      .select("id", "sample_rank").as[(Long, Int)].collect().toSet
    val b = S.weightedSample(df.repartition(9), "id", "w", k = 20,
      salt = "ws")
      .select("id", "sample_rank").as[(Long, Int)].collect().toSet
    a shouldBe b
    a.size shouldBe 20
  }

  it should "favor heavy rows across independent salts" in {
    // half the ids carry weight 10, half weight 1; over many salts the
    // heavy side should dominate the sample (E-S inclusion scales with w)
    val df = (1L to 200L).map(i =>
      (i, if (i <= 100) 10L else 1L)).toDF("id", "w")
    val heavyRate = (1 to 10).map { s =>
      S.weightedSample(df, "id", "w", k = 30, salt = s"ws$s")
        .filter($"id" <= 100).count()
    }.sum / 10.0
    heavyRate should be > 24.0 // ~30*10/11 expected, far above the 15 of uniform
  }

  it should "cap at k per stratum and exclude non-positive weights" in {
    val df = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 5L),
      (4L, "b", 5L), (5L, "b", 0L), (6L, "b", -1L)).toDF("id", "g", "w")
    val out = S.weightedSample(df, "id", "w", k = 2, salt = "s",
      strataCols = Seq("g"))
      .select("g", "id").as[(String, Long)].collect()
    out.count(_._1 == "a") shouldBe 2
    out.filter(_._1 == "b").map(_._2).toSet shouldBe Set(4L)
  }

  it should "rank by the replayable ln(u)/w key" in {
    val df = Seq((7L, 3L), (8L, 5L)).toDF("id", "w")
    val rows = S.weightedSample(df, "id", "w", k = 2, salt = "key")
      .orderBy("sample_rank")
      .select("id", "es_key").as[(Long, Double)].collect()
    rows.length shouldBe 2
    rows(0)._2 should be >= rows(1)._2
    // replicate the key on the driver: LCG-permuted hash -> micro-nat ln
    def key(id: Long, w: Long): Double = {
      val m = 1000000007L
      val h = graft.functions.expressions.PolyHash.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(id + "key"))
      val hp = (h * 1103515245L + 12345L) % m
      val lnu = math.floor(
        math.log((hp + 1).toDouble / (m + 1).toDouble) * 1e6 + 0.5).toLong
      lnu.toDouble / w.toDouble
    }
    rows.toMap.foreach { case (id, k0) =>
      k0 shouldBe key(id, if (id == 7L) 3L else 5L)
    }
  }
}
