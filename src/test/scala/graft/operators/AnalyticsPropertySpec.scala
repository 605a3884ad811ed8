package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.expr
import org.scalacheck.Gen
import java.sql.Timestamp

/** Property tests for the analytics operators: seeded random event
  * streams checked against straightforward driver-side reference
  * implementations (the ComponentsSpec pattern — distributed formulation
  * vs an independent sequential one).
  */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private val stepNames = Seq("a", "b", "c")

  private val eventsGen: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(5, 60)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 6L)
      t <- Gen.oneOf(stepNames ++ Seq("x", "y"))
      ts <- Gen.choose(0L, 50L)
    } yield (u, t, ts))
  } yield evs

  private def toTs(m: Long): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:${m % 60}%02d:${m / 60}%02d")

  behavior of "Funnel.completion (random streams vs sequential reference)"

  it should "match a brute-force reference on random event sets" in {
    (0 until 6).foreach { seed =>
      val evs = sample(eventsGen, seed.toLong)
      val df = evs.map { case (u, t, m) => (u, t, toTs(m)) }
        .toDF("user_id", "event_type", "t")
      val got = Funnel.completion(df, "user_id", "event_type", "t", stepNames)
        .select("user_id", "steps_completed")
        .as[(Long, Long)].collect().toMap
      // reference: for each user, greedily chain earliest valid steps
      val expected = evs.groupBy(_._1).map { case (u, rows) =>
        var depth = 0
        var tPrev = Long.MinValue
        for (step <- stepNames) {
          if (depth == stepNames.indexOf(step)) {
            val cands = rows.filter(r => r._2 == step && r._3 >= tPrev)
            if (cands.nonEmpty) {
              tPrev = cands.map(_._3).min
              depth += 1
            }
          }
        }
        u -> depth.toLong
      }
      got shouldBe expected
    }
  }

  behavior of "Retention.cohorts (random streams vs sequential reference)"

  it should "match per-cohort offset counts on random activity" in {
    (0 until 6).foreach { seed =>
      val evs = sample(eventsGen, 100L + seed)
      val df = evs.map { case (u, _, m) =>
        (u, Timestamp.valueOf(f"2024-01-${(m % 28) + 1}%02d 12:00:00"))
      }.toDF("user_id", "t")
      val got = Retention.cohorts(df, "user_id", "t", periodDays = 7)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val periods = evs.map { case (u, _, m) =>
        // same epoch-day arithmetic as the operator
        val day = java.time.LocalDate.of(2024, 1, (m % 28).toInt + 1)
          .toEpochDay
        (u, day / 7)
      }.distinct
      val first = periods.groupBy(_._1).map { case (u, ps) =>
        u -> ps.map(_._2).min }
      val expected = periods
        .map { case (u, p) => (first(u), p - first(u)) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      got shouldBe expected
    }
  }

  behavior of "GapFill (random series vs sequential reference)"

  it should "carry values forward over every gap on random series" in {
    (0 until 4).foreach { seed =>
      val evs = sample(eventsGen, 200L + seed)
      val df = evs.map { case (u, _, m) =>
        (s"k$u", Timestamp.valueOf(f"2024-01-01 ${(m % 24)}%02d:30:00"),
          (m % 10) + 1.0)
      }.toDF("k", "t", "v")
      val got = GapFill.carryForwardResample(df, "k", "t", "v", "hour")
        .as[(String, Timestamp, Long, Double, Int)].collect()
      // reference: per key, hour buckets with running carry
      val byKey = evs.map { case (u, _, m) => (s"k$u", (m % 24).toInt,
        (m % 10) + 1.0) }
        .groupBy(_._1)
      val expected = byKey.flatMap { case (k, rows) =>
        val byHour = rows.groupBy(_._2)
          .map { case (h, rs) =>
            h -> (rs.size.toLong,
              rs.map(r => BigDecimal(r._3)).sum.toDouble)
          }
        val (lo, hi) = (byHour.keys.min, byHour.keys.max)
        var carry = 0.0
        (lo to hi).map { h =>
          byHour.get(h) match {
            case Some((n, s)) => carry = s; (k, h, n, s, 0)
            case None => (k, h, 0L, carry, 1)
          }
        }
      }.toSet
      got.map(r => (r._1, r._2.toLocalDateTime.getHour, r._3, r._4, r._5))
        .toSet shouldBe expected
    }
  }

  behavior of "Hypothesis.mannWhitney (random samples vs sequential reference)"

  it should "match a brute-force rank computation on random data" in {
    (0 until 6).foreach { seed =>
      val vals = sample(Gen.listOfN(40, for {
        g <- Gen.oneOf("a", "b")
        v <- Gen.choose(0, 8)
      } yield (g, v.toDouble)), 100L + seed)
      val df = vals.toDF("g", "x")
      if (vals.exists(_._1 == "a") && vals.exists(_._1 == "b")) {
        val r = Hypothesis.mannWhitney(df, "g", "x").collect().head
        // reference: U_a = #(a>b pairs) + 0.5 * ties, via brute pairs
        val as = vals.filter(_._1 == "a").map(_._2)
        val bs = vals.filter(_._1 == "b").map(_._2)
        val u2Ref = as.map(a => bs.map(b =>
          if (a > b) 2L else if (a == b) 1L else 0L).sum).sum
        r.getLong(4) shouldBe u2Ref
        r.getLong(2) shouldBe as.length.toLong
        r.getLong(3) shouldBe bs.length.toLong
      }
    }
  }

  behavior of "Divergence.wasserstein1 (random counts vs sequential CDF walk)"

  it should "match a driver-side CDF integration and be symmetric" in {
    (0 until 6).foreach { seed =>
      val va = sample(Gen.listOfN(30, Gen.choose(0L, 12L)), 200L + seed)
      val vb = sample(Gen.listOfN(20, Gen.choose(0L, 12L)), 300L + seed)
      val a = va.toDF("v"); val b = vb.toDF("v")
      val emd = graft.text.Divergence.wasserstein1(a, b, "v")
        .collect().head.getDouble(4)
      // reference: integrate |F_a - F_b| over the merged grid
      val grid = (va ++ vb).distinct.sorted
      val ref = grid.zip(grid.tail).map { case (v, nxt) =>
        val fa = va.count(_ <= v).toDouble / va.length
        val fb = vb.count(_ <= v).toDouble / vb.length
        math.abs(fa - fb) * (nxt - v)
      }.sum
      emd shouldBe ref +- 1e-9
      val sym = graft.text.Divergence.wasserstein1(b, a, "v")
        .collect().head.getDouble(4)
      sym shouldBe emd +- 1e-12
    }
  }

  behavior of "CdfTransform bins/caps invariants (random data)"

  it should "assign monotone bins and respect winsorize bounds" in {
    (0 until 4).foreach { seed =>
      val vals = sample(Gen.listOfN(50, Gen.choose(0, 30)), 400L + seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
      val df = vals.toDF("id", "v")
      val bins = CdfTransform.quantileBins(df, "v", 5)
        .select("v", "bin").collect()
        .map(r => r.getDouble(0) -> r.getLong(1))
      // monotone: a larger value never lands in a smaller bin
      bins.sortBy(_._1).map(_._2).sliding(2).foreach {
        case Array(x, y) => x should be <= y
        case _ =>
      }
      val capped = CdfTransform.winsorize(df, "v", 0.1, 0.9)
        .select("v", "v_capped").collect()
      val (lo, hi) = (capped.map(_.getDouble(1)).min,
        capped.map(_.getDouble(1)).max)
      capped.foreach { r =>
        r.getDouble(1) should (be >= lo and be <= hi)
      }
      // capping never reorders: v1 <= v2 => capped(v1) <= capped(v2)
      capped.sortBy(_.getDouble(0)).map(_.getDouble(1))
        .sliding(2).foreach {
          case Array(x, y) => x should be <= y
          case _ =>
        }
    }
  }
}
