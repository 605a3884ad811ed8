package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.expr
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  private val steps = Seq("signup", "view", "purchase")

  private def events = Seq(
    // u1 completes all three in order
    (1L, "signup", ts(1, 9)), (1L, "view", ts(1, 10)),
    (1L, "purchase", ts(2, 9)),
    // u2: purchase BEFORE signup — must not count as step 3
    (2L, "purchase", ts(1, 8)), (2L, "signup", ts(1, 9)),
    (2L, "view", ts(1, 10)),
    // u3: signup only
    (3L, "signup", ts(1, 9)),
    // u4: no signup at all — depth 0 even with later steps present
    (4L, "view", ts(1, 9)), (4L, "purchase", ts(1, 10))
  ).toDF("user_id", "event_type", "t")

  it should "count ordered step depth, deepest step winning" in {
    val got = Funnel.completion(events, "user_id", "event_type", "t", steps)
      .select("user_id", "steps_completed")
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L)
  }

  it should "enforce the horizon from step one" in {
    val got = Funnel.completion(events, "user_id", "event_type", "t", steps,
      horizon = expr("interval 12 hours"))
      .select("user_id", "steps_completed")
      .as[(Long, Long)].collect().toMap
    got(1L) shouldBe 2L // purchase lands a day later, outside the horizon
    got(2L) shouldBe 2L
  }

  it should "report cumulative drop-off per level" in {
    val got = Funnel.report(events, "user_id", "event_type", "t", steps)
      .as[(Long, String, Long)].collect().toSeq
    got shouldBe Seq((1L, "signup", 3L), (2L, "view", 2L),
      (3L, "purchase", 1L))
  }

  it should "emit a zero row for a step nobody reached" in {
    val noPurchase = events.filter($"event_type" =!= "purchase")
    val got = Funnel.report(noPurchase, "user_id", "event_type", "t", steps)
      .as[(Long, String, Long)].collect().toSeq
    got shouldBe Seq((1L, "signup", 3L), (2L, "view", 2L),
      (3L, "purchase", 0L))
  }

  it should "plan one exchange for the whole chain" in {
    val df = Funnel.completion(events, "user_id", "event_type", "t", steps)
    df.collect()
    val exchanges = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.trim.startsWith("Exchange"))
    exchanges should be <= 2 // the entity hash partition (+AQE read)
  }
}
