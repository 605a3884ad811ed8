package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // trades (left) and quotes (right) per symbol — the canonical as-of shape
  private def trades = Seq(
    ("A", 3L, 100.0), ("A", 8L, 101.0), ("A", 15L, 102.0),
    ("B", 1L, 50.0), ("B", 10L, 51.0)
  ).toDF("sym", "t", "price")

  private def quotes = Seq(
    ("A", 2L, 1L, 99.5), ("A", 8L, 2L, 100.5), ("A", 8L, 3L, 100.6),
    ("A", 12L, 4L, 101.5),
    ("B", 5L, 5L, 49.5)
  ).toDF("sym", "qt", "qid", "bid")

  it should "attach the latest quote at or before each trade" in {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"),
      leftTime = "t", rightTime = "qt", payload = Seq("qid", "bid"),
      rightOrder = Some("qid"))
    rowsOf(out, "sym", "t", "qid", "bid") shouldBe Set(
      Seq("A", 3L, 1L, 99.5),
      // equal-time quotes (qt=8): the largest qid wins, deterministically
      Seq("A", 8L, 3L, 100.6),
      Seq("A", 15L, 4L, 101.5),
      Seq("B", 1L, null, null), // no quote at or before t=1
      Seq("B", 10L, 5L, 49.5))
  }

  it should "attach the earliest quote at or after each trade (forward)" in {
    val out = AsofJoin.forward(trades, quotes, Seq("sym"),
      leftTime = "t", rightTime = "qt", payload = Seq("qid"),
      rightOrder = Some("qid"))
    rowsOf(out, "sym", "t", "qid") shouldBe Set(
      Seq("A", 3L, 2L), // qt=8 ties broken toward the smallest qid
      Seq("A", 8L, 2L),
      Seq("A", 15L, null),
      Seq("B", 1L, 5L),
      Seq("B", 10L, null))
  }

  it should "null out matches beyond the tolerance" in {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"),
      leftTime = "t", rightTime = "qt", payload = Seq("qid"),
      rightOrder = Some("qid"),
      tolerance = Some((lt, rt) => lt - rt <= 2L))
    rowsOf(out, "sym", "t", "qid") shouldBe Set(
      Seq("A", 3L, 1L),   // gap 1 <= 2
      Seq("A", 8L, 3L),   // gap 0
      Seq("A", 15L, null), // latest quote is 3 back — beyond tolerance
      Seq("B", 1L, null),
      Seq("B", 10L, null)) // gap 5
  }

  it should "match the per-row subquery semantics on random fixtures" in {
    for (seed <- Seq(11, 23, 47)) {
      val rng = new scala.util.Random(seed)
      val l = (0 until 300).map(i =>
        (s"k${rng.nextInt(5)}", rng.nextInt(1000).toLong, i.toLong))
        .toDF("k", "t", "lid")
      val r = (0 until 300).map(i =>
        (s"k${rng.nextInt(5)}", rng.nextInt(1000).toLong, i.toLong))
        .toDF("k", "rt", "rid")
      val out = AsofJoin.backward(l, r, Seq("k"),
        leftTime = "t", rightTime = "rt", payload = Seq("rid"),
        rightOrder = Some("rid"))
      // oracle: per-left-row max over the naive theta-join (times can tie —
      // the (rt, rid) struct ordering mirrors rightOrder's tie-break)
      val best = l.join(r, l("k") === r("k") && $"rt" <= $"t")
        .groupBy("lid")
        .agg(max_by($"rid", struct($"rt", $"rid")).as("rid"))
      val expected = l.join(best, Seq("lid"), "left")
      withClue(s"seed $seed: ") {
        rowsOf(out, "k", "t", "lid", "rid") shouldBe
          rowsOf(expected, "k", "t", "lid", "rid")
      }
    }
  }

  it should "join on composite keys" in {
    val l = Seq(("A", "x", 5L, 1L), ("A", "y", 5L, 2L), ("B", "x", 5L, 3L))
      .toDF("sym", "venue", "t", "lid")
    val r = Seq(("A", "x", 4L, 10L), ("A", "y", 3L, 11L), ("B", "y", 1L, 12L))
      .toDF("sym", "venue", "qt", "rid")
    val out = AsofJoin.backward(l, r, Seq("sym", "venue"),
      leftTime = "t", rightTime = "qt", payload = Seq("rid"),
      rightOrder = Some("rid"))
    rowsOf(out, "lid", "rid") shouldBe Set(
      Seq(1L, 10L), Seq(2L, 11L), Seq(3L, null)) // (B,x) has no quotes
  }

  it should "never match on NULL keys" in {
    // join semantics: NULL = NULL is not a match. Null-keyed right rows
    // must not pair with null-keyed left rows (the window partitioning
    // would otherwise group them like GROUP BY does); null-keyed left rows
    // survive with a null payload, as in a left outer join.
    val l = Seq((Some("A"), 5L, 1L), (None, 5L, 2L))
      .toDF("sym", "t", "lid")
    val r = Seq((Some("A"), 3L, 10L), (None, 4L, 11L))
      .toDF("sym", "qt", "rid")
    val out = AsofJoin.backward(l, r, Seq("sym"),
      leftTime = "t", rightTime = "qt", payload = Seq("rid"),
      rightOrder = Some("rid"))
    rowsOf(out, "lid", "rid") shouldBe Set(
      Seq(1L, 10L), Seq(2L, null))
  }

  it should "fail fast when inputs use reserved internal column names" in {
    val bad = trades.withColumn("__m", lit(1))
    an[IllegalArgumentException] should be thrownBy
      AsofJoin.backward(bad, quotes, Seq("sym"),
        leftTime = "t", rightTime = "qt", payload = Seq("qid"))
  }

  it should "plan one exchange and no join node" in {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"),
      leftTime = "t", rightTime = "qt", payload = Seq("qid", "bid"),
      rightOrder = Some("qid"))
    // the union+window formulation joins NOTHING: no BroadcastNestedLoop,
    // no SortMerge, no per-key fan-out — one hash exchange on the key
    graft.core.Bucketing.shuffleCount(out) shouldBe 1
    out.queryExecution.executedPlan.toString.contains("Join") shouldBe false
  }

  // ---- nearest mode ----

  it should "pick the closer side with ties toward backward" in {
    val out = AsofJoin.nearest(trades, quotes, Seq("sym"),
      leftTime = "t", rightTime = "qt", payload = Seq("qid", "bid"),
      rightOrder = Some("qid"))
    rowsOf(out, "sym", "t", "qid", "bid") shouldBe Set(
      Seq("A", 3L, 1L, 99.5), // back dt=1 beats forward dt=5
      Seq("A", 8L, 3L, 100.6), // dt=0 both sides: backward (max qid)
      Seq("A", 15L, 4L, 101.5), // only backward exists
      Seq("B", 1L, 5L, 49.5), // only forward exists
      Seq("B", 10L, 5L, 49.5))
  }

  it should "prefer backward on equal distance" in {
    val l = Seq(("k", 10L, 1L)).toDF("sym", "t", "lid")
    val r = Seq(("k", 7L, 1L, 1.0), ("k", 13L, 2L, 2.0))
      .toDF("sym", "qt", "rid", "v")
    val out = AsofJoin.nearest(l, r, Seq("sym"), "t", "qt",
      Seq("rid", "v"), rightOrder = Some("rid"))
    rowsOf(out, "lid", "rid") shouldBe Set(Seq(1L, 1L))
  }

  it should "null matches beyond the tolerance" in {
    val l = Seq(("k", 100L, 1L), ("k", 11L, 2L)).toDF("sym", "t", "lid")
    val r = Seq(("k", 10L, 1L, 1.0)).toDF("sym", "qt", "rid", "v")
    val out = AsofJoin.nearest(l, r, Seq("sym"), "t", "qt",
      Seq("rid"), rightOrder = Some("rid"),
      toleranceMicros = Some(5L))
    rowsOf(out, "lid", "rid") shouldBe Set(Seq(1L, null), Seq(2L, 1L))
  }

  it should "keep the nearest plan join-free with one exchange" in {
    val out = AsofJoin.nearest(trades, quotes, Seq("sym"),
      leftTime = "t", rightTime = "qt", payload = Seq("qid"),
      rightOrder = Some("qid"))
    graft.core.Bucketing.shuffleCount(out) shouldBe 1
    out.queryExecution.executedPlan.toString.contains("Join") shouldBe false
  }
}
