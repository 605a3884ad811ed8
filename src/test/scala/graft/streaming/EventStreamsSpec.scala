package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  it should "aggregate tumbling windows over a stream with a watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val query = EventStreams
      .windowedEventCounts(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0),
        (ts(12), "view", 5.0))
      query.processAllAvailable()
      val rows = rowsOf(spark.table("win_counts"),
        "event_type", "cnt", "value_sum")
      rows shouldBe Set(Seq("click", 2L, 3.0), Seq("view", 1L, 5.0))
      // late-but-within-watermark event lands in its original window
      input.addData((ts(3), "click", 10.0))
      query.processAllAvailable()
      rowsOf(spark.table("win_counts"), "event_type", "cnt") should
        contain(Seq("click", 3L))
    } finally query.stop()
  }

  it should "close sessions after the idle gap" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val withWm = input.toDS()
      .withWatermark("ts", "1 minute")
      .as[EventStreams.Event]
    val query = EventStreams.sessionize(withWm, gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // two bursts separated by > gap → first session closes when the
      // second burst arrives
      input.addData(
        EventStreams.Event(1L, ts(0), "click", 1.0),
        EventStreams.Event(1L, ts(2), "view", 2.0))
      query.processAllAvailable()
      input.addData(EventStreams.Event(1L, ts(20), "click", 7.0))
      query.processAllAvailable()
      val sessions = spark.table("sessions").collect()
      sessions.length shouldBe 1
      val s = sessions.head
      s.getAs[Int]("n_events") shouldBe 2
      s.getAs[Double]("value_sum") shouldBe 3.0
      s.getAs[Timestamp]("start_ts") shouldBe ts(0)
      s.getAs[Timestamp]("end_ts") shouldBe ts(2)
    } finally query.stop()
  }

  it should "aggregate native session windows with batch/stream parity" in {
    // batch semantics: gap merge + micro-exact sums
    val batch = Seq(
      (1L, ts(0), "click", 1.5), (1L, ts(3), "view", 2.25),
      (1L, ts(20), "click", 4.0), (2L, ts(1), "view", 0.5))
      .toDF("user_id", "ts", "event_type", "value")
    val out = EventStreams.sessionWindowAggregate(batch, "5 minutes")
      .orderBy("user_id", "start_us").collect()
    out.length shouldBe 3
    out(0).getLong(3) shouldBe 2L // user 1 first session: 2 events
    out(0).getDouble(4) shouldBe 3.75 +- 1e-12
    // session end = last event + gap
    (out(0).getLong(2) - out(0).getLong(1)) shouldBe (3 + 5) * 60000000L

    // stream parity: same rows through a watermarked MemoryStream; the
    // late-burst session stays withheld (watermark never passes its end)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val stream = EventStreams.sessionWindowAggregate(
      input.toDS().toDF().withWatermark("ts", "1 minute"), "5 minutes")
    val q = stream.writeStream.format("memory")
      .queryName("native_sessions").outputMode("append").start()
    try {
      input.addData(
        EventStreams.Event(1L, ts(0), "click", 1.5),
        EventStreams.Event(1L, ts(3), "view", 2.25),
        EventStreams.Event(2L, ts(1), "view", 0.5))
      q.processAllAvailable()
      input.addData(EventStreams.Event(1L, ts(20), "click", 4.0))
      q.processAllAvailable()
      val emitted = spark.table("native_sessions")
        .orderBy("user_id", "start_us").collect()
      // watermark = ts(20) - 1min: both first-burst sessions emitted,
      // the ts(20) session (end ts(25)) withheld
      emitted.map(r => (r.getLong(0), r.getLong(3))).toSeq shouldBe
        Seq((1L, 2L), (2L, 1L))
      emitted(0).getDouble(4) shouldBe 3.75 +- 1e-12
    } finally q.stop()
  }

  it should "join purchases to clicks within the horizon, outer past the watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Long, String)]
    val clicks = MemoryStream[(Long, Timestamp, Long, String)]
    def frame(m: MemoryStream[(Long, Timestamp, Long, String)]) =
      m.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val query = EventStreams
      .intervalJoin(frame(purchases), frame(clicks),
        horizonSec = 600, lateness = "1 minute")
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      clicks.addData((100L, ts(1), 1L, "click"), (101L, ts(8), 1L, "click"),
        (102L, ts(5), 2L, "click"))
      purchases.addData((200L, ts(9), 1L, "purchase"),
        (201L, ts(30), 2L, "purchase"))
      query.processAllAvailable()
      // inner matches stream out immediately: both of user 1's clicks fall
      // in purchase 200's 10-minute horizon; user 2's click is 25 min
      // before purchase 201 — outside it
      rowsOf(spark.table("attributed").filter($"match_id".isNotNull),
        "event_id", "match_id") shouldBe
        Set(Seq(200L, 100L), Seq(200L, 101L))
      // the unmatched purchase emits its outer row only once the watermark
      // passes its horizon — advance event time far beyond it
      clicks.addData((103L, ts(55), 3L, "click"))
      purchases.addData((202L, ts(55), 3L, "purchase"))
      query.processAllAvailable()
      rowsOf(spark.table("attributed").filter($"match_id".isNull),
        "event_id", "match_id") shouldBe Set(Seq(201L, null))
    } finally query.stop()
  }

  it should "agree with the batch as-of join on a replayed fixture" in {
    // batch/stream twin for the as-of operator (the pattern sessionize
    // already uses): replay a random fixture through the streaming
    // intervalJoin + latestMatchPerEvent reduction, and through the batch
    // AsofJoin.backward with the same horizon as tolerance — identical
    // rows, including the left-outer (no match in horizon) events.
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(7)
    val clickFx = (0 until 60).map(i =>
      (100L + i, ts(rng.nextInt(40)), 1L + rng.nextInt(5), "click"))
    val purchFx = (0 until 30).map(i =>
      (200L + i, ts(rng.nextInt(40)), 1L + rng.nextInt(5), "purchase"))
    val horizon = 600L // seconds

    val purchases = MemoryStream[(Long, Timestamp, Long, String)]
    val clicks = MemoryStream[(Long, Timestamp, Long, String)]
    def frame(m: MemoryStream[(Long, Timestamp, Long, String)]) =
      m.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val query = EventStreams
      .intervalJoin(frame(purchases), frame(clicks),
        horizonSec = horizon, lateness = "1 minute")
      .writeStream.format("memory").queryName("asof_twin")
      .outputMode("append").start()
    try {
      clicks.addData(clickFx: _*)
      purchases.addData(purchFx: _*)
      query.processAllAvailable()
      // sentinels push the watermark past every fixture event's horizon so
      // all left-outer rows flush; excluded from the comparison below
      clicks.addData((999L, ts(59), 99L, "click"))
      purchases.addData((998L, ts(59), 99L, "purchase"))
      query.processAllAvailable()

      val streamed = EventStreams.latestMatchPerEvent(
        spark.table("asof_twin").filter($"event_id" < 900))

      val batchLeft = purchFx.toDF("event_id", "ts", "user_id", "event_type")
        .select("user_id", "event_id", "ts")
      val batchRight = clickFx.toDF("match_id", "match_ts", "user_id", "etype")
        .select("user_id", "match_id", "match_ts")
      val batch = graft.operators.AsofJoin.backward(batchLeft, batchRight,
        Seq("user_id"), leftTime = "ts", rightTime = "match_ts",
        payload = Seq("match_id", "match_ts"),
        rightOrder = Some("match_id"),
        tolerance = Some((lt, rt) =>
          unix_micros(lt) - unix_micros(rt) <= horizon * 1000000L))

      rowsOf(streamed, "user_id", "event_id", "match_id", "match_ts") shouldBe
        rowsOf(batch, "user_id", "event_id", "match_id", "match_ts")
    } finally query.stop()
  }

  it should "run map-only curation ops (decontamination) on a stream" in {
    // Contamination.ngramOverlap is a stateless map-only pass (probe set
    // is one literal), so it composes with Structured Streaming unchanged
    // — the streaming twin of the batch t08 gate.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val flagged = graft.text.Contamination.ngramOverlap(
      docs, "doc_id", "text", probe = Seq("leaked eval gram"))
    val query = flagged.writeStream.format("memory")
      .queryName("contamination").outputMode("append").start()
    try {
      input.addData(
        (1L, "clean text with plenty of ordinary words"),
        (2L, "contains the leaked eval gram right here"))
      query.processAllAvailable()
      rowsOf(spark.table("contamination"), "doc_id", "contaminated") shouldBe
        Set(Seq(1L, 0), Seq(2L, 1))
    } finally query.stop()
  }

  it should "advance the incremental funnel with batch parity" in {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "view", "purchase")
    val fixture = Seq(
      EventStreams.Event(1L, ts(1), "signup", 1.0),
      EventStreams.Event(1L, ts(2), "view", 1.0),
      EventStreams.Event(2L, ts(1), "purchase", 1.0), // before signup
      EventStreams.Event(2L, ts(3), "signup", 1.0),
      EventStreams.Event(1L, ts(9), "purchase", 1.0),
      EventStreams.Event(2L, ts(10), "view", 1.0),
      EventStreams.Event(3L, ts(4), "view", 1.0)) // never signs up
    val input = MemoryStream[EventStreams.Event]
    val query = EventStreams.incrementalFunnel(
      input.toDS().withWatermark("ts", "10 minutes")
        .as[EventStreams.Event], steps)
      .writeStream.format("memory").queryName("funnel_prog")
      .outputMode("append").start()
    try {
      // watermark-ordered delivery across two batches
      input.addData(fixture.take(4): _*)
      query.processAllAvailable()
      input.addData(fixture.drop(4): _*)
      query.processAllAvailable()
      val streamed = spark.table("funnel_prog")
        .groupBy("user_id").agg(max("step").as("depth"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      // batch twin on the same fixture
      val batch = graft.operators.Funnel.completion(
        fixture.toDF().withColumnRenamed("ts", "t"),
        "user_id", "event_type", "t", steps)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      streamed shouldBe batch.filter(_._2 > 0) // depth-0 users emit nothing
      batch(3L) shouldBe 0
    } finally query.stop()
  }

  it should "survive a funnel horizon already behind the watermark" in {
    // regression: a user event arriving after the watermark passed the
    // user's step-one deadline used to call setTimeoutTimestamp behind
    // the watermark, which throws and kills the query — the state must
    // expire instead
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val query = EventStreams.incrementalFunnel(
      input.toDS().withWatermark("ts", "1 minute")
        .as[EventStreams.Event],
      Seq("signup", "view"), horizonMs = 5 * 60 * 1000L)
      .writeStream.format("memory").queryName("funnel_horizon")
      .outputMode("append").start()
    try {
      input.addData(EventStreams.Event(1L, ts(0), "signup", 1.0))
      query.processAllAvailable()
      // push the watermark far past user 1's 5-minute deadline
      input.addData(EventStreams.Event(2L, ts(30), "signup", 1.0))
      query.processAllAvailable()
      // a late-ish event for user 1: must not crash, must not advance
      input.addData(EventStreams.Event(1L, ts(31), "view", 1.0))
      query.processAllAvailable()
      val got = spark.table("funnel_horizon")
        .groupBy("user_id").agg(max("step").as("d"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      got(1L) shouldBe 1 // view landed outside the horizon
    } finally query.stop()
  }

  it should "drop duplicate ids within the watermark horizon" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val query = EventStreams.dedupStream(events, "event_id", "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(1), "click"), (1L, ts(1), "click"),
        (2L, ts(2), "view"))
      query.processAllAvailable()
      spark.table("deduped").count() shouldBe 2
    } finally query.stop()
  }

  it should "match the batch transition matrix on a replayed stream" in {
    implicit val sqlCtx = spark.sqlContext
    val fixture = Seq(
      EventStreams.Event(1L, ts(1), "a", 0.0),
      EventStreams.Event(1L, ts(2), "b", 0.0),
      EventStreams.Event(2L, ts(3), "a", 0.0),
      // second micro-batch (monotone event time)
      EventStreams.Event(1L, ts(10), "a", 0.0),
      EventStreams.Event(2L, ts(11), "b", 0.0),
      EventStreams.Event(1L, ts(12), "c", 0.0))
    val input = MemoryStream[EventStreams.Event]
    val withWm = input.toDS().withWatermark("ts", "1 minute")
      .as[EventStreams.Event]
    val query = EventStreams.incrementalTransitions(withWm)
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      input.addData(fixture.take(3): _*)
      query.processAllAvailable()
      input.addData(fixture.drop(3): _*)
      query.processAllAvailable()
      val streamed = spark.table("transitions")
        .groupBy("from_state", "to_state").count()
        .as[(String, String, Long)].collect().toSet
      val batch = graft.operators.Transitions
        .matrix(fixture.toDF(), "user_id", "event_type", "ts")
        .select("from_state", "to_state", "n")
        .as[(String, String, Long)].collect().toSet
      streamed shouldBe batch
    } finally query.stop()
  }

  it should "sketch trending items per window on a stream" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "item")
    val query = EventStreams
      .trendingItems(events, "item", "10 minutes", "5 minutes", m = 4)
      .writeStream.format("memory").queryName("trending")
      .outputMode("complete").start()
    try {
      input.addData(
        (Seq.fill(5)((ts(1), "hot")) ++ Seq.fill(2)((ts(2), "warm")) ++
          Seq((ts(3), "cold1"), (ts(4), "cold2"), (ts(12), "next"))): _*)
      query.processAllAvailable()
      val wins = spark.table("trending").collect()
        .map(r => r.getAs[Timestamp](0) ->
          r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](1)
            .map(x => (x.getString(0), x.getLong(1))))
        .toMap
      wins.size shouldBe 2
      val first = wins(Timestamp.valueOf("2024-01-01 10:00:00"))
      first.head shouldBe (("hot", 5L))    // est exact below capacity
      first.map(_._1) should contain("warm")
    } finally query.stop()
  }

  it should "estimate windowed distincts with the KMV sketch, matching " +
      "the batch aggregate" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "item")
    val query = EventStreams
      .windowedDistincts(events, "item", "10 minutes", "5 minutes", k = 8)
      .writeStream.format("memory").queryName("distincts")
      .outputMode("complete").start()
    try {
      val firstWin = (1 to 20).map(i => (ts(i % 9), s"u${i % 12}"))
      input.addData(firstWin :+ ((ts(12), "late-user")): _*)
      query.processAllAvailable()
      val got = spark.table("distincts").collect()
        .map(r => r.getAs[Timestamp](0) ->
          ((r.getAs[scala.collection.Seq[String]](1).toSeq, r.getLong(2))))
        .toMap
      got.size shouldBe 2
      // batch parity: the same aggregate over the same rows
      val batch = firstWin.toDF("ts", "item")
        .agg(graft.functions.TextFunctions.kmvSample(col("item"), 8).as("s"))
        .select(col("s.sample"), col("s.est_distinct"))
        .collect().head
      got(Timestamp.valueOf("2024-01-01 10:00:00")) shouldBe
        ((batch.getAs[scala.collection.Seq[String]](0).toSeq,
          batch.getLong(1)))
      got(Timestamp.valueOf("2024-01-01 10:10:00")) shouldBe
        ((Seq("late-user"), 1L))
    } finally query.stop()
  }

  it should "expire idle transition state past the TTL" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val withWm = input.toDS().withWatermark("ts", "1 minute")
      .as[EventStreams.Event]
    val query = EventStreams
      .incrementalTransitions(withWm, ttlMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("transitions_ttl")
      .outputMode("append").start()
    try {
      input.addData(EventStreams.Event(1L, ts(0), "a", 0.0))
      query.processAllAvailable()
      // watermark sails past user 1's TTL deadline
      input.addData(EventStreams.Event(2L, ts(30), "a", 0.0))
      query.processAllAvailable()
      // user 1 returns: chain must restart, not bridge the idle gap
      input.addData(EventStreams.Event(1L, ts(31), "b", 0.0))
      query.processAllAvailable()
      spark.table("transitions_ttl").count() shouldBe 0L
    } finally query.stop()
  }

  it should "dedup a document stream against itself and the seen corpus" in {
    implicit val sqlCtx = spark.sqlContext
    val seen = Seq((100L, "seen text one"), (101L, "seen text two"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStreams
      .ingestDedup(docs, "ts", "text", "10 minutes", seen, "text")
      .writeStream.format("memory").queryName("ingest_dedup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(1), "fresh crawl page"),
        (2L, ts(2), "seen text one"), // dup of static corpus — dropped
        (3L, ts(3), "fresh crawl page")) // within-stream dup — dropped
      query.processAllAvailable()
      // a later micro-batch redelivers doc 1's content — still dropped
      input.addData((4L, ts(5), "fresh crawl page"),
        (5L, ts(6), "another new page"))
      query.processAllAvailable()
      rowsOf(spark.table("ingest_dedup"), "doc_id") shouldBe
        Set(Seq(1L), Seq(5L))
      // parity with the batch operators on the replayed fixture:
      // exactDedup keep-min ∘ incrementalDedup gives the same survivors
      // (arrival order here is id order, so first-arrival = min id)
      val replay = Seq((1L, "fresh crawl page"), (2L, "seen text one"),
        (3L, "fresh crawl page"), (4L, "fresh crawl page"),
        (5L, "another new page")).toDF("doc_id", "text")
      val batchNew = graft.dedup.NearDup.incrementalDedup(
        replay, "doc_id", "text", seen, "text")
      val batchKept = graft.dedup.NearDup.exactDedup(
        batchNew, "doc_id", "text")
      rowsOf(batchKept, "keep_id") shouldBe Set(Seq(1L), Seq(5L))
    } finally query.stop()
  }

  it should "stream-ingest vectors into a store identical to a one-shot write" in {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(5)
    val corpus = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rng.nextFloat()))
    }
    val corpusDf = corpus.toDF("vec_id", "embedding")
    val model = graft.similarity.Ivf.sampleCentroids(
      corpusDf, "vec_id", "embedding", nlist = 3)
    val streamed = java.nio.file.Files
      .createTempDirectory("vec_stream").toString + "/store"
    val oneShot = java.nio.file.Files
      .createTempDirectory("vec_oneshot").toString + "/store"
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.ingestVectorsIvfInt8(
      input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", model, streamed).start()
    try {
      // three arrival waves — the store must not care
      input.addData(corpus.take(20)); q.processAllAvailable()
      input.addData(corpus.slice(20, 45)); q.processAllAvailable()
      input.addData(corpus.drop(45)); q.processAllAvailable()
    } finally q.stop()
    graft.similarity.Quantize.writeIvfQuantized(
      graft.similarity.Ivf.assign(corpusDf, "vec_id", "embedding", model),
      oneShot)
    rowsOf(spark.read.parquet(streamed), "id", "cid", "amax") shouldBe
      rowsOf(spark.read.parquet(oneShot), "id", "cid", "amax")
    val a = graft.similarity.Quantize.searchIvfQuantized(streamed,
      corpusDf.filter($"vec_id" < 5), "vec_id", "embedding", model,
      k = 5, nprobe = 2)
    val b = graft.similarity.Quantize.searchIvfQuantized(oneShot,
      corpusDf.filter($"vec_id" < 5), "vec_id", "embedding", model,
      k = 5, nprobe = 2)
    rowsOf(a, "qid", "rank", "nid") shouldBe rowsOf(b, "qid", "rank", "nid")
  }

  it should "skip replayed micro-batch ids instead of double-appending" in {
    // foreachBatch is at-least-once: after a failure the engine
    // re-delivers the same batchId. The commit-marker discipline must
    // make the re-delivery a no-op, or the store grows duplicate ids.
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(11)
    val corpus = (0 until 30).map { i =>
      (i.toLong, Array.fill(8)(rng.nextFloat()))
    }
    val corpusDf = corpus.toDF("vec_id", "embedding")
    val model = graft.similarity.Ivf.sampleCentroids(
      corpusDf, "vec_id", "embedding", nlist = 3)
    val store = java.nio.file.Files
      .createTempDirectory("vec_replay").toString + "/store"
    val in1 = MemoryStream[(Long, Array[Float])]
    val q1 = EventStreams.ingestVectorsIvfInt8(
      in1.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", model, store).start()
    try { in1.addData(corpus.take(20)); q1.processAllAvailable() }
    finally q1.stop()
    spark.read.parquet(store).count() shouldBe 20
    // a restarted query re-delivers batchId 0 with the same rows — the
    // marker must short-circuit the append
    val in2 = MemoryStream[(Long, Array[Float])]
    val q2 = EventStreams.ingestVectorsIvfInt8(
      in2.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", model, store).start()
    try {
      in2.addData(corpus.take(20)); q2.processAllAvailable()
      spark.read.parquet(store).count() shouldBe 20 // not 40
      // a batchId with no marker still appends (batch 1 here)
      in2.addData(corpus.drop(20)); q2.processAllAvailable()
    } finally q2.stop()
    spark.read.parquet(store).count() shouldBe 30
    import org.apache.spark.sql.functions.col
    spark.read.parquet(store).groupBy(col("id")).count()
      .filter(col("count") > 1).count() shouldBe 0
  }
}
