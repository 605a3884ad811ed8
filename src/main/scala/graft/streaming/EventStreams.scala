package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine.
  *
  * The reference is pure batch; its closest streaming analogue is the
  * activity-day submission-lag window (mozetl/utils.py:16,131-160 — accept
  * up to 10 days of late data, then aggregate per day). Here that becomes
  * a first-class streaming pipeline: event-time watermark + tumbling
  * window aggregation, plus gap-based sessionization via
  * flatMapGroupsWithState (SURVEY §2.12 future-work made real). All
  * transforms take a (possibly streaming) DataFrame, so the same code
  * runs on `readStream` sources and on batch frames in tests.
  */
object EventStreams {

  /** Tumbling-window per-type counts with late-data tolerance — the
    * streaming form of the clients_daily activity window. `lateness`
    * mirrors ACTIVITY_SUBMISSION_LAG (10 days there; typically minutes
    * in a live stream).
    */
  def windowedEventCounts(events: DataFrame, windowLength: String,
      lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength).as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("value_sum"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("cnt"), col("value_sum"))

  /** Gap-based sessionization through Spark's NATIVE `session_window`
    * — the declarative twin of the flatMapGroupsWithState machine below
    * ([[sessionize]]): the built-in merges windows whose event times
    * fall within `gap` of the running session end, state is managed by
    * the streaming aggregation operator (no hand-rolled state class),
    * and the SAME expression works in batch (where it plans as a
    * sort-based session aggregation). Value sums ride per-row
    * micro-quantized longs — double accumulation inside a merging
    * window is order-dependent; exact longs are not.
    *
    * Works on batch or streaming input; streaming callers must set the
    * watermark BEFORE calling (sessions emit when the watermark passes
    * their end — the d21 withholding semantics).
    */
  def sessionWindowAggregate(events: DataFrame, gap: String): DataFrame =
    events
      .withColumn("vmicro",
        floor(col("value").cast("double") * lit(1000000.0) + lit(0.5))
          .cast("long"))
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum("vmicro").as("vsum_micro"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"),
        (col("vsum_micro").cast("double") / lit(1000000.0))
          .as("value_sum"))

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String,
      value: Double)

  case class SessionState(start: Long, lastSeen: Long, events: Int,
      valueSum: Double)

  case class Session(user_id: Long, start_ts: java.sql.Timestamp,
      end_ts: java.sql.Timestamp, n_events: Int, value_sum: Double)

  /** Gap-based sessionization: a user's events belong to one session until
    * `gapMs` of event-time silence. Custom state machine via
    * flatMapGroupsWithState with an EVENT-time timeout — sessions close
    * either when a later event arrives past the gap, or when the
    * watermark passes lastSeen+gap (idle users). The caller must apply a
    * watermark on `ts` upstream (see the spec); processing-time timeouts
    * would make the query self-schedule batches forever.
    */
  def sessionize(events: Dataset[Event], gapMs: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[SessionState]) =>
          def emit(s: SessionState) =
            Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastSeen), s.events, s.valueSum)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(s))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var current = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              current match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  // min/max, not plain assignment: a late-but-in-watermark
                  // event older than the current state must not REGRESS
                  // lastSeen (which would mis-time the gap check and the
                  // event-time timeout) or leave start after end
                  current = Some(s.copy(
                    start = math.min(s.start, t),
                    lastSeen = math.max(s.lastSeen, t),
                    events = s.events + 1,
                    valueSum = s.valueSum + e.value))
                case Some(s) =>
                  closed += emit(s)
                  current = Some(SessionState(t, t, 1, e.value))
                case None =>
                  current = Some(SessionState(t, t, 1, e.value))
              }
            }
            current match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.lastSeen + gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }

  case class FunnelState(depth: Int, t1: Long, tLast: Long)

  case class FunnelProgress(user_id: Long, step: Int, step_name: String,
      ts: java.sql.Timestamp)

  /** Incremental funnel — the streaming twin of `operators.Funnel`: a
    * per-user state machine emits one row each time the user ADVANCES a
    * step (in order, at-or-after the previous step, within `horizonMs` of
    * step one). The caller must watermark `ts` upstream; state for
    * expired funnels is dropped via an event-time timeout at the
    * horizon deadline.
    *
    * Single-pass-forward semantics: events are processed in event-time
    * order WITHIN a micro-batch, but no event is buffered across batches,
    * so delivery must be MONOTONE in event time across micro-batches — an
    * event must never arrive after an event with a LATER timestamp was
    * already processed (neither an out-of-order step-1 straggler nor a
    * later step delivered early can be replayed). The batch operator,
    * seeing everything, has no such constraint. Parity under monotone
    * delivery is asserted on a replayed fixture in EventStreamsSpec, the
    * same contract as the as-of twin.
    *
    * State lifecycle: a COMPLETED funnel's state is removed immediately;
    * with a finite horizon, in-flight state times out (event time) at the
    * step-one deadline. With the default infinite horizon, in-flight
    * state for users who never finish lives forever — pass a horizon in
    * production.
    */
  def incrementalFunnel(events: Dataset[Event], steps: Seq[String],
      horizonMs: Long = Long.MaxValue): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove() // funnel horizon passed — free the state
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
            val out = Seq.newBuilder[FunnelProgress]
            for (e <- rows.toSeq.sortBy(_.ts.getTime)) {
              val t = e.ts.getTime
              if (st.depth == 0) {
                if (e.event_type == steps.head) {
                  st = FunnelState(1, t, t)
                  out += FunnelProgress(userId, 1, steps.head, e.ts)
                }
              } else if (st.depth < steps.length &&
                  e.event_type == steps(st.depth) && t >= st.tLast &&
                  (horizonMs == Long.MaxValue || t - st.t1 <= horizonMs)) {
                st = FunnelState(st.depth + 1, st.t1, t)
                out += FunnelProgress(userId, st.depth, steps(st.depth - 1), e.ts)
              }
            }
            if (st.depth >= steps.length) {
              // completed — nothing can advance further; free the state
              if (state.exists) state.remove()
            } else if (st.depth > 0) {
              val deadline =
                if (horizonMs == Long.MaxValue ||
                  st.t1 > Long.MaxValue - horizonMs) Long.MaxValue
                else st.t1 + horizonMs
              val wm = state.getCurrentWatermarkMs()
              if (deadline <= wm) {
                // horizon already passed: any future in-watermark event
                // has ts >= wm >= deadline and cannot advance — expire now
                // (setTimeoutTimestamp at/behind the watermark THROWS)
                if (state.exists) state.remove()
              } else {
                state.update(st)
                if (deadline != Long.MaxValue)
                  state.setTimeoutTimestamp(deadline)
              }
            }
            out.result().iterator
          }
      }
  }

  /** Streaming dedup on the id column ALONE within the watermark horizon —
    * the streaming form of exact dedup (NearDup.exactDedup). Uses
    * dropDuplicatesWithinWatermark so a redelivered id with a fresh
    * timestamp (the standard producer-retry shape) still deduplicates;
    * dropDuplicates(id, ts) would keep both.
    */
  def dedupStream(events: DataFrame, idCol: String,
      lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq(idCol))

  /** Streaming ingest dedup — the streaming twin of
    * `NearDup.incrementalDedup` composed with within-stream exact dedup:
    * a continuously-arriving document stream is dropped against (a) the
    * static seen corpus and (b) its own earlier arrivals.
    *
    * Stages, both narrow for the streaming side:
    *  1. `dropDuplicatesWithinWatermark` on the content fingerprint —
    *     within-stream dedup keeping the FIRST ARRIVAL (streaming has no
    *     global min-id: later micro-batches cannot retract an emitted
    *     row; the batch `exactDedup` is the keep-min operator).
    *  2. stream-static LEFT ANTI join against the seen corpus's distinct
    *     fingerprints — the seen side is the same one-long-per-document
    *     frame d14 ships, re-read per micro-batch and broadcastable.
    *
    * State is one fingerprint per unexpired document (8 bytes + key
    * overhead), bounded by the watermark horizon — the streaming
    * equivalent of d18's "only possibly-seen rows reach the join".
    */
  def ingestDedup(docs: DataFrame, tsCol: String, textCol: String,
      lateness: String, seen: DataFrame, seenTextCol: String): DataFrame = {
    require(!docs.columns.contains("__fp"),
      "docs already has a '__fp' column (reserved)")
    docs.withColumn("__fp",
        graft.functions.TextFunctions.polyHash(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .join(
        seen.select(graft.functions.TextFunctions.polyHash(col(seenTextCol))
          .as("__fp")).distinct(),
        Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Stream-stream interval join: each left event joined to every right
    * event for the same user within the trailing `horizonSec` window
    * (`rts ∈ [lts - horizon, lts]`) — the streaming analogue of
    * `operators.AsofJoin.backward` with a tolerance. Streaming relaxes
    * "the latest match" to "all matches in the horizon" because picking
    * the single latest would need per-key ordered state with unbounded
    * reordering; the batch as-of join is the exact operator, this is its
    * incremental twin (the attribution query in both forms).
    *
    * Both sides carry watermarks, and the join condition bounds right
    * event time on both ends — exactly what Structured Streaming needs to
    * age state out instead of buffering both streams forever. Left-outer
    * rows (no match in horizon) emit once the watermark passes the left
    * event's horizon.
    *
    * Expects the standard events schema on both inputs; right columns come
    * back as (match_id, match_ts, match_type).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, horizonSec: Long,
      lateness: String): DataFrame = {
    val l = left.withWatermark("ts", lateness)
    val r = right.select(col("user_id").as("match_user"),
        col("event_id").as("match_id"), col("ts").as("match_ts"),
        col("event_type").as("match_type"))
      .withWatermark("match_ts", lateness)
    l.join(r,
      expr(s"""user_id = match_user
               AND match_ts BETWEEN ts - INTERVAL $horizonSec SECONDS
                               AND ts"""),
      "leftOuter")
      .drop("match_user")
  }

  /** Reduce `intervalJoin` output to exact as-of semantics: one row per
    * left event carrying only its LATEST in-horizon match (greatest
    * match_ts, ties to the greatest match_id — the same deterministic
    * winner `AsofJoin.backward` picks via rightOrder). Run as a batch
    * post-pass over the joined stream's sink: the streaming stage fans out
    * to all in-horizon matches (bounded state), this micro-aggregation
    * collapses them — together the two stages are the incremental twin of
    * the batch as-of join, and EventStreamsSpec replays a fixture through
    * both paths to assert they agree row-for-row.
    */
  def latestMatchPerEvent(joined: DataFrame): DataFrame = {
    // group on EVERY left column, not just the identity triple: event_id
    // functionally determines the rest, so grouping wider is free and the
    // left payload (event_type, value, ...) — the columns an attribution
    // consumer aggregates — survives the reduction
    val matchCols = Set("match_id", "match_ts", "match_type")
    val leftCols = joined.columns.filterNot(matchCols).toSeq
    joined.groupBy(leftCols.map(col): _*)
      .agg(max_by(
        struct(col("match_id"), col("match_ts"), col("match_type")),
        struct(col("match_ts"), col("match_id"))).as("m"))
      .select(leftCols.map(col) ++ Seq(
        col("m.match_id").as("match_id"),
        col("m.match_ts").as("match_ts"),
        col("m.match_type").as("match_type")): _*)
  }

  /** Trending items per tumbling window: the heavy-hitter sketch
    * (`TextFunctions.freqSketch`, a mergeable Misra-Gries
    * TypedImperativeAggregate) as a streaming aggregation — per-window
    * state is ≤ m counters per key however many distinct items flow
    * through, which is the property that makes "top items this hour" a
    * bounded-state query on an unbounded stream.
    */
  def trendingItems(events: DataFrame, itemCol: String,
      windowLength: String, lateness: String, m: Int): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength).as("win"))
      .agg(graft.functions.TextFunctions.freqSketch(col(itemCol), m)
        .as("top_items"))
      .select(col("win.start").as("window_start"), col("top_items"))

  /** Streaming twin of the bottom-k/KMV sketch (X50): per-window
    * distinct-count estimate plus a deterministic sample of the distinct
    * items, with ≤ k entries of state per window however many items flow
    * through — "how many distinct users this hour" as a bounded-state
    * query. Same mergeable `TextFunctions.kmvSample` aggregate as batch,
    * so a replayed stream lands on bit-identical samples and estimates
    * (the sketch has no RNG and no encounter-order dependence).
    */
  def windowedDistincts(events: DataFrame, itemCol: String,
      windowLength: String, lateness: String, k: Int): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength).as("win"))
      .agg(graft.functions.TextFunctions.kmvSample(col(itemCol), k)
        .as("s"))
      .select(col("win.start").as("window_start"),
        col("s.sample").as("sample"),
        col("s.est_distinct").as("est_distinct"))

  case class TransState(lastState: String, lastTs: Long)

  case class Transition(user_id: Long, from_state: String, to_state: String,
      ts: java.sql.Timestamp)

  /** Incremental transition stream — the streaming twin of
    * `operators.Transitions`: one row per observed (state → next state)
    * step per user, emitted as events arrive; counting/normalizing into
    * the matrix is a downstream aggregation. State per user is a single
    * (last state, last ts) pair.
    *
    * Same monotone-delivery contract as `incrementalFunnel`: events are
    * ordered by event time within a micro-batch and never buffered across
    * batches. Batch/stream parity on a replayed fixture is asserted in
    * EventStreamsSpec against `Transitions.matrix`.
    *
    * With a finite `ttlMs`, a user idle past the watermark by more than
    * the TTL has their state dropped (event-time timeout) — the next
    * event starts a fresh chain instead of bridging an unbounded gap,
    * which is what bounds state at 100 TB-stream scale.
    */
  def incrementalTransitions(events: Dataset[Event],
      ttlMs: Long = Long.MaxValue): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val out = Seq.newBuilder[Transition]
            var st = state.getOption.orNull
            for (e <- sorted) {
              if (st != null)
                out += Transition(userId, st.lastState, e.event_type, e.ts)
              st = TransState(e.event_type, e.ts.getTime)
            }
            if (st != null) {
              state.update(st)
              if (ttlMs != Long.MaxValue &&
                  st.lastTs <= Long.MaxValue - ttlMs) {
                val deadline = st.lastTs + ttlMs
                // a deadline at/behind the watermark would THROW; the
                // state is already expired — drop it now
                if (deadline <= state.getCurrentWatermarkMs()) state.remove()
                else state.setTimeoutTimestamp(deadline)
              }
            }
            out.result().iterator
          }
      }
  }

  /** Streaming corpus-drift monitor: per micro-batch, the
    * Jensen–Shannon divergence of the batch's token distribution
    * against a STATIC reference corpus ([[graft.text.Divergence]]).
    *
    * Deliberately foreachBatch, not a chained stateful aggregation:
    * JS needs the full vocabulary union per comparison (a full-outer
    * join streaming cannot express), and the production question is
    * per-ingest-batch anyway ("does today's crawl still look like the
    * accepted corpus?"). Each batch runs the exact batch operator —
    * same bitwise-replayable number the t29 gate checks — and hands
    * (batchId, n_terms, tot_batch, tot_ref, js_nats) to the sink.
    *
    * The caller starts the returned writer (`.start()`), picking
    * trigger/checkpoint; the reference should be a small distilled
    * sample or pre-aggregated corpus (it is re-scanned per batch —
    * cache it).
    */
  def driftMonitor(docs: DataFrame, textCol: String, reference: DataFrame)(
      sink: (Long, org.apache.spark.sql.Row) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        sink(id,
          graft.text.Divergence.jsTokens(batch, reference, textCol).head())
    }

  /** Continuous vector ingestion into the cid-partitioned int8 store —
    * the streaming half of the 100 TB ANN layout (d16 proves the read
    * path, d44 the batched-append write path; this drives the same
    * appends from Structured Streaming): each arriving vector is
    * assigned to its cell ON THE STREAM (the compiled `NearestCells`
    * rank is a stateless map — the streaming plan carries it directly,
    * zero state stores), and each micro-batch lands via
    * `Quantize.appendIvfQuantized` — per-vector quantization makes the
    * stored bytes batch-invariant, so however the source batches
    * arrivals, the store converges to the one-shot write byte for byte.
    * The model is FROZEN (the d44/d29 shared-index contract); re-train
    * + re-assign is an offline rebuild, not a streaming concern.
    *
    * Replayed micro-batches are SKIPPED: `foreachBatch` is at-least-once
    * (on failure the engine re-delivers the same batchId), and a blind
    * append would land the batch's rows twice. Each committed batch
    * leaves a marker file under `_graft_commits/<batchId>` inside the
    * store (underscore-prefixed, so Spark's reader never lists it as
    * data); a re-delivered batchId whose marker exists is a no-op.
    * Residual window: a crash AFTER the append but BEFORE the marker
    * write still duplicates that one batch on restart — closing it
    * needs a transactional sink (file-manifest commit), which a plain
    * cid-partitioned parquet layout deliberately doesn't carry.
    *
    * The caller starts the returned writer, picking trigger/checkpoint.
    */
  def ingestVectorsIvfInt8(vectors: DataFrame, idCol: String,
      vecCol: String, model: graft.similarity.Ivf.Model, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    graft.similarity.Ivf.assign(vectors, idCol, vecCol, model)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          val commits = new org.apache.hadoop.fs.Path(path, "_graft_commits")
          val marker = new org.apache.hadoop.fs.Path(commits, batchId.toString)
          val fs = marker.getFileSystem(
            batch.sparkSession.sessionState.newHadoopConf())
          if (!fs.exists(marker)) {
            graft.similarity.Quantize.appendIvfQuantized(batch, path)
            fs.mkdirs(commits)
            fs.create(marker, true).close()
          }
      }
}
