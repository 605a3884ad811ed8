package graft.queries

import org.apache.spark.sql.functions._

import GateQuery.{dsum, table => t}
import graft.operators.{AsofJoin, RangeJoin}

/** Temporal / range operator gates: the as-of join and bucketed range join
  * (whole-operator semantics Spark lacks natively — see
  * `graft.operators`), plus the two-phase pair-co-occurrence shape the
  * TAAR guid-guid job builds its coinstallation model from
  * (taar_lite_guidguid.py:93-130) — previously spec-only (SURVEY §2.5 A7),
  * now oracle-gated.
  *
  * Oracle notes:
  *  - q32's DuckDB oracle uses DuckDB's NATIVE `ASOF LEFT JOIN` — a
  *    genuinely independent algorithm (binary search per left row) from
  *    the engine's union+window formulation. (user_id, ts) is unique at
  *    every SF, so both sides pick the same match deterministically.
  *  - q33's oracle is the raw inequality join (DuckDB plans its IEJoin) —
  *    again an independent algorithm from the engine's bucketed equi-join.
  *  - Times are compared/emitted as integer microseconds (never raw
  *    timestamps or double seconds — see GateQuery's discipline notes).
  */
object TemporalQueries {

  val queries: Seq[GateQuery] = Seq(

    // As-of join: attach to each purchase the user's most recent click at
    // or before it (the classic attribution query). 143 of 1981 purchases
    // at sf0.01 precede any click — the left-outer null path is exercised.
    GateQuery(
      "q32_asof_join",
      (s, dir) => {
        val e = t(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("click_ts"))
        AsofJoin.backward(purchases, clicks, Seq("user_id"),
            leftTime = "ts", rightTime = "click_ts",
            payload = Seq("click_id", "click_ts"),
            rightOrder = Some("click_id"))
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("purchase_us"),
            col("click_id"),
            (unix_micros(col("ts")) - unix_micros(col("click_ts")))
              .as("micros_since_click"))
          .orderBy("user_id", "event_id")
      },
      Some("""
        WITH p AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
              FROM events WHERE event_type = 'click')
        SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
          c.click_id,
          epoch_us(p.ts) - epoch_us(c.click_ts) AS micros_since_click
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
        ORDER BY p.user_id, p.event_id""")),

    // Bucketed range join: orders priced into 25 overlapping price bands
    // (bands derived from nation so both engines see identical intervals).
    GateQuery(
      "q33_range_join",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val ranges = t(s, dir, "nation").select(
          col("n_nationkey").cast("long").as("range_id"),
          (col("n_nationkey") * lit(18000.0)).as("lo"),
          (col("n_nationkey") * lit(18000.0) + lit(30000.0)).as("hi"))
        RangeJoin.pointInInterval(orders, "o_totalprice",
            ranges, "lo", "hi", bucketWidth = 10000.0)
          .groupBy("range_id")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("price_sum"))
          .orderBy("range_id")
      },
      Some("""
        SELECT r.range_id, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS price_sum
        FROM (SELECT CAST(n_nationkey AS BIGINT) AS range_id,
                     n_nationkey * 18000.0 AS lo,
                     n_nationkey * 18000.0 + 30000.0 AS hi
              FROM nation) r
        JOIN orders o ON o.o_totalprice >= r.lo AND o.o_totalprice < r.hi
        GROUP BY r.range_id ORDER BY r.range_id""")),

    // Forward as-of with tolerance: each signup attached to the user's
    // next view, but only when it lands within 24 hours (685 of 2017
    // match at sf0.01 — beyond-tolerance and no-next-view rows both
    // exercise the null path). DuckDB replays with a forward ASOF LEFT
    // JOIN (s.ts <= v.view_ts) plus a CASE for the tolerance.
    GateQuery(
      "q35_asof_forward",
      (s, dir) => {
        val e = t(s, dir, "events")
        val signups = e.filter(col("event_type") === "signup")
          .select("user_id", "event_id", "ts")
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
        AsofJoin.forward(signups, views, Seq("user_id"),
            leftTime = "ts", rightTime = "view_ts",
            payload = Seq("view_id", "view_ts"),
            rightOrder = Some("view_id"),
            tolerance = Some((lt, rt) =>
              unix_micros(rt) - unix_micros(lt) <= 86400000000L))
          .select(col("user_id"), col("event_id"), col("view_id"),
            (unix_micros(col("view_ts")) - unix_micros(col("ts")))
              .as("micros_to_view"))
          .orderBy("user_id", "event_id")
      },
      Some("""
        WITH s AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'signup'),
        v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
              FROM events WHERE event_type = 'view')
        SELECT s.user_id, s.event_id,
          CASE WHEN epoch_us(v.view_ts) - epoch_us(s.ts) <= 86400000000
               THEN v.view_id END AS view_id,
          CASE WHEN epoch_us(v.view_ts) - epoch_us(s.ts) <= 86400000000
               THEN epoch_us(v.view_ts) - epoch_us(s.ts) END AS micros_to_view
        FROM s ASOF LEFT JOIN v
          ON s.user_id = v.user_id AND s.ts <= v.view_ts
        ORDER BY s.user_id, s.event_id""")),

    // A7 pair co-occurrence: distinct (user, event_type) self-joined into
    // ordered pairs, counted per pair — the coinstallation-matrix shape.
    // ReuseExchange deduplicates the identical distinct subplan, so the
    // self-join scans and shuffles the input once. Scale note: pairs grow
    // quadratically in per-key cardinality; at 100 TB cap the per-key fan
    // -out first (whitelist / top-k per key), exactly as the TAAR guidguid
    // job's whitelist semi-join does (LiteGuidGuid.scala).
    GateQuery(
      "q34_pair_cooccur",
      (s, dir) => {
        val d = t(s, dir, "events")
          .select("user_id", "event_type").distinct()
        val a = d.toDF("user_id", "et_a")
        val b = d.toDF("user_id", "et_b")
        a.join(b, Seq("user_id")).filter(col("et_a") < col("et_b"))
          .groupBy("et_a", "et_b").agg(count(lit(1)).as("n_users"))
          .orderBy("et_a", "et_b")
      },
      Some("""
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS et_a, b.event_type AS et_b,
          COUNT(*) AS n_users
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Interval-OVERLAP range join (both sides are intervals): nation price
    // bands × per-order price windows [price, price+20000). The engine
    // fans both sides over buckets and emits each qualifying pair exactly
    // once from the bucket containing the overlap start (RangeJoin.
    // intervalOverlap — no post-join distinct); DuckDB replays the raw
    // two-sided inequality with its IEJoin, a genuinely independent
    // algorithm.
    GateQuery(
      "q36_interval_overlap",
      (s, dir) => {
        val ranges = t(s, dir, "nation").select(
          col("n_nationkey").cast("long").as("range_id"),
          (col("n_nationkey") * lit(18000.0)).as("lo"),
          (col("n_nationkey") * lit(18000.0) + lit(30000.0)).as("hi"))
        val ords = t(s, dir, "orders").select(
          col("o_orderkey"), col("o_totalprice"),
          col("o_totalprice").as("p_lo"),
          (col("o_totalprice") + lit(20000.0)).as("p_hi"))
        RangeJoin.intervalOverlap(ranges, "lo", "hi",
            ords, "p_lo", "p_hi", bucketWidth = 10000.0)
          .groupBy("range_id")
          .agg(count(lit(1)).as("n_overlaps"),
            dsum(col("o_totalprice")).as("price_sum"))
          .orderBy("range_id")
      },
      Some("""
        SELECT r.range_id, COUNT(*) AS n_overlaps,
          CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS price_sum
        FROM (SELECT CAST(n_nationkey AS BIGINT) AS range_id,
                     n_nationkey * 18000.0 AS lo,
                     n_nationkey * 18000.0 + 30000.0 AS hi
              FROM nation) r
        JOIN (SELECT o_orderkey, o_totalprice,
                     o_totalprice AS p_lo,
                     o_totalprice + 20000.0 AS p_hi
              FROM orders) o
          ON r.lo < o.p_hi AND o.p_lo < r.hi
        GROUP BY r.range_id ORDER BY r.range_id"""))
  )
}
