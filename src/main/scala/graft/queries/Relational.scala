package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import GateQuery.{dec, dsum, table => t}

/** Core relational operator inventory (SURVEY.md §2.3–§2.9) exercised over
  * the driver testdata tables, each with a DuckDB oracle.
  *
  * Reference semantics covered per query are cited as SURVEY §2 operator ids
  * (e.g. A1 = mixed-agg rollup like mozetl/clientsdaily/rollup.py:123-124).
  * The implementations are Spark-first: declarative DataFrame chains that
  * Catalyst plans (pushdown, pruning, broadcast) without hand-scheduling.
  */
object Relational {

  val queries: Seq[GateQuery] = Seq(

    // A1/A2: hash group-by with a mixed aggregate list (sum/avg/count/
    // countDistinct) — the clients_daily rollup shape (rollup.py:123-124).
    GateQuery(
      "q01_agg_mixed",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        l.groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            (sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
              .as("avg_qty"),
            count(lit(1)).as("cnt"),
            countDistinct(col("l_orderkey")).as("cnt_orders"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          COUNT(*) AS cnt,
          COUNT(DISTINCT l_orderkey) AS cnt_orders
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // P1/P2/F4: projection + typed predicates + arithmetic (TPC-H Q6 shape;
    // utils.py:151-159 chained wheres). Filter must push to the parquet scan.
    GateQuery(
      "q02_filter_project",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_quantity") < 24)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (dec(col("l_extendedprice")) * dec(col("l_discount")))
              .cast("double").as("disc_revenue"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS disc_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_quantity < 24
        ORDER BY l_orderkey, l_linenumber""")),

    // J1/J2: multi-way inner equi-join + agg (taar_ensemble.py:453 shape).
    // nation is dimension-sized: Catalyst auto-broadcasts it.
    GateQuery(
      "q03_join_agg",
      (s, dir) => {
        val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(dsum(col("o_totalprice")).as("total"), count(lit(1)).as("cnt"))
          .orderBy("n_name")
      },
      Some("""
        SELECT n_name,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          COUNT(*) AS cnt
        FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // J3: left outer join preserving unmatched rows (taar_similarity.py:203).
    GateQuery(
      "q04_join_left",
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(c("c_custkey").as("c_custkey"))
          .agg(count(o("o_orderkey")).as("order_cnt"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // J5-as-semi-join: whitelist filtering without duplication
    // (taar_lite_guidguid.py:105 broadcast-set membership).
    GateQuery(
      "q05_join_semi",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val f = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        c.join(f, c("c_custkey") === f("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        ORDER BY c_custkey""")),

    // Anti-join: set-difference filtering (SURVEY §2.4 notes semi/anti
    // availability; the engine exposes it first-class).
    GateQuery(
      "q06_join_anti",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        ORDER BY c_custkey""")),

    // J4: snowflake of broadcast dimensions off the fact table
    // (taar_locale.py:121-132 small-table join). Explicit broadcast() on
    // every dim keeps the fact table shuffle-free: one stage, no exchange.
    GateQuery(
      "q07_broadcast_dims",
      (s, dir) => {
        val l = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        l.join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name")
          .agg(dsum(col("l_extendedprice")).as("revenue"),
            count(lit(1)).as("cnt"))
          .orderBy("r_name")
      },
      Some("""
        SELECT r_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS cnt
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // W1: latest-record-per-key dedup — THE signature mozetl window
    // (taar_similarity.py:80-84, taar_dynamo.py:338-346), with a unique
    // tie-break so the result is deterministic.
    GateQuery(
      "q08_window_latest",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(desc("ts"), desc("event_id"))
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "event_type", "value")
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id, event_id, event_type, value FROM (
          SELECT user_id, event_id, event_type, value,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1 ORDER BY user_id""")),

    // W2: top-N per group via window (landfill/sampler.py:134-143).
    GateQuery(
      "q09_window_topn",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(desc("value"), asc("event_id"))
        t(s, dir, "events")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select("user_id", "rnk", "event_id", "value")
          .orderBy("user_id", "rnk")
      },
      Some("""
        SELECT user_id, rnk, event_id, value FROM (
          SELECT user_id, event_id, value,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id) AS rnk
          FROM events) WHERE rnk <= 3 ORDER BY user_id, rnk""")),

    // W3 + running frame: whole-partition analytic count
    // (taar_locale.py:145-150) and an ordered ROWS frame running sum.
    GateQuery(
      "q10_window_analytic",
      (s, dir) => {
        val part = Window.partitionBy("user_id")
        val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(
            col("event_id"), col("user_id"),
            count(lit(1)).over(part).as("user_events"),
            sum(dec(col("value"))).over(run).cast("double")
              .as("running_value"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
          COUNT(*) OVER (PARTITION BY user_id) AS user_events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS running_value
        FROM events ORDER BY event_id""")),

    // A5: pivot — search_clients_daily's type→columns rotation
    // (search/aggregates.py:153-177), as day × event_type.
    GateQuery(
      "q11_pivot",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(sum(dec(col("value"))).cast("double"))
          .orderBy("day"),
      Some("""
        SELECT strftime(ts, '%Y-%m-%d') AS day,
          CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
          CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
          CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
          CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
          CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        FROM events GROUP BY day ORDER BY day""")),

    // E1: explode array → per-element rows → re-aggregate
    // (clientsdaily/rollup.py:49-51 search_counts explode).
    GateQuery(
      "q12_explode_wordcount",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("word"))
          .limit(50),
      Some("""
        SELECT word, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY word
        ORDER BY cnt DESC, word LIMIT 50""")),

    // P7: row-level dedup (addon_aggregates.py:141 distinct()).
    GateQuery(
      "q13_distinct",
      (s, dir) =>
        t(s, dir, "documents").select("lang", "source").distinct()
          .orderBy("lang", "source"),
      Some("""
        SELECT DISTINCT lang, source FROM documents
        ORDER BY lang, source""")),

    // U1: positional union of homogeneous branches then agg
    // (clientsdaily/rollup.py:86-97 unionAll).
    GateQuery(
      "q14_union",
      (s, dir) => {
        val e = t(s, dir, "events")
        val a = e.filter(col("value") > 150).select("event_type")
        val b = e.filter(col("user_id") < 10).select("event_type")
        a.union(b).groupBy("event_type").agg(count(lit(1)).as("cnt"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS cnt FROM (
          SELECT event_type FROM events WHERE value > 150
          UNION ALL
          SELECT event_type FROM events WHERE user_id < 10)
        GROUP BY event_type ORDER BY event_type""")),

    // P6: CASE WHEN bucketing (addon_aggregates.py:97-117 indicator cols).
    GateQuery(
      "q15_casewhen",
      (s, dir) =>
        t(s, dir, "orders")
          .withColumn("bucket",
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 200000, "medium")
              .otherwise("large"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
          .orderBy("bucket"),
      Some("""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 200000 THEN 'medium'
                    ELSE 'large' END AS bucket,
          COUNT(*) AS cnt,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY bucket ORDER BY bucket""")),

    // P4/P5: IN-list + LIKE + null-safe predicates
    // (clientsdaily/rollup.py:53-58 isin; addon_aggregates.py:100-107 like).
    GateQuery(
      "q16_inlist_like",
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
            col("p_name").like("%widget%"))
          .select("p_partkey", "p_name", "p_brand", "p_type")
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey, p_name, p_brand, p_type FROM part
        WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
          AND p_name LIKE '%widget%'
        ORDER BY p_partkey""")),

    // F1: date functions — format/extract/diff (clientsdaily/fields.py:128-136,
    // sync/bookmark_validation.py:42 date_format).
    GateQuery(
      "q17_dates",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
              .cast("long").as("days_since"))
          .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') AS day,
          CAST(year(o_orderdate) AS BIGINT) AS yr,
          CAST(month(o_orderdate) AS BIGINT) AS mo,
          CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
        FROM orders ORDER BY o_orderkey""")),

    // F2: string functions (addon_aggregates.py:75 substring et al.).
    GateQuery(
      "q18_strings",
      (s, dir) =>
        t(s, dir, "customer")
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("uname"),
            substring(col("c_name"), 10, 9).as("id_part"),
            length(col("c_name")).cast("long").as("name_len"),
            concat(col("c_mktsegment"), lit(":"),
              col("c_nationkey").cast("string")).as("seg_nation"))
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey,
          upper(c_name) AS uname,
          substring(c_name, 10, 9) AS id_part,
          CAST(length(c_name) AS BIGINT) AS name_len,
          c_mktsegment || ':' || CAST(c_nationkey AS VARCHAR) AS seg_nation
        FROM customer ORDER BY c_custkey""")),

    // A4: multi-column countDistinct (sync/bookmark_validation.py:73-79).
    GateQuery(
      "q19_countdistinct_multi",
      (s, dir) =>
        t(s, dir, "events")
          .agg(
            countDistinct(col("user_id")).as("users"),
            countDistinct(col("user_id"), col("event_type"))
              .as("user_type_pairs"),
            count(lit(1)).as("cnt")),
      Some("""
        SELECT COUNT(DISTINCT user_id) AS users,
          COUNT(DISTINCT (user_id, event_type)) AS user_type_pairs,
          COUNT(*) AS cnt
        FROM events""")),

    // A6: collect_list/collect_set per group, canonicalized to a sorted
    // joined string (taar_lite_guidguid.py:160-182 coinstall lists).
    GateQuery(
      "q20_collect_sorted",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
            .as("types"))
          .orderBy("user_id"),
      Some("""
        SELECT user_id,
          array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Beyond-reference agg: ROLLUP grouping sets (SURVEY §2.5 notes absence
    // in reference; first-class here).
    GateQuery(
      "q21_rollup",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("cnt"))
          .orderBy(asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus")),
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          COUNT(*) AS cnt
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // O1/O2: global sort + limit with unique tie-break
    // (search/aggregates.py:357-358 orderBy-before-write).
    GateQuery(
      "q22_topk_orders",
      (s, dir) =>
        t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .limit(10),
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // F8: JSON path extraction from string columns
    // (bhr_collection.py:640-643 json.loads → get_json_object here).
    GateQuery(
      "q23_json_extract",
      (s, dir) =>
        t(s, dir, "events")
          // Cast through DOUBLE then truncate: Spark's direct string→long
          // cast truncates '3.7'→3 while DuckDB's rounds to 4; going
          // via DOUBLE + trunc makes both sides floor toward zero.
          .withColumn("k",
            get_json_object(col("props"), "$.k").cast("double").cast("long"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("cnt"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type,
          CAST(SUM(CAST(trunc(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT)) AS BIGINT) AS k_sum,
          COUNT(*) AS cnt
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // E3/D3-style higher-order functions replacing Python UDFs
    // (search/aggregates.py:190-205 → transform/filter on arrays).
    GateQuery(
      "q24_higher_order",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(filter(split(col("text"), " "),
              x => length(x) > lit(4))).cast("long").as("long_tokens"),
            size(filter(split(col("text"), " "),
              x => x =!= lit(""))).cast("long").as("n_tokens"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 4)) AS BIGINT) AS long_tokens,
          CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents ORDER BY doc_id""")),

    // max_by/min_by ordered-selection agg — deterministic replacement for
    // the reference's first(ignoreNulls) pattern (clientsdaily/fields.py:26-27)
    // when an explicit ordering key exists.
    GateQuery(
      "q25_argmax",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(
            expr("max_by(event_type, event_id)").as("last_type"),
            expr("min_by(event_type, event_id)").as("first_type"),
            max(col("event_id")).as("max_event_id"))
          .orderBy("user_id"),
      Some("""
        SELECT user_id,
          max_by(event_type, event_id) AS last_type,
          min_by(event_type, event_id) AS first_type,
          MAX(event_id) AS max_event_id
        FROM events GROUP BY user_id ORDER BY user_id"""))
  )
}
