package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import GateQuery.{dsum, table => t}

/** Round-10 gate queries: experiment statistics (Mann-Whitney, CUPED),
  * SQL-surface completions (GROUPING SETS, time-RANGE window frames),
  * distribution tooling (equal-frequency bins, quantile sketch), graph
  * density (k-core), market-basket rules, CUSUM changepoints, and
  * code-modality detection. Oracles follow the house discipline:
  * identical column aliases, exact-integer cores, fixed IEEE shapes,
  * total ORDER BY.
  */
object StatsQueries {

  val queries: Seq[GateQuery] = Seq(

    // GROUPING SETS ((status), (priority)) — the non-hierarchical
    // multi-aggregate rollup/cube (q21/q28) cannot express: two
    // independent subtotal lattices in ONE pass over the scan (Spark
    // plans a single Expand + one aggregation — one shuffle where two
    // separate GROUP BYs would scan and shuffle twice). Subtotal slots
    // surface as 'ALL' labels: the grouping columns are non-NULL in the
    // data, so the label is unambiguous and engine-portable (grouping_id
    // bit conventions are not).
    GateQuery(
      "q75_grouping_sets",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("sum_price"))
          .orderBy("status", "priority")
      },
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status, priority""")),

    // Time-based RANGE window frame: per user, the trailing-1-hour
    // event count and value sum at every event — the sliding-window
    // feature a RANGE BETWEEN frame computes in ONE pass over one
    // user-partitioned sort, where a self-join formulation (q33's range
    // join) would re-shuffle both sides. Values micro-quantize per ROW
    // before the frame sum, so the window aggregates exact longs
    // (double summation inside a sliding frame is order-dependent);
    // frame peers (equal timestamps) are included by RANGE semantics in
    // both engines.
    GateQuery(
      "q76_range_frame",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("tus", unix_micros(col("ts")))
          .withColumn("vmicro",
            floor(col("value").cast("double") * lit(1000000.0) + lit(0.5))
              .cast("long"))
        val w = Window.partitionBy("user_id").orderBy("tus")
          .rangeBetween(-3600000000L, 0L)
        ev.select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_trailing"),
            (sum(col("vmicro")).over(w).cast("double") / lit(1000000.0))
              .as("value_trailing"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
               CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                   AS BIGINT)) OVER w AS DOUBLE) / 1000000.0
                 AS value_trailing
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // Mann-Whitney U between every pair of return-flag populations on
    // quantity — the rank test computed WITHOUT a global sort (per-value
    // counts + one window over the compressed table; ranks are exact
    // integers 2p+c+1 even under the heavy ties a 1..50 quantity column
    // produces). The z normal approximation is a fixed IEEE shape over
    // the exact longs, tie-corrected.
    GateQuery(
      "q77_mann_whitney",
      (s, dir) =>
        graft.operators.Hypothesis.mannWhitney(
            t(s, dir, "lineitem"), "l_returnflag", "l_quantity")
          .orderBy("group_a", "group_b"),
      Some("""
        WITH c AS (SELECT l_returnflag AS g,
                CAST(floor(CAST(l_quantity AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS v,
                CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        gs AS (SELECT DISTINCT g FROM c),
        pr AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b
               ON a.g < b.g),
        m AS (SELECT pr.ga, pr.gb, c.v,
                SUM(CASE WHEN c.g = pr.ga THEN c.cnt ELSE 0 END) AS ca,
                SUM(CASE WHEN c.g = pr.gb THEN c.cnt ELSE 0 END) AS cb
              FROM pr JOIN c ON c.g IN (pr.ga, pr.gb)
              GROUP BY 1, 2, 3),
        r AS (SELECT ga, gb, v, ca, cb, ca + cb AS cc,
                SUM(ca + cb) OVER (PARTITION BY ga, gb ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - (ca + cb) AS pp
              FROM m),
        a AS (SELECT ga, gb,
                CAST(SUM(ca) AS BIGINT) AS n_a,
                CAST(SUM(cb) AS BIGINT) AS n_b,
                CAST(SUM(ca * (2*pp + cc + 1)) AS BIGINT) AS r2a,
                CAST(SUM(cc*cc*cc - cc) AS BIGINT) AS tie_term
              FROM r GROUP BY 1, 2),
        u AS (SELECT ga, gb, n_a, n_b, tie_term,
                r2a - n_a * (n_a + 1) AS u2
              FROM a)
        SELECT ga AS group_a, gb AS group_b, n_a, n_b, u2,
          CAST(u2 AS DOUBLE) / 2.0 AS u, tie_term,
          CASE WHEN CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
              ((CAST(n_a + n_b AS DOUBLE) + 1.0)
               - CAST(tie_term AS DOUBLE)
                 / (CAST(n_a + n_b AS DOUBLE)
                    * (CAST(n_a + n_b AS DOUBLE) - 1.0))) > 0.0
          THEN (CAST(u2 AS DOUBLE) / 2.0
                - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
               / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
                   ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                    - CAST(tie_term AS DOUBLE)
                      / (CAST(n_a + n_b AS DOUBLE)
                         * (CAST(n_a + n_b AS DOUBLE) - 1.0))))
          END AS z_score
        FROM u ORDER BY group_a, group_b""")),

    // CUPED variance-reduced A/B readout: users split into two synthetic
    // variants (user_id parity); covariate = first-half activity value,
    // metric = second-half. Unit values are per-event micro-quantized
    // exact sums re-expressed in units, so both engines quantize the
    // SAME double; theta/rho2/adjusted means are one moments aggregation
    // + a broadcast 1-row pooled frame.
    GateQuery(
      "q78_cuped",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val units = ev.groupBy(col("user_id"))
          .agg(
            (sum(when(col("ts") < lit("2024-01-16").cast("timestamp"),
              floor(col("value").cast("double") * lit(1000000.0) + lit(0.5))
                .cast("long")).otherwise(0L)).cast("double") /
              lit(1000000.0)).as("x"),
            (sum(when(col("ts") >= lit("2024-01-16").cast("timestamp"),
              floor(col("value").cast("double") * lit(1000000.0) + lit(0.5))
                .cast("long")).otherwise(0L)).cast("double") /
              lit(1000000.0)).as("y"))
          .withColumn("variant", (col("user_id") % 2).cast("long"))
        // milli-quantization: per-user sums reach ~2.5e3 units, and
        // micro-scale product moments would cross 2^53 where
        // HUGEINT->DOUBLE casts stop agreeing across engines (see
        // Cuped.adjustedMeans scaladoc)
        graft.operators.Cuped.adjustedMeans(units, "variant", "x", "y",
            quantScale = 1000.0)
          .orderBy("variant")
      },
      Some("""
        WITH units AS (
          SELECT user_id,
            CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                THEN CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                     AS BIGINT) ELSE 0 END) AS DOUBLE) / 1000000.0 AS x,
            CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                THEN CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                     AS BIGINT) ELSE 0 END) AS DOUBLE) / 1000000.0 AS y,
            user_id % 2 AS variant
          FROM events GROUP BY user_id),
        q AS (SELECT variant,
                CAST(floor(x * 1000.0 + 0.5) AS BIGINT) AS xm,
                CAST(floor(y * 1000.0 + 0.5) AS BIGINT) AS ym
              FROM units),
        pv AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xm) AS HUGEINT) AS sx,
                 CAST(SUM(ym) AS HUGEINT) AS sy,
                 SUM(CAST(xm AS HUGEINT) * ym) AS sxy,
                 SUM(CAST(xm AS HUGEINT) * xm) AS sxx,
                 SUM(CAST(ym AS HUGEINT) * ym) AS syy
               FROM q GROUP BY 1),
        g AS (SELECT CAST(SUM(n) AS DOUBLE) AS gn,
                CAST(SUM(sx) AS DOUBLE) AS gsx,
                CAST(SUM(sy) AS DOUBLE) AS gsy,
                CAST(SUM(sxy) AS DOUBLE) AS gsxy,
                CAST(SUM(sxx) AS DOUBLE) AS gsxx,
                CAST(SUM(syy) AS DOUBLE) AS gsyy
              FROM pv),
        k AS (SELECT gn, gsx,
                gsxy - gsx * gsy / gn AS covn,
                gsxx - gsx * gsx / gn AS varxn,
                gsyy - gsy * gsy / gn AS varyn
              FROM g)
        SELECT pv.variant, pv.n,
          CAST(pv.sx AS DOUBLE) / CAST(pv.n AS DOUBLE) / 1.0e3 AS mean_x,
          CAST(pv.sy AS DOUBLE) / CAST(pv.n AS DOUBLE) / 1.0e3 AS mean_y,
          CASE WHEN k.varxn > 0.0 THEN k.covn / k.varxn END AS theta,
          CASE WHEN k.varxn > 0.0 AND k.varyn > 0.0
               THEN k.covn * k.covn / (k.varxn * k.varyn) END AS rho2,
          CAST(pv.sy AS DOUBLE) / CAST(pv.n AS DOUBLE) / 1.0e3
            - (CASE WHEN k.varxn > 0.0 THEN k.covn / k.varxn END)
              * (CAST(pv.sx AS DOUBLE) / CAST(pv.n AS DOUBLE)
                 - k.gsx / k.gn) / 1.0e3 AS adj_mean
        FROM pv CROSS JOIN k ORDER BY variant""")),

    // Budgeted k-core peeling of the customer-part co-purchase graph
    // (the q74 edge derivation): two synchronous peel rounds at k=20,
    // then degrees within the survivor subgraph. The oracle unrolls the
    // EXACT rounds — budgeted iteration is the contract (you budget
    // rounds up front at 100 TB), so the replay is structural, not
    // convergence-dependent. Part ids offset by 1e6 to disjoin the
    // bipartite id spaces.
    GateQuery(
      "q79_kcore",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_partkey") + 1000000L).as("dst"))
          .distinct()
        // peelEdges ≡ peel with the endpoint universe (any non-endpoint
        // node has degree 0 and dies in round 1) — and it stops this
        // gate re-deriving the edge list for the node frame (r18 opt)
        graft.graph.KCore.peelEdges(edges, "src", "dst",
            k = 20, rounds = 2)
          .orderBy("id")
      },
      Some("""
        WITH e0 AS (SELECT DISTINCT o_custkey AS s,
                l_partkey + 1000000 AS d
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        sym AS (SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d
                FROM e0),
        d1 AS (SELECT s AS id, COUNT(*) AS c FROM sym GROUP BY 1),
        a1 AS (SELECT id FROM d1 WHERE c >= 20),
        d2 AS (SELECT s AS id, COUNT(*) AS c FROM sym
               WHERE s IN (SELECT id FROM a1)
                 AND d IN (SELECT id FROM a1) GROUP BY 1),
        a2 AS (SELECT id FROM d2 WHERE c >= 20)
        SELECT s AS id, CAST(COUNT(*) AS BIGINT) AS degree
        FROM sym
        WHERE s IN (SELECT id FROM a2) AND d IN (SELECT id FROM a2)
        GROUP BY 1 ORDER BY id""")),

    // Pairwise association rules over order baskets of part brands:
    // Apriori-pruned (items counted first, infrequent items semi-joined
    // away BEFORE the per-basket self-join — the pruning that bounds
    // the pair explosion at scale), presence semantics, exact-ratio
    // support/confidence/lift.
    GateQuery(
      "q80_assoc_rules",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        val part = t(s, dir, "part").select("p_partkey", "p_brand")
        val baskets = li.join(broadcast(part),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
        graft.operators.AssocRules.pairRules(baskets, "basket", "item",
            minCount = 50L)
          .orderBy("antecedent", "consequent")
      },
      Some("""
        WITH pres AS (SELECT DISTINCT l_orderkey AS b, p_brand AS i
              FROM lineitem JOIN part ON l_partkey = p_partkey),
        nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_baskets
               FROM pres),
        ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM pres
               GROUP BY 1 HAVING COUNT(*) >= 50),
        fr AS (SELECT p.b, p.i FROM pres p JOIN ic ON p.i = ic.i),
        pc AS (SELECT l.i AS ia, r.i AS ib,
                 CAST(COUNT(*) AS BIGINT) AS n_pair
               FROM fr l JOIN fr r ON l.b = r.b AND l.i < r.i
               GROUP BY 1, 2 HAVING COUNT(*) >= 50),
        dd AS (SELECT ia AS a, ib AS c, n_pair FROM pc
               UNION ALL SELECT ib AS a, ia AS c, n_pair FROM pc)
        SELECT dd.a AS antecedent, dd.c AS consequent, dd.n_pair,
          ia.n_i AS n_a, ib.n_i AS n_b, nb.n_baskets,
          CAST(dd.n_pair AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE)
            AS support,
          CAST(dd.n_pair AS DOUBLE) / CAST(ia.n_i AS DOUBLE)
            AS confidence,
          CAST(nb.n_baskets AS DOUBLE) * CAST(dd.n_pair AS DOUBLE)
            / (CAST(ia.n_i AS DOUBLE) * CAST(ib.n_i AS DOUBLE)) AS lift
        FROM dd JOIN ic ia ON dd.a = ia.i JOIN ic ib ON dd.c = ib.i
        CROSS JOIN nb
        ORDER BY antecedent, consequent""")),

    // CUSUM changepoint scan over per-type daily event counts — Page's
    // statistic as an exact-integer ordered fold (deviations scaled by
    // n so the mean never materializes as a fraction); the oracle
    // replays the same fold with a list_reduce whose 8-slot BIGINT-list
    // accumulator is seeded by a prepended zero state (the q67
    // list-accumulator convention).
    GateQuery(
      "q81_cusum",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).cast("double").as("n_events"))
        graft.operators.Changepoint.cusum(daily, "event_type", "day",
            "n_events")
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (SELECT event_type,
                epoch_us(ts) // 86400000000 AS day,
                CAST(COUNT(*) AS BIGINT) * 1000000 AS vm
              FROM events GROUP BY 1, 2),
        g AS (SELECT event_type,
                list(struct_pack(o := day, v := vm) ORDER BY day) AS l,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(vm) AS BIGINT) AS sv
              FROM daily GROUP BY 1),
        f AS (SELECT event_type, n, sv,
            list_reduce(
              list_prepend(
                [CAST(NULL AS BIGINT), NULL, 0, 0, NULL, 0, 0, NULL],
                list_transform(l, e -> [e.o, e.v, NULL, NULL, NULL,
                                        NULL, NULL, NULL])),
              (acc, x) -> [
                NULL, NULL,
                greatest(0, acc[3] + (n*x[2] - sv)),
                greatest(acc[4], greatest(0, acc[3] + (n*x[2] - sv))),
                CASE WHEN greatest(0, acc[3] + (n*x[2] - sv)) > acc[4]
                     THEN x[1] ELSE acc[5] END,
                greatest(0, acc[6] + (sv - n*x[2])),
                greatest(acc[7], greatest(0, acc[6] + (sv - n*x[2]))),
                CASE WHEN greatest(0, acc[6] + (sv - n*x[2])) > acc[7]
                     THEN x[1] ELSE acc[8] END]) AS r
          FROM g)
        SELECT event_type, n AS n_points,
          CAST(sv AS DOUBLE) / (CAST(n * 1000000 AS DOUBLE)) AS mean,
          CAST(r[4] AS DOUBLE) / (CAST(n * 1000000 AS DOUBLE))
            AS s_pos_max,
          CASE WHEN r[4] > 0 THEN r[5] END AS pos_at,
          CAST(r[7] AS DOUBLE) / (CAST(n * 1000000 AS DOUBLE))
            AS s_neg_max,
          CASE WHEN r[7] > 0 THEN r[8] END AS neg_at
        FROM f ORDER BY event_type""")),

    // Equal-frequency discretization of order totals into 8 bins,
    // reported as a per-bin profile (count, min, max). NTILE(8) would
    // split tie runs by physical row order — non-reproducible; the
    // mid-rank bin is pure integer arithmetic over per-value counts
    // (no global sort), and boundaries land identically in any engine.
    GateQuery(
      "q82_quantile_bins",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("price", col("o_totalprice").cast("double"))
        graft.operators.CdfTransform.quantileBins(o, "price", 8)
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            min("price").as("lo"), max("price").as("hi"))
          .orderBy("bin")
      },
      Some("""
        WITH c AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
                CAST(COUNT(*) AS BIGINT) AS eq
              FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        w AS (SELECT v, eq,
                SUM(eq) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) - eq AS lt,
                SUM(eq) OVER () AS n
              FROM c),
        b AS (SELECT v, eq,
                CAST(least(7, (2*lt + eq) * 8 // (2*n)) AS BIGINT) AS bin
              FROM w)
        SELECT bin, CAST(SUM(eq) AS BIGINT) AS n,
               MIN(v) AS lo, MAX(v) AS hi
        FROM b GROUP BY bin ORDER BY bin""")),

    // Mergeable quantile sketch in its EXACT regime: per return flag,
    // graft_quantiles over the 1..50-valued quantity column (50
    // distinct << capacity 128 — compaction never fires, the summary
    // IS the value histogram and the order statistics are exact). The
    // approximate regime is spec-bounded; the exact regime is the
    // driver-checked contract, same split as the X35/X42 frequency
    // sketch.
    GateQuery(
      "t41_quantile_sketch",
      (s, dir) => {
        import graft.functions.TextFunctions.quantileSketch
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(quantileSketch(col("l_quantity").cast("long"), 128,
            Seq(0.25, 0.5, 0.75, 0.9)).as("s"))
          .select(col("l_returnflag"),
            col("s.n_total").as("n_total"),
            col("s.n_entries").as("n_entries"),
            col("s.exact").cast("boolean").as("exact"),
            element_at(col("s.values"), 1).as("q25"),
            element_at(col("s.values"), 2).as("q50"),
            element_at(col("s.values"), 3).as("q75"),
            element_at(col("s.values"), 4).as("q90"))
          .orderBy("l_returnflag")
      },
      Some("""
        WITH c AS (SELECT l_returnflag AS g,
                CAST(l_quantity AS BIGINT) AS v,
                CAST(COUNT(*) AS BIGINT) AS eq
              FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        w AS (SELECT g, v, eq,
                SUM(eq) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                SUM(eq) OVER (PARTITION BY g) AS n
              FROM c),
        q AS (SELECT g, CAST(MAX(n) AS BIGINT) AS n_total,
                CAST(COUNT(*) AS BIGINT) AS n_entries,
                MIN(CASE WHEN cum >= CAST(ceil(0.25 * n) AS BIGINT)
                    THEN v END) AS q25,
                MIN(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
                    THEN v END) AS q50,
                MIN(CASE WHEN cum >= CAST(ceil(0.75 * n) AS BIGINT)
                    THEN v END) AS q75,
                MIN(CASE WHEN cum >= CAST(ceil(0.9 * n) AS BIGINT)
                    THEN v END) AS q90
              FROM w GROUP BY g)
        SELECT g AS l_returnflag, n_total, n_entries,
               TRUE AS exact, q25, q50, q75, q90
        FROM q ORDER BY l_returnflag""")),

    // Code-vs-prose detection over the documents corpus — the modality
    // router upstream of the prose-calibrated quality rules. Map-only
    // plan (pure codegen'd string expressions, no exchange); every
    // signal is exact integer counting (translate-delete, line splits,
    // replace-delete) and the score a fixed IEEE combination, so the
    // full per-document frame replays bitwise.
    GateQuery(
      "t42_code_detect",
      (s, dir) =>
        graft.text.CodeDetect.score(
            t(s, dir, "documents").select("doc_id", "text"), "text")
          .select("doc_id", "n_chars_text", "symbol_chars", "n_lines",
            "indent_lines", "keyword_hits", "code_score", "is_code")
          .orderBy("doc_id"),
      Some {
        val kwTerms = graft.text.CodeDetect.Keywords.map { kw =>
          val esc = kw.replace("'", "''")
          s"(length(t) - length(replace(t, '$esc', ''))) // ${kw.length}"
        }.mkString(" + ")
        s"""WITH src AS (SELECT doc_id, COALESCE(text, '') AS t
           |      FROM documents),
           |m AS (SELECT doc_id,
           |        CAST(length(t) AS BIGINT) AS n_chars_text,
           |        CAST(length(t) - length(translate(t, '{}()[];=<>', ''))
           |          AS BIGINT) AS symbol_chars,
           |        CAST(len(string_split(t, chr(10))) AS BIGINT)
           |          AS n_lines,
           |        CAST(len(list_filter(string_split(t, chr(10)),
           |            x -> x LIKE '    %' OR substr(x, 1, 1) = chr(9)))
           |          AS BIGINT) AS indent_lines,
           |        CAST($kwTerms AS BIGINT) AS keyword_hits
           |      FROM src),
           |sc AS (SELECT doc_id, n_chars_text, symbol_chars, n_lines,
           |        indent_lines, keyword_hits,
           |        CASE WHEN n_chars_text = 0 THEN 0.0
           |             ELSE 1000.0 * CAST(symbol_chars AS DOUBLE)
           |                    / CAST(n_chars_text AS DOUBLE)
           |                + 1000.0 * CAST(indent_lines AS DOUBLE)
           |                    / CAST(n_lines AS DOUBLE)
           |                + 10.0 * CAST(keyword_hits AS DOUBLE)
           |                    * 1000.0 / CAST(n_chars_text AS DOUBLE)
           |        END AS code_score
           |      FROM m)
           |SELECT doc_id, n_chars_text, symbol_chars, n_lines,
           |  indent_lines, keyword_hits, code_score,
           |  code_score >= 80.0 AS is_code
           |FROM sc ORDER BY doc_id""".stripMargin
      }),

    // Mutual nearest neighbors over the embedding corpus through the
    // composed IVF→int8→exact-rerank path (the d11 configuration with
    // every vector as its own query): a pair survives only if each
    // vector is the OTHER's top-1 — the hub-free alignment filter. The
    // oracle replays centroid sampling, assignment, probing,
    // quantization, rerank, and the mutuality join stage by stage.
    GateQuery(
      "q83_mutual_nn",
      (s, dir) =>
        graft.similarity.MutualNn.ivfMutualTopOne(
            t(s, dir, "embeddings"), "vec_id", "embedding",
            nlist = 8, nprobe = 2)
          .orderBy("id_a", "id_b"),
      Some("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        cent AS (SELECT row_number() OVER (ORDER BY hk, vec_id) - 1
                     AS cid,
                   v AS cv, list_dot_product(v, v) AS cnorm
                 FROM (SELECT vec_id, v,
                         (vec_id * 2654435761) % 1000003 AS hk
                       FROM e ORDER BY hk, vec_id LIMIT 8)),
        asn AS (SELECT vec_id, v, cid FROM (
                  SELECT e.vec_id, e.v, cent.cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY cent.cnorm
                          - 2*list_dot_product(e.v, cent.cv),
                        cent.cid) AS rn
                  FROM e, cent) WHERE rn = 1),
        qz AS (SELECT vec_id, cid,
                 CASE WHEN amax = 0 THEN list_transform(v, x -> 0.0)
                      ELSE list_transform(v,
                        x -> floor(x * 127.0 / amax + 0.5))
                 END AS qv
               FROM (SELECT vec_id, cid, v,
                       list_reduce(list_prepend(0.0,
                           list_transform(v, x -> abs(x))),
                         (acc, x) -> greatest(acc, x)) AS amax
                     FROM asn)),
        n AS (SELECT vec_id, cid, qv,
                sqrt(list_dot_product(qv, qv)) AS nrm FROM qz),
        prb AS (SELECT qid, cid FROM (
                  SELECT q.vec_id AS qid, cent.cid,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY cent.cnorm
                          - 2*list_dot_product(q.v, cent.cv),
                        cent.cid) AS rn
                  FROM e q, cent) WHERE rn <= 2),
        sc AS (SELECT prb.qid, a.vec_id AS nid,
                 list_dot_product(qq.qv, a.qv) / (qq.nrm * a.nrm) AS sim
               FROM prb JOIN n a ON prb.cid = a.cid
                        JOIN n qq ON qq.vec_id = prb.qid
               WHERE prb.qid <> a.vec_id),
        r AS (SELECT qid, nid,
                row_number() OVER (PARTITION BY qid
                  ORDER BY sim DESC, nid) AS rnk
              FROM sc),
        r1 AS (SELECT qid, nid FROM r WHERE rnk = 1)
        SELECT a.qid AS id_a, a.nid AS id_b
        FROM r1 a JOIN r1 b ON a.nid = b.qid AND b.nid = a.qid
          AND a.qid < b.qid
        ORDER BY id_a, id_b""")),

    // Sparse TF-IDF cosine pairs through the term-partitioned inverted
    // index with a df cap — the lexical near-dup detector next to the
    // shingle/MinHash family. Weights are exact longs (milli-nat idf —
    // the quantization scale chosen so norms and dots stay below 2^53,
    // the q78 cross-engine cast bound); the only floats are two
    // correctly-rounded sqrts and one division.
    GateQuery(
      "t43_tfidf_pairs",
      (s, dir) =>
        graft.text.TfidfPairs.cosinePairs(
            t(s, dir, "documents"), "doc_id", "text",
            threshold = 0.5, maxDf = 50L)
          .orderBy("id_a", "id_b"),
      Some("""
        WITH tok AS (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\s+'),
                  t -> t <> '') AS toks
              FROM documents),
        occ AS (SELECT doc_id AS id, unnest(toks) AS term FROM tok),
        tf AS (SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM occ GROUP BY 1, 2),
        nd AS (SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS nd FROM tf),
        dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
                GROUP BY 1 HAVING COUNT(*) <= 50),
        w AS (SELECT tf.id, tf.term,
                tf.tf * CAST(floor(ln(CAST(nd.nd AS DOUBLE)
                    / CAST(dft.df AS DOUBLE)) * 1000.0 + 0.5) AS BIGINT)
                  AS w
              FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN nd),
        nrm AS (SELECT id, sqrt(CAST(SUM(w*w) AS DOUBLE)) AS nrm
                FROM w GROUP BY 1),
        dots AS (SELECT a.id AS id_a, b.id AS id_b,
                   CAST(SUM(a.w * b.w) AS BIGINT) AS dot
                 FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
                 GROUP BY 1, 2)
        SELECT d.id_a, d.id_b, d.dot,
          CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm) AS cos
        FROM dots d JOIN nrm na ON d.id_a = na.id
                    JOIN nrm nb ON d.id_b = nb.id
        WHERE CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm) >= 0.5
        ORDER BY id_a, id_b""")),

    // Log-likelihood keyness (Dunning's G²) of the English subcorpus
    // against the rest: which vocabulary is over-represented on each
    // side, calibrated at low expected counts where chi-square breaks.
    // Counts exact; each log factor micro-nat quantized; g2_micro an
    // exact long. One token pass, one (term, side) aggregation, totals
    // broadcast-crossed onto the vocabulary-sized table.
    GateQuery(
      "t44_keyness",
      (s, dir) =>
        graft.text.Keyness.g2(t(s, dir, "documents"), "text",
            col("lang") === "en", minCount = 5L)
          .orderBy("term"),
      Some("""
        WITH tok AS (SELECT lang = 'en' AS f,
                list_filter(regexp_split_to_array(lower(text), '\s+'),
                  t -> t <> '') AS toks
              FROM documents),
        occ AS (SELECT f, unnest(toks) AS term FROM tok),
        c AS (SELECT term,
                CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS a,
                CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS b
              FROM occ GROUP BY 1 HAVING COUNT(*) >= 5),
        tt AS (SELECT CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT)
                   AS na,
                 CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT)
                   AS nb
               FROM occ),
        k AS (SELECT term, a, b, na, nb,
                CAST(floor(ln(CAST(a AS DOUBLE)
                      * CAST(na + nb AS DOUBLE)
                      / (CAST(na AS DOUBLE) * CAST(a + b AS DOUBLE)))
                    * 1000000.0 + 0.5) AS BIGINT) AS la,
                CAST(floor(ln(CAST(b AS DOUBLE)
                      * CAST(na + nb AS DOUBLE)
                      / (CAST(nb AS DOUBLE) * CAST(a + b AS DOUBLE)))
                    * 1000000.0 + 0.5) AS BIGINT) AS lb
              FROM c CROSS JOIN tt),
        g AS (SELECT term, a, b, na, nb,
                2 * (CASE WHEN a > 0 THEN a * la ELSE 0 END
                   + CASE WHEN b > 0 THEN b * lb ELSE 0 END) AS g2m
              FROM k)
        SELECT term, a AS n_focus, b AS n_ref,
          CAST(g2m AS BIGINT) AS g2_micro,
          CAST(g2m AS DOUBLE) / 1000000.0 AS g2,
          CASE WHEN CAST(a AS DOUBLE) * CAST(nb AS DOUBLE)
                  > CAST(b AS DOUBLE) * CAST(na AS DOUBLE)
               THEN 'focus' ELSE 'reference' END AS overused
        FROM g ORDER BY term""")),

    // Degree assortativity of the co-purchase graph — the hubs-to-hubs
    // correlation that tells you whether k-core peeling (q79) or hub
    // capping is the right cleanup. Bipartite co-purchase graphs come
    // out disassortative; the gate pins the exact moments and the
    // fixed-IEEE Pearson shape over them.
    GateQuery(
      "q84_assortativity",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_partkey") + 1000000L).as("dst"))
          .distinct()
        graft.graph.Assortativity.degreeCorrelation(edges, "src", "dst")
          .orderBy("m2")
      },
      Some("""
        WITH e0 AS (SELECT DISTINCT o_custkey AS s,
                l_partkey + 1000000 AS d
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        sym AS (SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d
                FROM e0),
        deg AS (SELECT s AS id, CAST(COUNT(*) AS BIGINT) AS deg
                FROM sym GROUP BY 1),
        j AS (SELECT dx.deg AS x, dy.deg AS y
              FROM sym JOIN deg dx ON sym.s = dx.id
                       JOIN deg dy ON sym.d = dy.id),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
                CAST(SUM(x) AS BIGINT) AS sum_x,
                CAST(SUM(x*x) AS BIGINT) AS sum_xx,
                CAST(SUM(x*y) AS BIGINT) AS sum_xy
              FROM j)
        SELECT m2, sum_x, sum_xx, sum_xy,
          CASE WHEN CAST(m2 AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                  - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE) > 0.0
               THEN (CAST(m2 AS DOUBLE) * CAST(sum_xy AS DOUBLE)
                     - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                  / (CAST(m2 AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                     - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
          END AS assortativity
        FROM m ORDER BY m2""")),

    // Spark's NATIVE session_window in batch — the declarative twin of
    // the q31/d22 state-machine sessionization: windows merge while
    // event times fall within the gap of the running session end, and
    // the same expression runs unchanged over a stream (d27). Value
    // sums ride per-row micro-quantized longs (double accumulation
    // inside a merging window is order-dependent). The oracle is the
    // classic gaps-and-islands rewrite with an event_id tiebreak.
    GateQuery(
      "q85_session_window",
      (s, dir) =>
        graft.streaming.EventStreams.sessionWindowAggregate(
            t(s, dir, "events"), "30 minutes")
          .orderBy("user_id", "start_us"),
      Some("""
        WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS vm
              FROM events),
        l AS (SELECT *, LAG(tus) OVER (PARTITION BY user_id
                ORDER BY tus, event_id) AS prev FROM ev),
        b AS (SELECT *, CASE WHEN prev IS NULL
                  OR tus - prev >= 1800000000 THEN 1 ELSE 0 END AS brk
              FROM l),
        g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
                ORDER BY tus, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS sess FROM b)
        SELECT user_id,
          CAST(MIN(tus) AS BIGINT) AS start_us,
          CAST(MAX(tus) + 1800000000 AS BIGINT) AS end_us,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(SUM(vm) AS DOUBLE) / 1000000.0 AS value_sum
        FROM g GROUP BY user_id, sess
        ORDER BY user_id, start_us""")),

    // Interval union per user — events carry synthetic [ts, ts+dur)
    // exposure windows (dur from the event id, 10–70 min) and the
    // operator collapses overlaps into covered spans: the
    // exposure/uptime primitive where summing raw durations
    // double-counts. One window pass + one aggregation, exact integral
    // micros.
    GateQuery(
      "q86_interval_union",
      (s, dir) => {
        val iv = t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("ivs"),
          (unix_micros(col("ts")) +
            (col("event_id") % 7 + 1) * 600000000L).as("ive"))
        graft.operators.Intervals.mergeOverlaps(iv, "user_id",
            "ivs", "ive")
          .orderBy("user_id", "span_start")
      },
      Some("""
        WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                epoch_us(ts) + (event_id % 7 + 1) * 600000000 AS e
              FROM events),
        w AS (SELECT *, MAX(e) OVER (PARTITION BY user_id
                ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING) AS pmax FROM iv),
        b AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax
                THEN 1 ELSE 0 END AS brk FROM w),
        g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
                ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS isl FROM b)
        SELECT user_id,
          CAST(MIN(s) AS BIGINT) AS span_start,
          CAST(MAX(e) AS BIGINT) AS span_end,
          CAST(COUNT(*) AS BIGINT) AS n_merged,
          CAST(MAX(e) - MIN(s) AS BIGINT) AS covered
        FROM g GROUP BY user_id, isl
        ORDER BY user_id, span_start""")),

    // Nearest-mode as-of join — each purchase picks the CLOSER of its
    // latest-preceding and earliest-following click within ±1 h, ties
    // toward the backward side (the X1 family's third direction).
    // Still join-free: one union, one key exchange, two in-partition
    // window sorts. The oracle materializes both candidates per
    // purchase with the operator's exact tie rules and picks the same
    // side.
    GateQuery(
      "q87_asof_nearest",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t_us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            unix_micros(col("ts")).as("click_t_us"),
            col("value").as("click_value"))
        graft.operators.AsofJoin.nearest(purchases, clicks,
            keys = Seq("user_id"), leftTime = "t_us",
            rightTime = "click_t_us",
            payload = Seq("click_id", "click_t_us", "click_value"),
            rightOrder = Some("click_id"),
            toleranceMicros = Some(3600000000L))
          .orderBy("event_id")
      },
      Some("""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pt
              FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, event_id AS cid, epoch_us(ts) AS ct,
                CAST(value AS DOUBLE) AS cv
              FROM events WHERE event_type = 'click'),
        bk AS (SELECT p.event_id, p.user_id, p.pt, c.cid, c.ct, c.cv
               FROM p LEFT JOIN c ON p.user_id = c.user_id
                 AND c.ct <= p.pt
               QUALIFY row_number() OVER (PARTITION BY p.event_id
                 ORDER BY c.ct DESC NULLS LAST, c.cid DESC) = 1),
        fw AS (SELECT p.event_id, c.cid, c.ct, c.cv
               FROM p LEFT JOIN c ON p.user_id = c.user_id
                 AND c.ct >= p.pt
               QUALIFY row_number() OVER (PARTITION BY p.event_id
                 ORDER BY c.ct ASC NULLS LAST, c.cid ASC) = 1),
        pick AS (SELECT bk.event_id, bk.user_id, bk.pt,
                  CASE WHEN bk.ct IS NULL THEN fw.cid
                       WHEN fw.ct IS NULL THEN bk.cid
                       WHEN fw.ct - bk.pt < bk.pt - bk.ct THEN fw.cid
                       ELSE bk.cid END AS cid,
                  CASE WHEN bk.ct IS NULL THEN fw.ct
                       WHEN fw.ct IS NULL THEN bk.ct
                       WHEN fw.ct - bk.pt < bk.pt - bk.ct THEN fw.ct
                       ELSE bk.ct END AS ct,
                  CASE WHEN bk.ct IS NULL THEN fw.cv
                       WHEN fw.ct IS NULL THEN bk.cv
                       WHEN fw.ct - bk.pt < bk.pt - bk.ct THEN fw.cv
                       ELSE bk.cv END AS cv
                FROM bk JOIN fw ON bk.event_id = fw.event_id)
        SELECT event_id, user_id, CAST(pt AS BIGINT) AS t_us,
          CASE WHEN ct IS NOT NULL AND abs(ct - pt) <= 3600000000
               THEN cid END AS click_id,
          CASE WHEN ct IS NOT NULL AND abs(ct - pt) <= 3600000000
               THEN CAST(ct AS BIGINT) END AS click_t_us,
          CASE WHEN ct IS NOT NULL AND abs(ct - pt) <= 3600000000
               THEN cv END AS click_value
        FROM pick ORDER BY event_id""")),

    // Winsorization at the [p05, p95] empirical quantiles per return
    // flag — outlier capping with caps as EXACT order statistics from
    // the compressed value table (no sort, no interpolation), verified
    // through the per-flag census of clipped rows and the
    // decimal-exact sum of the capped column.
    GateQuery(
      "q88_winsorize",
      (s, dir) => {
        val capped = graft.operators.CdfTransform.winsorize(
          t(s, dir, "lineitem")
            .select(col("l_returnflag"),
              col("l_extendedprice").cast("double").as("price")),
          "price", 0.05, 0.95, Seq("l_returnflag"))
        capped.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(when(col("clipped") === -1, 1L).otherwise(0L)).as("n_lo"),
            sum(when(col("clipped") === 1, 1L).otherwise(0L)).as("n_hi"),
            min("price_capped").as("cap_lo"),
            max("price_capped").as("cap_hi"),
            GateQuery.dsum(col("price_capped")).as("sum_capped"))
          .orderBy("l_returnflag")
      },
      Some("""
        WITH v AS (SELECT l_returnflag AS g,
                CAST(l_extendedprice AS DOUBLE) AS price
              FROM lineitem),
        c AS (SELECT g, price, CAST(COUNT(*) AS BIGINT) AS eq
              FROM v WHERE price IS NOT NULL GROUP BY 1, 2),
        w AS (SELECT g, price, eq,
                SUM(eq) OVER (PARTITION BY g ORDER BY price ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                SUM(eq) OVER (PARTITION BY g) AS n
              FROM c),
        caps AS (SELECT g,
                   MIN(CASE WHEN cum >= greatest(1,
                       CAST(ceil(0.05 * n) AS BIGINT))
                     THEN price END) AS lo,
                   MIN(CASE WHEN cum >= greatest(1,
                       CAST(ceil(0.95 * n) AS BIGINT))
                     THEN price END) AS hi
                 FROM w GROUP BY g),
        x AS (SELECT v.g, v.price,
                CASE WHEN v.price < caps.lo THEN caps.lo
                     WHEN v.price > caps.hi THEN caps.hi
                     ELSE v.price END AS capped,
                CASE WHEN v.price < caps.lo THEN -1
                     WHEN v.price > caps.hi THEN 1 ELSE 0 END AS clip
              FROM v JOIN caps ON v.g = caps.g)
        SELECT g AS l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN clip = -1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_lo,
          CAST(SUM(CASE WHEN clip = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_hi,
          MIN(capped) AS cap_lo, MAX(capped) AS cap_hi,
          CAST(SUM(CAST(capped AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_capped
        FROM x GROUP BY g ORDER BY l_returnflag""")),

    // Type-1 MERGE/upsert — today's extract applied to the running
    // table in one full-outer key join with an auditable action
    // column: matched rows take the source version, new keys insert,
    // unmatched targets survive. The current-state complement to the
    // history-keeping SCD2 (q53); bucket both sides on the key at
    // scale and the exchange disappears.
    GateQuery(
      "q89_merge_upsert",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val extract = base.filter(col("doc_id") % 3 === 0)
          .withColumn("n_chars", col("n_chars") + 1000L)
          .unionByName(base.filter(col("doc_id") < 20)
            .withColumn("doc_id", col("doc_id") + 100000L))
        graft.operators.Merge.upsert(base, extract, Seq("doc_id"))
          .orderBy("doc_id")
      },
      Some("""
        WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
        extract AS (
          SELECT doc_id, lang, n_chars + 1000 AS n_chars FROM base
          WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, lang, n_chars FROM base
          WHERE doc_id < 20)
        SELECT COALESCE(b.doc_id, e.doc_id) AS doc_id,
          CASE WHEN e.doc_id IS NOT NULL THEN e.lang ELSE b.lang END
            AS lang,
          CASE WHEN e.doc_id IS NOT NULL THEN e.n_chars
               ELSE b.n_chars END AS n_chars,
          CASE WHEN b.doc_id IS NOT NULL AND e.doc_id IS NOT NULL
                 THEN 'updated'
               WHEN e.doc_id IS NOT NULL THEN 'inserted'
               ELSE 'kept' END AS action
        FROM base b FULL OUTER JOIN extract e ON b.doc_id = e.doc_id
        ORDER BY doc_id""")),

    // Trailing-7-day distinct actives per day (the WAU curve) — exact
    // sliding DISTINCT via the presence smear: each (user, day)
    // presence row contributes to ≤ 7 report days, one explode + one
    // distinct + one count instead of 7 re-scans per day or an HLL
    // approximation. The reference's DAU/MAU machinery
    // (utils.py:16,34-43) re-expressed as a single declarative pass.
    GateQuery(
      "q90_rolling_actives",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        graft.operators.Engagement.rollingActives(ev, "user_id", "day",
            windowDays = 7)
          .orderBy("day")
      },
      Some("""
        WITH pres AS (SELECT DISTINCT user_id AS u,
                epoch_us(ts) // 86400000000 AS d
              FROM events),
        bounds AS (SELECT MAX(d) AS d_max FROM pres),
        sm AS (SELECT DISTINCT u, d + g.x AS day
               FROM pres, (SELECT unnest(range(0, 7)) AS x) g)
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active
        FROM sm, bounds WHERE day <= d_max
        GROUP BY day ORDER BY day""")),

    // Volume-weighted price quantiles per return flag — order
    // statistics where every unit of quantity votes, selected by the
    // PURE-INTEGER rule 100·cumW ≥ p·W (no ceil/epsilon ambiguity, so
    // both engines pick the identical value for any percentile).
    GateQuery(
      "q91_weighted_quantiles",
      (s, dir) =>
        graft.operators.CdfTransform.weightedQuantiles(
            t(s, dir, "lineitem")
              .select(col("l_returnflag"),
                col("l_extendedprice").cast("double").as("price"),
                col("l_quantity").cast("long").as("qty")),
            "price", "qty", Seq(25, 50, 75, 90), Seq("l_returnflag"))
          .orderBy("l_returnflag"),
      Some("""
        WITH c AS (SELECT l_returnflag AS g,
                CAST(l_extendedprice AS DOUBLE) AS v,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
              FROM lineitem
              WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
              GROUP BY 1, 2),
        r AS (SELECT g, v, w,
                SUM(w) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                SUM(w) OVER (PARTITION BY g) AS tot
              FROM c)
        SELECT g AS l_returnflag, CAST(MAX(tot) AS BIGINT) AS w_total,
          MIN(CASE WHEN cum * 100 >= 25 * tot THEN v END) AS p25,
          MIN(CASE WHEN cum * 100 >= 50 * tot THEN v END) AS p50,
          MIN(CASE WHEN cum * 100 >= 75 * tot THEN v END) AS p75,
          MIN(CASE WHEN cum * 100 >= 90 * tot THEN v END) AS p90
        FROM r GROUP BY g ORDER BY l_returnflag""")),

    // Fixed-target CUSUM through the CHUNKED fold (chunkSize 7 forces
    // several carried-state hops over the 30-day series) — gating the
    // carry logic end-to-end: the left fold re-associates over chunks
    // without touching the arithmetic, so the oracle is the UNCHUNKED
    // fold (the q49/q42 chunked-EWMA convention). Target mean is a
    // fixed baseline literal, the causal monitoring form a daily
    // ingest can actually run.
    GateQuery(
      "q92_cusum_fixed",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).cast("double").as("n_events"))
        graft.operators.Changepoint.cusumFixedChunked(daily,
            "event_type", "day", "n_events", targetMean = 66.0,
            chunkSize = 7)
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (SELECT event_type,
                epoch_us(ts) // 86400000000 AS day,
                CAST(COUNT(*) AS BIGINT) * 1000000 AS vm
              FROM events GROUP BY 1, 2),
        g AS (SELECT event_type,
                list(struct_pack(o := day, v := vm) ORDER BY day) AS l,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM daily GROUP BY 1),
        f AS (SELECT event_type, n,
            list_reduce(
              list_prepend(
                [CAST(NULL AS BIGINT), NULL, 0, 0, NULL, 0, 0, NULL],
                list_transform(l, e -> [e.o, e.v, NULL, NULL, NULL,
                                        NULL, NULL, NULL])),
              (acc, x) -> [
                NULL, NULL,
                greatest(0, acc[3] + (x[2] - 66000000)),
                greatest(acc[4], greatest(0, acc[3] + (x[2] - 66000000))),
                CASE WHEN greatest(0, acc[3] + (x[2] - 66000000)) > acc[4]
                     THEN x[1] ELSE acc[5] END,
                greatest(0, acc[6] + (66000000 - x[2])),
                greatest(acc[7], greatest(0, acc[6] + (66000000 - x[2]))),
                CASE WHEN greatest(0, acc[6] + (66000000 - x[2])) > acc[7]
                     THEN x[1] ELSE acc[8] END]) AS r
          FROM g)
        SELECT event_type, n AS n_points,
          CAST(r[4] AS DOUBLE) / 1000000.0 AS s_pos_max,
          CASE WHEN r[4] > 0 THEN r[5] END AS pos_at,
          CAST(r[7] AS DOUBLE) / 1000000.0 AS s_neg_max,
          CASE WHEN r[7] > 0 THEN r[8] END AS neg_at
        FROM f ORDER BY event_type""")),

    // Analytic-window surface suite: lag/lead, nth_value over the full
    // frame, dense_rank, and cume_dist in ONE window pass with a
    // unique (price, key) tie-break so every function is
    // deterministic. Completes the W-family coverage with the
    // less-travelled analytic functions.
    GateQuery(
      "q93_window_suite",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("double").as("price"))
        val byPk = Window.partitionBy("status")
          .orderBy(col("price"), col("o_orderkey"))
        val full = byPk.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        val byPrice = Window.partitionBy("status").orderBy(col("price"))
        o.select(col("o_orderkey"), col("status"), col("price"),
            lag("price", 1).over(byPk).as("prev_price"),
            lead("price", 1).over(byPk).as("next_price"),
            nth_value(col("price"), 3).over(full).as("third_lowest"),
            dense_rank().over(byPrice).as("price_dense_rank"),
            cume_dist().over(byPrice).as("price_cume_dist"))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH o AS (SELECT o_orderkey, o_orderstatus AS status,
                CAST(o_totalprice AS DOUBLE) AS price
              FROM orders WHERE o_orderkey % 97 = 0)
        SELECT o_orderkey, status, price,
          lag(price, 1) OVER wk AS prev_price,
          lead(price, 1) OVER wk AS next_price,
          nth_value(price, 3) OVER (PARTITION BY status
            ORDER BY price, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING
            AND UNBOUNDED FOLLOWING) AS third_lowest,
          CAST(dense_rank() OVER wp AS INT) AS price_dense_rank,
          cume_dist() OVER wp AS price_cume_dist
        FROM o
        WINDOW wk AS (PARTITION BY status ORDER BY price, o_orderkey),
               wp AS (PARTITION BY status ORDER BY price)
        ORDER BY o_orderkey""")),

    // Multiset set operations — INTERSECT ALL / EXCEPT ALL keep
    // duplicate multiplicity (min / truncated difference of counts),
    // which the q27 DISTINCT variants erase; the gate compares the
    // resulting multisets as grouped counts.
    GateQuery(
      "q94_setops_all",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"),
            col("l_quantity").cast("long").as("qty"))
        val a = li.filter(col("qty") % 2 === 0)
        val b = li.filter(col("qty") % 3 === 0)
        val ia = a.intersectAll(b).groupBy("flag", "qty")
          .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
        val ea = a.exceptAll(b).groupBy("flag", "qty")
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
        ia.unionByName(ea).orderBy("op", "flag", "qty")
      },
      Some("""
        WITH a AS (SELECT l_returnflag AS flag,
                CAST(l_quantity AS BIGINT) AS qty
              FROM lineitem WHERE CAST(l_quantity AS BIGINT) % 2 = 0),
        b AS (SELECT l_returnflag AS flag,
                CAST(l_quantity AS BIGINT) AS qty
              FROM lineitem WHERE CAST(l_quantity AS BIGINT) % 3 = 0),
        ia AS (SELECT flag, qty FROM a INTERSECT ALL
               SELECT flag, qty FROM b),
        ea AS (SELECT flag, qty FROM a EXCEPT ALL
               SELECT flag, qty FROM b),
        u AS (SELECT flag, qty, CAST(COUNT(*) AS BIGINT) AS n,
                'intersect' AS op FROM ia GROUP BY 1, 2
              UNION ALL
              SELECT flag, qty, CAST(COUNT(*) AS BIGINT) AS n,
                'except' AS op FROM ea GROUP BY 1, 2)
        SELECT flag, qty, n, op FROM u ORDER BY op, flag, qty""")),

    // 1-D Wasserstein distance between the A- and R-flag quantity
    // distributions — the drift measure that charges TRANSPORT
    // distance where PSI/JS treat bins as unordered symbols. Exact
    // integer numerator (|cumA·WB − cumB·WA|·gap summed over the
    // merged value axis), one double division at the end.
    GateQuery(
      "q95_wasserstein",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        graft.text.Divergence.wasserstein1(
            li.filter(col("l_returnflag") === "A")
              .select(col("l_quantity").as("v")),
            li.filter(col("l_returnflag") === "R")
              .select(col("l_quantity").as("v")),
            "v")
          .orderBy("n_values")
      },
      Some("""
        WITH ca AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                CAST(COUNT(*) AS BIGINT) AS ca
              FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1),
        cb AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                CAST(COUNT(*) AS BIGINT) AS cb
              FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
        m AS (SELECT COALESCE(ca.v, cb.v) AS v,
                COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
              FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        st AS (SELECT v, ca, cb,
                SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS cuma,
                SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS cumb,
                SUM(ca) OVER () AS wa, SUM(cb) OVER () AS wb,
                COALESCE(lead(v, 1) OVER (ORDER BY v) - v, 0) AS gap
              FROM m)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
          CAST(MAX(wa) AS BIGINT) AS wa, CAST(MAX(wb) AS BIGINT) AS wb,
          CAST(SUM(abs(cuma * wb - cumb * wa) * gap) AS BIGINT)
            AS emd_num,
          CASE WHEN MAX(wa) > 0 AND MAX(wb) > 0
               THEN CAST(SUM(abs(cuma * wb - cumb * wa) * gap)
                      AS DOUBLE)
                  / (CAST(MAX(wa) AS DOUBLE) * CAST(MAX(wb) AS DOUBLE))
          END AS emd
        FROM st ORDER BY n_values""")),

    // Embedding centroid drift per label between two snapshots
    // (vec_id parity): the vector-space drift leg — cosine between
    // snapshot mean embeddings from milli-quantized exact-integer
    // moments (cosine of sums = cosine of means).
    GateQuery(
      "d28_centroid_drift",
      (s, dir) =>
        graft.similarity.EmbeddingDrift.centroidCosine(
            t(s, dir, "embeddings")
              .withColumn("snap_a", col("vec_id") % 2 === 0),
            "label", "snap_a", "embedding")
          .orderBy("label"),
      Some("""
        WITH raw AS (SELECT label, vec_id,
                generate_subscripts(embedding, 1) AS dim,
                unnest(embedding) AS comp
              FROM embeddings WHERE embedding IS NOT NULL),
        cells AS (SELECT label, vec_id % 2 = 0 AS a, dim,
                CAST(floor(CAST(comp AS DOUBLE) * 1000.0 + 0.5)
                  AS BIGINT) AS m
              FROM raw),
        perdim AS (SELECT label, dim,
                CAST(SUM(CASE WHEN a THEN m ELSE 0 END) AS BIGINT)
                  AS sa,
                CAST(SUM(CASE WHEN a THEN 0 ELSE m END) AS BIGINT)
                  AS sb
              FROM cells GROUP BY 1, 2),
        mom AS (SELECT label, CAST(SUM(sa*sb) AS BIGINT) AS dot,
                CAST(SUM(sa*sa) AS BIGINT) AS norm2_a,
                CAST(SUM(sb*sb) AS BIGINT) AS norm2_b
              FROM perdim GROUP BY 1),
        cnt AS (SELECT label,
                CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
                CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_b
              FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1)
        SELECT c.label, n_a, n_b, dot, norm2_a, norm2_b,
          CASE WHEN norm2_a > 0 AND norm2_b > 0
               THEN CAST(dot AS DOUBLE)
                  / (sqrt(CAST(norm2_a AS DOUBLE))
                     * sqrt(CAST(norm2_b AS DOUBLE))) END
            AS centroid_cos
        FROM cnt c JOIN mom USING (label) ORDER BY label""")),

    // Wald's SPRT over each variant's purchase stream — the
    // always-valid sequential A/B readout (a fixed-horizon test peeked
    // daily is invalid; the LLR walk with Wald boundaries is designed
    // to be read after every observation). Bernoulli LLR is linear in
    // the conversion count, so the walk is ONE running-sum window and
    // crossing detection pure integer comparison; the micro-nat
    // constants are shared verbatim with the oracle (the Benford
    // convention).
    GateQuery(
      "q96_sprt",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select((col("user_id") % 2).as("variant"), col("event_id"),
            (col("event_type") === "purchase").cast("int").as("converted"))
        graft.operators.Sprt.bernoulli(ev, "variant", "event_id",
            "converted", p0 = 0.10, p1 = 0.15)
          .orderBy("variant")
      },
      Some {
        val a = graft.operators.Sprt.llrA(0.10, 0.15)
        val b = graft.operators.Sprt.llrB(0.10, 0.15)
        val up = graft.operators.Sprt.upperBound(0.05, 0.05)
        val lo = graft.operators.Sprt.lowerBound(0.05, 0.05)
        s"""WITH ev AS (SELECT user_id % 2 AS variant, event_id,
           |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
           |          AS x
           |      FROM events),
           |w AS (SELECT variant, event_id,
           |        ROW_NUMBER() OVER (PARTITION BY variant
           |          ORDER BY event_id) AS k,
           |        SUM(x) OVER (PARTITION BY variant ORDER BY event_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |          AS conv
           |      FROM ev),
           |l AS (SELECT variant, event_id, k, conv,
           |        $a * conv + ($b) * (k - conv) AS llr FROM w),
           |ag AS (SELECT variant, CAST(MAX(k) AS BIGINT) AS n_obs,
           |         CAST(MAX(conv) AS BIGINT) AS n_conv,
           |         CAST(max_by(llr, k) AS BIGINT) AS llr_final_micro,
           |         MIN(CASE WHEN llr >= $up THEN event_id END)
           |           AS up_at,
           |         MIN(CASE WHEN llr <= $lo THEN event_id END)
           |           AS lo_at
           |       FROM l GROUP BY 1)
           |SELECT variant, n_obs, n_conv, llr_final_micro,
           |  CASE WHEN up_at IS NOT NULL
           |         AND (lo_at IS NULL OR up_at <= lo_at)
           |       THEN 'accept_h1'
           |       WHEN lo_at IS NOT NULL THEN 'accept_h0'
           |       ELSE 'continue' END AS decision,
           |  CASE WHEN up_at IS NOT NULL
           |         AND (lo_at IS NULL OR up_at <= lo_at)
           |       THEN up_at ELSE lo_at END AS decided_at
           |FROM ag ORDER BY variant""".stripMargin
      }),

    // BPE first-merge table — the pair counts tokenizer induction
    // learns from: word-internal adjacent character pairs over the
    // lowercased corpus, top-20 by (count DESC, pair ASC). One
    // character-pair Generate pass; the shuffle carries bigram cells,
    // never text.
    GateQuery(
      "t47_bpe_pairs",
      (s, dir) =>
        graft.text.Bpe.topPairs(t(s, dir, "documents"), "text",
            k = 20, minCount = 2L)
          .orderBy("rank"),
      Some("""
        WITH tok AS (SELECT unnest(list_filter(
                regexp_split_to_array(lower(text), '\s+'),
                t -> len(t) >= 2)) AS tok
              FROM documents),
        pairs AS (SELECT unnest(list_transform(
                range(1, length(tok)), i -> substr(tok, i, 2))) AS pair
              FROM tok),
        c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM pairs GROUP BY 1 HAVING COUNT(*) >= 2),
        r AS (SELECT pair, cnt, CAST(row_number() OVER (
                ORDER BY cnt DESC, pair ASC) AS BIGINT) AS rank
              FROM c)
        SELECT rank, pair, cnt FROM r WHERE rank <= 20
        ORDER BY rank""")),

    // Least-squares trend per event type: slope of daily event counts
    // over the day index — the "how fast is this metric drifting"
    // number, from one moments pass at milli quantization (day·count
    // products at micro would cross the 2^53 cast bound).
    GateQuery(
      "q98_trendline",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).cast("double").as("n_events"))
          .withColumn("day_d", col("day").cast("double"))
        graft.operators.Trendline.fit(daily, "event_type", "day_d",
            "n_events", quantScale = 1000.0)
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (SELECT event_type,
                epoch_us(ts) // 86400000000 AS day,
                CAST(COUNT(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1, 2),
        q AS (SELECT event_type,
                CAST(floor(CAST(day AS DOUBLE) * 1000.0 + 0.5)
                  AS BIGINT) AS xm,
                CAST(floor(CAST(n_events AS DOUBLE) * 1000.0 + 0.5)
                  AS BIGINT) AS ym
              FROM daily),
        m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(xm) AS HUGEINT) AS sx,
                CAST(SUM(ym) AS HUGEINT) AS sy,
                SUM(CAST(xm AS HUGEINT) * ym) AS sxy,
                SUM(CAST(xm AS HUGEINT) * xm) AS sxx,
                SUM(CAST(ym AS HUGEINT) * ym) AS syy
              FROM q GROUP BY 1),
        k AS (SELECT event_type, n,
                CAST(n AS DOUBLE) AS nd,
                CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                CAST(sxy AS DOUBLE) AS sxyd,
                CAST(sxx AS DOUBLE) AS sxxd,
                CAST(syy AS DOUBLE) AS syyd
              FROM m)
        SELECT event_type, n,
          CASE WHEN sxxd - sxd * sxd / nd > 0.0
               THEN (sxyd - sxd * syd / nd) / (sxxd - sxd * sxd / nd)
          END AS slope,
          CASE WHEN sxxd - sxd * sxd / nd > 0.0
               THEN (syd / nd - ((sxyd - sxd * syd / nd)
                      / (sxxd - sxd * sxd / nd)) * (sxd / nd)) / 1000.0
          END AS intercept,
          CASE WHEN sxxd - sxd * sxd / nd > 0.0
                 AND syyd - syd * syd / nd > 0.0
               THEN (sxyd - sxd * syd / nd) * (sxyd - sxd * syd / nd)
                  / ((sxxd - sxd * sxd / nd) * (syyd - syd * syd / nd))
          END AS r2
        FROM k ORDER BY event_type""")),

    // Day-of-week seasonality index per event type: mean daily count
    // on each weekday vs the overall mean, as exact integer ratios
    // plus ONE fixed-shape double — the trends family's seasonal leg
    // (index 1.0 = no weekday effect).
    GateQuery(
      "q99_dow_seasonality",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("n_events"))
          .withColumn("dow", col("day") % 7)
        val perDow = daily.groupBy("event_type", "dow")
          .agg(count(lit(1)).as("n_days"), sum("n_events").as("sum_ev"))
        val overall = daily.groupBy("event_type")
          .agg(count(lit(1)).as("tot_days"), sum("n_events").as("tot_ev"))
        perDow.join(overall, "event_type")
          .select(col("event_type"), col("dow"), col("n_days"),
            col("sum_ev"), col("tot_days"), col("tot_ev"),
            ((col("sum_ev") * col("tot_days")).cast("double") /
              (col("n_days") * col("tot_ev")).cast("double"))
              .as("seasonality_index"))
          .orderBy("event_type", "dow")
      },
      Some("""
        WITH daily AS (SELECT event_type,
                epoch_us(ts) // 86400000000 AS day,
                CAST(COUNT(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1, 2),
        d2 AS (SELECT event_type, day % 7 AS dow, n_events FROM daily),
        per AS (SELECT event_type, dow,
                 CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(n_events) AS BIGINT) AS sum_ev
               FROM d2 GROUP BY 1, 2),
        org AS (SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS tot_days,
                 CAST(SUM(n_events) AS BIGINT) AS tot_ev
               FROM d2 GROUP BY 1)
        SELECT p.event_type, p.dow, p.n_days, p.sum_ev,
          o.tot_days, o.tot_ev,
          CAST(p.sum_ev * o.tot_days AS DOUBLE)
            / CAST(p.n_days * o.tot_ev AS DOUBLE) AS seasonality_index
        FROM per p JOIN org o ON p.event_type = o.event_type
        ORDER BY p.event_type, dow""")),

    // Zipf-law fit of the token frequency distribution — the corpus
    // "law" check (natural text slopes near −1; generated/templated
    // text deviates): OLS of ln(freq) on ln(rank) over the top-100
    // terms, composing the X133 trend line over micro-nat-quantized
    // logs (both axes exact longs; top-100 keeps the moment products
    // inside the 2^53 bound; rank cut pinned by (count DESC, term)).
    GateQuery(
      "t48_zipf",
      (s, dir) => {
        import graft.functions.TextFunctions._
        val counts = t(s, dir, "documents")
          .select(explode(tokens(lower(col("text")))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
        val ranked = counts
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cnt").desc, col("term"))).cast("long"))
          .filter(col("rank") <= 100)
          .select(
            (floor(log(col("rank").cast("double")) * lit(1000000.0) +
              lit(0.5)) / lit(1000000.0)).as("ln_rank"),
            (floor(log(col("cnt").cast("double")) * lit(1000000.0) +
              lit(0.5)) / lit(1000000.0)).as("ln_freq"))
          .withColumn("g", lit("corpus"))
        graft.operators.Trendline.fit(ranked, "g", "ln_rank", "ln_freq")
          .select(col("g").as("corpus"), col("n"),
            col("slope").as("zipf_slope"), col("intercept"), col("r2"))
          .orderBy("corpus")
      },
      Some("""
        WITH tok AS (SELECT list_filter(
                regexp_split_to_array(lower(text), '\s+'),
                t -> t <> '') AS toks FROM documents),
        occ AS (SELECT unnest(toks) AS term FROM tok),
        c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM occ GROUP BY 1),
        r AS (SELECT cnt, row_number() OVER (
                ORDER BY cnt DESC, term) AS rank FROM c),
        pts AS (SELECT
                 CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5)
                   AS BIGINT) AS xm,
                 CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5)
                   AS BIGINT) AS ym
               FROM r WHERE rank <= 100),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(xm) AS HUGEINT) AS sx,
                CAST(SUM(ym) AS HUGEINT) AS sy,
                SUM(CAST(xm AS HUGEINT) * ym) AS sxy,
                SUM(CAST(xm AS HUGEINT) * xm) AS sxx,
                SUM(CAST(ym AS HUGEINT) * ym) AS syy
              FROM pts),
        k AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                CAST(sxy AS DOUBLE) AS sxyd,
                CAST(sxx AS DOUBLE) AS sxxd,
                CAST(syy AS DOUBLE) AS syyd
              FROM m)
        SELECT 'corpus' AS corpus, n,
          CASE WHEN sxxd - sxd * sxd / nd > 0.0
               THEN (sxyd - sxd * syd / nd) / (sxxd - sxd * sxd / nd)
          END AS zipf_slope,
          CASE WHEN sxxd - sxd * sxd / nd > 0.0
               THEN (syd / nd - ((sxyd - sxd * syd / nd)
                      / (sxxd - sxd * sxd / nd)) * (sxd / nd))
                    / 1000000.0
          END AS intercept,
          CASE WHEN sxxd - sxd * sxd / nd > 0.0
                 AND syyd - syd * syd / nd > 0.0
               THEN (sxyd - sxd * syd / nd) * (sxyd - sxd * syd / nd)
                  / ((sxxd - sxd * sxd / nd) * (syyd - syd * syd / nd))
          END AS r2
        FROM k ORDER BY corpus""")),

    // Per-document lexical diversity: type-token ratio + corpus-hapax
    // density — templated text sits at low TTR, OCR noise and novelty
    // both surface as hapax spikes. One tokenize pass; the hapax set
    // is a vocabulary-sized aggregation semi-joined back.
    GateQuery(
      "t49_lexical_diversity",
      (s, dir) =>
        graft.text.CorpusStats.lexicalDiversity(
            t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id"),
      Some("""
        WITH tok AS (SELECT doc_id, list_filter(
                regexp_split_to_array(lower(text), '\s+'),
                t -> t <> '') AS toks FROM documents),
        occ AS (SELECT doc_id, unnest(toks) AS term FROM tok),
        per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(COUNT(DISTINCT term) AS BIGINT) AS n_types
               FROM occ GROUP BY 1),
        hx AS (SELECT term FROM occ GROUP BY term HAVING COUNT(*) = 1),
        hd AS (SELECT occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hapax
               FROM occ JOIN hx ON occ.term = hx.term GROUP BY 1)
        SELECT per.doc_id, n_tokens, n_types,
          CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
          COALESCE(hd.n_hapax, 0) AS n_hapax
        FROM per LEFT JOIN hd ON per.doc_id = hd.doc_id
        ORDER BY per.doc_id""")),

    // Cliff's delta effect size from the Mann-Whitney machinery:
    // δ = 2U/(n_a·n_b) − 1, the ordinal effect-size companion to the
    // q77 significance readout (a tiny p with negligible δ is the
    // classic big-data trap); pure exact-ratio arithmetic off the
    // doubled-U longs, with the conventional magnitude labels.
    GateQuery(
      "q101_cliffs_delta",
      (s, dir) => {
        val mw = graft.operators.Hypothesis.mannWhitney(
          t(s, dir, "lineitem"), "l_returnflag", "l_quantity")
        val nab = (col("n_a") * col("n_b")).cast("double")
        val delta = (col("u2").cast("double") - nab) / nab
        mw.select(col("group_a"), col("group_b"), col("n_a"),
            col("n_b"), col("u2"), delta.as("cliffs_delta"),
            when(abs(delta) < 0.147, "negligible")
              .when(abs(delta) < 0.33, "small")
              .when(abs(delta) < 0.474, "medium")
              .otherwise("large").as("magnitude"))
          .orderBy("group_a", "group_b")
      },
      Some("""
        WITH c AS (SELECT l_returnflag AS g,
                CAST(floor(CAST(l_quantity AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS v,
                CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        gs AS (SELECT DISTINCT g FROM c),
        pr AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b
               ON a.g < b.g),
        m AS (SELECT pr.ga, pr.gb, c.v,
                SUM(CASE WHEN c.g = pr.ga THEN c.cnt ELSE 0 END) AS ca,
                SUM(CASE WHEN c.g = pr.gb THEN c.cnt ELSE 0 END) AS cb
              FROM pr JOIN c ON c.g IN (pr.ga, pr.gb)
              GROUP BY 1, 2, 3),
        r AS (SELECT ga, gb, v, ca, cb, ca + cb AS cc,
                SUM(ca + cb) OVER (PARTITION BY ga, gb ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - (ca + cb) AS pp
              FROM m),
        a AS (SELECT ga, gb,
                CAST(SUM(ca) AS BIGINT) AS n_a,
                CAST(SUM(cb) AS BIGINT) AS n_b,
                CAST(SUM(ca * (2*pp + cc + 1)) AS BIGINT) AS r2a
              FROM r GROUP BY 1, 2),
        u AS (SELECT ga, gb, n_a, n_b,
                r2a - n_a * (n_a + 1) AS u2
              FROM a),
        dd AS (SELECT ga, gb, n_a, n_b, u2,
                (CAST(u2 AS DOUBLE)
                 - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS delta
              FROM u)
        SELECT ga AS group_a, gb AS group_b, n_a, n_b, u2,
          delta AS cliffs_delta,
          CASE WHEN abs(delta) < 0.147 THEN 'negligible'
               WHEN abs(delta) < 0.33 THEN 'small'
               WHEN abs(delta) < 0.474 THEN 'medium'
               ELSE 'large' END AS magnitude
        FROM dd ORDER BY group_a, group_b""")),

    // Uniformity audit of the q30 hash sampler: chi-square occupancy
    // of the 100 polyhash slices over orders — the check that the
    // deterministic sampling substrate is actually unbiased before any
    // slice-based sample is trusted. Exact integer observed counts;
    // expected as exact ratios; chi2 terms fixed IEEE shapes (the q72
    // Benford machinery applied to the engine's own sampler).
    GateQuery(
      "q102_sampler_uniformity",
      (s, dir) => {
        val sliced = t(s, dir, "orders")
          .withColumn("slice",
            graft.functions.TextFunctions.polyHash(
              col("o_orderkey").cast("string")) % 100)
        val per = sliced.groupBy("slice")
          .agg(count(lit(1)).as("n_observed"))
        val tot = per.agg(sum("n_observed").as("n_total"),
          count(lit(1)).as("n_slices"))
        per.crossJoin(broadcast(tot))
          .select(col("slice"), col("n_observed"), col("n_total"),
            ((col("n_observed").cast("double") -
              col("n_total").cast("double") /
                col("n_slices").cast("double")) *
              (col("n_observed").cast("double") -
                col("n_total").cast("double") /
                  col("n_slices").cast("double")) /
              (col("n_total").cast("double") /
                col("n_slices").cast("double"))).as("chi2_term"))
          .orderBy("slice")
      },
      Some("""
        WITH sl AS (SELECT
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(
                    string_split(CAST(o_orderkey AS VARCHAR), ''),
                    ch -> CAST(ascii(ch) AS BIGINT))),
                  (h, ch) -> (h*31 + ch) % 1000000007) % 100 AS slice
              FROM orders),
        per AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS n_observed
               FROM sl GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_observed) AS BIGINT) AS n_total,
                 CAST(COUNT(*) AS BIGINT) AS n_slices
               FROM per)
        SELECT slice, n_observed, n_total,
          (CAST(n_observed AS DOUBLE)
             - CAST(n_total AS DOUBLE) / CAST(n_slices AS DOUBLE))
          * (CAST(n_observed AS DOUBLE)
             - CAST(n_total AS DOUBLE) / CAST(n_slices AS DOUBLE))
          / (CAST(n_total AS DOUBLE) / CAST(n_slices AS DOUBLE))
            AS chi2_term
        FROM per CROSS JOIN tot ORDER BY slice""")),

    // N-gram novelty in ingestion order: the fraction of a document's
    // distinct trigrams whose FIRST corpus occurrence is this document
    // (attribution by min doc_id — deterministic, order-defined).
    // High novelty = genuinely new material; low = recombination of
    // what the corpus already holds. One shingle pass + one
    // vocabulary-sized first-seen aggregation joined back.
    GateQuery(
      "t50_ngram_novelty",
      (s, dir) => {
        val sets = graft.dedup.NearDup.shingleSets(
          t(s, dir, "documents"), "doc_id", "text", 3)
        val occ = sets.select(col("id"),
          explode(col("shingle_set")).as("g"))
        val firstSeen = occ.groupBy("g").agg(min("id").as("first_id"))
        occ.join(firstSeen, "g")
          .groupBy(col("id").as("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("id") === col("first_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col("doc_id"), col("n_grams"), col("n_novel"),
            (col("n_novel").cast("double") / col("n_grams").cast("double"))
              .as("novelty"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (SELECT doc_id, list_filter(
                regexp_split_to_array(text, '\s+'), t -> t <> '')
                AS toks FROM documents),
        sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(range(1, len(toks)-1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                 ELSE toks END) AS ss FROM tok),
        sets AS (SELECT doc_id, ss FROM sh WHERE len(ss) > 0),
        occ AS (SELECT doc_id AS id, unnest(ss) AS g FROM sets),
        fs AS (SELECT g, MIN(id) AS first_id FROM occ GROUP BY 1)
        SELECT occ.id AS doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_grams,
          CAST(SUM(CASE WHEN occ.id = fs.first_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
          CAST(SUM(CASE WHEN occ.id = fs.first_id THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
        FROM occ JOIN fs ON occ.g = fs.g
        GROUP BY occ.id ORDER BY doc_id""")),

    // Stickiness (DAU/WAU): the engagement-intensity ratio composed
    // from two presence-smear curves — per day, what fraction of the
    // week's actives showed up today. Exact integer actives on both
    // sides, one fixed-shape division.
    GateQuery(
      "q103_stickiness",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val dau = graft.operators.Engagement.rollingActives(
          ev, "user_id", "day", windowDays = 1)
          .select(col("day"), col("n_active").as("dau"))
        val wau = graft.operators.Engagement.rollingActives(
          ev, "user_id", "day", windowDays = 7)
          .select(col("day"), col("n_active").as("wau"))
        dau.join(wau, "day")
          .select(col("day"), col("dau"), col("wau"),
            (col("dau").cast("double") / col("wau").cast("double"))
              .as("stickiness"))
          .orderBy("day")
      },
      Some("""
        WITH pres AS (SELECT DISTINCT user_id AS u,
                epoch_us(ts) // 86400000000 AS d
              FROM events),
        bounds AS (SELECT MAX(d) AS d_max FROM pres),
        dau AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau
               FROM pres GROUP BY 1),
        sm AS (SELECT DISTINCT u, d + g.x AS day
               FROM pres, (SELECT unnest(range(0, 7)) AS x) g),
        wau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS wau
               FROM sm, bounds WHERE day <= d_max GROUP BY day)
        SELECT dau.day, dau.dau, wau.wau,
          CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
            AS stickiness
        FROM dau JOIN wau ON dau.day = wau.day
        ORDER BY dau.day""")),

    // Week-over-week net revenue retention: for each week, the prior
    // week's active cohort's revenue this week over their revenue last
    // week — the expansion/contraction gauge (NRR > 1 = the existing
    // base grew). Per-event micro-quantized value sums keep both
    // numerator and denominator exact; one self-join on (user,
    // adjacent week).
    GateQuery(
      "q104_revenue_retention",
      (s, dir) => {
        val weekly = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("week"))
          .agg(sum(floor(col("value").cast("double") * lit(1000000.0) +
            lit(0.5)).cast("long")).as("rev_micro"))
        val prev = weekly.select(col("user_id"),
          (col("week") + 1L).as("week"),
          col("rev_micro").as("prev_micro"))
        prev.join(weekly, Seq("user_id", "week"), "left")
          .groupBy("week")
          .agg(count(lit(1)).as("n_cohort"),
            sum("prev_micro").as("base_micro"),
            sum(coalesce(col("rev_micro"), lit(0L))).as("retained_micro"))
          .select(col("week"), col("n_cohort"), col("base_micro"),
            col("retained_micro"),
            (col("retained_micro").cast("double") /
              col("base_micro").cast("double")).as("nrr"))
          .orderBy("week")
      },
      Some("""
        WITH weekly AS (SELECT user_id,
                epoch_us(ts) // 604800000000 AS week,
                CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000.0
                  + 0.5) AS BIGINT)) AS BIGINT) AS rev_micro
              FROM events WHERE event_type = 'purchase'
              GROUP BY 1, 2),
        j AS (SELECT p.user_id, p.week + 1 AS week,
                p.rev_micro AS prev_micro, w.rev_micro
              FROM weekly p LEFT JOIN weekly w
                ON w.user_id = p.user_id AND w.week = p.week + 1)
        SELECT week, CAST(COUNT(*) AS BIGINT) AS n_cohort,
          CAST(SUM(prev_micro) AS BIGINT) AS base_micro,
          CAST(SUM(COALESCE(rev_micro, 0)) AS BIGINT) AS retained_micro,
          CAST(SUM(COALESCE(rev_micro, 0)) AS DOUBLE)
            / CAST(SUM(prev_micro) AS DOUBLE) AS nrr
        FROM j GROUP BY week ORDER BY week""")),

    // Burstiness (Fano factor) of daily event counts per type — the
    // overdispersion gauge separating Poisson-like arrivals (≈1) from
    // bursty traffic (>1): the WHOLE statistic is one exact integer
    // ratio, (n·Σx² − (Σx)²) / (n·Σx), emitted with its exact
    // numerator and denominator.
    GateQuery(
      "t51_burstiness",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"), col("sx"), col("sxx"),
            (col("n") * col("sxx") - col("sx") * col("sx"))
              .as("fano_num"),
            (col("n") * col("sx")).as("fano_den"),
            ((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") /
              (col("n") * col("sx")).cast("double")).as("fano"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (SELECT event_type,
                epoch_us(ts) // 86400000000 AS day,
                CAST(COUNT(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sx,
                CAST(SUM(x*x) AS BIGINT) AS sxx
              FROM daily GROUP BY 1)
        SELECT event_type, n, sx, sxx,
          CAST(n * sxx - sx * sx AS BIGINT) AS fano_num,
          CAST(n * sx AS BIGINT) AS fano_den,
          CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * sx AS DOUBLE)
            AS fano
        FROM m ORDER BY event_type"""))
  )
}
