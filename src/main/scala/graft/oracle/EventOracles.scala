package graft.oracle

import Ctes._

/** DuckDB oracle twins — event-stream and relational workloads: sessions,
  * windows, funnels, cohorts, as-of/range joins, and the TPC-H audit
  * queries.
  * Same column names/types/values as the SparkEntry.queries entries they
  * mirror; the driver hash-compares them per round. */
object EventOracles {
  val sql: Map[String, String] = Map(

    "retention_cohorts" ->
      """WITH fd AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        |            FROM events GROUP BY user_id),
        |ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |  CAST(day - cohort AS BIGINT) AS day_offset,
        |  CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_users
        |FROM ud JOIN fd USING (user_id)
        |GROUP BY fd.cohort, day - cohort""".stripMargin,


    "user_sessions" ->
      """WITH e AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |g AS (SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT CAST(user_id AS BIGINT) AS user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts) + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,


    "window_counts" ->
      """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,


    // the KMV bottom-32 by md5(event_id) per (hour, type), then the
    // nearest-rank pick over the (v, h)-sorted sample — all integer
    // selection over raw doubles
    "windowed_value_quantiles" ->
      """WITH ev AS (SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |    event_type, md5(CAST(event_id AS VARCHAR)) AS h, value::DOUBLE AS v
        |  FROM events),
        |smp AS (SELECT * FROM (SELECT window_start, event_type, h, v,
        |    row_number() OVER (PARTITION BY window_start, event_type ORDER BY h) AS hrk
        |  FROM ev) WHERE hrk <= 32),
        |tot AS (SELECT window_start, event_type, count(*) AS n FROM ev GROUP BY 1, 2),
        |r AS (SELECT window_start, event_type, v,
        |    row_number() OVER (PARTITION BY window_start, event_type ORDER BY v, h) AS rk,
        |    count(*) OVER (PARTITION BY window_start, event_type) AS ns FROM smp),
        |q AS (SELECT window_start, event_type, ns,
        |    max(CASE WHEN rk = 1 + (25*(ns-1))//100 THEN v END) AS p25,
        |    max(CASE WHEN rk = 1 + (50*(ns-1))//100 THEN v END) AS p50,
        |    max(CASE WHEN rk = 1 + (75*(ns-1))//100 THEN v END) AS p75
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT q.window_start, q.event_type, CAST(t.n AS BIGINT) AS n,
        |  CAST(q.ns AS BIGINT) AS n_sample, q.p25, q.p50, q.p75
        |FROM q JOIN tot t USING (window_start, event_type)""".stripMargin,


    // rank-window twin of the bounded graft_topk heap: same total order
    // (value desc, event_id asc); n counts every event in the group,
    // null values are skipped by the heap like the FILTER here
    "windowed_topk" ->
      """WITH ev AS (SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |    event_type, event_id, value::DOUBLE AS v
        |  FROM events),
        |tot AS (SELECT window_start, event_type, count(*) AS n FROM ev GROUP BY 1, 2),
        |r AS (SELECT window_start, event_type, event_id, v,
        |    row_number() OVER (PARTITION BY window_start, event_type
        |      ORDER BY v DESC, event_id ASC) AS rk
        |  FROM ev WHERE v IS NOT NULL)
        |SELECT r.window_start, r.event_type, CAST(t.n AS BIGINT) AS n,
        |  CAST(r.rk AS BIGINT) AS rk, CAST(r.event_id AS BIGINT) AS event_id,
        |  r.v AS value
        |FROM r JOIN tot t USING (window_start, event_type)
        |WHERE r.rk <= 5""".stripMargin,


    // the vocab_sketch HLL replay keyed by (hour window, event_type)
    // over user_id rendered as a decimal string — same register
    // arithmetic, same shared estimate expression
    "windowed_distinct" ->
      """WITH ev AS (SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |         event_type, user_id::VARCHAR AS u
        |  FROM events),
        |tot AS (SELECT window_start, event_type, count(*) AS n FROM ev GROUP BY 1, 2),
        |hh AS (SELECT DISTINCT window_start, event_type, md5(u) AS h FROM ev),
        |reg AS (SELECT window_start, event_type,
        |    (strpos('0123456789abcdef', substr(h,1,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(h,2,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(h,3,1))-1) AS idx,
        |    list_sum(list_transform(range(13), i ->
        |      (strpos('0123456789abcdef', substr(h, (4+i)::INT, 1))-1)::BIGINT << (4*(12-i))::INT)) AS tail
        |  FROM hh),
        |rk AS (SELECT window_start, event_type, idx,
        |    max(CASE WHEN tail = 0 THEN 53 ELSE 53 - length(format('{:b}', tail::BIGINT)) END) AS mj
        |  FROM reg GROUP BY 1, 2, 3),
        |agg AS (SELECT window_start, event_type, count(*) AS nonzero, sum(mj) AS rank_sum,
        |    sum(CAST(1::BIGINT << (53 - mj) AS HUGEINT))
        |      + CAST(4096 - count(*) AS HUGEINT) * CAST(1::BIGINT << 53 AS HUGEINT) AS s
        |  FROM rk GROUP BY 1, 2)
        |SELECT t.window_start, t.event_type, CAST(t.n AS BIGINT) AS n,
        |  CAST(a.nonzero AS BIGINT) AS nonzero_registers,
        |  CAST(a.rank_sum AS BIGINT) AS register_sum,
        |  round(CASE WHEN 4096 - a.nonzero > 0 AND
        |      0.7213 / (1 + 1.079/4096.0) * 4096.0 * 4096.0 * 9007199254740992.0 / a.s::DOUBLE <= 2.5 * 4096.0
        |    THEN 4096.0 * ln(4096.0 / (4096 - a.nonzero))
        |    ELSE 0.7213 / (1 + 1.079/4096.0) * 4096.0 * 4096.0 * 9007199254740992.0 / a.s::DOUBLE
        |  END, 4) AS est_users
        |FROM tot t JOIN agg a USING (window_start, event_type)""".stripMargin,


    "funnel_first" ->
      """WITH t AS (SELECT event_id AS trigger_id, user_id, ts AS t_ts
        |           FROM events WHERE event_type = 'click'),
        |     f AS (SELECT event_id AS follow_id, user_id, ts AS f_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     p AS (SELECT t.trigger_id, t.user_id, f.follow_id, t.t_ts, f.f_ts,
        |                  row_number() OVER (PARTITION BY t.trigger_id
        |                    ORDER BY f.f_ts, f.follow_id) AS rn
        |           FROM t JOIN f ON t.user_id = f.user_id
        |             AND f.f_ts > t.t_ts AND f.f_ts <= t.t_ts + INTERVAL 2 HOUR)
        |SELECT trigger_id, CAST(user_id AS BIGINT) AS user_id, follow_id,
        |       CAST(epoch_ms(f_ts) - epoch_ms(t_ts) AS BIGINT) AS lag_ms
        |FROM p WHERE rn = 1""".stripMargin,


    "asof_join" ->
      """SELECT l.event_id, l.user_id, r.event_id AS purchase_id,
        |       r.value AS purchase_value,
        |       strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts""".stripMargin,


    // per-user lead() bigrams -> types²-bounded counts + from-state
    // totals; all integers
    "event_transitions" ->
      """WITH p AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total
        |FROM c""".stripMargin,


    // per-user behavioral entropy: c·ln c in integer micros per type,
    // HUGEINT sum, one shared final expression — token_entropy's twin
    // doctrine on the events table
    "user_event_entropy" ->
      """WITH tf AS (SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT CAST(user_id AS BIGINT) AS user_id,
        |  CAST(sum(c) AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  round(ln(sum(c)) -
        |    sum(CAST(floor(c * ln(c) * 1000000.0 + 0.5) AS HUGEINT))::DOUBLE
        |      / 1000000.0 / sum(c)::DOUBLE, 6) AS entropy_nats
        |FROM tf GROUP BY user_id""".stripMargin,


    // winsorized per-type stats: nearest-rank p01/p99 cuts (ceil(n·q)
    // is the same IEEE double both sides), clamp, per-row integer
    // micros summed in HUGEINT, ONE shared double expression out — no
    // rounded mean (half-point class)
    "events_winsorized" ->
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |b AS (SELECT event_type,
        |    max(CASE WHEN rn = greatest(CAST(ceil(n*0.01) AS BIGINT), 1) THEN value END) AS lo,
        |    max(CASE WHEN rn = CAST(ceil(n*0.99) AS BIGINT) THEN value END) AS hi,
        |    CAST(max(n) AS BIGINT) AS n
        |  FROM r GROUP BY event_type)
        |SELECT e.event_type, b.n, b.lo, b.hi,
        |  round(sum(CAST(floor(least(greatest(e.value, b.lo), b.hi)*1000000 + 0.5) AS HUGEINT))::DOUBLE
        |    / 1000000.0, 6) AS wins_sum
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type, b.n, b.lo, b.hi""".stripMargin,


    // LOCF: one running last-non-null window per user, same
    // deterministic (ts, event_id) order as the Spark side; the value
    // double passes through unchanged
    "events_locf" ->
      """SELECT CAST(event_id AS BIGINT) AS event_id,
        |       CAST(user_id AS BIGINT) AS user_id,
        |       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
        |FROM events""".stripMargin,


    "range_join" ->
      """SELECT l.event_id AS event_id, r.event_id AS err_event_id
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id AND r.event_type = 'error'
        | AND l.ts >= r.ts AND l.ts <= r.ts + INTERVAL 1 HOUR
        | AND l.event_id <> r.event_id""".stripMargin,


    "top_orders_per_customer" ->
      """WITH t AS (
        |  SELECT CAST(3000000 + o_custkey AS BIGINT) AS customer,
        |         CAST(6000000 + o_orderkey AS BIGINT) AS order_v,
        |         o_totalprice AS totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        |  FROM orders)
        |SELECT customer, order_v, totalprice, rk FROM t WHERE rk <= 3""".stripMargin,


    "orders_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |       o_orderpriority AS priority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_year, priority)""".stripMargin,


    "orders_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS p1_urgent,
        |  CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS p2_high,
        |  CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3_medium,
        |  CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4_not_specified,
        |  CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS p5_low
        |FROM orders GROUP BY 1""".stripMargin,


    // rank-ordered deciles by the explicit integer cut, shares via
    // exact HUGEINT floor division — no float division anywhere
    "revenue_deciles" ->
      """WITH rev AS (SELECT CAST(o_custkey AS BIGINT) AS c,
        |    sum(CAST(floor(o_totalprice*1000000 + 0.5) AS BIGINT)) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT c, x, row_number() OVER (ORDER BY x, c) AS i,
        |    count(*) OVER () AS n FROM rev),
        |dec AS (SELECT ((i - 1) * 10) // n + 1 AS decile, x FROM r),
        |g AS (SELECT decile, count(*) AS n_customers,
        |    sum(CAST(x AS HUGEINT)) AS xs FROM dec GROUP BY decile),
        |tot AS (SELECT sum(xs) AS t FROM g)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(n_customers AS BIGINT) AS n_customers,
        |  CAST((xs * 1000000) // tot.t AS BIGINT) AS share_micro
        |FROM g, tot""".stripMargin,


    // per-order micros -> per-customer sums -> rank moments in HUGEINT,
    // floor(g*1e6) of the identical double (floor, never round)
    "gini_revenue" ->
      """WITH rev AS (SELECT CAST(o_custkey AS BIGINT) AS c,
        |    sum(CAST(floor(o_totalprice*1000000 + 0.5) AS BIGINT)) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT c, x, row_number() OVER (ORDER BY x, c) AS i FROM rev),
        |s AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS b,
        |    sum(CAST(i AS HUGEINT) * x) AS a FROM r)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |  CAST(floor((2.0 * a::DOUBLE / (n::DOUBLE * b::DOUBLE) - (n + 1.0) / n)
        |    * 1000000.0) AS BIGINT) AS gini_micro,
        |  CAST(floor((2.0 * a::DOUBLE / (n::DOUBLE * b::DOUBLE) - (n + 1.0) / n)
        |    * 1000000.0) AS BIGINT) / 1000000.0 AS gini
        |FROM s""".stripMargin,


    // distinct (order, part) baskets; ratio = the same double
    // op-sequence on the same integers (rank-safe), emitted through
    // round(ln, 4) — the pmi_collocations contract on part pairs
    "basket_lift" ->
      """WITH bk AS (
        |  SELECT DISTINCT CAST(6000000 + l_orderkey AS BIGINT) AS o,
        |         CAST(5000000 + l_partkey AS BIGINT) AS p
        |  FROM lineitem),
        |nn AS (SELECT count(DISTINCT o)::DOUBLE AS n FROM bk),
        |ca AS (SELECT p, count(*) AS c FROM bk GROUP BY p),
        |pr AS (SELECT x.p AS a, y.p AS b, count(*) AS c_ab
        |  FROM bk x JOIN bk y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |r AS (SELECT pr.a, pr.b, la.c AS c_a, lb.c AS c_b, pr.c_ab,
        |    (pr.c_ab * nn.n) / CAST(la.c * lb.c AS DOUBLE) AS ratio
        |  FROM pr JOIN ca la ON la.p = pr.a JOIN ca lb ON lb.p = pr.b, nn),
        |rk AS (SELECT *, row_number() OVER (ORDER BY ratio DESC, a, b) AS rk FROM r)
        |SELECT a, b, CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
        |  CAST(c_ab AS BIGINT) AS c_ab, round(ln(ratio), 4) AS log_lift,
        |  CAST(rk AS BIGINT) AS rk
        |FROM rk WHERE rk <= 20""".stripMargin,


    "motif_shared_part" ->
      """WITH co AS (
        |  SELECT DISTINCT CAST(3000000 + o.o_custkey AS BIGINT) AS customer,
        |         CAST(6000000 + o.o_orderkey AS BIGINT) AS order_v,
        |         CAST(5000000 + l.l_partkey AS BIGINT) AS part_v
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
        |SELECT a.customer AS customer, CAST(count(*) AS BIGINT) AS n_motifs
        |FROM co a JOIN co b
        |  ON a.customer = b.customer AND a.part_v = b.part_v
        | AND a.order_v < b.order_v
        |GROUP BY a.customer""".stripMargin,


    "events_enriched" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment AS mktsegment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,
  )
}
