package graft.oracle

import Ctes._

/** DuckDB oracle twins — the temporal-graph surface: asOf/versions/diffs, CRUD
  * sessions, compaction, persistence, and the catalog views.
  * Same column names/types/values as the SparkEntry.queries entries they
  * mirror; the driver hash-compares them per round. */
object SnapshotOracles {
  val sql: Map[String, String] = Map(

    "property_keys" ->
      """SELECT key FROM (VALUES ('name'),('acctbal'),('mktsegment'),('size'),('brand'),
        |('type'),('retailprice'),('orderstatus'),('totalprice'),('orderdate'),('orderpriority')) t(key)""".stripMargin,


    "edge_property_keys" ->
      """SELECT key FROM (VALUES ('quantity'),('extendedprice'),('discount'),
        |('returnflag'),('shipdate')) t(key)""".stripMargin,


    "edge_props" ->
      """WITH liseq AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity,
        |           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) AS seq FROM lineitem)
        |SELECT CAST(4000000000 + CAST(l_orderkey AS BIGINT) * 64 + seq AS BIGINT) AS id, l_quantity AS quantity
        |FROM liseq""".stripMargin,


    "asof_values" ->
      s"""SELECT CAST(7000000 + user_id AS BIGINT) AS id, event_type AS last_type,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
         |FROM (${latestEventSql("2024-01-15 00:00:00")}) WHERE rn = 1""".stripMargin,


    // asOf Jan-15 re-derived from the FULL history — retention compaction
    // (cutoff Jan-10) must leave every later checkpoint exact
    "retained_state" ->
      s"""SELECT CAST(7000000 + user_id AS BIGINT) AS id, event_type AS last_type,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
         |FROM (${latestEventSql("2024-01-15 00:00:00")}) WHERE rn = 1""".stripMargin,


    // head state re-derived from the FULL event history — compaction
    // must not change any live (last_type, value)
    "compacted_state" ->
      s"""SELECT CAST(7000000 + user_id AS BIGINT) AS id, event_type AS last_type,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
         |FROM (${latestEventSql("2099-01-01 00:00:00")}) WHERE rn = 1""".stripMargin,


    "version_count" ->
      """SELECT CAST(7000000 + user_id AS BIGINT) AS id, CAST(count(*) AS BIGINT) AS n_versions
        |FROM events GROUP BY user_id""".stripMargin,


    "version_chain" ->
      """SELECT CAST(event_id + 1 AS BIGINT) AS tx,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS t_start,
        |  lead(strftime(ts, '%Y-%m-%d %H:%M:%S.%f')) OVER (ORDER BY event_id) AS t_end
        |FROM events WHERE user_id = 7""".stripMargin,


    "version_intervals" ->
      """SELECT CAST(7000000 + user_id AS BIGINT) AS id, CAST(event_id + 1 AS BIGINT) AS tx,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS v_from,
        |  lead(strftime(ts, '%Y-%m-%d %H:%M:%S.%f')) OVER (PARTITION BY user_id ORDER BY event_id) AS v_to
        |FROM events""".stripMargin,


    "neighbors_by_name" ->
      """SELECT CAST(3000000 + c_custkey AS BIGINT) AS id
        |FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_7'
        |UNION ALL
        |SELECT CAST(4000000 + s_suppkey AS BIGINT)
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7'""".stripMargin,


    "asof_diff" ->
      s"""WITH v1 AS (SELECT user_id, value FROM (${latestEventSql("2024-01-10 00:00:00")})
         |            WHERE rn = 1 AND event_type <> 'error'),
         |     v2 AS (SELECT user_id, value FROM (${latestEventSql("2024-01-20 00:00:00")})
         |            WHERE rn = 1 AND event_type <> 'error')
         |SELECT CAST(7000000 + v2.user_id AS BIGINT) AS id, v2.value AS value
         |FROM v2 LEFT JOIN v1 ON v2.user_id = v1.user_id AND v2.value = v1.value
         |WHERE v1.user_id IS NULL""".stripMargin,


    "diff_workingset" ->
      s"""WITH s1 AS (SELECT user_id, event_type, value
         |            FROM (${latestEventSql("2024-01-20 00:00:00")}) WHERE rn = 1),
         |     s2 AS (SELECT user_id, event_type, value
         |            FROM (${latestEventSql("2024-01-10 00:00:00")}) WHERE rn = 1),
         |     f1 AS (SELECT user_id, 'last$$type.string.vertex' AS attr,
         |                   event_type AS v_str, CAST(NULL AS DOUBLE) AS v_dbl FROM s1
         |            UNION ALL
         |            SELECT user_id, 'value.double.vertex', NULL, value
         |            FROM s1 WHERE event_type <> 'error'),
         |     f2 AS (SELECT user_id, 'last$$type.string.vertex' AS attr,
         |                   event_type AS v_str, CAST(NULL AS DOUBLE) AS v_dbl FROM s2
         |            UNION ALL
         |            SELECT user_id, 'value.double.vertex', NULL, value
         |            FROM s2 WHERE event_type <> 'error')
         |SELECT CAST(7000000 + f1.user_id AS BIGINT) AS id, f1.attr, f1.v_str, f1.v_dbl
         |FROM f1 WHERE f1.user_id < 50 AND NOT EXISTS (
         |  SELECT 1 FROM f2 WHERE f2.user_id = f1.user_id AND f2.attr = f1.attr
         |    AND f2.v_str IS NOT DISTINCT FROM f1.v_str
         |    AND f2.v_dbl IS NOT DISTINCT FROM f1.v_dbl)""".stripMargin,


    "supplier_revenue" ->
      """SELECT CAST(4000000 + l_suppkey AS BIGINT) AS supplier,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,


    "sql_views" ->
      """SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,


    "time_ids" ->
      """SELECT CAST(7000000 + user_id AS BIGINT) AS id,
        |  CAST(max(event_id) + 1 AS BIGINT) AS time_id
        |FROM events GROUP BY user_id""".stripMargin,


    "since_facts" ->
      """SELECT CAST(7000000 + user_id AS BIGINT) AS id, CAST(event_id + 1 AS BIGINT) AS tx,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value,
        |  event_type <> 'error' AS added
        |FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,


    "version_next_values" ->
      """SELECT CAST(7000000 + user_id AS BIGINT) AS id, CAST(event_id + 1 AS BIGINT) AS tx,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value,
        |  lead(CASE WHEN event_type = 'error' THEN NULL ELSE value END)
        |    OVER (PARTITION BY user_id ORDER BY event_id) AS next_value
        |FROM events""".stripMargin,


    "time_aware_filter" ->
      """SELECT CAST(event_id + 1 AS BIGINT) AS tx, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS at
        |FROM events WHERE user_id = 7
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,


    "version_prev_values" ->
      """SELECT CAST(7000000 + user_id AS BIGINT) AS id, CAST(event_id + 1 AS BIGINT) AS tx,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value,
        |  lag(CASE WHEN event_type = 'error' THEN NULL ELSE value END)
        |    OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
        |FROM events""".stripMargin,


    // scripted CRUD sessions → static oracles (deterministic id assignment)
    "crud_timeline" ->
      """SELECT 'jan' AS tag, CAST(3 AS BIGINT) AS n_vertices, CAST(3 AS BIGINT) AS n_edges
        |UNION ALL SELECT 'feb', 3, 2
        |UNION ALL SELECT 'mar', 0, 0""".stripMargin,


    "crud_remove_property" ->
      """SELECT 'jan' AS tag, 'age' AS key
        |UNION ALL SELECT 'jan', 'name'
        |UNION ALL SELECT 'feb', 'name'""".stripMargin,


    "crud_version_pins" ->
      """SELECT 'head' AS tag, true AS is_current, CAST(2 AS BIGINT) AS p
        |UNION ALL SELECT 'prev', false, 1""".stripMargin,


    "crud_intx" ->
      // one batched tx (head_tx 0) holding 2 vertices + 1 edge; the
      // rolled-back tx changes nothing
      """SELECT 'batch' AS tag, CAST(0 AS BIGINT) AS head_tx, CAST(3 AS BIGINT) AS n_elements
        |UNION ALL SELECT 'rollback', 0, 3""".stripMargin,


    "key_index_registry" ->
      """SELECT 'vertex' AS kind, 'name' AS key
        |UNION ALL SELECT 'edge', 'weight'""".stripMargin,


    "crud_is_deleted" ->
      // crudGraph ids: vertices 1-4 (dave=4), edges 5-8; removeVertex(dave)
      // cascades dave→alice (7) and carol→dave (8)
      """SELECT CAST(4 AS BIGINT) AS id
        |UNION ALL SELECT 7 UNION ALL SELECT 8""".stripMargin,


    "element_version_diff" ->
      "SELECT 'age.long.vertex' AS attr, CAST(31 AS BIGINT) AS v_long",


    "persist_roundtrip" ->
      "SELECT CAST(3 AS BIGINT) AS n_vertices, CAST(2 AS BIGINT) AS n_edges",


    // full re-derivation of the TPC-H fact projection (every constructor
    // in TpchGraph.build, FIXTURES.md §3 id scheme), then the same
    // additive checksum: Σ uint32(md5(e|attr|vStr|vLong|vRef|0|true))
    // mod 2^61 per attr — order-free integer addition on both engines
    "log_checksums" ->
      """WITH liseq AS (SELECT *,
        |    CAST(4000000000 + CAST(l_orderkey AS BIGINT) * 64 + row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity,
        |               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) AS BIGINT) AS ct
        |  FROM lineitem),
        |f AS (
        |  SELECT CAST(1000000 + r_regionkey AS BIGINT) AS e, ':graph.element/type' AS attr,
        |         'vertex' AS vs, NULL::BIGINT AS vl, NULL::BIGINT AS vr FROM region
        |  UNION ALL SELECT 1000000 + r_regionkey, 'name.string.vertex', r_name, NULL, NULL FROM region
        |  UNION ALL SELECT 2000000 + n_nationkey, ':graph.element/type', 'vertex', NULL, NULL FROM nation
        |  UNION ALL SELECT 2000000 + n_nationkey, 'name.string.vertex', n_name, NULL, NULL FROM nation
        |  UNION ALL SELECT 10000000 + n_nationkey, ':graph.element/type', 'edge', NULL, NULL FROM nation
        |  UNION ALL SELECT 10000000 + n_nationkey, ':graph.edge/label', 'in_region', NULL, NULL FROM nation
        |  UNION ALL SELECT 10000000 + n_nationkey, ':graph.edge/outVertex', NULL, NULL, 2000000 + n_nationkey FROM nation
        |  UNION ALL SELECT 10000000 + n_nationkey, ':graph.edge/inVertex', NULL, NULL, 1000000 + n_regionkey FROM nation
        |  UNION ALL SELECT 3000000 + c_custkey, ':graph.element/type', 'vertex', NULL, NULL FROM customer
        |  UNION ALL SELECT 3000000 + c_custkey, 'name.string.vertex', c_name, NULL, NULL FROM customer
        |  UNION ALL SELECT 3000000 + c_custkey, 'acctbal.double.vertex', NULL, NULL, NULL FROM customer
        |  UNION ALL SELECT 3000000 + c_custkey, 'mktsegment.string.vertex', c_mktsegment, NULL, NULL FROM customer
        |  UNION ALL SELECT 11000000 + c_custkey, ':graph.element/type', 'edge', NULL, NULL FROM customer
        |  UNION ALL SELECT 11000000 + c_custkey, ':graph.edge/label', 'in_nation', NULL, NULL FROM customer
        |  UNION ALL SELECT 11000000 + c_custkey, ':graph.edge/outVertex', NULL, NULL, 3000000 + c_custkey FROM customer
        |  UNION ALL SELECT 11000000 + c_custkey, ':graph.edge/inVertex', NULL, NULL, 2000000 + c_nationkey FROM customer
        |  UNION ALL SELECT 4000000 + s_suppkey, ':graph.element/type', 'vertex', NULL, NULL FROM supplier
        |  UNION ALL SELECT 4000000 + s_suppkey, 'name.string.vertex', s_name, NULL, NULL FROM supplier
        |  UNION ALL SELECT 4000000 + s_suppkey, 'acctbal.double.vertex', NULL, NULL, NULL FROM supplier
        |  UNION ALL SELECT 12000000 + s_suppkey, ':graph.element/type', 'edge', NULL, NULL FROM supplier
        |  UNION ALL SELECT 12000000 + s_suppkey, ':graph.edge/label', 'in_nation', NULL, NULL FROM supplier
        |  UNION ALL SELECT 12000000 + s_suppkey, ':graph.edge/outVertex', NULL, NULL, 4000000 + s_suppkey FROM supplier
        |  UNION ALL SELECT 12000000 + s_suppkey, ':graph.edge/inVertex', NULL, NULL, 2000000 + s_nationkey FROM supplier
        |  UNION ALL SELECT 5000000 + p_partkey, ':graph.element/type', 'vertex', NULL, NULL FROM part
        |  UNION ALL SELECT 5000000 + p_partkey, 'name.string.vertex', p_name, NULL, NULL FROM part
        |  UNION ALL SELECT 5000000 + p_partkey, 'brand.string.vertex', p_brand, NULL, NULL FROM part
        |  UNION ALL SELECT 5000000 + p_partkey, 'type.string.vertex', p_type, NULL, NULL FROM part
        |  UNION ALL SELECT 5000000 + p_partkey, 'size.long.vertex', NULL, CAST(p_size AS BIGINT), NULL FROM part
        |  UNION ALL SELECT 5000000 + p_partkey, 'retailprice.double.vertex', NULL, NULL, NULL FROM part
        |  UNION ALL SELECT 6000000 + o_orderkey, ':graph.element/type', 'vertex', NULL, NULL FROM orders
        |  UNION ALL SELECT 6000000 + o_orderkey, 'orderstatus.string.vertex', o_orderstatus, NULL, NULL FROM orders
        |  UNION ALL SELECT 6000000 + o_orderkey, 'totalprice.double.vertex', NULL, NULL, NULL FROM orders
        |  UNION ALL SELECT 6000000 + o_orderkey, 'orderdate.ts.vertex', NULL, NULL, NULL FROM orders
        |  UNION ALL SELECT 6000000 + o_orderkey, 'orderpriority.string.vertex', o_orderpriority, NULL, NULL FROM orders
        |  UNION ALL SELECT 13000000 + o_orderkey, ':graph.element/type', 'edge', NULL, NULL FROM orders
        |  UNION ALL SELECT 13000000 + o_orderkey, ':graph.edge/label', 'placed', NULL, NULL FROM orders
        |  UNION ALL SELECT 13000000 + o_orderkey, ':graph.edge/outVertex', NULL, NULL, 3000000 + o_custkey FROM orders
        |  UNION ALL SELECT 13000000 + o_orderkey, ':graph.edge/inVertex', NULL, NULL, 6000000 + o_orderkey FROM orders
        |  UNION ALL SELECT ct, ':graph.element/type', 'edge', NULL, NULL FROM liseq
        |  UNION ALL SELECT ct, ':graph.edge/label', 'contains', NULL, NULL FROM liseq
        |  UNION ALL SELECT ct, ':graph.edge/outVertex', NULL, NULL, 6000000 + l_orderkey FROM liseq
        |  UNION ALL SELECT ct, ':graph.edge/inVertex', NULL, NULL, 5000000 + l_partkey FROM liseq
        |  UNION ALL SELECT ct, 'quantity.double.edge', NULL, NULL, NULL FROM liseq
        |  UNION ALL SELECT ct, 'extendedprice.double.edge', NULL, NULL, NULL FROM liseq
        |  UNION ALL SELECT ct, 'discount.double.edge', NULL, NULL, NULL FROM liseq
        |  UNION ALL SELECT ct, 'returnflag.string.edge', l_returnflag, NULL, NULL FROM liseq
        |  UNION ALL SELECT ct, 'shipdate.ts.edge', NULL, NULL, NULL FROM liseq
        |  UNION ALL SELECT ct + 4000000000, ':graph.element/type', 'edge', NULL, NULL FROM liseq
        |  UNION ALL SELECT ct + 4000000000, ':graph.edge/label', 'supplied_by', NULL, NULL FROM liseq
        |  UNION ALL SELECT ct + 4000000000, ':graph.edge/outVertex', NULL, NULL, 5000000 + l_partkey FROM liseq
        |  UNION ALL SELECT ct + 4000000000, ':graph.edge/inVertex', NULL, NULL, 4000000 + l_suppkey FROM liseq),
        |c AS (SELECT attr,
        |    e::VARCHAR || '|' || attr || '|' || coalesce(vs, '~null~') || '|' ||
        |    coalesce(vl::VARCHAR, '~null~') || '|' || coalesce(vr::VARCHAR, '~null~') ||
        |    '|0|true' AS canon
        |  FROM f)
        |SELECT attr, CAST(count(*) AS BIGINT) AS n_facts,
        |  CAST(sum(list_sum([(strpos('0123456789abcdef', substr(md5(canon), k, 1)) - 1)
        |      * (1::BIGINT << (4*(8-k))) for k in range(1, 9)]))::HUGEINT
        |    % 2305843009213693952 AS BIGINT) AS checksum
        |FROM c GROUP BY attr""".stripMargin,


    "read_formats" ->
      """SELECT 'graphml' AS fmt, 'marko' AS src_name, 'knows' AS label, 'vadas' AS dst_name
        |UNION ALL SELECT 'graphson', 'marko', 'knows', 'vadas'
        |UNION ALL SELECT 'gml', 'marko', 'knows', 'vadas'""".stripMargin,


    "mutations_crud" ->
      """SELECT 'alice' AS src_name, 'knows' AS label, 'bob' AS dst_name
        |UNION ALL SELECT 'bob', 'knows', 'carol'""".stripMargin,


    "property_type_dance" ->
      """SELECT 'x.string.vertex' AS attr, 's' AS vStr, CAST(NULL AS BIGINT) AS vLong, CAST(NULL AS DOUBLE) AS vDouble
        |UNION ALL SELECT 'y.double.vertex', NULL, NULL, 2.5""".stripMargin,


    "temporal_backdate" ->
      """SELECT 'jan' AS tag, CAST(1 AS BIGINT) AS p
        |UNION ALL SELECT 'feb', 2
        |UNION ALL SELECT 'apr', 4""".stripMargin,
  )
}
