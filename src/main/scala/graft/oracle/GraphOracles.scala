package graft.oracle

import Ctes._

/** DuckDB oracle twins — graph topology, traversal, and iterative graph analytics
  * (scans, hops, PageRank, triangles, k-core, LPA, modularity).
  * Same column names/types/values as the SparkEntry.queries entries they
  * mirror; the driver hash-compares them per round. */
object GraphOracles {
  val sql: Map[String, String] = Map(
    "pagerank_full" -> pagerankFullSql,

    "pagerank_personal" -> pagerankPersonalSql(3000042L),

    "pagerank_weighted" -> pagerankWeightedSql,

    "scan_vertices" -> vertexUnion,


    "scan_edges" -> edgeUnion,


    // deterministic DeepWalk twin: the md5 coin is a pure function of
    // (walk, step, candidate), so each step is an exact argmin replay —
    // rank by (md5('w:t:u'), u) per walk over the out-neighbor join,
    // keep rank 1, unrolled per step
    "graph_walks" -> {
      val stepCtes = (1 to 5).map { t =>
        s"""w$t AS (SELECT walk_id, v FROM (
           |  SELECT w.walk_id, e.inV AS v,
           |    row_number() OVER (PARTITION BY w.walk_id
           |      ORDER BY md5(w.walk_id::VARCHAR || ':$t:' || e.inV::VARCHAR), e.inV) AS rn
           |  FROM w${t - 1} w JOIN edges e ON e.outV = w.v) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val unions = (0 to 5).map(t =>
        s"SELECT CAST(walk_id AS BIGINT) AS walk_id, CAST($t AS BIGINT) AS step, CAST(v AS BIGINT) AS vertex_id FROM w$t")
        .mkString("\nUNION ALL ")
      s"""WITH edges AS ($edgeUnion),
         |w0 AS (SELECT DISTINCT outV AS walk_id, outV AS v FROM edges
         |       WHERE outV >= 3000000 AND outV < 4000000),
         |$stepCtes
         |$unions""".stripMargin
    },


    "sql_serving" ->
      s"""WITH edges AS ($edgeUnion)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_edges,
         |  CAST(count(DISTINCT outV) AS BIGINT) AS n_src
         |FROM edges GROUP BY label""".stripMargin,


    "out_edges_labeled" ->
      """SELECT CAST(13000000 + o_orderkey AS BIGINT) AS id, 'placed' AS label
        |FROM orders WHERE o_custkey = 42""".stripMargin,


    "degree_histogram" ->
      s"""WITH edges AS ($edgeUnion)
         |SELECT deg, CAST(count(*) AS BIGINT) AS n_vertices
         |FROM (SELECT outV, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY outV)
         |GROUP BY deg""".stripMargin,


    "lookup_vertex" ->
      """SELECT CAST(3000000 + c_custkey AS BIGINT) AS id, c_name AS name,
        |       c_acctbal AS acctbal, c_mktsegment AS mktsegment
        |FROM customer WHERE c_custkey = 42""".stripMargin,


    "lookup_edge" ->
      """WITH liseq AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity,
        |           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) AS seq FROM lineitem)
        |SELECT CAST(4000000000 + CAST(l_orderkey AS BIGINT) * 64 + seq AS BIGINT) AS id,
        |       'contains' AS label,
        |       CAST(6000000 + l_orderkey AS BIGINT) AS outV,
        |       CAST(5000000 + l_partkey AS BIGINT) AS inV,
        |       l_quantity AS quantity
        |FROM liseq
        |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem) AND seq = 1""".stripMargin,


    "filter_by_prop" ->
      "SELECT CAST(3000000 + c_custkey AS BIGINT) AS id FROM customer WHERE c_mktsegment = 'BUILDING'",


    "count_by_prop" ->
      "SELECT CAST(count(*) AS BIGINT) AS cnt FROM customer WHERE c_mktsegment = 'BUILDING'",


    "edges_by_label" ->
      """SELECT CAST(13000000 + o_orderkey AS BIGINT) AS id,
        |       CAST(3000000 + o_custkey AS BIGINT) AS outV,
        |       CAST(6000000 + o_orderkey AS BIGINT) AS inV FROM orders""".stripMargin,


    "edges_by_prop" ->
      """WITH liseq AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity,
        |           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) AS seq FROM lineitem)
        |SELECT CAST(4000000000 + CAST(l_orderkey AS BIGINT) * 64 + seq AS BIGINT) AS id
        |FROM liseq WHERE l_returnflag = 'R'""".stripMargin,


    "both_edges" ->
      """WITH liseq AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity,
        |           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) AS seq FROM lineitem)
        |SELECT CAST(8000000000 + CAST(l_orderkey AS BIGINT) * 64 + seq AS BIGINT) AS id, 'out' AS dir
        |FROM liseq WHERE l_partkey = 42
        |UNION ALL
        |SELECT CAST(4000000000 + CAST(l_orderkey AS BIGINT) * 64 + seq AS BIGINT), 'in'
        |FROM liseq WHERE l_partkey = 42""".stripMargin,


    "out_edges" ->
      """SELECT CAST(13000000 + o_orderkey AS BIGINT) AS id, 'placed' AS label
        |FROM orders WHERE o_custkey = 42
        |UNION ALL SELECT CAST(11000000 + c_custkey AS BIGINT), 'in_nation'
        |FROM customer WHERE c_custkey = 42""".stripMargin,


    "hop1_neighbors" ->
      """SELECT CAST(3000000 + o_custkey AS BIGINT) AS src,
        |       CAST(6000000 + o_orderkey AS BIGINT) AS dst FROM orders""".stripMargin,


    "hop2_parts" ->
      """SELECT DISTINCT CAST(5000000 + l_partkey AS BIGINT) AS id
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_custkey = 42""".stripMargin,


    "hop3_traversal" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_paths,
        |       CAST(count(DISTINCT l2.l_suppkey) AS BIGINT) AS n_suppliers
        |FROM orders o
        |JOIN lineitem l1 ON l1.l_orderkey = o.o_orderkey
        |JOIN lineitem l2 ON l2.l_partkey = l1.l_partkey""".stripMargin,


    "hop3_graphx" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_paths,
        |       CAST(count(DISTINCT l2.l_suppkey) AS BIGINT) AS n_suppliers
        |FROM orders o
        |JOIN lineitem l1 ON l1.l_orderkey = o.o_orderkey
        |JOIN lineitem l2 ON l2.l_partkey = l1.l_partkey""".stripMargin,


    "query_has_interval" ->
      """SELECT CAST(3000000 + c_custkey AS BIGINT) AS id FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 1000 AND c_acctbal < 5000""".stripMargin,


    "connected_components" ->
      """SELECT CAST(2000000 + n_nationkey AS BIGINT) AS vertex_id,
        |       CAST(2000000 + n_nationkey AS BIGINT) AS component FROM nation
        |WHERE n_nationkey IN (SELECT c_nationkey FROM customer
        |                      UNION SELECT s_nationkey FROM supplier)
        |UNION ALL SELECT CAST(3000000 + c_custkey AS BIGINT),
        |       CAST(2000000 + c_nationkey AS BIGINT) FROM customer
        |UNION ALL SELECT CAST(4000000 + s_suppkey AS BIGINT),
        |       CAST(2000000 + s_nationkey AS BIGINT) FROM supplier""".stripMargin,


    // closed-form PageRank on the in_nation/in_region star DAG (see
    // GraphXTraversal.pageRankStarDF): sources 0.15, nation = 0.15 +
    // 0.85·0.15·members, region = 0.15 + 0.85·Σ nation-ranks, then
    // GraphX's final normalization rank·|V|/Σrank
    "pagerank" ->
      """WITH mem AS (
        |  SELECT nk, count(*) AS m FROM (
        |    SELECT c_nationkey AS nk FROM customer
        |    UNION ALL SELECT s_nationkey AS nk FROM supplier) t GROUP BY nk
        |), nrank AS (
        |  SELECT n_nationkey, n_regionkey,
        |         CAST(0.15 AS DOUBLE) + 0.85 * (0.15 * COALESCE(m, 0)) AS r
        |  FROM nation LEFT JOIN mem ON nk = n_nationkey
        |), rrank AS (
        |  SELECT n_regionkey, CAST(0.15 AS DOUBLE) + 0.85 * sum(r) AS r
        |  FROM nrank GROUP BY n_regionkey
        |), rawrank AS (
        |  SELECT CAST(3000000 + c_custkey AS BIGINT) AS vertex_id,
        |         CAST(0.15 AS DOUBLE) AS r FROM customer
        |  UNION ALL SELECT CAST(4000000 + s_suppkey AS BIGINT),
        |         CAST(0.15 AS DOUBLE) FROM supplier
        |  UNION ALL SELECT CAST(2000000 + n_nationkey AS BIGINT), r FROM nrank
        |  UNION ALL SELECT CAST(1000000 + n_regionkey AS BIGINT), r FROM rrank
        |), tot AS (SELECT count(*) AS nv, sum(r) AS s FROM rawrank)
        |SELECT vertex_id, round(r * nv / s, 4) AS "rank" FROM rawrank, tot""".stripMargin,


    // relational triangle census of the bulk-quantity co-occurrence
    // graph: e is the distinct a<b part-pair set, wedges close on a
    // third join (see GraphXTraversal.triangleCensusDF)
    "triangle_count" ->
      """WITH bulk AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
        |), e AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM bulk x JOIN bulk y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)
        |SELECT
        |  CAST((SELECT count(*) FROM (SELECT a AS v FROM e UNION SELECT b FROM e)) AS BIGINT) AS n_parts,
        |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_coedges,
        |  CAST((SELECT count(*)
        |        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |                  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS BIGINT) AS n_triangles""".stripMargin,


    // per-vertex wedge closure: each triangle (x < y < z) credits all
    // three corners; degrees from canonical pair endpoints
    "kcore" -> kcoreSql(12, 12),

    // per-edge triangle-support peel to the fixpoint; the unrolled twin
    // recounts support one extra round for the converged flag
    // nominal 8 covers the measured peel depths (sf0.01 takes 6 peels,
    // sf0.1 takes 3 — depth is a graph property, not monotone in scale)
    "ktruss" -> ktrussSql(4, 8),

    // per-threshold club/edge integer counts, one round(6) division
    "rich_club" -> {
      val rows = Seq(4, 8, 16, 32).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS k,
           |  (SELECT count(*) FROM deg WHERE d > $k) AS n_club,
           |  (SELECT count(*) FROM e0 e
           |     JOIN (SELECT v FROM deg WHERE d > $k) p ON e.a = p.v
           |     JOIN (SELECT v FROM deg WHERE d > $k) q ON e.b = q.v) AS e_club""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH bulk AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
         |), e0 AS MATERIALIZED (
         |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
         |  FROM bulk x JOIN bulk y
         |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
         |deg AS MATERIALIZED (SELECT v, count(*) AS d FROM (
         |    SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY v),
         |r AS ($rows)
         |SELECT k, CAST(n_club AS BIGINT) AS n_club, CAST(e_club AS BIGINT) AS e_club,
         |  CASE WHEN n_club < 2 THEN 0.0
         |       ELSE round(2.0 * e_club / (CAST(n_club AS DOUBLE) * (n_club - 1)), 6)
         |  END AS phi
         |FROM r""".stripMargin
    },

    // Hill estimator: top-(k+1) degree order statistics (values only —
    // ties can't show), ln-degrees in integer micros, one division
    "degree_tail_alpha" ->
      """WITH bulk AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
        |), e0 AS (
        |  SELECT DISTINCT CAST(5000000 + x.l_partkey AS BIGINT) AS a,
        |                  CAST(5000000 + y.l_partkey AS BIGINT) AS b
        |  FROM bulk x JOIN bulk y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |deg AS (SELECT v, count(*) AS d FROM (
        |    SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY v),
        |top AS (SELECT v, d FROM deg ORDER BY d DESC, v LIMIT 101),
        |r AS (SELECT d, row_number() OVER (ORDER BY d DESC, v) AS rn,
        |    CAST(floor(ln(d) * 1000000.0 + 0.5) AS BIGINT) AS m FROM top)
        |SELECT CAST(100 AS BIGINT) AS k,
        |  max(CASE WHEN rn = 101 THEN d END) AS dk1,
        |  round(100000000.0 /
        |    (sum(CASE WHEN rn <= 100 THEN m END)
        |     - 100 * max(CASE WHEN rn = 101 THEN m END))::DOUBLE, 4) AS alpha
        |FROM r""".stripMargin,

    // edges with NO closed wedge (support 0): anti-join against the
    // wedge-closure count, endpoint degrees from the symmetrized list
    "local_bridges" ->
      """WITH bulk AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
        |), e0 AS MATERIALIZED (
        |  SELECT DISTINCT CAST(5000000 + x.l_partkey AS BIGINT) AS a,
        |                  CAST(5000000 + y.l_partkey AS BIGINT) AS b
        |  FROM bulk x JOIN bulk y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |adj AS (SELECT a AS w, b AS x FROM e0 UNION ALL SELECT b, a FROM e0),
        |sup AS (
        |  SELECT p.x AS a, q.x AS b, count(*) AS s
        |  FROM adj p JOIN adj q ON p.w = q.w AND p.x < q.x
        |  JOIN e0 e ON e.a = p.x AND e.b = q.x
        |  GROUP BY 1, 2),
        |deg AS (SELECT w AS v, count(*) AS d FROM adj GROUP BY w)
        |SELECT e.a, e.b, CAST(da.d AS BIGINT) AS deg_a, CAST(db.d AS BIGINT) AS deg_b
        |FROM e0 e LEFT JOIN sup s ON s.a = e.a AND s.b = e.b
        |JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
        |WHERE s.a IS NULL""".stripMargin,

    "communities_lpa" -> lpaSql(4),

    // the LPA chain + the exact-integer modularity numerator; HUGEINT
    // sums, one double division, round(6) — matches the Scala sequence
    "community_modularity" ->
      s"""WITH ${lpaCtes(4)},
         |lab AS (SELECT v, lbl FROM l4),
         |e2 AS MATERIALIZED (SELECT la.lbl AS ca, lb.lbl AS cb
         |  FROM e0 JOIN lab la ON la.v = e0.a JOIN lab lb ON lb.v = e0.b),
         |mm AS (SELECT count(*) AS m FROM e2),
         |inc AS (SELECT ca AS c, count(*) AS ic FROM e2 WHERE ca = cb GROUP BY 1),
         |degc AS (SELECT c, count(*) AS dc FROM (
         |    SELECT ca AS c FROM e2 UNION ALL SELECT cb FROM e2) GROUP BY 1),
         |num AS (SELECT sum(CAST(4 AS HUGEINT) * mm.m * coalesce(i.ic, 0)
         |    - CAST(d.dc AS HUGEINT) * d.dc) AS n
         |  FROM degc d LEFT JOIN inc i ON i.c = d.c CROSS JOIN mm)
         |SELECT CAST(mm.m AS BIGINT) AS n_edges,
         |  CAST((SELECT count(DISTINCT lbl) FROM lab) AS BIGINT) AS n_communities,
         |  round(num.n::DOUBLE / (4.0 * mm.m * mm.m), 6) AS modularity
         |FROM mm CROSS JOIN num""".stripMargin,


    // integer-exact Pearson of endpoint degrees over the symmetrized
    // pair edge list; HUGEINT widening mirrors the BigInt combination
    "assortativity" ->
      """WITH bulk AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
        |), e0 AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM bulk x JOIN bulk y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |deg AS (SELECT v, count(*) AS d FROM (
        |    SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY v),
        |xy AS (
        |  SELECT da.d AS x, db.d AS y
        |  FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b
        |  UNION ALL
        |  SELECT db.d, da.d
        |  FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
        |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM xy)
        |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
        |  CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN 0.0
        |       ELSE round((n*sxy - sx*sy)::DOUBLE /
        |         (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE)), 4)
        |  END AS r
        |FROM s""".stripMargin,


    // wedge enumeration + closure semi-join, each wedge's 1/ln(deg)
    // quantized to integer micros before the per-edge sum — the same
    // op sequence as GraphXTraversal.adamicAdarDF
    "adamic_adar" ->
      """WITH bulk AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
        |), e0 AS (
        |  SELECT DISTINCT CAST(5000000 + x.l_partkey AS BIGINT) AS a,
        |                  CAST(5000000 + y.l_partkey AS BIGINT) AS b
        |  FROM bulk x JOIN bulk y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |adj AS (SELECT a AS w, b AS x FROM e0 UNION ALL SELECT b, a FROM e0),
        |deg AS (SELECT w, count(*) AS d FROM adj GROUP BY w),
        |closed AS (
        |  SELECT p.x AS x, q.x AS y, p.w AS w
        |  FROM adj p JOIN adj q ON p.w = q.w AND p.x < q.x
        |  JOIN e0 ON e0.a = p.x AND e0.b = q.x),
        |m AS (SELECT x, y,
        |    CAST(floor(1000000.0 / ln(d) + 0.5) AS BIGINT) AS m
        |  FROM closed JOIN deg USING (w))
        |SELECT x AS a, y AS b, CAST(count(*) AS BIGINT) AS n_common,
        |  CAST(sum(m) AS BIGINT) AS aa_micro,
        |  CAST(sum(m) AS BIGINT)::DOUBLE / 1000000.0 AS aa
        |FROM m GROUP BY x, y""".stripMargin,


    "clustering_coeff" ->
      """WITH bulk AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
        |), e AS (
        |  SELECT DISTINCT CAST(5000000 + x.l_partkey AS BIGINT) AS a,
        |                  CAST(5000000 + y.l_partkey AS BIGINT) AS b
        |  FROM bulk x JOIN bulk y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |tl AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |tri AS (
        |  SELECT v, count(*) AS t FROM (
        |    SELECT x AS v FROM tl UNION ALL SELECT y FROM tl UNION ALL SELECT z FROM tl)
        |  GROUP BY v),
        |deg AS (
        |  SELECT v, count(*) AS d FROM (
        |    SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v)
        |SELECT CAST(deg.v AS BIGINT) AS part_id, CAST(deg.d AS BIGINT) AS degree,
        |  CAST(coalesce(tri.t, 0) AS BIGINT) AS triangles,
        |  round(CASE WHEN deg.d < 2 THEN 0
        |        ELSE 2.0 * coalesce(tri.t, 0) / (deg.d * (deg.d - 1)) END, 4) AS coeff
        |FROM deg LEFT JOIN tri ON tri.v = deg.v""".stripMargin,


    // closed-form BFS levels on the placed/contains/supplied_by DAG
    // (see GraphXTraversal.shortestPathsDF): landmark suppliers 0,
    // their parts 1, orders containing those parts 2, customers 3
    "shortest_paths" ->
      s"""WITH $spDagCtes
        |SELECT vertex_id, landmark_id, dist FROM (
        |  SELECT lid AS vertex_id, lid AS landmark_id, CAST(0 AS INT) AS dist FROM lm
        |  UNION ALL SELECT v, lid, CAST(1 AS INT) FROM d1
        |  UNION ALL SELECT v, lid, CAST(2 AS INT) FROM d2
        |  UNION ALL SELECT v, lid, CAST(3 AS INT) FROM d3)""".stripMargin,


    // Brandes to the landmark set, derived CLOSED-FORM from the DAG's
    // level structure (vs the general relational sweep under test):
    // σ(part) = supplied_by multiplicity to the landmark, σ(order) =
    // Σ σ(part) per contains edge (lineitem row — multi-edges count),
    // σ(cust) = Σ σ(order) per placed edge; the backward pass uses the
    // INTEGER-quantized δ recursion (σv·(1e6+δu)) // σu — floor division
    // of non-negative integers, bit-identical in both engines. Leaves
    // (customers) carry 0, landmarks are excluded, only δ > 0 returns.
    "betweenness_landmarks" ->
      """WITH s1 AS (
        |  SELECT CAST(5000000 + l_partkey AS BIGINT) AS v,
        |         CAST(4000000 + l_suppkey AS BIGINT) AS lid,
        |         count(*) AS sigma
        |  FROM lineitem WHERE l_suppkey BETWEEN 1 AND 3 GROUP BY 1, 2),
        |s2 AS (
        |  SELECT CAST(6000000 + l.l_orderkey AS BIGINT) AS v, s1.lid,
        |         sum(s1.sigma) AS sigma
        |  FROM lineitem l JOIN s1 ON CAST(5000000 + l.l_partkey AS BIGINT) = s1.v
        |  GROUP BY 1, 2),
        |s3 AS (
        |  SELECT CAST(3000000 + o.o_custkey AS BIGINT) AS v, s2.lid,
        |         sum(s2.sigma) AS sigma
        |  FROM orders o JOIN s2 ON CAST(6000000 + o.o_orderkey AS BIGINT) = s2.v
        |  GROUP BY 1, 2),
        |d2 AS (
        |  SELECT s2.v, s2.lid,
        |         sum((s2.sigma * 1000000) // s3.sigma) AS delta
        |  FROM s2 JOIN orders o ON CAST(6000000 + o.o_orderkey AS BIGINT) = s2.v
        |          JOIN s3 ON s3.v = CAST(3000000 + o.o_custkey AS BIGINT)
        |                 AND s3.lid = s2.lid
        |  GROUP BY 1, 2),
        |d1 AS (
        |  SELECT s1.v, s1.lid,
        |         sum((s1.sigma * (1000000 + d2.delta)) // s2.sigma) AS delta
        |  FROM lineitem l
        |    JOIN s1 ON CAST(5000000 + l.l_partkey AS BIGINT) = s1.v
        |    JOIN s2 ON CAST(6000000 + l.l_orderkey AS BIGINT) = s2.v
        |           AND s2.lid = s1.lid
        |    JOIN d2 ON d2.v = s2.v AND d2.lid = s1.lid
        |  GROUP BY 1, 2)
        |SELECT CAST(v AS BIGINT) AS vertex_id, CAST(sum(delta) AS BIGINT) AS btw_mu
        |FROM (SELECT v, delta FROM d2 UNION ALL SELECT v, delta FROM d1)
        |GROUP BY v HAVING sum(delta) > 0""".stripMargin,


    // the same closed-form BFS levels, folded to Σ 1/dist in integer
    // micros (d=0 landmark self-rows excluded, the convention)
    "harmonic_centrality" ->
      s"""WITH $spDagCtes,
        |sp AS (
        |  SELECT v AS vertex_id, CAST(1 AS INT) AS dist FROM d1
        |  UNION ALL SELECT v, CAST(2 AS INT) FROM d2
        |  UNION ALL SELECT v, CAST(3 AS INT) FROM d3)
        |SELECT CAST(vertex_id AS BIGINT) AS vertex_id,
        |  CAST(count(*) AS BIGINT) AS n_reachable,
        |  CAST(sum(m) AS BIGINT) AS h_micro,
        |  CAST(sum(m) AS BIGINT)::DOUBLE / 1000000.0 AS harmonic
        |FROM (SELECT vertex_id, CAST(floor(1000000.0 / dist + 0.5) AS BIGINT) AS m FROM sp)
        |GROUP BY vertex_id""".stripMargin,


    // weighted SSSP, closed-form level mins (see ssspWeightedDF):
    // parts supplying a landmark sit at 1 (supplied_by weight 1, min
    // over parallel edges), orders at min(quantity + 1) over their
    // lineitems into d1 parts, customers at 1 + min over their orders;
    // all-long arithmetic, landmarks self-report 0
    "sssp_weighted" ->
      """WITH lm AS (
        |  SELECT CAST(4000000 + s_suppkey AS BIGINT) AS lid FROM supplier
        |  WHERE s_suppkey BETWEEN 1 AND 3
        |    AND s_suppkey IN (SELECT l_suppkey FROM lineitem)
        |), w1 AS (
        |  SELECT DISTINCT CAST(5000000 + l_partkey AS BIGINT) AS v,
        |         CAST(4000000 + l_suppkey AS BIGINT) AS lid,
        |         CAST(1 AS BIGINT) AS dw
        |  FROM lineitem WHERE l_suppkey BETWEEN 1 AND 3
        |), w2 AS (
        |  SELECT CAST(6000000 + l.l_orderkey AS BIGINT) AS v, w1.lid,
        |         min(CAST(l.l_quantity AS BIGINT) + w1.dw) AS dw
        |  FROM lineitem l JOIN w1 ON CAST(5000000 + l.l_partkey AS BIGINT) = w1.v
        |  GROUP BY 1, 2
        |), w3 AS (
        |  SELECT CAST(3000000 + o.o_custkey AS BIGINT) AS v, w2.lid,
        |         min(1 + w2.dw) AS dw
        |  FROM orders o JOIN w2 ON CAST(6000000 + o.o_orderkey AS BIGINT) = w2.v
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(vertex_id AS BIGINT) AS vertex_id,
        |  CAST(landmark_id AS BIGINT) AS landmark_id, CAST(dist_w AS BIGINT) AS dist_w
        |FROM (
        |  SELECT lid AS vertex_id, lid AS landmark_id, 0 AS dist_w FROM lm
        |  UNION ALL SELECT v, lid, dw FROM w1
        |  UNION ALL SELECT v, lid, dw FROM w2
        |  UNION ALL SELECT v, lid, dw FROM w3)""".stripMargin,


    // HyperANF replay (see gx/HyperAnf.scala): register state after h
    // rounds = the HLL sketch of the EXACT out-ball, so the twin
    // derives ball membership from the order DAG's closed-form level
    // joins, hashes members with the same md5 recipe, and replays the
    // pinned-integer estimator (raw numerator + linear-counting table
    // interpolated from the same JVM constants) bit-for-bit
    "hyperanf" ->
      s"""WITH $hyperAnfCtes
         |SELECT CAST(vertex_id AS BIGINT) AS vertex_id, CAST(hop AS INT) AS hop,
         |  CAST(est_micros AS BIGINT) AS est_micros FROM anf""".stripMargin,


    // N(h) = Σ_v est(v,h) summed in HUGEINT (Spark side: DECIMAL(38,0)
    // — the ×10/×9 effective-diameter compare must not wrap), emitted
    // as BIGINT; eff_diameter_90 = min h with 10·N(h) ≥ 9·N(3)
    "effective_diameter" ->
      s"""WITH $hyperAnfCtes,
         |nn AS (SELECT
         |    sum(CASE WHEN hop = 1 THEN est_micros ELSE 0 END) AS n1,
         |    sum(CASE WHEN hop = 2 THEN est_micros ELSE 0 END) AS n2,
         |    sum(CASE WHEN hop = 3 THEN est_micros ELSE 0 END) AS n3 FROM anf)
         |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  CAST(n3 AS BIGINT) AS n3,
         |  CAST(CASE WHEN n1 * 10 >= n3 * 9 THEN 1
         |            WHEN n2 * 10 >= n3 * 9 THEN 2 ELSE 3 END AS INT) AS eff_diameter_90
         |FROM nn""".stripMargin,
  )

  /** Shared CTE chain for the HyperANF twins: exact out-balls on the
    * placed/contains/supplied_by DAG (generic 1/2/3-hop path joins —
    * namespaced vertex bands as everywhere), then md5 register
    * derivation and the estimator with constants interpolated from
    * [[graft.gx.HyperAnf]] — ONE source of truth for α, the rho cap,
    * the LC threshold and the 64-entry LC table. */
  private lazy val hyperAnfCtes: String = {
    val lcList = graft.gx.HyperAnf.LcMicros.mkString("[", ", ", "]")
    val rawNumer = graft.gx.HyperAnf.RawNumerMicros
    val lcThresh = graft.gx.HyperAnf.LcThresholdMicros
    s"""e AS (
       |  SELECT CAST(3000000 + o_custkey AS BIGINT) AS src,
       |         CAST(6000000 + o_orderkey AS BIGINT) AS dst FROM orders
       |  UNION SELECT CAST(6000000 + l_orderkey AS BIGINT),
       |         CAST(5000000 + l_partkey AS BIGINT) FROM lineitem
       |  UNION SELECT CAST(5000000 + l_partkey AS BIGINT),
       |         CAST(4000000 + l_suppkey AS BIGINT) FROM lineitem
       |), vv AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
       |b1 AS (SELECT src AS v, dst AS mem FROM e),
       |b2 AS (SELECT DISTINCT e1.src AS v, e2.dst AS mem
       |       FROM e e1 JOIN e e2 ON e2.src = e1.dst),
       |b3 AS (SELECT DISTINCT e1.src AS v, e3.dst AS mem
       |       FROM e e1 JOIN e e2 ON e2.src = e1.dst
       |                 JOIN e e3 ON e3.src = e2.dst),
       |memb AS (
       |  SELECT 1 AS hop, v, mem FROM (
       |    SELECT v, v AS mem FROM vv UNION SELECT * FROM b1)
       |  UNION ALL SELECT 2, v, mem FROM (
       |    SELECT v, v AS mem FROM vv UNION SELECT * FROM b1 UNION SELECT * FROM b2)
       |  UNION ALL SELECT 3, v, mem FROM (
       |    SELECT v, v AS mem FROM vv UNION SELECT * FROM b1
       |    UNION SELECT * FROM b2 UNION SELECT * FROM b3)),
       |hashed AS (SELECT hop, v, md5(CAST(mem AS VARCHAR)) AS h FROM memb),
       |rj AS (SELECT hop, v,
       |    ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
       |      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) % 64 AS j,
       |    CASE WHEN length(strip) = 0 THEN 30
       |         ELSE least((28 - length(strip)) * 4
       |           + CASE WHEN substr(strip, 1, 1) = '1' THEN 3
       |                  WHEN substr(strip, 1, 1) IN ('2', '3') THEN 2
       |                  WHEN substr(strip, 1, 1) IN ('4', '5', '6', '7') THEN 1
       |                  ELSE 0 END + 1, 30) END AS m
       |  FROM (SELECT hop, v, h,
       |          regexp_replace(substr(h, 3, 28), '^0+', '') AS strip FROM hashed)),
       |regs AS (SELECT hop, v, j, max(m) AS m FROM rj GROUP BY 1, 2, 3),
       |qq AS (SELECT hop, v,
       |    CAST(sum(CAST(1 AS BIGINT) << (30 - m))
       |      + (64 - count(*)) * (CAST(1 AS BIGINT) << 30) AS BIGINT) AS q,
       |    64 - count(*) AS v_empty
       |  FROM regs GROUP BY 1, 2),
       |anf AS (SELECT v AS vertex_id, hop,
       |    CASE WHEN v_empty > 0 AND raw <= $lcThresh
       |         THEN list_extract($lcList, CAST(v_empty AS INT))
       |         ELSE raw END AS est_micros
       |  FROM (SELECT hop, v, v_empty,
       |          CAST($rawNumer AS BIGINT) // q AS raw FROM qq))""".stripMargin
  }
}
