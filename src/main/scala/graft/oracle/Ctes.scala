package graft.oracle

import graft.pipeline.TextOps

/** Shared DuckDB SQL builders for the per-family oracle maps (split out
  * of SparkEntry — VERDICT r10 item 8): id-scheme unions, generated
  * CTE chains for iterative algorithms (k-core peels, LPA rounds, BPE
  * merges, IVF/PQ chains, unrolled PageRank), and the common corpus
  * shingle/cluster CTEs. Pure string builders — no Spark dependency. */
object Ctes {
  private[oracle] val vertexUnion =
    """SELECT CAST(1000000 + r_regionkey AS BIGINT) AS id FROM region
      |UNION ALL SELECT CAST(2000000 + n_nationkey AS BIGINT) FROM nation
      |UNION ALL SELECT CAST(3000000 + c_custkey AS BIGINT) FROM customer
      |UNION ALL SELECT CAST(4000000 + s_suppkey AS BIGINT) FROM supplier
      |UNION ALL SELECT CAST(5000000 + p_partkey AS BIGINT) FROM part
      |UNION ALL SELECT CAST(6000000 + o_orderkey AS BIGINT) FROM orders""".stripMargin

  private[oracle] val latestEventSql = (t: String) =>
    s"""SELECT user_id, event_type, value,
       |  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
       |FROM events WHERE ts <= TIMESTAMP '$t'""".stripMargin

  /** The composed curation chain (clean → decontaminate → domainMix →
    * splitStratified) as nested CTEs — each stage is its standalone
    * oracle's SQL applied to the PREVIOUS stage's relation, replaying
    * TextOps.curationPipeline end to end (13-gram decontamination, the
    * production default — at sf1's eval-slice density 3-grams flag the
    * ENTIRE corpus, a degenerate pipeline). Ends at `sp` (doc_id, lang,
    * source, rk, n) and `ct` (doc_id, t = token list). */
  private[oracle] val curationGram13 = (0 until 13).map(o => s"t[i+$o]").mkString(" || ' ' || ")
  // clean stage (train side, exact-dedup + lang/length gate) shared by the
  // n-gram and the semantic pipeline twins — one source, no drift
  private[oracle] val cleanCdCte =
    s"""cbase AS (SELECT * FROM documents WHERE doc_id % 25 <> 0),
      |cln AS (SELECT min(doc_id) AS doc_id FROM cbase
      |  WHERE lang IN ('en', 'de') AND length(text) BETWEEN 100 AND 2000
      |  GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
      |cd AS (SELECT d.doc_id, d.lang, d.source, d.text FROM documents d JOIN cln USING (doc_id))""".stripMargin

  private[oracle] val curationChainCte =
    s"""$cleanCdCte,
      |ct AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM cd),
      |csh AS (SELECT doc_id, CASE WHEN len(t) >= 13
      |  THEN list_distinct([$curationGram13 for i in range(1, len(t) - 11)])
      |  ELSE [] END AS s FROM ct),
      |evt AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      |  FROM documents WHERE doc_id % 25 = 0),
      |evg AS (SELECT DISTINCT unnest(CASE WHEN len(t) >= 13
      |  THEN list_distinct([$curationGram13 for i in range(1, len(t) - 11)])
      |  ELSE [] END) AS gram FROM evt),
      |hit AS (SELECT DISTINCT c.doc_id
      |  FROM (SELECT doc_id, unnest(s) AS gram FROM csh) c JOIN evg USING (gram)),
      |dec AS (SELECT cd.* FROM cd WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
      |dm AS (SELECT doc_id FROM (SELECT doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM dec) WHERE rk <= 50),
      |kept AS (SELECT dec.* FROM dec JOIN dm USING (doc_id)),
      |sp AS (SELECT doc_id, lang, source,
      |    row_number() OVER (PARTITION BY lang, source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
      |    count(*) OVER (PARTITION BY lang, source) AS n
      |  FROM kept)""".stripMargin

  private[oracle] val shingleCte =
    """toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
      |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
      |  THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])
      |  ELSE [] END AS s FROM toks)""".stripMargin

  /** Recursive near-dup cluster closure shared by every oracle that
    * replays [[graft.pipeline.TextOps.dedupClusters]]: exact all-pairs
    * Jaccard (quadratic — sf0.01-gate class), CC closure, min-id
    * representative. Ends with `asg(doc_id, cluster_id, keep)`. */
  private[oracle] val clusterClosureCtes: String =
    s"""$shingleCte,
       |pairs AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(a.s) > 0 AND len(b.s) > 0
       |    AND len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
       |edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
       |reach AS (
       |  SELECT x, y FROM edges
       |  UNION
       |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x),
       |clust AS (SELECT x AS doc_id, LEAST(x, MIN(y)) AS cluster_id FROM reach GROUP BY x),
       |asg AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |               CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
       |               COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS keep
       |        FROM documents d LEFT JOIN clust c ON c.doc_id = d.doc_id)""".stripMargin


  // ---- replicated-ANN oracle CTEs ----------------------------------------
  // The pagerank_full pattern, applied to the ANN indexes: every stage of
  // the build is deterministic PUBLIC math (lowest-id init, the vec_id%5
  // Lloyd sample, a fixed iteration count — VectorOps.ivfBuild/pqTrain),
  // so DuckDB can re-derive the INDEX ITSELF with unrolled CTE steps and
  // then replay the search over it. That upgrades the ann_ivf/ann_pq
  // family from rows-only entries to full rows+schema+hash oracle rows:
  // the twin checks cell assignments, code assignments, shortlists, and
  // the final ranking — not just that 100 rows came back.

  /** Exact zip-fold twins of VectorOps.l2sq / dot (sequential fold order
    * matches Spark's `aggregate` HOF, so the doubles agree bit-for-bit). */
  private[oracle] def l2sqSql(a: String, b: String): String =
    s"list_sum(list_transform(range(len($a)), i -> ($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1])))"
  private[oracle] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(len($a)), i -> $a[i+1] * $b[i+1]))"

  private[oracle] val rawEmbCte = "raw AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)"

  /** CTEs `vbase … c3` + full-corpus `asg` + query `probe`: ivfBuild's
    * k-means (init = the 16 lowest base vec_ids, 3 Lloyd iterations on
    * the vec_id%5 base sample, cosine argmax with ties → lowest cell)
    * trained on `baseFilter` rows, then every corpus vector assigned and
    * each query's 10 nearest cells probed (ivfSearch). `baseFilter` is
    * TRUE for the plain index; the appended index trains on 6/7 of the
    * corpus and assigns the rest to the frozen centroids (ivfAppend) —
    * which is exactly "train on the base subset, assign everyone". */
  private[oracle] def ivfChainCte(baseFilter: String, kExpr: String = "16",
                                  qsFilter: String = "vec_id < 10",
                                  nProbe: Int = 10): String = {
    val lloyd = (1 to 3).map { it =>
      s"""a$it AS (SELECT cell, x FROM (
         |    SELECT c.cell, s.x, row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY list_cosine_similarity(s.x, c.cv) DESC, c.cell) AS rn
         |    FROM samp s, c${it - 1} c) WHERE rn = 1),
         |m$it AS (SELECT cell, list(m ORDER BY i) AS mv FROM (
         |    SELECT cell, i, avg(xx) AS m FROM (
         |      SELECT cell, unnest(x) AS xx, unnest(range(len(x))) AS i FROM a$it)
         |    GROUP BY cell, i) GROUP BY cell),
         |c$it AS (SELECT c.cell, coalesce(m.mv, c.cv) AS cv
         |    FROM c${it - 1} c LEFT JOIN m$it m USING (cell))""".stripMargin
    }.mkString(",\n")
    s"""$rawEmbCte,
       |vbase AS (SELECT * FROM raw WHERE $baseFilter),
       |samp AS (SELECT * FROM vbase WHERE vec_id % 5 = 0),
       |kk AS (SELECT CAST($kExpr AS BIGINT) AS k FROM (SELECT count(*) AS n FROM vbase)),
       |c0 AS (SELECT t.rn - 1 AS cell, t.x AS cv FROM (
       |    SELECT row_number() OVER (ORDER BY vec_id) AS rn, x FROM vbase) t, kk
       |    WHERE t.rn <= kk.k),
       |$lloyd,
       |asg AS (SELECT vec_id AS nb, x AS nbv, cell FROM (
       |    SELECT r.vec_id, r.x, c.cell, row_number() OVER (PARTITION BY r.vec_id
       |      ORDER BY list_cosine_similarity(r.x, c.cv) DESC, c.cell) AS rn
       |    FROM raw r, c3 c) WHERE rn = 1),
       |qs AS (SELECT vec_id AS q, x AS qv FROM raw WHERE $qsFilter),
       |probe AS (SELECT q, qv, cell FROM (
       |    SELECT qs.q, qs.qv, c.cell, row_number() OVER (PARTITION BY qs.q
       |      ORDER BY list_cosine_similarity(qs.qv, c.cv) DESC, c.cell) AS rn
       |    FROM qs, c3 c) WHERE rn <= $nProbe)""".stripMargin
  }

  /** `scored` + `ivf` = (q, nb, sim): exact re-rank of the probed cells'
    * members, top-10 per query by (sim desc, nb). */
  private[oracle] def ivfRankCteK(topK: Int): String =
    s"""scored AS (SELECT p.q, a.nb, list_cosine_similarity(p.qv, a.nbv) AS sim
       |    FROM probe p JOIN asg a USING (cell) WHERE a.nb <> p.q),
       |ivf AS (SELECT q, nb, sim FROM (
       |    SELECT q, nb, sim, row_number() OVER (PARTITION BY q
       |      ORDER BY sim DESC, nb) AS rn FROM scored) WHERE rn <= $topK)""".stripMargin

  private[oracle] val ivfRankCte = ivfRankCteK(10)

  private[oracle] val ivfSelect =
    "SELECT CAST(q AS BIGINT) AS q, CAST(nb AS BIGINT) AS nb, round(sim, 4) AS sim FROM ivf"

  private[oracle] def ivfOracleSql(baseFilter: String): String =
    s"WITH ${ivfChainCte(baseFilter)},\n$ivfRankCte\n$ivfSelect"

  /** CTEs `vn … b3` (pqTrain: L2-normalize, split into 8×8 sub-vectors,
    * per-subspace k-means — init = sub-vectors of the 16 lowest sampled
    * vec_ids, 3 Lloyd iterations, L2² assignment with ties → lowest
    * code) + `enc` (pqEncode over the full corpus) + the per-query ADC
    * weight table `wtab` (w = dot(normalized query sub-vector, code
    * centroid), computed driver-side in Spark with the same sequential
    * fold). Requires `raw`. */
  private[oracle] val pqChainCte: String = {
    val lloyd = (1 to 3).map { it =>
      s"""pa$it AS (SELECT sub, code, sv FROM (
         |    SELECT s.sub, s.vec_id, b.code, s.sv,
         |      row_number() OVER (PARTITION BY s.sub, s.vec_id
         |        ORDER BY ${l2sqSql("s.sv", "b.cv")} ASC, b.code) AS rn
         |    FROM ssub s JOIN b${it - 1} b USING (sub)) WHERE rn = 1),
         |pm$it AS (SELECT sub, code, list(mu ORDER BY i) AS mv FROM (
         |    SELECT sub, code, i, avg(xx) AS mu FROM (
         |      SELECT sub, code, unnest(sv) AS xx, unnest(range(len(sv))) AS i FROM pa$it)
         |    GROUP BY sub, code, i) GROUP BY sub, code),
         |b$it AS (SELECT b.sub, b.code, coalesce(m.mv, b.cv) AS cv
         |    FROM b${it - 1} b LEFT JOIN pm$it m USING (sub, code))""".stripMargin
    }.mkString(",\n")
    s"""vn AS (SELECT vec_id, list_transform(x, e -> e / nrm) AS v FROM (
       |    SELECT vec_id, x, sqrt(list_sum(list_transform(x, y -> y * y))) AS nrm FROM raw)),
       |allsub AS (SELECT vec_id, CAST(t.j AS INT) AS sub, v[(t.j*8+1):(t.j*8+8)] AS sv
       |    FROM vn, range(8) t(j)),
       |ssub AS (SELECT * FROM allsub WHERE vec_id % 5 = 0),
       |iinit AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code FROM (
       |    SELECT DISTINCT vec_id FROM ssub ORDER BY vec_id LIMIT 16)),
       |b0 AS (SELECT s.sub, i.code, s.sv AS cv FROM ssub s JOIN iinit i USING (vec_id)),
       |$lloyd,
       |enc AS (SELECT vec_id, sub, code FROM (
       |    SELECT a.vec_id, a.sub, b.code,
       |      row_number() OVER (PARTITION BY a.vec_id, a.sub
       |        ORDER BY ${l2sqSql("a.sv", "b.cv")} ASC, b.code) AS rn
       |    FROM allsub a JOIN b3 b USING (sub)) WHERE rn = 1),
       |qsub AS (SELECT vec_id AS qid, sub, sv FROM allsub WHERE vec_id < 10),
       |wtab AS (SELECT q.qid, q.sub, b.code,
       |    CAST(floor(${dotSql("q.sv", "b.cv")} * 1099511627776 + 0.5) AS BIGINT) AS w
       |    FROM qsub q JOIN b3 b USING (sub))""".stripMargin
  }

  /** `adc … pq` = (qid, vec_id, cos, rank): ADC scores summed over the 8
    * subspaces, 100-candidate shortlist by (adc desc, vec_id), exact
    * cosine re-rank to rank ≤ 10 (pqTopK / ivfPqTopK). `candJoin`
    * narrows the ADC scan to the IVF-probed cells' members (ivfPqTopK's
    * semi-join) and needs `asg`/`probe` from [[ivfChainCte]]. */
  private[oracle] def pqRankCte(candJoin: Boolean): String = {
    val cand = if (candJoin)
      """cand AS (SELECT p.q AS qid, a.nb AS vec_id FROM asg a JOIN probe p USING (cell)),
        |""".stripMargin else ""
    val joins = if (candJoin)
      """FROM enc e JOIN cand cd ON e.vec_id = cd.vec_id
        |    JOIN wtab w ON cd.qid = w.qid AND e.sub = w.sub AND e.code = w.code""".stripMargin
    else
      "FROM enc e JOIN wtab w ON e.sub = w.sub AND e.code = w.code"
    s"""${cand}adc AS (SELECT w.qid, e.vec_id, sum(w.w) AS adc
       |    $joins
       |    WHERE w.qid <> e.vec_id GROUP BY w.qid, e.vec_id),
       |short AS (SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
       |      ORDER BY adc DESC, vec_id) AS rn FROM adc) WHERE rn <= 100),
       |rer AS (SELECT s.qid, s.vec_id, list_cosine_similarity(q.x, c.x) AS cos
       |    FROM short s JOIN raw c ON s.vec_id = c.vec_id
       |    JOIN raw q ON s.qid = q.vec_id),
       |pq AS (SELECT qid, vec_id, cos, rank FROM (
       |    SELECT qid, vec_id, cos, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, vec_id) AS rank FROM rer) WHERE rank <= 10)""".stripMargin
  }

  private[oracle] val pqSelect =
    """SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
      |  round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank FROM pq""".stripMargin

  /** CTEs `raw`, `planes`, `sig`, `band` — the hyperplane-LSH chain
    * (VectorOps.lshSignature + banding): the twin re-derives the exact
    * ±1 plane matrix from md5 (graft.functions.Hyperplanes.matrix), the
    * signature bits as sign-of-dot with the same sequential fold, and
    * the band buckets as exact integer packing. */
  /** The md5-derived ±1 plane matrix (Hyperplanes.matrix) as a CTE —
    * shared by the LSH chain and the random-projection twins. */
  private[oracle] def planesCte(nPlanes: Int): String =
    s"""planes AS (SELECT CAST(p.j AS INT) AS j, list(w ORDER BY i) AS pw FROM (
       |    SELECT p.j, d.i,
       |      CASE WHEN ((strpos('0123456789abcdef', substr(md5(p.j || '_' || d.i), 2, 1)) - 1) & 1) = 1
       |           THEN 1.0 ELSE -1.0 END AS w
       |    FROM range($nPlanes) p(j), range(64) d(i)) p(j, i, w) GROUP BY p.j)""".stripMargin

  /** Adaptive-band variant of [[lshChainCte]] (dedup_embedding r12):
    * rowsPerBand = GREATEST(4, bitlen(N−1) − 7) computed IN SQL from the
    * corpus count (the integer formula VectorOps.lshRowsPerBand
    * replays), the remainder band dropped (j < (nPlanes ∕∕ r)·r) so no
    * short band reintroduces tiny hash spaces; 1::BIGINT shifts so wide
    * bands can't overflow. Plane j is a pure function of (j, i), so the
    * Spark side's bands·r-plane signature is a prefix of this 64-plane
    * matrix. */
  private[oracle] def lshChainCteAdaptive(nPlanes: Int): String =
    s"""$rawEmbCte,
       |${planesCte(nPlanes)},
       |rpb AS (SELECT GREATEST(4, CAST(length(bin(GREATEST(count(*) - 1, 0))) AS INT) - 7) AS r
       |  FROM raw),
       |sig AS (SELECT v.vec_id, p.j,
       |    CASE WHEN list_sum(list_transform(range(len(v.x)), i -> v.x[i+1] * p.pw[i+1])) > 0
       |         THEN 1 ELSE 0 END AS bit
       |  FROM raw v, planes p),
       |band AS (SELECT vec_id, band, sum(bit * (1::BIGINT << bitpos)) AS bh FROM (
       |    SELECT s.vec_id, CAST(s.j // r.r AS INT) AS band,
       |           CAST(s.j % r.r AS INT) AS bitpos, s.bit
       |    FROM sig s, rpb r WHERE s.j < ($nPlanes // r.r) * r.r)
       |  GROUP BY vec_id, band)""".stripMargin

  private[oracle] def lshChainCte(nPlanes: Int, rowsPerBand: Int): String =
    s"""$rawEmbCte,
       |${planesCte(nPlanes)},
       |sig AS (SELECT v.vec_id, p.j,
       |    CASE WHEN list_sum(list_transform(range(len(v.x)), i -> v.x[i+1] * p.pw[i+1])) > 0
       |         THEN 1 ELSE 0 END AS bit
       |  FROM raw v, planes p),
       |band AS (SELECT vec_id, CAST(j // $rowsPerBand AS INT) AS band,
       |    sum(bit * (1 << CAST(j % $rowsPerBand AS INT))) AS bh
       |  FROM sig GROUP BY vec_id, j // $rowsPerBand)""".stripMargin

  /** k-core twin: the kCoreDF peel loop unrolled as sequential CTE
    * steps — round r computes degrees over e_{r-1}, keeps vertices with
    * degree ≥ k, and re-induces e_r. Same pair-graph derivation as the
    * triangle/clustering twins (5000000 + l_partkey vertex ids). One
    * EXTRA round past the nominal depth computes the `converged` flag
    * honestly (count(e_{rounds+1}) = count(e_rounds) — the edge set
    * shrinks monotonically, so equal counts mean a no-op peel): if the
    * operator ever needs more peels than the twin unrolls, the flag and
    * the rows both diverge visibly instead of agreeing on a non-core. */
  private[oracle] def kcoreSql(k: Int, rounds: Int): String = {
    // AS MATERIALIZED: each round references the previous one 3× — an
    // inlining planner would expand the chain 3^rounds-fold (DuckDB ran
    // out of file handles re-scanning the base table before the fix)
    val steps = (1 to (rounds + 1)).map { r =>
      s"""d$r AS MATERIALIZED (SELECT v, count(*) AS c FROM (
         |    SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}) GROUP BY v),
         |al$r AS MATERIALIZED (SELECT v FROM d$r WHERE c >= $k),
         |e$r AS MATERIALIZED (SELECT x.a, x.b FROM e${r - 1} x
         |    JOIN al$r p ON x.a = p.v JOIN al$r q ON x.b = q.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH bulk AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
       |), e0 AS MATERIALIZED (
       |  SELECT DISTINCT CAST(5000000 + x.l_partkey AS BIGINT) AS a,
       |                  CAST(5000000 + y.l_partkey AS BIGINT) AS b
       |  FROM bulk x JOIN bulk y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       |$steps
       |SELECT CAST(v AS BIGINT) AS part_id, CAST(count(*) AS BIGINT) AS degree,
       |  (SELECT count(*) FROM e${rounds + 1}) = (SELECT count(*) FROM e$rounds) AS converged
       |FROM (
       |  SELECT a AS v FROM e$rounds UNION ALL SELECT b FROM e$rounds) GROUP BY v""".stripMargin
  }

  /** k-truss twin: the kTrussPeel loop unrolled like [[kcoreSql]] —
    * round r computes per-edge triangle support over e_{r-1} (adjacency
    * self-join on the middle vertex, closed by a join back to e_{r-1},
    * counted per ordered pair) and keeps edges with support ≥ k−2. One
    * EXTRA round past the nominal depth yields both the honest
    * `converged` flag (equal edge counts — the set shrinks
    * monotonically) and the final-subgraph support recount the Spark
    * side emits. Same pair-graph derivation as the triangle twins
    * (5000000 + l_partkey vertex ids). */
  private[oracle] def ktrussSql(k: Int, rounds: Int): String = {
    val minSup = k - 2
    val steps = (1 to (rounds + 1)).map { r =>
      s"""adj$r AS MATERIALIZED (
         |  SELECT a AS w, b AS x FROM e${r - 1} UNION ALL SELECT b, a FROM e${r - 1}),
         |sup$r AS MATERIALIZED (
         |  SELECT p.x AS a, q.x AS b, count(*) AS sup
         |  FROM adj$r p JOIN adj$r q ON p.w = q.w AND p.x < q.x
         |  JOIN e${r - 1} e ON e.a = p.x AND e.b = q.x
         |  GROUP BY 1, 2),
         |e$r AS MATERIALIZED (
         |  SELECT s.a, s.b FROM sup$r s WHERE s.sup >= $minSup)""".stripMargin
    }.mkString(",\n")
    s"""WITH bulk AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
       |), e0 AS MATERIALIZED (
       |  SELECT DISTINCT CAST(5000000 + x.l_partkey AS BIGINT) AS a,
       |                  CAST(5000000 + y.l_partkey AS BIGINT) AS b
       |  FROM bulk x JOIN bulk y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       |$steps
       |SELECT CAST(e.a AS BIGINT) AS a, CAST(e.b AS BIGINT) AS b,
       |  CAST(coalesce(s.sup, 0) AS BIGINT) AS support,
       |  (SELECT count(*) FROM e${rounds + 1}) = (SELECT count(*) FROM e$rounds) AS converged
       |FROM e$rounds e LEFT JOIN sup${rounds + 1} s ON s.a = e.a AND s.b = e.b""".stripMargin
  }

  /** Sync-LPA twin: rounds unrolled like kcoreSql — round r counts
    * neighbor labels over the undirected edge list against l_{r-1} and
    * picks per vertex by (count desc, label asc). Same pair-graph e0
    * derivation (5000000 + l_partkey ids). */
  /** BPE training twin: unrolled per-round CTEs over the long-format
    * symbol table s_r(word, pos, sym). Each round counts freq-weighted
    * adjacent pairs, picks the argmax by (w desc, a, b), then applies
    * the leftmost-greedy merge relationally: hit positions → islands of
    * consecutive hits (only possible for runs when a = b) → keep even
    * offsets within the island (the parity rule that equals the Spark
    * side's left-to-right fold), drop each kept merge's second symbol,
    * renumber. All weights are exact integers. */
  private[oracle] def bpeCtes(rounds: Int): String = {
    val steps = (0 until rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT s.sym AS a, t.sym AS b, CAST(sum(f.freq) AS BIGINT) AS w
         |  FROM s$r s JOIN s$r t ON t.word = s.word AND t.pos = s.pos + 1
         |  JOIN wf f ON f.word = s.word
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (
         |  SELECT a, b, w FROM p$r ORDER BY w DESC, a, b LIMIT 1),
         |x$r AS (
         |  -- LEFT JOIN ON TRUE: an exhausted round (empty m$r) must pass
         |  -- the symbol table through unchanged, as the Spark loop does
         |  SELECT s.word, s.pos, s.sym, m.a, m.b,
         |    coalesce(s.sym = m.a AND
         |      lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = m.b,
         |      FALSE) AS hit
         |  FROM s$r s LEFT JOIN m$r m ON TRUE),
         |y$r AS (
         |  SELECT *, CASE WHEN hit THEN pos - row_number()
         |    OVER (PARTITION BY word, hit ORDER BY pos) END AS isl
         |  FROM x$r),
         |z$r AS (
         |  SELECT *, hit AND
         |      (pos - min(pos) OVER (PARTITION BY word, isl)) % 2 = 0 AS keep
         |  FROM y$r),
         |k$r AS (
         |  SELECT *, coalesce(lag(keep) OVER (PARTITION BY word ORDER BY pos),
         |      FALSE) AS prev_keep
         |  FROM z$r),
         |s${r + 1} AS MATERIALIZED (
         |  SELECT word,
         |    CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT) AS pos,
         |    CASE WHEN keep THEN a || b ELSE sym END AS sym
         |  FROM k$r WHERE NOT prev_keep)""".stripMargin
    }.mkString(",\n")
    s"""toks AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |  FROM documents),
       |wf AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY 1),
       |s0 AS MATERIALIZED (
       |  SELECT word, CAST(pos AS BIGINT) AS pos, substr(word, pos, 1) AS sym
       |  FROM (SELECT word, unnest(generate_series(1, length(word))) AS pos
       |        FROM wf)),
       |$steps""".stripMargin
  }

  private[oracle] def lpaCtes(rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""n$r AS MATERIALIZED (
         |  SELECT e.x AS v, l.lbl, count(*) AS c
         |  FROM ed e JOIN l${r - 1} l ON l.v = e.y GROUP BY 1, 2),
         |l$r AS MATERIALIZED (
         |  SELECT v, lbl FROM (
         |    SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn
         |    FROM n$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""bulk AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30
       |), e0 AS MATERIALIZED (
       |  SELECT DISTINCT CAST(5000000 + x.l_partkey AS BIGINT) AS a,
       |                  CAST(5000000 + y.l_partkey AS BIGINT) AS b
       |  FROM bulk x JOIN bulk y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       |ed AS MATERIALIZED (SELECT a AS x, b AS y FROM e0 UNION ALL SELECT b, a FROM e0),
       |l0 AS MATERIALIZED (SELECT DISTINCT x AS v, x AS lbl FROM ed),
       |$steps""".stripMargin
  }

  private[oracle] def lpaSql(rounds: Int): String =
    s"""WITH ${lpaCtes(rounds)}
       |SELECT CAST(v AS BIGINT) AS part_id, CAST(lbl AS BIGINT) AS community
       |FROM l$rounds""".stripMargin

  /** MMR greedy re-rank twin: the shortlist is the exact-rank CTE, the
    * pairwise-sim table is rounded to 4 BEFORE the objective (both
    * engines then pick from identical numbers), and each greedy step is
    * an unrolled pick CTE — the kcore pattern for iterative algorithms. */
  private[oracle] def mmrSql(k: Int, shortlist: Int, lambda: Double): String = {
    val steps = (2 to k).map { t =>
      s"""obj$t AS (
         |  SELECT c.nb, round($lambda * c.simq - ${1 - lambda} * (
         |      SELECT max(ps.s) FROM ps JOIN sel${t - 1} s ON ps.x = c.nb AND ps.y = s.nb), 5) AS score
         |  FROM cand c WHERE c.nb NOT IN (SELECT nb FROM sel${t - 1})),
         |pick$t AS (SELECT nb, score FROM obj$t ORDER BY score DESC, nb LIMIT 1),
         |sel$t AS (SELECT nb FROM sel${t - 1} UNION ALL SELECT nb FROM pick$t)""".stripMargin
    }.mkString(",\n")
    val union = (1 to k).map(t =>
      s"SELECT $t AS step, nb AS vec_id, score FROM pick$t").mkString("\nUNION ALL ")
    s"""WITH $rawEmbCte,
       |qv AS (SELECT x AS qx FROM raw WHERE vec_id = 0),
       |cand AS (SELECT nb, simq FROM (
       |    SELECT r.vec_id AS nb, round(list_cosine_similarity(qv.qx, r.x), 4) AS simq,
       |      row_number() OVER (ORDER BY list_cosine_similarity(qv.qx, r.x) DESC, r.vec_id) AS rn
       |    FROM raw r, qv WHERE r.vec_id <> 0) WHERE rn <= $shortlist),
       |candv AS (SELECT c.nb, r.x FROM cand c JOIN raw r ON r.vec_id = c.nb),
       |ps AS (SELECT a.nb AS x, b.nb AS y, round(list_cosine_similarity(a.x, b.x), 4) AS s
       |       FROM candv a JOIN candv b ON a.nb <> b.nb),
       |pick1 AS (SELECT nb, round($lambda * simq, 5) AS score
       |          FROM cand ORDER BY round($lambda * simq, 5) DESC, nb LIMIT 1),
       |sel1 AS (SELECT nb FROM pick1),
       |$steps
       |SELECT CAST(step AS BIGINT) AS step, CAST(vec_id AS BIGINT) AS vec_id, score FROM (
       |$union)""".stripMargin
  }

  /** Exact brute-force top-10 per query (`ex`) — the truth side of the
    * recall twins; same shape the ann_topk oracle already proves. */
  private[oracle] val exactTopKCte =
    """ex AS (SELECT q, nb FROM (
      |    SELECT qs.q, r.vec_id AS nb, row_number() OVER (PARTITION BY qs.q
      |      ORDER BY list_cosine_similarity(qs.qv, r.x) DESC, r.vec_id) AS rn
      |    FROM qs, raw r WHERE r.vec_id <> qs.q) WHERE rn <= 10)""".stripMargin

  private[oracle] val edgeUnion =
    """WITH liseq AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |  ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity,
      |           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) AS seq FROM lineitem)
      |SELECT CAST(10000000 + n_nationkey AS BIGINT) AS id, 'in_region' AS label,
      |       CAST(2000000 + n_nationkey AS BIGINT) AS outV, CAST(1000000 + n_regionkey AS BIGINT) AS inV FROM nation
      |UNION ALL SELECT CAST(11000000 + c_custkey AS BIGINT), 'in_nation',
      |       CAST(3000000 + c_custkey AS BIGINT), CAST(2000000 + c_nationkey AS BIGINT) FROM customer
      |UNION ALL SELECT CAST(12000000 + s_suppkey AS BIGINT), 'in_nation',
      |       CAST(4000000 + s_suppkey AS BIGINT), CAST(2000000 + s_nationkey AS BIGINT) FROM supplier
      |UNION ALL SELECT CAST(13000000 + o_orderkey AS BIGINT), 'placed',
      |       CAST(3000000 + o_custkey AS BIGINT), CAST(6000000 + o_orderkey AS BIGINT) FROM orders
      |UNION ALL SELECT CAST(4000000000 + CAST(l_orderkey AS BIGINT) * 64 + seq AS BIGINT), 'contains',
      |       CAST(6000000 + l_orderkey AS BIGINT), CAST(5000000 + l_partkey AS BIGINT) FROM liseq
      |UNION ALL SELECT CAST(8000000000 + CAST(l_orderkey AS BIGINT) * 64 + seq AS BIGINT), 'supplied_by',
      |       CAST(5000000 + l_partkey AS BIGINT), CAST(4000000 + l_suppkey AS BIGINT) FROM liseq""".stripMargin

  /** 10-iteration power-method PageRank over the full graph, unrolled as
    * sequential CTE steps (standard SQL forbids aggregates in a recursive
    * term): r_{i+1}(v) = 0.15 + 0.85·Σ_{(u,v)∈E} r_i(u)/outdeg(u), init
    * r_0 = 1, then GraphX's final normalization rank·|V|/Σrank and the
    * same (rank desc, vertex_id asc) top-30 cut as pageRankDF. */
  private[oracle] val pagerankFullSql: String = {
    val steps = (1 to 10).map { i =>
      s"""r$i AS (
         |  SELECT v.id AS vertex_id, CAST(0.15 AS DOUBLE) + 0.85 * COALESCE(m.s, 0) AS "rank"
         |  FROM verts v LEFT JOIN (
         |    SELECT e.inV AS dst, sum(r."rank" / d.deg) AS s
         |    FROM edges e JOIN r${i - 1} r ON r.vertex_id = e.outV
         |                 JOIN deg d ON d.vertex_id = e.outV
         |    GROUP BY e.inV) m ON m.dst = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgeUnion),
       |verts AS ($vertexUnion),
       |deg AS (SELECT outV AS vertex_id, CAST(count(*) AS DOUBLE) AS deg
       |        FROM edges GROUP BY outV),
       |r0 AS (SELECT id AS vertex_id, CAST(1.0 AS DOUBLE) AS "rank" FROM verts),
       |$steps,
       |tot AS (SELECT count(*) AS nv, sum("rank") AS s FROM r10)
       |SELECT vertex_id, round(sr, 4) AS "rank" FROM (
       |  SELECT vertex_id, "rank" * nv / s AS sr FROM r10, tot
       |  ORDER BY sr DESC, vertex_id ASC LIMIT 30)""".stripMargin
  }

  /** Closed-form BFS levels on the placed/contains/supplied_by DAG with
    * supplier landmarks 1..3 (see GraphXTraversal.shortestPathsDF):
    * parts supplying a landmark at 1, orders containing those parts at
    * 2, their customers at 3. CTEs `lm`, `d1`, `d2`, `d3` — shared by
    * the shortest_paths and harmonic_centrality twins. */
  private[oracle] val spDagCtes: String =
    """lm AS (
      |  -- a landmark is a DAG vertex only if some edge references it
      |  SELECT CAST(4000000 + s_suppkey AS BIGINT) AS lid FROM supplier
      |  WHERE s_suppkey BETWEEN 1 AND 3
      |    AND s_suppkey IN (SELECT l_suppkey FROM lineitem)
      |), d1 AS (
      |  SELECT DISTINCT CAST(5000000 + l_partkey AS BIGINT) AS v,
      |         CAST(4000000 + l_suppkey AS BIGINT) AS lid
      |  FROM lineitem WHERE l_suppkey BETWEEN 1 AND 3
      |), d2 AS (
      |  SELECT DISTINCT CAST(6000000 + l.l_orderkey AS BIGINT) AS v, d1.lid
      |  FROM lineitem l JOIN d1 ON CAST(5000000 + l.l_partkey AS BIGINT) = d1.v
      |), d3 AS (
      |  SELECT DISTINCT CAST(3000000 + o.o_custkey AS BIGINT) AS v, d2.lid
      |  FROM orders o JOIN d2 ON CAST(6000000 + o.o_orderkey AS BIGINT) = d2.v
      |)""".stripMargin

  /** The edge union with a `wt` column: `contains` edges carry their
    * l_quantity, every other label 1.0 — the weighted-PageRank twin's
    * input. Quantities are integer-valued, so per-vertex weight sums
    * are exact doubles in both engines. */
  private[oracle] val weightedEdgeUnion =
    """SELECT CAST(2000000 + n_nationkey AS BIGINT) AS outV,
      |       CAST(1000000 + n_regionkey AS BIGINT) AS inV, CAST(1.0 AS DOUBLE) AS wt FROM nation
      |UNION ALL SELECT CAST(3000000 + c_custkey AS BIGINT),
      |       CAST(2000000 + c_nationkey AS BIGINT), 1.0 FROM customer
      |UNION ALL SELECT CAST(4000000 + s_suppkey AS BIGINT),
      |       CAST(2000000 + s_nationkey AS BIGINT), 1.0 FROM supplier
      |UNION ALL SELECT CAST(3000000 + o_custkey AS BIGINT),
      |       CAST(6000000 + o_orderkey AS BIGINT), 1.0 FROM orders
      |UNION ALL SELECT CAST(6000000 + l_orderkey AS BIGINT),
      |       CAST(5000000 + l_partkey AS BIGINT), l_quantity FROM lineitem
      |UNION ALL SELECT CAST(5000000 + l_partkey AS BIGINT),
      |       CAST(4000000 + l_suppkey AS BIGINT), 1.0 FROM lineitem""".stripMargin

  /** 10-iteration WEIGHTED power method, unrolled like
    * [[pagerankFullSql]] with each contribution scaled by wt∕Σ_out wt
    * instead of 1∕outdeg. */
  private[oracle] val pagerankWeightedSql: String = {
    val steps = (1 to 10).map { i =>
      s"""r$i AS (
         |  SELECT v.id AS vertex_id, CAST(0.15 AS DOUBLE) + 0.85 * COALESCE(m.s, 0) AS "rank"
         |  FROM verts v LEFT JOIN (
         |    SELECT e.inV AS dst, sum(r."rank" * (e.wt / d.tw)) AS s
         |    FROM edges e JOIN r${i - 1} r ON r.vertex_id = e.outV
         |                 JOIN wdeg d ON d.vertex_id = e.outV
         |    GROUP BY e.inV) m ON m.dst = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($weightedEdgeUnion),
       |verts AS ($vertexUnion),
       |wdeg AS (SELECT outV AS vertex_id, sum(wt) AS tw FROM edges GROUP BY outV),
       |r0 AS (SELECT id AS vertex_id, CAST(1.0 AS DOUBLE) AS "rank" FROM verts),
       |$steps,
       |tot AS (SELECT count(*) AS nv, sum("rank") AS s FROM r10)
       |SELECT vertex_id, round(sr, 4) AS "rank" FROM (
       |  SELECT vertex_id, "rank" * nv / s AS sr FROM r10, tot
       |  ORDER BY sr DESC, vertex_id ASC LIMIT 30)""".stripMargin
  }

  /** 10-iteration personalized power method from `src`, unrolled like
    * [[pagerankFullSql]]: r_0 = 1{v=src},
    * r_{i+1}(v) = 0.15·1{v=src} + 0.85·Σ_{(u,v)∈E} r_i(u)/outdeg(u),
    * then GraphX's personalized normalization rank/Σrank (sum to 1, NOT
    * the ·|V| of the global variant) and the same top-30 cut. */
  private[oracle] def pagerankPersonalSql(src: Long): String = {
    val steps = (1 to 10).map { i =>
      s"""r$i AS (
         |  SELECT v.id AS vertex_id,
         |    CASE WHEN v.id = $src THEN CAST(0.15 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
         |      + 0.85 * COALESCE(m.s, 0) AS "rank"
         |  FROM verts v LEFT JOIN (
         |    SELECT e.inV AS dst, sum(r."rank" / d.deg) AS s
         |    FROM edges e JOIN r${i - 1} r ON r.vertex_id = e.outV
         |                 JOIN deg d ON d.vertex_id = e.outV
         |    GROUP BY e.inV) m ON m.dst = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgeUnion),
       |verts AS ($vertexUnion),
       |deg AS (SELECT outV AS vertex_id, CAST(count(*) AS DOUBLE) AS deg
       |        FROM edges GROUP BY outV),
       |r0 AS (SELECT id AS vertex_id,
       |       CASE WHEN id = $src THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS "rank"
       |       FROM verts),
       |$steps,
       |tot AS (SELECT sum("rank") AS s FROM r10)
       |SELECT vertex_id, round(sr, 4) AS "rank" FROM (
       |  SELECT vertex_id, "rank" / s AS sr FROM r10, tot
       |  ORDER BY sr DESC, vertex_id ASC LIMIT 30)""".stripMargin
  }
}
