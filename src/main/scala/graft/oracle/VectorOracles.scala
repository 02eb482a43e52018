package graft.oracle

import Ctes._
import graft.pipeline.TextOps

/** DuckDB oracle twins — the embedding/ANN family: brute-force, IVF/PQ/LSH via
  * md5-derived replicated indexes, re-rank and recall audits.
  * Same column names/types/values as the SparkEntry.queries entries they
  * mirror; the driver hash-compares them per round. */
object VectorOracles {
  val sql: Map[String, String] = Map(

    "embedding_norms" ->
      """SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS norm
        |FROM embeddings""".stripMargin,


    // exact-integer outlier replay: xq on the 1e-4 grid, ranking key
    // c²·d² = Σ (c·xq − N_i)² in HUGEINT (bit-identical ordering in
    // both engines, ties by vec_id); dist is the one shared double
    "embedding_outliers" ->
      """WITH q AS (SELECT vec_id, label,
        |    CAST(floor(x * 10000 + 0.5) AS BIGINT) AS xq, i
        |  FROM (SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS x,
        |               unnest(range(0, len(embedding))) AS i FROM embeddings)),
        |cent AS (SELECT label, i, CAST(sum(xq) AS HUGEINT) AS ni, count(*) AS c
        |  FROM q GROUP BY label, i),
        |d AS (SELECT q.vec_id, q.label, max(c.c) AS c,
        |    sum((CAST(c.c AS HUGEINT) * q.xq - c.ni) * (CAST(c.c AS HUGEINT) * q.xq - c.ni)) AS d2
        |  FROM q JOIN cent c ON c.label = q.label AND c.i = q.i
        |  GROUP BY q.vec_id, q.label),
        |r AS (SELECT *, row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id) AS rnk FROM d)
        |SELECT CAST(label AS BIGINT) AS label, CAST(vec_id AS BIGINT) AS vec_id,
        |  CAST(rnk AS BIGINT) AS rnk,
        |  round(sqrt(d2::DOUBLE) / c / 10000.0, 6) AS dist
        |FROM r WHERE rnk <= 5""".stripMargin,


    "ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT qid, vec_id AS nb, list_cosine_similarity(qv, embedding::DOUBLE[]) AS sim
        |      FROM q, embeddings WHERE vec_id <> qid),
        |r AS (SELECT qid, nb, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nb) AS rn FROM s)
        |SELECT CAST(qid AS BIGINT) AS q, CAST(nb AS BIGINT) AS nb, round(sim, 4) AS sim
        |FROM r WHERE rn <= 10""".stripMargin,


    // Replicated-index ANN oracles: DuckDB re-derives the trained index
    // itself (unrolled Lloyd CTEs), then replays assignment, probe,
    // shortlist, and re-rank — full rows+schema+hash checks on what were
    // rows-only entries through round 7.
    "ann_ivf" -> ivfOracleSql("TRUE"),

    // replayed IVF chain (same k=16 build as ann_ivf), then per-cell
    // counts + per-row micro-quantized cosine-to-own-centroid sums —
    // order-free integer state, one HUGEINT sum per cell
    "ann_ivf_cells" ->
      s"""WITH ${ivfChainCte("TRUE")}
         |SELECT CAST(a.cell AS BIGINT) AS cell,
         |  CAST(count(*) AS BIGINT) AS n_vectors,
         |  CAST(sum(CAST(floor(list_cosine_similarity(a.nbv, c.cv) * 1e6 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS sum_cos_mu
         |FROM asg a JOIN c3 c USING (cell)
         |GROUP BY a.cell""".stripMargin,

    // NSW beam search replay: the knn_graph chain gives the adjacency,
    // then the fixed-round beam walk unrolls like the kcore peel —
    // candidate = beam ∪ expanded neighbors (UNION = the distinct),
    // re-scored, top-beam by (sim desc, node); final beam cut to 10
    // with self excluded. AS MATERIALIZED on multi-referenced CTEs
    // (the kcore 3^rounds inlining lesson)
    "ann_nsw" ->
      s"""WITH $nswChainCtes
         |SELECT CAST(q AS BIGINT) AS q, CAST(nb AS BIGINT) AS nb,
         |  round(sim, 4) AS sim FROM nsw""".stripMargin,

    // recall@10 of the replayed NSW walk against DuckDB's own exact
    // top-10 (the ann_ivf_recall shape — quality cross-engine-checked)
    "ann_nsw_recall" ->
      s"""WITH $nswChainCtes,
         |exq AS (SELECT q, nb FROM (
         |    SELECT qx.q, r.vec_id AS nb, row_number() OVER (PARTITION BY qx.q
         |      ORDER BY list_cosine_similarity(qx.qv, r.x) DESC, r.vec_id) AS rn
         |    FROM qx, raw r WHERE r.vec_id <> qx.q) WHERE rn <= 10)
         |SELECT CAST(n.q AS BIGINT) AS q, CAST(count(e.nb) AS BIGINT) AS hits,
         |  round(count(e.nb) / 10.0, 4) AS recall
         |FROM nsw n LEFT JOIN exq e ON n.q = e.q AND n.nb = e.nb
         |GROUP BY n.q""".stripMargin,

    // the corpus-as-queries batch self-search: same replayed IVF chain
    // at the dedup-scaled k = ⌈√N⌉ (the O(N^1.5) contract), every vector
    // a query (qsFilter TRUE), nProbe 4, top-5 per vector
    "knn_graph" ->
      s"WITH ${ivfChainCte("TRUE", "greatest(16, CAST(ceil(sqrt(n)) AS BIGINT))",
        qsFilter = "TRUE", nProbe = 4)},\n${ivfRankCteK(5)}\n$ivfSelect",

    // the knn_graph chain + one reverse-edge self-join; integer counts,
    // one round(4) division (the dup_ratio_by_source ratio class)
    "knn_mutual_rate" ->
      s"""WITH ${ivfChainCte("TRUE", "greatest(16, CAST(ceil(sqrt(n)) AS BIGINT))",
        qsFilter = "TRUE", nProbe = 4)},
         |${ivfRankCteK(5)},
         |e AS (SELECT q, nb FROM ivf),
         |m AS (SELECT count(*) AS mm FROM e a JOIN e b ON a.q = b.nb AND a.nb = b.q),
         |t AS (SELECT count(*) AS n FROM e)
         |SELECT CAST(t.n AS BIGINT) AS n_edges, CAST(m.mm AS BIGINT) AS n_mutual,
         |  round(m.mm::DOUBLE / t.n, 4) AS mutual_rate
         |FROM t, m""".stripMargin,

    // the knn_graph chain + two label dimension joins + the per-label
    // integer hit/pair counts and one round(4) division
    "knn_label_purity" ->
      s"""WITH ${ivfChainCte("TRUE", "greatest(16, CAST(ceil(sqrt(n)) AS BIGINT))",
        qsFilter = "TRUE", nProbe = 4)},
         |${ivfRankCteK(5)},
         |lab AS (SELECT vec_id, label FROM embeddings)
         |SELECT lq.label AS label,
         |  CAST(count(DISTINCT i.q) AS BIGINT) AS n_vecs,
         |  CAST(sum(CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  CAST(count(*) AS BIGINT) AS pairs,
         |  round(sum(CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS purity
         |FROM ivf i JOIN lab lq ON lq.vec_id = i.q
         |           JOIN lab ln ON ln.vec_id = i.nb
         |GROUP BY lq.label""".stripMargin,

    // same chain; the neighbor side filters to 'en' docs before the rank
    "ann_ivf_filtered" ->
      s"""WITH ${ivfChainCte("TRUE")},
         |scored AS (SELECT p.q, a.nb, list_cosine_similarity(p.qv, a.nbv) AS sim
         |    FROM probe p JOIN asg a USING (cell)
         |    JOIN documents dd ON dd.doc_id = a.nb AND dd.lang = 'en'
         |    WHERE a.nb <> p.q),
         |ivf AS (SELECT q, nb, sim FROM (
         |    SELECT q, nb, sim, row_number() OVER (PARTITION BY q
         |      ORDER BY sim DESC, nb) AS rn FROM scored) WHERE rn <= 10)
         |$ivfSelect""".stripMargin,

    "ann_ivf_opened" -> ivfOracleSql("TRUE"), // parity with the built index,

    // the binary tier: re-pack the 64 sign bits as two 32-bit words
    // (integer shifts — the Spark side's exact pow(2,i) doubles land on
    // the same values) and replay the exact Hamming rank
    "ann_hamming" ->
      s"""WITH $rawEmbCte,
         |sk AS (SELECT vec_id,
         |    CAST(list_sum(list_transform(range(32), i ->
         |      CASE WHEN x[i+1] > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lo,
         |    CAST(list_sum(list_transform(range(32), i ->
         |      CASE WHEN x[i+33] > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS hi
         |  FROM raw),
         |qs AS (SELECT vec_id AS q, lo AS qlo, hi AS qhi FROM sk WHERE vec_id < 10),
         |scored AS (SELECT qs.q, c.vec_id AS nb,
         |    CAST(bit_count(xor(c.lo, qs.qlo)) + bit_count(xor(c.hi, qs.qhi)) AS BIGINT) AS ham
         |  FROM sk c, qs WHERE c.vec_id <> qs.q)
         |SELECT CAST(q AS BIGINT) AS q, CAST(nb AS BIGINT) AS nb, ham FROM (
         |  SELECT q, nb, ham, row_number() OVER (PARTITION BY q ORDER BY ham, nb) AS rn
         |  FROM scored) WHERE rn <= 10""".stripMargin,

    // deterministic-offset pairs, the SAME sequential cosine fold
    // (dot/(√dot·√dot) via the zip-fold builders), floor buckets +
    // exact micro sums
    "embedding_isotropy" -> {
      val cos = s"(${dotSql("p.xa", "v2.x")} / " +
        s"(sqrt(${dotSql("p.xa", "p.xa")}) * sqrt(${dotSql("v2.x", "v2.x")})))"
      s"""WITH $rawEmbCte,
         |nn AS (SELECT max(vec_id) + 1 AS n FROM raw),
         |p AS (
         |  SELECT vec_id AS a, x AS xa, (vec_id + 1) % nn.n AS b FROM raw, nn
         |  UNION ALL SELECT vec_id, x, (vec_id + 17) % nn.n FROM raw, nn
         |  UNION ALL SELECT vec_id, x, (vec_id + 131) % nn.n FROM raw, nn),
         |sc AS (SELECT CAST(floor($cos * 10.0) AS BIGINT) AS bucket,
         |    CAST(floor($cos * 1000000.0 + 0.5) AS BIGINT) AS m
         |  FROM p JOIN raw v2 ON v2.vec_id = p.b WHERE p.a <> p.b)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(m) AS BIGINT) AS sum_cos_micro
         |FROM sc GROUP BY bucket""".stripMargin
    },

    // multi-index byte-chunk candidates + exact popcount verify — the
    // same bands replayed relationally (the dedup_minhash twin class)
    "dedup_hamming" ->
      s"""WITH $rawEmbCte,
         |sk AS (SELECT vec_id,
         |    CAST(list_sum(list_transform(range(32), i ->
         |      CASE WHEN x[i+1] > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lo,
         |    CAST(list_sum(list_transform(range(32), i ->
         |      CASE WHEN x[i+33] > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS hi
         |  FROM raw),
         |ch AS (SELECT vec_id, lo, hi, t.j,
         |    CASE WHEN t.j < 4 THEN (lo >> (8*CAST(t.j AS INT))) & 255
         |         ELSE (hi >> (8*(CAST(t.j AS INT)-4))) & 255 END AS c
         |  FROM sk, range(8) t(j)),
         |cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb,
         |    a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
         |  FROM ch a JOIN ch b ON a.j = b.j AND a.c = b.c AND a.vec_id < b.vec_id)
         |SELECT CAST(va AS BIGINT) AS a, CAST(vb AS BIGINT) AS b,
         |  CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT) AS ham
         |FROM cand
         |WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 20""".stripMargin,

    // the Hamming rank vs the exact-cosine truth side, counted per
    // query — the ann_ivf_recall shape on the binary tier (sketch-side
    // queries renamed qsk so exactTopKCte's qs stays the cosine one)
    "ann_hamming_recall" ->
      s"""WITH $rawEmbCte,
         |sk AS (SELECT vec_id,
         |    CAST(list_sum(list_transform(range(32), i ->
         |      CASE WHEN x[i+1] > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lo,
         |    CAST(list_sum(list_transform(range(32), i ->
         |      CASE WHEN x[i+33] > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS hi
         |  FROM raw),
         |qsk AS (SELECT vec_id AS q, lo AS qlo, hi AS qhi FROM sk WHERE vec_id < 10),
         |hscored AS (SELECT qsk.q, c.vec_id AS nb,
         |    CAST(bit_count(xor(c.lo, qsk.qlo)) + bit_count(xor(c.hi, qsk.qhi)) AS BIGINT) AS ham
         |  FROM sk c, qsk WHERE c.vec_id <> qsk.q),
         |ham AS (SELECT q, nb FROM (
         |  SELECT q, nb, row_number() OVER (PARTITION BY q ORDER BY ham, nb) AS rn
         |  FROM hscored) WHERE rn <= 10),
         |qs AS (SELECT vec_id AS q, x AS qv FROM raw WHERE vec_id < 10),
         |$exactTopKCte
         |SELECT CAST(h.q AS BIGINT) AS q, CAST(count(e.nb) AS BIGINT) AS hits,
         |  round(count(e.nb) / 10.0, 4) AS recall
         |FROM ham h LEFT JOIN ex e ON h.q = e.q AND h.nb = e.nb
         |GROUP BY h.q""".stripMargin,

    "ann_ivf_appended" -> ivfOracleSql("vec_id % 7 <> 0"),

    // the self-maintenance decision row: replay the base build (6/7 of
    // the corpus) + frozen-centroid assignment of everything (asg in the
    // chain assigns the FULL corpus — exactly ivfAppend's merge), then
    // the per-side affinity micro sums and the exact integer compares
    // the Spark ivfHealth runs (cross-multiplied staleness at 20000
    // micros, imbalance at 4x fair share, k=16)
    "ann_ivf_health" ->
      s"""WITH ${ivfChainCte("vec_id % 7 <> 0")},
         |aff AS (SELECT a.nb,
         |    CAST(floor(list_cosine_similarity(a.nbv, c.cv) * 1e6 + 0.5) AS BIGINT) AS cos_mu
         |  FROM asg a JOIN c3 c USING (cell)),
         |sides AS (SELECT
         |    sum(CASE WHEN nb % 7 <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_base,
         |    sum(CASE WHEN nb % 7 <> 0 THEN cos_mu ELSE 0 END)::BIGINT AS sum_base_mu,
         |    sum(CASE WHEN nb % 7 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_app,
         |    sum(CASE WHEN nb % 7 = 0 THEN cos_mu ELSE 0 END)::BIGINT AS sum_app_mu
         |  FROM aff),
         |cl AS (SELECT count(*)::BIGINT AS n_cells, max(cnt)::BIGINT AS max_cell_n FROM (
         |    SELECT cell, count(*) AS cnt FROM asg GROUP BY cell)),
         |v AS (SELECT *,
         |    (sum_base_mu::HUGEINT * n_app - sum_app_mu::HUGEINT * n_base)
         |      > (20000::HUGEINT * n_base * n_app) AS stale,
         |    max_cell_n * 16 > 4 * (n_base + n_app) AS imbalanced
         |  FROM sides, cl)
         |SELECT (n_base + n_app)::BIGINT AS n_vectors, n_cells, max_cell_n,
         |  n_base, sum_base_mu, n_app, sum_app_mu, stale, imbalanced,
         |  (stale OR imbalanced) AS rebuild
         |FROM v""".stripMargin,

    "ann_pq" -> s"WITH $rawEmbCte,\n$pqChainCte,\n${pqRankCte(candJoin = false)}\n$pqSelect",

    "ann_ivfpq" -> s"WITH ${ivfChainCte("TRUE")},\n$pqChainCte,\n${pqRankCte(candJoin = true)}\n$pqSelect",

    "ann_ivf_recall" ->
      s"""WITH ${ivfChainCte("TRUE")},
         |$ivfRankCte,
         |$exactTopKCte
         |SELECT CAST(i.q AS BIGINT) AS q, CAST(count(e.nb) AS BIGINT) AS hits,
         |  round(count(e.nb) / 10.0, 4) AS recall
         |FROM ivf i LEFT JOIN ex e ON i.q = e.q AND i.nb = e.nb
         |GROUP BY i.q""".stripMargin,

    "ann_ivfpq_recall" ->
      s"""WITH ${ivfChainCte("TRUE")},
         |$pqChainCte,
         |${pqRankCte(candJoin = true)},
         |$exactTopKCte
         |SELECT CAST(p.qid AS BIGINT) AS q, CAST(count(e.nb) AS BIGINT) AS hits,
         |  round(count(e.nb) / 10.0, 4) AS recall
         |FROM pq p LEFT JOIN ex e ON p.qid = e.q AND p.vec_id = e.nb
         |GROUP BY p.qid""".stripMargin,


    // SemDeDup twin: the SAME replicated k-means chain as ann_ivf gives
    // the cell assignment — but with the dedup k-derivation
    // k = max(16, ⌈√N⌉) replayed (IEEE sqrt/ceil are correctly rounded,
    // so both engines derive the same k), making the registered
    // contract the O(N^1.5)-balanced one; the verify stage is a plain
    // within-cell cosine predicate — both halves oracle-checked.
    "dedup_semantic" ->
      s"""WITH ${ivfChainCte("TRUE", "greatest(16, CAST(ceil(sqrt(n)) AS BIGINT))")}
         |SELECT CAST(a.nb AS BIGINT) AS a, CAST(b.nb AS BIGINT) AS b,
         |  CAST(a.cell AS BIGINT) AS cell,
         |  round(list_cosine_similarity(a.nbv, b.nbv), 4) AS sim
         |FROM asg a JOIN asg b ON a.cell = b.cell AND a.nb < b.nb
         |WHERE list_cosine_similarity(a.nbv, b.nbv) >= 0.45""".stripMargin,


    "mmr_rerank" -> mmrSql(5, 20, 0.7),


    // Random-projection twins: the ±1 matrix is the same md5 derivation
    // as the LSH planes, so the projection — and the recall of search in
    // projected space — replay exactly.
    "rp_project" ->
      s"""WITH $rawEmbCte,
         |${planesCte(16)},
         |proj AS (SELECT v.vec_id, p.j,
         |    ${dotSql("v.x", "p.pw")} / sqrt(16.0) AS val
         |  FROM raw v, planes p)
         |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(j AS BIGINT) AS j,
         |  round(val, 4) AS v FROM proj""".stripMargin,

    // ann_topk's scoring with the duplicate band excluded BEFORE ranking
    "hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT qid, vec_id AS nb, list_cosine_similarity(qv, embedding::DOUBLE[]) AS sim
        |      FROM q, embeddings WHERE vec_id <> qid),
        |f AS (SELECT * FROM s WHERE sim < 0.45),
        |r AS (SELECT qid, nb, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nb) AS rn FROM f)
        |SELECT CAST(qid AS BIGINT) AS q, CAST(nb AS BIGINT) AS nb, round(sim, 4) AS sim
        |FROM r WHERE rn <= 10""".stripMargin,


    // rp_recall's contract with the projection replaced by the plain
    // 16-dim PREFIX slice (the matryoshka question)
    "matryoshka_recall" ->
      s"""WITH $rawEmbCte,
         |projv AS (SELECT vec_id, x[1:16] AS y FROM raw),
         |qs AS (SELECT vec_id AS q, x AS qv FROM raw WHERE vec_id < 10),
         |$exactTopKCte,
         |rqs AS (SELECT vec_id AS q, y AS qy FROM projv WHERE vec_id < 10),
         |rp AS (SELECT q, nb FROM (
         |    SELECT rqs.q, pv.vec_id AS nb, row_number() OVER (PARTITION BY rqs.q
         |      ORDER BY list_cosine_similarity(rqs.qy, pv.y) DESC, pv.vec_id) AS rn
         |    FROM rqs, projv pv WHERE pv.vec_id <> rqs.q) WHERE rn <= 10)
         |SELECT CAST(rp.q AS BIGINT) AS q, CAST(count(e.nb) AS BIGINT) AS hits,
         |  round(count(e.nb) / 10.0, 4) AS recall
         |FROM rp LEFT JOIN ex e ON rp.q = e.q AND rp.nb = e.nb
         |GROUP BY rp.q""".stripMargin,


    "rp_recall" ->
      s"""WITH $rawEmbCte,
         |${planesCte(16)},
         |projv AS (SELECT vec_id, list(val ORDER BY j) AS y FROM (
         |    SELECT v.vec_id, p.j, ${dotSql("v.x", "p.pw")} / sqrt(16.0) AS val
         |    FROM raw v, planes p) GROUP BY vec_id),
         |qs AS (SELECT vec_id AS q, x AS qv FROM raw WHERE vec_id < 10),
         |$exactTopKCte,
         |rqs AS (SELECT vec_id AS q, y AS qy FROM projv WHERE vec_id < 10),
         |rp AS (SELECT q, nb FROM (
         |    SELECT rqs.q, pv.vec_id AS nb, row_number() OVER (PARTITION BY rqs.q
         |      ORDER BY list_cosine_similarity(rqs.qy, pv.y) DESC, pv.vec_id) AS rn
         |    FROM rqs, projv pv WHERE pv.vec_id <> rqs.q) WHERE rn <= 10)
         |SELECT CAST(rp.q AS BIGINT) AS q, CAST(count(e.nb) AS BIGINT) AS hits,
         |  round(count(e.nb) / 10.0, 4) AS recall
         |FROM rp LEFT JOIN ex e ON rp.q = e.q AND rp.nb = e.nb
         |GROUP BY rp.q""".stripMargin,


    // Hyperplane-LSH twins: the md5-derived ±1 plane matrix
    // (Hyperplanes.matrix) is re-derived IN SQL, so bucketing and the
    // exact-cosine verify stage are both oracle-checked.
    "ann_lsh" ->
      s"""WITH ${lshChainCte(32, 8)},
         |cand AS (SELECT DISTINCT qb.vec_id AS q, cb.vec_id AS nb
         |  FROM band cb JOIN band qb ON cb.band = qb.band AND cb.bh = qb.bh
         |  WHERE qb.vec_id < 10 AND qb.vec_id <> cb.vec_id),
         |scored AS (SELECT c.q, c.nb, list_cosine_similarity(qv.x, cv.x) AS sim
         |  FROM cand c JOIN raw qv ON qv.vec_id = c.q JOIN raw cv ON cv.vec_id = c.nb)
         |SELECT CAST(q AS BIGINT) AS q, CAST(nb AS BIGINT) AS nb, round(sim, 4) AS sim FROM (
         |  SELECT q, nb, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, nb) AS rn
         |  FROM scored) WHERE rn <= 10""".stripMargin,

    "dedup_embedding" ->
      s"""WITH ${lshChainCteAdaptive(64)},
         |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         |  FROM band x JOIN band y ON x.band = y.band AND x.bh = y.bh AND x.vec_id < y.vec_id),
         |scored AS (SELECT c.a, c.b, list_cosine_similarity(va.x, vb.x) AS sim
         |  FROM cand c JOIN raw va ON va.vec_id = c.a JOIN raw vb ON vb.vec_id = c.b)
         |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, round(sim, 4) AS sim
         |FROM scored WHERE sim >= 0.45""".stripMargin,


    // SimHash twin: md5-derived per-token hashes (TextOps.tokenHashes)
    // make the signature pure integer math both engines compute
    // identically — bit j of a token's hash is a nibble-bit of its md5
    // hex, the fingerprint bit is the sign of the ±1 bit-sum, bands are
    // 16-bit slices, hamming is the differing-bit count.
    "dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |th AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |hh AS (SELECT doc_id, md5(tok) AS m FROM th),
        |bitsum AS (SELECT doc_id, t.j AS j,
        |    sum(((strpos('0123456789abcdef', substr(m, CAST(16 - t.j // 4 AS INT), 1)) - 1)
        |         >> CAST(t.j % 4 AS INT)) & 1) * 2 - count(*) AS s
        |  FROM hh, range(64) t(j) GROUP BY doc_id, t.j),
        |fpb AS (SELECT d.doc_id, t.j AS j,
        |    CASE WHEN coalesce(bs.s, 0) > 0 THEN 1 ELSE 0 END AS bit
        |  FROM documents d CROSS JOIN range(64) t(j)
        |  LEFT JOIN bitsum bs ON bs.doc_id = d.doc_id AND bs.j = t.j),
        |band AS (SELECT doc_id, CAST(j // 16 AS INT) AS band,
        |    sum(bit * (1 << CAST(j % 16 AS INT))) AS bh
        |  FROM fpb GROUP BY doc_id, CAST(j // 16 AS INT)),
        |pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM band x JOIN band y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
        |ham AS (SELECT p.a, p.b, sum(CASE WHEN xa.bit <> xb.bit THEN 1 ELSE 0 END) AS hamming
        |  FROM pairs p JOIN fpb xa ON xa.doc_id = p.a JOIN fpb xb ON xb.doc_id = p.b AND xa.j = xb.j
        |  GROUP BY p.a, p.b)
        |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, CAST(hamming AS BIGINT) AS hamming
        |FROM ham WHERE hamming <= 3""".stripMargin,
  )

  /** The NSW walk's CTE chain: knn_graph adjacency (the dedup-scaled
    * replayed IVF chain, qsFilter TRUE, nProbe 4, top-5) + the
    * fixed-round beam unroll with beam/rounds interpolated from
    * [[graft.pipeline.VectorOps]] (one source of truth). `qx` = the
    * registered query set, `nsw` = (q, nb, sim). */
  private lazy val nswChainCtes: String = {
    val beam = graft.pipeline.VectorOps.NswBeam
    val rounds = graft.pipeline.VectorOps.NswRounds
    val roundCtes = (1 to rounds).map { r =>
      s"""cand$r AS (SELECT q, node FROM b${r - 1}
         |  UNION SELECT b.q, e.nb FROM b${r - 1} b JOIN knn e ON e.q = b.node),
         |sc$r AS (SELECT c.q, c.node, list_cosine_similarity(qv.x, nv.x) AS s
         |  FROM cand$r c JOIN raw nv ON nv.vec_id = c.node
         |                JOIN raw qv ON qv.vec_id = c.q),
         |b$r AS MATERIALIZED (SELECT q, node FROM (
         |    SELECT q, node, row_number() OVER (PARTITION BY q
         |      ORDER BY s DESC, node) AS rn FROM sc$r) WHERE rn <= $beam)""".stripMargin
    }.mkString(",\n")
    s"""${ivfChainCte("TRUE", "greatest(16, CAST(ceil(sqrt(n)) AS BIGINT))",
      qsFilter = "TRUE", nProbe = 4)},
       |${ivfRankCteK(5)},
       |knn AS MATERIALIZED (SELECT q, nb FROM ivf UNION SELECT nb, q FROM ivf),
       |qx AS MATERIALIZED (SELECT vec_id AS q, x AS qv FROM raw WHERE vec_id < 10),
       |b0 AS (SELECT q, CAST(0 AS BIGINT) AS node FROM qx),
       |$roundCtes,
       |scf AS (SELECT b.q, b.node, list_cosine_similarity(qv.x, nv.x) AS s
       |  FROM b$rounds b JOIN raw nv ON nv.vec_id = b.node
       |                  JOIN raw qv ON qv.vec_id = b.q
       |  WHERE b.node <> b.q),
       |nsw AS (SELECT q, node AS nb, s AS sim FROM (
       |    SELECT q, node, s, row_number() OVER (PARTITION BY q
       |      ORDER BY s DESC, node) AS rn FROM scf) WHERE rn <= 10)""".stripMargin
  }
}
