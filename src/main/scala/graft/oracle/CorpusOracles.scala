package graft.oracle

import Ctes._
import graft.pipeline.TextOps

/** DuckDB oracle twins — text-corpus analysis and dedup: stats, n-gram
  * families, BPE training, heavy hitters, incremental/edit/LSH dedup,
  * curation chains.
  * Same column names/types/values as the SparkEntry.queries entries they
  * mirror; the driver hash-compares them per round. */
object CorpusOracles {
  val sql: Map[String, String] = Map(

    "text_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars2,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |FROM documents""".stripMargin,


    "token_counts" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin,


    "lang_stats" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,


    // histogram-derived competition ranks (no vocabulary sort), OLS
    // moments quantized to integer micros per histogram row and summed
    // in HUGEINT — the same op sequence as TextOps.zipfSlope
    "zipf_slope" ->
      """WITH toks AS (SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
        |tf AS (SELECT lang, tok, count(*) AS f FROM toks GROUP BY 1, 2),
        |hist AS (SELECT lang, f, count(*) AS h FROM tf GROUP BY 1, 2),
        |ranked AS (SELECT lang, f, h,
        |  1 + coalesce(sum(h) OVER (PARTITION BY lang ORDER BY f DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
        |  FROM hist),
        |s AS (SELECT lang,
        |  CAST(sum(h) AS HUGEINT) AS n,
        |  CAST(sum(f * h) AS BIGINT) AS n_tokens,
        |  sum(CAST(floor(h * ln(r) * 1000000.0 + 0.5) AS HUGEINT)) AS sx,
        |  sum(CAST(floor(h * ln(f) * 1000000.0 + 0.5) AS HUGEINT)) AS sy,
        |  sum(CAST(floor(h * ln(r) * ln(f) * 1000000.0 + 0.5) AS HUGEINT)) AS sxy,
        |  sum(CAST(floor(h * ln(r) * ln(r) * 1000000.0 + 0.5) AS HUGEINT)) AS sxx
        |  FROM ranked GROUP BY lang)
        |SELECT lang, CAST(n AS BIGINT) AS vocab, n_tokens,
        |  CASE WHEN (n * sxx * 1000000 - sx * sx)::DOUBLE = 0 THEN 0.0
        |       ELSE round((n * sxy * 1000000 - sx * sy)::DOUBLE /
        |                  (n * sxx * 1000000 - sx * sx)::DOUBLE, 4) END AS slope
        |FROM s""".stripMargin,


    // c·ln c quantized to integer micros per term, HUGEINT sum, one
    // final double expression — TextOps.tokenEntropy's twin
    "token_entropy" ->
      """WITH toks AS (SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
        |tf AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY 1, 2)
        |SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab,
        |  round(ln(sum(c)) -
        |    sum(CAST(floor(c * ln(c) * 1000000.0 + 0.5) AS HUGEINT))::DOUBLE
        |      / 1000000.0 / sum(c)::DOUBLE, 6) AS entropy_nats
        |FROM tf GROUP BY lang""".stripMargin,


    // first-occurrence attribution per distinct 3-gram: min doc_id over
    // the corpus, then a per-doc stale count — all integers; novelty is
    // the ratio of those integers (1.0 for gram-less docs)
    "gram_novelty" ->
      s"""WITH $shingleCte,
         |dg AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |fst AS (SELECT g, min(doc_id) AS first_doc FROM dg GROUP BY g),
         |pd AS (SELECT dg.doc_id, count(*) AS n_grams,
         |    sum(CASE WHEN f.first_doc < dg.doc_id THEN 1 ELSE 0 END) AS n_stale
         |  FROM dg JOIN fst f USING (g) GROUP BY dg.doc_id)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(pd.n_stale, 0) AS BIGINT) AS n_stale,
         |  CASE WHEN coalesce(pd.n_grams, 0) = 0 THEN 1.0
         |       ELSE round(1.0 - coalesce(pd.n_stale, 0)::DOUBLE / pd.n_grams, 4)
         |  END AS novelty
         |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id""".stripMargin,


    // prefix membership is integer-exact (rk <= (i*N)//10); distinct
    // vocab per checkpoint via first-occurrence rank, never a rescan
    "heaps_law" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |rk AS (SELECT doc_id, t, row_number() OVER (ORDER BY doc_id) AS rk FROM toks),
        |n AS (SELECT count(*) AS nd FROM documents),
        |cps AS (SELECT (g.range*100)//10 AS pct, (g.range*n.nd)//10 AS cutoff
        |  FROM range(1, 11) g, n),
        |tot AS (SELECT c.pct, count(*) AS n_docs, sum(len(r.t)) AS total_tokens
        |  FROM rk r JOIN cps c ON r.rk <= c.cutoff GROUP BY c.pct),
        |fr AS (SELECT tok, min(rk) AS fr
        |  FROM (SELECT rk, unnest(t) AS tok FROM rk) GROUP BY tok),
        |voc AS (SELECT c.pct, count(*) AS distinct_tokens
        |  FROM fr JOIN cps c ON fr.fr <= c.cutoff GROUP BY c.pct)
        |SELECT CAST(t.pct AS BIGINT) AS pct, CAST(t.n_docs AS BIGINT) AS n_docs,
        |  CAST(t.total_tokens AS BIGINT) AS total_tokens,
        |  CAST(coalesce(v.distinct_tokens, 0) AS BIGINT) AS distinct_tokens
        |FROM tot t LEFT JOIN voc v USING (pct)""".stripMargin,


    // hashed-bigram importance replay: feature id from md5 word 1 (the
    // hash_embed hex decode), λ = bin-length(t+1) − bin-length(r+1) —
    // integer floor-log2, no libm log on either side
    "dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |big AS (SELECT doc_id, lang, unnest(CASE WHEN len(t) >= 2
        |    THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
        |    ELSE [] END) AS g FROM toks),
        |hx AS (SELECT doc_id, lang, md5(g) AS h FROM big),
        |occ AS (SELECT doc_id, lang,
        |    list_sum(list_transform(range(8), j ->
        |      (strpos('0123456789abcdef', substr(h, (j+1)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 4096 AS f
        |  FROM hx),
        |lam AS (SELECT f,
        |    length(bin((sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1)::BIGINT))
        |      - length(bin((count(*) + 1)::BIGINT)) AS lam
        |  FROM occ GROUP BY f),
        |pdf AS (SELECT doc_id, f, count(*) AS cnt FROM occ GROUP BY 1, 2),
        |sc AS (SELECT doc_id, sum(cnt) AS n_feat, sum(cnt*lam) AS score
        |  FROM pdf JOIN lam USING (f) GROUP BY doc_id)
        |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |  CAST(coalesce(sc.n_feat, 0) AS BIGINT) AS n_feat,
        |  CAST(coalesce(sc.score, 0) AS BIGINT) AS score
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin,


    // strlen = UTF-8 bytes (Spark's octet_length); the two ratios are
    // double divisions of exact integer totals
    "tokenizer_fertility" ->
      """WITH s AS (SELECT lang, count(*) AS n_docs,
        |    sum(strlen(text)) AS total_bytes, sum(length(text)) AS total_chars,
        |    sum(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS n_ws,
        |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))) AS n_bpe
        |  FROM documents GROUP BY lang)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(total_bytes AS BIGINT) AS total_bytes,
        |  CAST(total_chars AS BIGINT) AS total_chars,
        |  CAST(n_ws AS BIGINT) AS n_ws, CAST(n_bpe AS BIGINT) AS n_bpe,
        |  round(total_bytes::DOUBLE / n_bpe, 4) AS bytes_per_bpe,
        |  round(total_chars::DOUBLE / n_bpe, 4) AS chars_per_bpe
        |FROM s""".stripMargin,


    // per-source seat allocation: base = (B·n)÷N, leftover seats by
    // (remainder desc, source) — every term an integer
    // the data-recipe planner: equal integer token budget per source,
    // epoch cap, ONE largest-remainder redistribution round over the
    // uncapped sources, a final clamp — every quantity an exact integer
    // (epochs emitted as 10^6*alloc div tokens, never a rounded rational)
    "epoch_plan" ->
      """WITH tok AS (SELECT source,
        |    CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS BIGINT) AS t
        |  FROM documents GROUP BY source),
        |q AS (SELECT source, t,
        |    110000 // count(*) OVER ()
        |      + CASE WHEN row_number() OVER (ORDER BY source) <= 110000 % count(*) OVER ()
        |             THEN 1 ELSE 0 END AS quota,
        |    4 * t AS cap_alloc
        |  FROM tok),
        |f AS (SELECT sum(CASE WHEN quota > cap_alloc THEN quota - cap_alloc ELSE 0 END) AS freed,
        |             sum(CASE WHEN quota <= cap_alloc THEN t ELSE 0 END) AS u FROM q),
        |unc AS (SELECT q.source, (f.freed * q.t) // f.u AS base2,
        |    (f.freed * q.t) % f.u AS rem2, f.freed AS freed
        |  FROM q, f WHERE q.quota <= q.cap_alloc AND f.freed > 0 AND f.u > 0),
        |ex AS (SELECT source, base2 + CASE WHEN
        |      row_number() OVER (ORDER BY rem2 DESC, source) <= freed - sum(base2) OVER ()
        |      THEN 1 ELSE 0 END AS extra FROM unc),
        |w AS (SELECT q.source, q.t, q.cap_alloc, q.quota + coalesce(ex.extra, 0) AS want
        |  FROM q LEFT JOIN ex USING (source))
        |SELECT source, CAST(t AS BIGINT) AS tokens,
        |  CAST(least(cap_alloc, want) AS BIGINT) AS alloc_tokens,
        |  CAST(1000000 * least(cap_alloc, want) // t AS BIGINT) AS epochs_ppm,
        |  want > cap_alloc AS capped
        |FROM w""".stripMargin,

    "quota_apportion" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |t AS (SELECT c.*, sum(n_docs) OVER () AS n FROM c),
        |b AS (SELECT source, n_docs, (1000*n_docs)//n AS base,
        |    1000 - sum((1000*n_docs)//n) OVER () AS leftover,
        |    row_number() OVER (ORDER BY (1000*n_docs)%n DESC, source) AS rk
        |  FROM t)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM b""".stripMargin,


    // BPE merge learning replay: 8 unrolled rounds; each emits its
    // argmax pair — the merge table is pure integer argmaxes, so both
    // engines agree bit-for-bit
    "bpe_merges" ->
      s"""WITH ${bpeCtes(8)}
         |${(0 until 8).map(r =>
             s"SELECT CAST($r AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, w AS weight FROM m$r")
             .mkString("\n UNION ALL ")}""".stripMargin,


    // (source, label) contingency with per-source shares
    "source_label_mix" ->
      """WITH j AS (
        |  SELECT d.source, e.label
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        |c AS (SELECT source, label, CAST(count(*) AS BIGINT) AS n
        |  FROM j GROUP BY 1, 2),
        |t AS (SELECT source, sum(n) AS total FROM c GROUP BY 1)
        |SELECT c.source, CAST(c.label AS BIGINT) AS label, c.n,
        |  round(c.n::DOUBLE / t.total, 4) AS pct
        |FROM c JOIN t USING (source)""".stripMargin,


    // per-doc encode counts off the replayed final segmentation s8
    "bpe_doc_tokens" ->
      s"""WITH ${bpeCtes(8)},
         |seg AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sub
         |  FROM s8 GROUP BY 1),
         |dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
         |  FROM documents),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
         |  FROM dw JOIN seg USING (word) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(pd.n_words, 0) AS n_words,
         |  coalesce(pd.n_bpe_tokens, 0) AS n_bpe_tokens
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,


    // centroid-cosine drift: the n·scale denominators cancel, so the
    // cosine runs on HUGEINT sums of quantized inputs up to one final
    // double expression (the assortativity pattern in embedding space)
    "source_embedding_drift" ->
      s"""WITH $rawEmbCte,
         |q AS (
         |  SELECT d.source, i, CAST(floor(xx * 10000 + 0.5) AS BIGINT) AS xq
         |  FROM (SELECT vec_id, unnest(x) AS xx, unnest(range(len(x))) AS i
         |        FROM raw) r
         |  JOIN documents d ON d.doc_id = r.vec_id),
         |pd AS (SELECT source, i, CAST(sum(xq) AS HUGEINT) AS s1,
         |    count(*) AS n FROM q GROUP BY 1, 2),
         |g AS (SELECT i, CAST(sum(s1) AS HUGEINT) AS g1 FROM pd GROUP BY i),
         |bb AS (SELECT sum(g1 * g1) AS bb FROM g),
         |ps AS (
         |  SELECT source, sum(s1 * g1) AS dd, sum(s1 * s1) AS aa,
         |    CAST(max(n) AS BIGINT) AS n_vecs
         |  FROM pd JOIN g USING (i) GROUP BY source)
         |SELECT source, n_vecs,
         |  round(dd::DOUBLE / (sqrt(aa::DOUBLE) * sqrt(bb.bb::DOUBLE)), 6)
         |    AS cos_to_global
         |FROM ps CROSS JOIN bb""".stripMargin,


    // distinct 5-grams per (gram, lang), gram-keyed pair join; DuckDB
    // 1-based INCLUSIVE list slice t[i:i+4] = the 5 tokens from i
    "crosslingual_leakage" ->
      """WITH toks AS (
        |  SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT lang, md5(array_to_string(t[i:i+4], ' ')) AS g
        |  FROM toks, unnest(range(1, len(t) - 3)) r(i)
        |  WHERE len(t) >= 5)
        |SELECT a.lang AS lang_a, b.lang AS lang_b,
        |  CAST(count(*) AS BIGINT) AS n_shared_grams
        |FROM g a JOIN g b ON a.g = b.g AND a.lang < b.lang
        |GROUP BY 1, 2""".stripMargin,


    // vocabulary artifact: final-symbol explode weighted by word freq
    "bpe_vocab" ->
      s"""WITH ${bpeCtes(8)},
         |wsym AS (SELECT word, sym FROM s8)
         |SELECT sym, CAST(sum(f.freq) AS BIGINT) AS freq,
         |  CAST(count(DISTINCT w.word) AS BIGINT) AS n_words
         |FROM wsym w JOIN wf f ON f.word = w.word
         |GROUP BY sym""".stripMargin,


    // per-source χ² GOF vs the pooled distribution: HUGEINT mirrors the
    // DECIMAL(38) d = N·O − R·C; per-cell micros quantize before the sum
    "source_chi2" ->
      """WITH tf AS MATERIALIZED (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS o FROM (
        |    SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |    FROM documents) GROUP BY 1, 2),
        |rt AS (SELECT source, sum(o) AS r FROM tf GROUP BY 1),
        |ct AS (SELECT tok, sum(o) AS c FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS HUGEINT) AS n FROM tf),
        |cells AS (
        |  SELECT tf.source, rt.r, ct.c, nn.n,
        |    CAST(nn.n * tf.o - CAST(rt.r AS HUGEINT) * ct.c AS HUGEINT) AS d
        |  FROM tf JOIN ct USING (tok) JOIN rt USING (source) CROSS JOIN nn),
        |mic AS (
        |  SELECT source, r, c, n,
        |    CAST(floor((d::DOUBLE * d::DOUBLE) /
        |      ((n::DOUBLE * r::DOUBLE) * c::DOUBLE) * 1e6 + 0.5) AS BIGINT) AS micro
        |  FROM cells),
        |ps AS (
        |  SELECT source, count(*) AS n_cells, sum(micro) AS obs_micro,
        |    any_value(r) AS r, sum(c) AS sc, any_value(n) AS n
        |  FROM mic GROUP BY source),
        |fin AS (
        |  SELECT source, r, n_cells,
        |    obs_micro + CAST(floor((r::DOUBLE * (n::DOUBLE - sc::DOUBLE)) /
        |      n::DOUBLE * 1e6 + 0.5) AS BIGINT) AS chi2_micro
        |  FROM ps)
        |SELECT source, CAST(r AS BIGINT) AS n_tokens,
        |  CAST(n_cells AS BIGINT) AS n_cells,
        |  CAST(chi2_micro AS BIGINT) AS chi2_micro,
        |  chi2_micro::DOUBLE / 1e6 AS chi2
        |FROM fin""".stripMargin,


    // fertility under the learned segmentation: final symbol counts per
    // word joined to per-lang word counts; integer sums, one division
    "bpe_encode" ->
      s"""WITH ${bpeCtes(8)},
         |seg AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sub
         |  FROM s8 GROUP BY 1),
         |lw AS (SELECT lang, word, count(*) AS cnt FROM (
         |    SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
         |    FROM documents) GROUP BY 1, 2)
         |SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_words,
         |  CAST(sum(cnt * n_sub) AS BIGINT) AS n_subwords,
         |  round(sum(cnt * n_sub)::DOUBLE / sum(cnt), 4) AS subwords_per_word
         |FROM lw JOIN seg USING (word) GROUP BY 1""".stripMargin,


    // bitlen-logprob surrogate (sum of integer floor-log2 token-count
    // masses), rational average via one double division, integer-exact
    // tertile cuts within lang
    "quality_tiers" ->
      """WITH tk AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
        |ct AS (SELECT tok, length(bin(count(*)::BIGINT)) AS bl FROM tk GROUP BY tok),
        |pd AS (SELECT doc_id, count(*) AS n_tokens, sum(bl) AS sum_bl
        |  FROM tk JOIN ct USING (tok) GROUP BY doc_id),
        |sc AS (SELECT d.doc_id, d.lang,
        |    coalesce(pd.n_tokens, 0) AS n_tokens, coalesce(pd.sum_bl, 0) AS sum_bl,
        |    CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN 0.0
        |         ELSE coalesce(pd.sum_bl, 0)::DOUBLE / pd.n_tokens END AS avg_bl
        |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id),
        |rkd AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY avg_bl DESC, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n FROM sc)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |  CAST(n_tokens AS BIGINT) AS n_tokens, CAST(sum_bl AS BIGINT) AS sum_bl,
        |  CASE WHEN rk*3 <= n THEN 'head'
        |       WHEN rk*3 <= n*2 THEN 'middle' ELSE 'tail' END AS tier
        |FROM rkd""".stripMargin,


    // independent per-lang KMV samples; same rank contract inside each
    "lang_length_quantiles" ->
      """WITH b AS (SELECT lang AS grp, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    n_chars::DOUBLE AS v FROM documents),
        |s AS (SELECT * FROM (SELECT grp, h, v,
        |    row_number() OVER (PARTITION BY grp ORDER BY h) AS hrk FROM b)
        |  WHERE hrk <= 256),
        |r AS (SELECT grp, v, h,
        |    row_number() OVER (PARTITION BY grp ORDER BY v, h) AS rk,
        |    count(*) OVER (PARTITION BY grp) AS n FROM s)
        |SELECT r.grp AS "group", CAST(p.pct AS BIGINT) AS pct, r.v AS val,
        |  CAST(r.n AS BIGINT) AS n_sample
        |FROM r JOIN (VALUES (25),(50),(75)) p(pct)
        |  ON r.rk = 1 + (p.pct*(r.n-1))//100""".stripMargin,


    // the KMV bottom-k sample is a pure function of md5(o_orderkey), so
    // the sample AND its order statistics replay bit-for-bit
    "bottomk_quantiles" ->
      """WITH smp AS (SELECT md5(CAST(o_orderkey AS VARCHAR)) AS h,
        |    o_totalprice::DOUBLE AS v
        |  FROM orders ORDER BY h LIMIT 1024),
        |rkd AS (SELECT v, h, row_number() OVER (ORDER BY v, h) AS rk,
        |    count(*) OVER () AS n FROM smp)
        |SELECT CAST(p.pct AS BIGINT) AS pct, r.v AS val
        |FROM rkd r JOIN (VALUES (10),(20),(30),(40),(50),(60),(70),(80),(90)) p(pct)
        |  ON r.rk = 1 + (p.pct*(r.n-1))//100""".stripMargin,


    "quality_scores" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / greatest(length(text), 1), 4) AS punct_ratio,
        |  round(length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE / greatest(length(text), 1), 4) AS upper_ratio,
        |  round(length(text)::DOUBLE / greatest(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')), 1), 4) AS chars_per_token
        |FROM documents""".stripMargin,


    "dedup_exact" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS group_size
        |FROM documents GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')""".stripMargin,


    "doc_fingerprint" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,


    "clean_corpus" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
        |FROM documents
        |WHERE lang IN ('en', 'de') AND length(text) BETWEEN 100 AND 2000
        |GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')""".stripMargin,


    // positional 13-gram md5s → corpus-repeated grams → per-doc
    // gaps-and-islands merge of flagged positions into maximal spans
    "dup_spans" ->
      """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(range(1, len(t) - 11)) AS pos,
        |    unnest([md5(array_to_string(t[i:i+12], ' ')) for i in range(1, len(t) - 11)]) AS g
        |  FROM t WHERE len(t) >= 13),
        |dup AS (SELECT g FROM g GROUP BY g HAVING count(*) > 1),
        |fl AS (SELECT doc_id, pos FROM g JOIN dup USING (g)),
        |isl AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM fl)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(min(pos) AS BIGINT) AS start_pos,
        |  CAST(max(pos) + 12 AS BIGINT) AS end_pos,
        |  CAST(max(pos) + 12 - min(pos) + 1 AS BIGINT) AS span_tokens,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl GROUP BY doc_id, grp""".stripMargin,


    // dup_spans coverage excision + ordered string_agg reassembly;
    // clean/short docs keep their full token stream, empty docs emit ''
    "dedup_substrings" ->
      """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(range(1, len(t) - 11)) AS pos,
        |    unnest([md5(array_to_string(t[i:i+12], ' ')) for i in range(1, len(t) - 11)]) AS g
        |  FROM t WHERE len(t) >= 13),
        |dup AS (SELECT g FROM g GROUP BY g HAVING count(*) > 1),
        |fl AS (SELECT doc_id, pos FROM g JOIN dup USING (g)),
        |isl AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM fl),
        |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 12 AS e FROM isl GROUP BY doc_id, grp),
        |cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM sp),
        |tok AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos, unnest(t) AS tok FROM t),
        |kept AS (SELECT tok.doc_id, tok.pos, tok.tok FROM tok
        |  ANTI JOIN cov ON cov.doc_id = tok.doc_id AND cov.pos = tok.pos),
        |asm AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id)
        |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |  coalesce(a.clean_text, '') AS clean_text,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(coalesce(tt.n_tokens, 0) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM documents d
        |LEFT JOIN asm a ON a.doc_id = d.doc_id
        |LEFT JOIN tot tt ON tt.doc_id = d.doc_id""".stripMargin,


    // the hashing-trick replay: cell index/sign from md5 words 1/2 of
    // each distinct (doc, token); dense assembly via a (doc × dim) grid
    // left-joined to the sparse cells — all exact integers
    "hash_embed" ->
      s"""WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
         |cnt AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
         |h AS (SELECT doc_id, md5(tok) AS h, cnt FROM cnt),
         |cell AS (SELECT doc_id,
         |    list_sum(list_transform(range(8), j ->
         |      (strpos('0123456789abcdef', substr(h, (j+1)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 64 AS j,
         |    CASE WHEN list_sum(list_transform(range(8), j ->
         |      (strpos('0123456789abcdef', substr(h, (j+9)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 2 = 0
         |      THEN cnt ELSE -cnt END AS v
         |  FROM h),
         |agg AS (SELECT doc_id, j, sum(v) AS v FROM cell GROUP BY 1, 2),
         |grid AS (SELECT d.doc_id, g.range AS j
         |  FROM (SELECT DISTINCT doc_id FROM cnt) d CROSS JOIN range(64) g),
         |rows0 AS (SELECT grid.doc_id, grid.j, coalesce(a.v, 0) AS v
         |  FROM grid LEFT JOIN agg a ON a.doc_id = grid.doc_id AND a.j = grid.j)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(j AS BIGINT) AS j,
         |  CAST(v AS BIGINT) AS v
         |FROM rows0""".stripMargin,


    // ann_topk's contract over the hashEmbed vectors: shared hv CTE
    // (the hash_embed relation cast to DOUBLE), zero vectors filtered,
    // cosine + (sim desc, nb) rank
    "text_ann_hashed" ->
      s"""WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
         |cnt AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
         |h AS (SELECT doc_id, md5(tok) AS h, cnt FROM cnt),
         |cell AS (SELECT doc_id,
         |    list_sum(list_transform(range(8), j ->
         |      (strpos('0123456789abcdef', substr(h, (j+1)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 64 AS j,
         |    CASE WHEN list_sum(list_transform(range(8), j ->
         |      (strpos('0123456789abcdef', substr(h, (j+9)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 2 = 0
         |      THEN cnt ELSE -cnt END AS v
         |  FROM h),
         |agg AS (SELECT doc_id, j, sum(v) AS v FROM cell GROUP BY 1, 2),
         |grid AS (SELECT d.doc_id, g.range AS j
         |  FROM (SELECT DISTINCT doc_id FROM cnt) d CROSS JOIN range(64) g),
         |rows0 AS (SELECT grid.doc_id, grid.j, coalesce(a.v, 0) AS v
         |  FROM grid LEFT JOIN agg a ON a.doc_id = grid.doc_id AND a.j = grid.j),
         |hv AS (SELECT doc_id, list(v::DOUBLE ORDER BY j) AS x FROM rows0 GROUP BY doc_id
         |       HAVING max(abs(v)) > 0),
         |q AS (SELECT doc_id AS qid, x AS qx FROM hv WHERE doc_id < 5),
         |s AS (SELECT qid, hv.doc_id AS nb, list_cosine_similarity(qx, x) AS sim
         |      FROM q, hv WHERE hv.doc_id <> qid),
         |r AS (SELECT qid, nb, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nb) AS rn FROM s)
         |SELECT CAST(qid AS BIGINT) AS q, CAST(nb AS BIGINT) AS nb, round(sim, 4) AS sim
         |FROM r WHERE rn <= 5""".stripMargin,


    // the Count-Min replay: cell (i, c) sums multiplicities of tokens
    // whose i-th md5 word (hex chars [8i, 8i+8) as a 32-bit int) ≡ c
    // (mod 1024); probe = min counter over a term's 4 cells — all exact
    // integers, order-independent on both engines
    "cms_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
        |  FROM documents),
        |hashed AS (SELECT tok, md5(tok) AS h FROM toks),
        |cells AS (SELECT r, c, count(*) AS n FROM (
        |    SELECT unnest(range(4)) AS r,
        |      unnest(list_transform(range(4), i ->
        |        list_sum(list_transform(range(8), j ->
        |          (strpos('0123456789abcdef', substr(h, (i*8+j+1)::INT, 1))-1)::BIGINT
        |            << (4*(7-j))::INT)) % 1024)) AS c
        |    FROM hashed)
        |  GROUP BY r, c),
        |top AS (SELECT tok, count(*) AS true_count,
        |    row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
        |  FROM toks GROUP BY tok ORDER BY 2 DESC, 1 LIMIT 20),
        |probes AS (SELECT t.tok, t.true_count, t.rk,
        |    unnest(range(4)) AS r,
        |    unnest(list_transform(range(4), i ->
        |      list_sum(list_transform(range(8), j ->
        |        (strpos('0123456789abcdef', substr(md5(t.tok), (i*8+j+1)::INT, 1))-1)::BIGINT
        |          << (4*(7-j))::INT)) % 1024)) AS c
        |  FROM top t)
        |SELECT p.tok, CAST(p.true_count AS BIGINT) AS true_count,
        |  CAST(min(cl.n) AS BIGINT) AS est, CAST(p.rk AS BIGINT) AS rk
        |FROM probes p JOIN cells cl ON cl.r = p.r AND cl.c = p.c
        |GROUP BY p.tok, p.true_count, p.rk""".stripMargin,


    // the MG-invariants projection: every (lang, token) must satisfy the
    // Misra–Gries guarantee against the sketch, and the guarantee is
    // provable from EXACT counts alone (merge-order-independent), so the
    // twin emits TRUE per row — the Spark side computes the booleans
    // from the live graft_topfreq summary
    "hh_sketch_audit" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
        |  FROM documents),
        |cnt AS (SELECT lang, tok, count(*) AS true_count FROM toks GROUP BY 1, 2)
        |SELECT lang, tok, CAST(true_count AS BIGINT) AS true_count, TRUE AS mg_ok
        |FROM cnt""".stripMargin,


    "heavy_hitters" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
        |  FROM documents),
        |freqs AS (SELECT lang, tok, count(*) AS freq FROM toks GROUP BY lang, tok),
        |ranked AS (SELECT lang, tok, freq,
        |    row_number() OVER (PARTITION BY lang ORDER BY freq DESC, tok) AS rk
        |  FROM freqs)
        |SELECT lang, tok, CAST(freq AS BIGINT) AS freq, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 10""".stripMargin,


    // CLOSED-FORM twin: emits the canonical target each of the three
    // synthesized surface variants must collapse to — scheme/host case,
    // www., :443, trailing slash, tracking params, param order and
    // fragment all erased, kept params sorted (a=1 < id=g < z=2). Any
    // canonicalUrl deviation shows up as a string mismatch here instead
    // of being replayed into the oracle.
    "dedup_url" ->
      """SELECT 'https://' || source || '.example.com/page/' || (doc_id // 3)
        |    || '?a=1&id=' || (doc_id // 3) || '&z=2' AS url_canon,
        |  CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
        |  CAST(count(*) AS BIGINT) AS n_dups
        |FROM documents
        |GROUP BY 1""".stripMargin,


    // closed-form canonical target again (crawl.example.com, page =
    // doc_id % 430); batch groups by canonical URL then anti-joins the
    // history's canonical set — pages 0-69 are revisits and drop out
    "dedup_url_incremental" ->
      """WITH cu AS (
        |  SELECT doc_id,
        |    'https://crawl.example.com/page/' || (doc_id % 430)
        |      || '?a=1&id=' || (doc_id % 430) || '&z=2' AS url_canon
        |  FROM documents),
        |batch AS (
        |  SELECT url_canon, min(doc_id) AS doc_id, count(*) AS batch_dups
        |  FROM cu WHERE doc_id >= 400 GROUP BY 1)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, url_canon,
        |  CAST(batch_dups AS BIGINT) AS batch_dups
        |FROM batch
        |WHERE url_canon NOT IN (SELECT url_canon FROM cu WHERE doc_id < 400)""".stripMargin,


    // closed-form host + page (the dedup_url variants all collapse to
    // source.example.com / doc_id // 3); n_texts replays the normText key
    "host_stats" ->
      """SELECT source || '.example.com' AS host,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT doc_id // 3) AS BIGINT) AS n_pages,
        |  CAST(count(DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |    AS BIGINT) AS n_texts,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY 1""".stripMargin,


    // smoothed KL(batch‖history) over the union vocabulary: exact
    // integer counts form the same doubles in both engines; per-token
    // terms quantized to integer picos per row (can be negative —
    // floor(x+0.5) is round-half-up in both), order-free total; top-20
    // by (|term| desc, tok)
    "vocab_drift" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
        |  FROM documents),
        |cb AS (SELECT tok, count(*) AS c_batch FROM toks WHERE doc_id >= 400 GROUP BY 1),
        |chh AS (SELECT tok, count(*) AS c_hist FROM toks WHERE doc_id < 400 GROUP BY 1),
        |j AS (SELECT coalesce(cb.tok, chh.tok) AS tok,
        |    coalesce(c_batch, 0) AS c_batch, coalesce(c_hist, 0) AS c_hist
        |  FROM cb FULL OUTER JOIN chh ON cb.tok = chh.tok),
        |tot AS (SELECT sum(c_batch)::DOUBLE AS nb, sum(c_hist)::DOUBLE AS nh,
        |    count(*)::DOUBLE AS vv FROM j),
        |t AS (SELECT tok, c_hist, c_batch,
        |    CAST(floor((((c_batch + 0.5) / (nb + 0.5 * vv)) *
        |      ln(((c_batch + 0.5) / (nb + 0.5 * vv)) /
        |         ((c_hist + 0.5) / (nh + 0.5 * vv)))) * 1e12 + 0.5) AS BIGINT)
        |      AS term_pico
        |  FROM j, tot),
        |kl AS (SELECT sum(term_pico) AS kl_pico FROM t),
        |rk AS (SELECT tok, c_hist, c_batch, term_pico,
        |    row_number() OVER (ORDER BY abs(term_pico) DESC, tok) AS rk FROM t)
        |SELECT tok, CAST(c_hist AS BIGINT) AS c_hist,
        |  CAST(c_batch AS BIGINT) AS c_batch,
        |  CAST(term_pico AS BIGINT) AS term_pico,
        |  CAST(kl.kl_pico AS BIGINT) AS kl_pico, CAST(rk AS BIGINT) AS rk
        |FROM rk, kl WHERE rk <= 20""".stripMargin,


    // bigram_logprob's LM spine, per-bigram NLL quantized to integer
    // micros PER ROW (order-free), per-doc DECIMAL sums; docs rank
    // within lang by the exact rational sum/n (one double division of
    // integers, ties by doc_id; bigram-less docs flagged to the tail
    // end — no NULL-ordering dependence); integer tertile boundaries
    "perplexity_tiers" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(t) AS tok FROM toks)),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |       FROM toks, UNNEST(range(1, len(t))) u(i) WHERE len(t) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c) AS c1 FROM c12 GROUP BY w1),
        |pd AS (SELECT bg.doc_id, count(*) AS n_bigrams,
        |    sum(CAST(floor(-ln((c12.c + 0.5) / (c1.c1 + 0.5 * v.v)) * 1e6 + 0.5)
        |        AS BIGINT)) AS sum_nll_mu
        |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
        |  GROUP BY bg.doc_id),
        |sc AS (SELECT d.doc_id, d.lang,
        |    coalesce(pd.n_bigrams, 0) AS n_bigrams,
        |    coalesce(pd.sum_nll_mu, 0) AS sum_nll_mu
        |  FROM documents d LEFT JOIN pd USING (doc_id)),
        |rk AS (SELECT doc_id, lang, n_bigrams, sum_nll_mu,
        |    row_number() OVER (PARTITION BY lang ORDER BY (n_bigrams = 0),
        |      CASE WHEN n_bigrams = 0 THEN 0.0
        |           ELSE sum_nll_mu::DOUBLE / n_bigrams END, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM sc)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |  CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |  CAST(sum_nll_mu AS BIGINT) AS sum_nll_mu,
        |  CASE WHEN rk * 3 <= n THEN 'head'
        |       WHEN rk * 3 <= n * 2 THEN 'middle'
        |       ELSE 'tail' END AS tier
        |FROM rk""".stripMargin,


    "dedup_incremental" ->
      """WITH batch AS (
        |  SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    min(doc_id) AS doc_id, count(*) AS batch_dups
        |  FROM documents WHERE doc_id >= 400 GROUP BY 1)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(batch_dups AS BIGINT) AS batch_dups
        |FROM batch
        |WHERE norm NOT IN (
        |  SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |  FROM documents WHERE doc_id < 400)""".stripMargin,


    // exact all-pairs edit twin (quadratic — ORACLE_SKIP at scaled data
    // like dedup_minhash); the length-difference prefilter is a lower
    // bound on levenshtein, cutting the DP work without changing the set
    // r10: the twin replays the PORTABLE banded candidate stage (md5
    // KM family, 128 hashes / 32 bands) bit-for-bit, then applies the
    // same integer edit predicate — both engines share the exact
    // candidate relation, so the shingle-vs-edit metric mismatch can no
    // longer diverge on pairs the bands miss (the contract IS
    // "candidates ∩ edit-predicate"; ADVICE r9 closed).
    "dedup_edit" ->
      s"""WITH $shingleCte,
        |hx AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0),
        |hp AS (SELECT doc_id,
        |    list_sum([(strpos('0123456789abcdef', substr(md5(g), k, 1)) - 1)
        |              * (1::BIGINT << (4*(8-k))) for k in range(1, 9)]) AS h1,
        |    list_sum([(strpos('0123456789abcdef', substr(md5(g), k + 8, 1)) - 1)
        |              * (1::BIGINT << (4*(8-k))) for k in range(1, 9)]) AS h2
        |  FROM hx),
        |sig AS (SELECT doc_id, i, min((h1 + i * h2) % 2147483647) AS mh
        |  FROM hp, range(128) r(i) GROUP BY doc_id, i),
        |sigl AS (SELECT doc_id, list(mh ORDER BY i) AS sg FROM sig GROUP BY doc_id),
        |band AS (SELECT doc_id, b,
        |    md5(array_to_string([sg[b*4 + j] for j in range(1, 5)], ',')) AS bh
        |  FROM sigl, range(32) r(b)),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM band x JOIN band y ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
        |n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
        |  FROM documents)
        |SELECT CAST(c.a AS BIGINT) AS a, CAST(c.b AS BIGINT) AS b,
        |  CAST(levenshtein(na.nt, nb.nt) AS BIGINT) AS lev,
        |  CAST(greatest(length(na.nt), length(nb.nt)) AS BIGINT) AS max_len
        |FROM cand c JOIN n na ON na.doc_id = c.a JOIN n nb ON nb.doc_id = c.b
        |WHERE 100 * levenshtein(na.nt, nb.nt)
        |      <= 20 * greatest(length(na.nt), length(nb.nt))""".stripMargin,


    "winnow_fingerprints" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |hs AS (SELECT doc_id,
        |    [md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) for i in range(1, len(t) - 1)] AS hs
        |  FROM toks WHERE len(t) >= 3)
        |SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, unnest(list_distinct(
        |    [list_min(hs[i:i+3]) for i in range(1, greatest(len(hs) - 3, 1) + 1)])) AS fp
        |FROM hs""".stripMargin,


    // The NEAR-dup incremental contract: the banded candidate join plus
    // exact-Jaccard verify must equal the exact cross-set relation (the
    // same guarantee dedup_minhash proves for the self-join form).
    "dedup_incremental_lsh" ->
      s"""WITH $shingleCte
         |SELECT CAST(b.doc_id AS BIGINT) AS doc_id, CAST(h.doc_id AS BIGINT) AS dup_of,
         |  round(len(list_intersect(b.s, h.s))::DOUBLE / len(list_distinct(list_concat(b.s, h.s))), 3) AS jac
         |FROM sh b JOIN sh h ON b.doc_id >= 400 AND h.doc_id < 400
         |WHERE len(b.s) > 0 AND len(h.s) > 0
         |  AND len(list_intersect(b.s, h.s))::DOUBLE / len(list_distinct(list_concat(b.s, h.s))) >= 0.8""".stripMargin,


    // per-source drop share under the replayed cluster closure
    "dup_ratio_by_source" ->
      s"""WITH RECURSIVE $clusterClosureCtes
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN a.keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dupes,
         |  round(sum(CASE WHEN a.keep THEN 0 ELSE 1 END)::DOUBLE / count(*), 4)
         |    AS dup_ratio
         |FROM asg a JOIN documents d USING (doc_id)
         |GROUP BY d.source""".stripMargin,


    // per-eval-doc shingle exposure: distinct train grams LEFT-joined
    // onto each eval doc's shingles; integers up to one division
    "eval_coverage" ->
      s"""WITH $shingleCte,
         |tg AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 25 <> 0),
         |eg AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id % 25 = 0),
         |pd AS (
         |  SELECT eg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(count(tg.gram) AS BIGINT) AS n_covered
         |  FROM eg LEFT JOIN tg USING (gram) GROUP BY eg.doc_id)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  coalesce(pd.n_grams, 0) AS n_grams,
         |  coalesce(pd.n_covered, 0) AS n_covered,
         |  CASE WHEN coalesce(pd.n_grams, 0) = 0 THEN 0.0
         |       ELSE round(pd.n_covered::DOUBLE / pd.n_grams, 4) END AS coverage
         |FROM documents d LEFT JOIN pd USING (doc_id)
         |WHERE d.doc_id % 25 = 0""".stripMargin,


    // survivors after the exact cross-set Jaccard drop (same exact-
    // verify contract as dedup_incremental_lsh's quadratic twin)
    "decontaminate_lsh" ->
      s"""WITH $shingleCte,
         |hit AS (SELECT DISTINCT b.doc_id
         |  FROM sh b JOIN sh h ON b.doc_id % 25 <> 0 AND h.doc_id % 25 = 0
         |  WHERE len(b.s) > 0 AND len(h.s) > 0
         |    AND len(list_intersect(b.s, h.s))::DOUBLE /
         |        len(list_distinct(list_concat(b.s, h.s))) >= 0.8)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, d.source
         |FROM documents d
         |WHERE d.doc_id % 25 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM hit)""".stripMargin,


    "chunk_dedup" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |ch AS (SELECT doc_id, i AS chunk_id, array_to_string(t[(i*40+1):(i*40+50)], ' ') AS chunk
        |  FROM toks, UNNEST(range(0, ((len(t)-1)//40) + 1)) AS u(i) WHERE len(t) >= 1),
        |ranked AS (SELECT doc_id, chunk_id,
        |    count(*) OVER (PARTITION BY chunk) AS n_copies,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_id) AS rn
        |  FROM ch)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(n_copies AS BIGINT) AS n_copies
        |FROM ranked WHERE rn = 1 AND n_copies >= 2""".stripMargin,


    "bigram_logprob" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(t) AS tok FROM toks)),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |       FROM toks, UNNEST(range(1, len(t))) u(i) WHERE len(t) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c) AS c1 FROM c12 GROUP BY w1),
        |p AS (SELECT bg.doc_id, (c12.c + 0.5) / (c1.c1 + 0.5 * v.v) AS p
        |      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(p)), 4) AS avg_logprob
        |FROM p GROUP BY doc_id""".stripMargin,


    "pmi_collocations" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |bg AS (SELECT t[i] AS w1, t[i+1] AS w2
        |       FROM toks, UNNEST(range(1, len(t))) u(i) WHERE len(t) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY w1, w2),
        |tot AS (SELECT sum(n)::DOUBLE AS total FROM c12),
        |cl AS (SELECT w1, sum(n) AS cl FROM c12 GROUP BY w1),
        |cr AS (SELECT w2, sum(n) AS cr FROM c12 GROUP BY w2),
        |r AS (SELECT c12.w1, c12.w2, c12.n, (c12.n * tot.total) / (cl.cl * cr.cr) AS ratio
        |      FROM c12 JOIN cl USING (w1) JOIN cr USING (w2), tot WHERE c12.n >= 5),
        |rk AS (SELECT w1, w2, n, ratio,
        |    row_number() OVER (ORDER BY ratio DESC, w1, w2) AS rk FROM r)
        |SELECT w1, w2, CAST(n AS BIGINT) AS n, round(ln(ratio), 4) AS pmi,
        |  CAST(rk AS BIGINT) AS rk
        |FROM rk WHERE rk <= 20""".stripMargin,


    "length_percentiles" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  round(percent_rank() OVER (PARTITION BY lang ORDER BY length(text)), 6) AS pr
        |FROM documents""".stripMargin,


    // order-independent contract (r10): quantize to the 1e-4 grid, take
    // EXACT integer sums Σxq/Σxq², then identical double arithmetic on
    // both sides — μ/σ no longer depend on either engine's summation
    // order, so round(z, 4) sees bit-identical inputs
    "standardize_embeddings" ->
      s"""WITH $rawEmbCte,
         |e AS (SELECT vec_id, CAST(floor(xx * 10000 + 0.5) AS BIGINT) AS xq, i FROM (
         |      SELECT vec_id, unnest(x) AS xx, unnest(range(len(x))) AS i FROM raw)),
         |st AS (SELECT i, CAST(sum(xq) AS DOUBLE) / count(*) / 10000 AS m,
         |    sqrt(greatest(0, CAST(sum(xq*xq) AS DOUBLE) / count(*) / 100000000
         |      - (CAST(sum(xq) AS DOUBLE) / count(*) / 10000)
         |        * (CAST(sum(xq) AS DOUBLE) / count(*) / 10000))) AS sd
         |  FROM e GROUP BY i)
         |SELECT CAST(e.vec_id AS BIGINT) AS vec_id, CAST(e.i AS BIGINT) AS i,
         |  round(CASE WHEN st.sd > 0 THEN (e.xq / 10000.0 - st.m) / st.sd
         |             ELSE e.xq / 10000.0 - st.m END, 4) AS z
         |FROM e JOIN st USING (i)""".stripMargin,


    "user_features" ->
      """SELECT CAST(user_id AS BIGINT) AS user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
        |  round(sum(value), 4) AS total_value
        |FROM events GROUP BY user_id""".stripMargin,


    "source_overlap" ->
      s"""WITH $shingleCte,
         |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE len(a.s) > 0 AND len(b.s) > 0
         |    AND len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.8)
         |SELECT least(da.source, db.source) AS source_x,
         |  greatest(da.source, db.source) AS source_y,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs p JOIN documents da ON da.doc_id = p.a
         |             JOIN documents db ON db.doc_id = p.b
         |GROUP BY 1, 2""".stripMargin,


    // the portable-HLL register replay (vocab_sketch doctrine) lifted
    // to PAIRWISE sketch algebra: per-source max-rank registers from
    // md5 hex, pairwise union registers by elementwise max, and the
    // estimate expression repeated verbatim per side/union — exact
    // integers (nonzero, rank_sum) pin the register state, the doubles
    // are one shared left-assoc sequence rounded at 4
    "source_overlap_sketch" ->
      """WITH toks AS (SELECT source, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |shs AS (SELECT source, CASE WHEN len(t) >= 3
        |  THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])
        |  ELSE [] END AS s FROM toks),
        |hh AS (SELECT DISTINCT source, md5(g) AS h
        |       FROM (SELECT source, unnest(s) AS g FROM shs)),
        |reg AS (SELECT source,
        |    (strpos('0123456789abcdef', substr(h,1,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(h,2,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(h,3,1))-1) AS idx,
        |    list_sum(list_transform(range(13), i ->
        |      (strpos('0123456789abcdef', substr(h, (4+i)::INT, 1))-1)::BIGINT << (4*(12-i))::INT)) AS tail
        |  FROM hh),
        |rk AS (SELECT source, idx,
        |    max(CASE WHEN tail = 0 THEN 53 ELSE 53 - length(format('{:b}', tail::BIGINT)) END) AS mj
        |  FROM reg GROUP BY source, idx),
        |agg AS (SELECT source, count(*) AS nz, sum(mj) AS rs,
        |    sum(CAST(1::BIGINT << (53 - mj) AS HUGEINT))
        |      + CAST(4096 - count(*) AS HUGEINT) * CAST(1::BIGINT << 53 AS HUGEINT) AS s
        |  FROM rk GROUP BY source),
        |est AS (SELECT source, nz,
        |    CASE WHEN 4096 - nz > 0 AND
        |        0.7213 / (1 + 1.079/4096.0) * 4096.0 * 4096.0 * 9007199254740992.0 / s::DOUBLE <= 2.5 * 4096.0
        |      THEN 4096.0 * ln(4096.0 / (4096 - nz))
        |      ELSE 0.7213 / (1 + 1.079/4096.0) * 4096.0 * 4096.0 * 9007199254740992.0 / s::DOUBLE
        |    END AS e
        |  FROM agg),
        |prs AS (SELECT a.source AS source_a, b.source AS source_b
        |  FROM (SELECT DISTINCT source FROM rk) a
        |  JOIN (SELECT DISTINCT source FROM rk) b ON a.source < b.source),
        |urk AS (SELECT source_a, source_b, idx, max(mj) AS mj FROM (
        |    SELECT p.source_a, p.source_b, r.idx, r.mj
        |    FROM prs p JOIN rk r ON r.source = p.source_a
        |    UNION ALL
        |    SELECT p.source_a, p.source_b, r.idx, r.mj
        |    FROM prs p JOIN rk r ON r.source = p.source_b)
        |  GROUP BY source_a, source_b, idx),
        |uagg AS (SELECT source_a, source_b, count(*) AS nz, sum(mj) AS rs,
        |    sum(CAST(1::BIGINT << (53 - mj) AS HUGEINT))
        |      + CAST(4096 - count(*) AS HUGEINT) * CAST(1::BIGINT << 53 AS HUGEINT) AS s
        |  FROM urk GROUP BY source_a, source_b),
        |uest AS (SELECT source_a, source_b, nz, rs,
        |    CASE WHEN 4096 - nz > 0 AND
        |        0.7213 / (1 + 1.079/4096.0) * 4096.0 * 4096.0 * 9007199254740992.0 / s::DOUBLE <= 2.5 * 4096.0
        |      THEN 4096.0 * ln(4096.0 / (4096 - nz))
        |      ELSE 0.7213 / (1 + 1.079/4096.0) * 4096.0 * 4096.0 * 9007199254740992.0 / s::DOUBLE
        |    END AS e
        |  FROM uagg)
        |SELECT u.source_a, u.source_b,
        |  CAST(ea.nz AS BIGINT) AS nonzero_a,
        |  CAST(eb.nz AS BIGINT) AS nonzero_b,
        |  CAST(u.nz AS BIGINT) AS nonzero_union,
        |  CAST(u.rs AS BIGINT) AS register_sum_union,
        |  round(ea.e, 4) AS est_a,
        |  round(eb.e, 4) AS est_b,
        |  round(u.e, 4) AS est_union,
        |  round(ea.e + eb.e - u.e, 4) AS est_common,
        |  round((ea.e + eb.e - u.e) / u.e, 4) AS jaccard_est
        |FROM uest u JOIN est ea ON ea.source = u.source_a
        |            JOIN est eb ON eb.source = u.source_b""".stripMargin,


    "curation_funnel" ->
      """WITH t AS (SELECT lang, text,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |f AS (SELECT lang IN ('en', 'de') AS f1,
        |    length(text) BETWEEN 100 AND 2000 AS f2,
        |    len(list_distinct(t))::DOUBLE / greatest(len(t), 1) >= 0.3 AS f3,
        |    norm FROM t),
        |a AS (SELECT count(*) AS raw,
        |    count(*) FILTER (f1) AS lang_n,
        |    count(*) FILTER (f1 AND f2) AS len_n,
        |    count(*) FILTER (f1 AND f2 AND f3) AS qual_n,
        |    count(DISTINCT CASE WHEN f1 AND f2 AND f3 THEN norm END) AS dedup_n
        |  FROM f)
        |SELECT '0_raw' AS stage, CAST(raw AS BIGINT) AS n_docs FROM a
        |UNION ALL SELECT '1_lang', CAST(lang_n AS BIGINT) FROM a
        |UNION ALL SELECT '2_length', CAST(len_n AS BIGINT) FROM a
        |UNION ALL SELECT '3_quality', CAST(qual_n AS BIGINT) FROM a
        |UNION ALL SELECT '4_dedup', CAST(dedup_n AS BIGINT) FROM a""".stripMargin,


    "curation_pipeline" ->
      s"""WITH $curationChainCte
         |SELECT CAST(sp.doc_id AS BIGINT) AS doc_id, sp.lang, sp.source,
         |  CAST(sp.rk AS BIGINT) AS rk,
         |  CASE WHEN sp.rk * 100 <= sp.n * 90 THEN 'train'
         |       WHEN sp.rk * 100 <= sp.n * 95 THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(len(ct.t) AS BIGINT) AS n_tokens
         |FROM sp JOIN ct USING (doc_id)""".stripMargin,


    // pack invariants over the PIPELINE's train split: counts re-derived
    // from the curated relation; the packing-dependent bound is the
    // provable TRUE (same contract as pack_invariants)
    "curation_pipeline_pack" ->
      s"""WITH $curationChainCte,
         |tr AS (SELECT doc_id FROM sp WHERE rk * 100 <= n * 90),
         |pt AS (SELECT len(ct.t) AS ntok FROM ct JOIN tr USING (doc_id))
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS distinct_docs,
         |  CAST(coalesce(sum(ntok), 0) AS BIGINT) AS total_tokens,
         |  CAST(count(*) FILTER (WHERE ntok > 512) AS BIGINT) AS oversize_bins,
         |  CAST(0 AS BIGINT) AS overfull_bins,
         |  TRUE AS bins_within_bound
         |FROM pt""".stripMargin,


    // the semantic-guard pipeline twin: the shared clean `cd` CTE, then
    // the decontaminate_semantic cross join keeping strict < threshold,
    // then domain_mix's md5 window and split_assign's integer bucket
    "curation_pipeline_sem" ->
      s"""WITH $cleanCdCte,
         |ev AS (SELECT embedding::DOUBLE[] AS x FROM embeddings WHERE vec_id % 25 = 0),
         |sem AS (SELECT t.vec_id AS doc_id
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
         |        WHERE vec_id % 25 <> 0) t CROSS JOIN ev
         |  GROUP BY t.vec_id
         |  HAVING max(list_cosine_similarity(t.x, ev.x)) < 0.35),
         |dc AS (SELECT cd.doc_id, cd.lang, cd.source FROM cd JOIN sem USING (doc_id)),
         |dm AS (SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM dc)
         |  WHERE rk <= 50),
         |kept AS (SELECT dc.doc_id, dc.lang, dc.source,
         |    CAST((((dc.doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS BIGINT) AS bucket
         |  FROM dc JOIN dm USING (doc_id))
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source, bucket,
         |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM kept""".stripMargin,


    "event_drift" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |types AS (SELECT DISTINCT event_type FROM daily),
        |tc AS (SELECT count(*) AS t_cnt FROM types),
        |tot AS (SELECT day, sum(c) AS tot FROM daily GROUP BY day),
        |grid AS (SELECT t.day, ty.event_type, t.tot,
        |    (coalesce(d.c, 0) + 1.0) / (t.tot + tc.t_cnt) AS p
        |  FROM tot t CROSS JOIN types ty
        |  LEFT JOIN daily d ON d.day = t.day AND d.event_type = ty.event_type, tc),
        |lagged AS (SELECT day, tot, p,
        |    lag(p) OVER (PARTITION BY event_type ORDER BY day) AS pp FROM grid)
        |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(max(tot) AS BIGINT) AS n_events,
        |  round(sum(p * ln(p / pp)), 6) AS kl
        |FROM lagged WHERE pp IS NOT NULL GROUP BY day""".stripMargin,


    "mixture_weights" ->
      """WITH c AS (SELECT source, count(*) AS n,
        |    sum(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS toks
        |  FROM documents GROUP BY source),
        |z AS (SELECT sum(pow(n, 0.5)) AS z FROM c)
        |SELECT source, CAST(n AS BIGINT) AS n_docs, CAST(toks AS BIGINT) AS n_tokens,
        |  round(pow(n, 0.5) / z, 6) AS weight,
        |  CAST(round(1000 * pow(n, 0.5) / z) AS BIGINT) AS expected_docs,
        |  round(1000 * pow(n, 0.5) / z / n, 4) AS epochs
        |FROM c, z""".stripMargin,


    "lang_confusion" ->
      """SELECT lang,
        |  CASE WHEN best.s > 0 THEN best.l ELSE 'und' END AS pred,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM (
        |  SELECT lang, list_max([
        |    {'s': len(list_distinct(list_intersect(t, ['the','and','of','to','a','in','is','that','for','with']))), 'l': 'en'},
        |    {'s': len(list_distinct(list_intersect(t, ['der','die','das','und','ist','von','mit','ein','nicht','auf']))), 'l': 'de'},
        |    {'s': len(list_distinct(list_intersect(t, ['le','la','les','et','de','est','un','une','pour','dans']))), 'l': 'fr'},
        |    {'s': len(list_distinct(list_intersect(t, ['el','la','los','y','de','es','un','una','por','con']))), 'l': 'es'}
        |  ]) AS best
        |  FROM (SELECT lang, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |        FROM documents))
        |GROUP BY 1, 2""".stripMargin,


    // the trained-langID replay: hashed token buckets (md5 word 1, the
    // hash_embed cell idiom) → per-bucket majority label on the
    // doc_id%10<8 train split → holdout per-doc majority vote; every
    // argmax is integer counts with (count desc, label asc) ties
    "lang_id_trained" ->
      """WITH toks AS (SELECT doc_id, lang, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
        |feat AS (SELECT doc_id, lang,
        |    list_sum(list_transform(range(8), j ->
        |      (strpos('0123456789abcdef', substr(md5(tok), (j+1)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 1024 AS b
        |  FROM toks),
        |prof AS (SELECT b, lang, count(*) AS c FROM feat WHERE doc_id % 10 < 8 GROUP BY 1, 2),
        |blab AS (SELECT b, lang AS plang FROM (
        |    SELECT b, lang, row_number() OVER (PARTITION BY b ORDER BY c DESC, lang) AS rn FROM prof)
        |  WHERE rn = 1),
        |votes AS (SELECT f.doc_id, f.lang, bl.plang, count(*) AS v
        |  FROM feat f JOIN blab bl ON bl.b = f.b WHERE f.doc_id % 10 >= 8 GROUP BY 1, 2, 3),
        |pred AS (SELECT doc_id, lang, plang FROM (
        |    SELECT doc_id, lang, plang, row_number() OVER (PARTITION BY doc_id ORDER BY v DESC, plang) AS rn FROM votes)
        |  WHERE rn = 1)
        |SELECT lang, plang AS predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2""".stripMargin,


    // quality_tiers' label chain + lang_id_trained's classifier chain,
    // composed: tier labels from the integer LM-plausibility tertiles,
    // then the hashed-bucket majority train / holdout vote — every step
    // an integer count or a (count desc, label asc) argmax, replayed here
    "quality_classifier" ->
      """WITH tk AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
        |ct AS (SELECT tok, length(bin(count(*)::BIGINT)) AS bl FROM tk GROUP BY tok),
        |pd AS (SELECT doc_id, count(*) AS n_tokens, sum(bl) AS sum_bl
        |  FROM tk JOIN ct USING (tok) GROUP BY doc_id),
        |sc AS (SELECT d.doc_id, d.lang,
        |    CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN 0.0
        |         ELSE coalesce(pd.sum_bl, 0)::DOUBLE / pd.n_tokens END AS avg_bl
        |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id),
        |rkd AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY avg_bl DESC, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n FROM sc),
        |tiers AS (SELECT doc_id,
        |    CASE WHEN rk*3 <= n THEN 'head'
        |         WHEN rk*3 <= n*2 THEN 'middle' ELSE 'tail' END AS tier
        |  FROM rkd),
        |feat AS (SELECT t.doc_id, ti.tier,
        |    list_sum(list_transform(range(8), j ->
        |      (strpos('0123456789abcdef', substr(md5(t.tok), (j+1)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 1024 AS b
        |  FROM tk t JOIN tiers ti USING (doc_id)),
        |prof AS (SELECT b, tier, count(*) AS c FROM feat WHERE doc_id % 10 < 8 GROUP BY 1, 2),
        |blab AS (SELECT b, tier AS ptier FROM (
        |    SELECT b, tier, row_number() OVER (PARTITION BY b ORDER BY c DESC, tier) AS rn FROM prof)
        |  WHERE rn = 1),
        |votes AS (SELECT f.doc_id, f.tier, bl.ptier, count(*) AS v
        |  FROM feat f JOIN blab bl ON bl.b = f.b WHERE f.doc_id % 10 >= 8 GROUP BY 1, 2, 3),
        |pred AS (SELECT doc_id, tier, ptier FROM (
        |    SELECT doc_id, tier, ptier, row_number() OVER (PARTITION BY doc_id ORDER BY v DESC, ptier) AS rn FROM votes)
        |  WHERE rn = 1)
        |SELECT tier, ptier AS predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2""".stripMargin,


    "split_balance" ->
      """WITH s AS (SELECT lang,
        |    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
        |    len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS toks
        |  FROM (SELECT lang, text,
        |          CAST((((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS BIGINT) AS b
        |        FROM documents)),
        |c AS (SELECT split, lang, count(*) AS n_docs, sum(toks) AS n_tokens
        |      FROM s GROUP BY split, lang)
        |SELECT split, lang, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(n_docs::DOUBLE / sum(n_docs) OVER (PARTITION BY split), 6) AS share
        |FROM c""".stripMargin,


    "split_stratified" ->
      """WITH r AS (SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang, source) AS n
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
        |  CAST(rk AS BIGINT) AS rk,
        |  CASE WHEN rk * 100 <= n * 90 THEN 'train'
        |       WHEN rk * 100 <= n * 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r""".stripMargin,


    // A-ES twin: u re-derived digit-wise from the md5 hex (same integer,
    // same double); ln and the division replay on identical inputs
    "weighted_sample" ->
      """WITH t AS (SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (SELECT doc_id, n_tokens,
        |    ln((list_sum([CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS BIGINT)
        |          * CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)]) + 1)::DOUBLE
        |       / 4294967297) / n_tokens AS priority
        |  FROM t WHERE n_tokens >= 1),
        |rk AS (SELECT doc_id, n_tokens, priority,
        |    row_number() OVER (ORDER BY priority DESC, doc_id) AS rk FROM s)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(priority, 6) AS priority, CAST(rk AS BIGINT) AS rk
        |FROM rk WHERE rk <= 100""".stripMargin,


    "budget_sample" ->
      """WITH t AS (SELECT doc_id, source,
        |    len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM t)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
        |  CAST(n_tokens AS BIGINT) AS n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 1000""".stripMargin,


    "domain_mix" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, source, CAST(rk AS BIGINT) AS rk
        |FROM (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |      FROM documents)
        |WHERE rk <= 10""".stripMargin,


    "tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term),
        |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |dft AS (SELECT term, ln((SELECT n + 1 FROM n) / (count(*) + 1)) + 1 AS idf
        |        FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf * dft.idf AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * dft.idf DESC, tf.term) AS rk
        |  FROM tf JOIN dft USING (term))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, term,
        |  round(score, 4) AS tfidf, CAST(rk AS BIGINT) AS rk
        |FROM scored WHERE rk <= 5""".stripMargin,


    "bottomk_sketch" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |hashed AS (SELECT doc_id, md5(g) AS h FROM ex),
         |ranked AS (SELECT doc_id, h,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rk
         |  FROM hashed)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rk AS BIGINT) AS rk, h
         |FROM ranked WHERE rk <= 5""".stripMargin,


    "dedup_minhash" ->
      s"""WITH $shingleCte
         |SELECT CAST(a.doc_id AS BIGINT) AS a, CAST(b.doc_id AS BIGINT) AS b,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))), 3) AS jac
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(a.s) > 0 AND len(b.s) > 0
         |  AND len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.8""".stripMargin,


    // exact containment replay: numerator over the 2..maxDf indexed
    // vocabulary, denominator the FULL distinct gram count — the same
    // numerator-only truncation as the operator, so the gate is exact
    "dedup_containment" ->
      s"""WITH $shingleCte,
         |dg AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |voc AS (SELECT g FROM (SELECT g, count(*) AS df FROM dg GROUP BY g)
         |        WHERE df BETWEEN 2 AND 50),
         |idx AS (SELECT doc_id, g FROM dg JOIN voc USING (g)),
         |sizes AS (SELECT doc_id, count(*) AS n_grams FROM dg GROUP BY doc_id),
         |common AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_common
         |  FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id <> b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT CAST(c.a AS BIGINT) AS contained, CAST(c.b AS BIGINT) AS container,
         |  CAST(c.n_common AS BIGINT) AS n_common,
         |  CAST(s.n_grams AS BIGINT) AS n_grams,
         |  round(c.n_common::DOUBLE / s.n_grams, 4) AS containment
         |FROM common c JOIN sizes s ON s.doc_id = c.a
         |WHERE c.n_common::DOUBLE / s.n_grams >= 0.8""".stripMargin,


    // transitive closure of the exact near-dup pair relation via a
    // recursive CTE (cheap at sf0.01: 24 pairs), then min-id per cluster
    "dedup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
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
         |clust AS (SELECT x AS doc_id, LEAST(x, MIN(y)) AS cluster_id FROM reach GROUP BY x)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |       CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
         |       COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS keep
         |FROM documents d LEFT JOIN clust c ON c.doc_id = d.doc_id""".stripMargin,


    // same transitive closure, best-keeper policy: the representative is
    // the cluster's longest doc (n_chars DESC, doc_id ASC) — the exact
    // integer argmax TextOps.dedupKeepBest computes via max(struct)
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $shingleCte,
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
         |    CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
         |    CAST(d.n_chars AS BIGINT) AS n_chars
         |  FROM documents d LEFT JOIN clust c ON c.doc_id = d.doc_id),
         |best AS (SELECT cluster_id, doc_id AS best_doc FROM (
         |    SELECT cluster_id, doc_id,
         |      row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC) AS rn
         |    FROM asg) WHERE rn = 1)
         |SELECT a.doc_id, a.cluster_id, a.doc_id = b.best_doc AS keep
         |FROM asg a JOIN best b USING (cluster_id)""".stripMargin,


    "lang_id" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CASE WHEN best.s > 0 THEN best.l ELSE 'und' END AS lang_pred
        |FROM (
        |  SELECT doc_id, list_max([
        |    {'s': len(list_distinct(list_intersect(t, ['the','and','of','to','a','in','is','that','for','with']))), 'l': 'en'},
        |    {'s': len(list_distinct(list_intersect(t, ['der','die','das','und','ist','von','mit','ein','nicht','auf']))), 'l': 'de'},
        |    {'s': len(list_distinct(list_intersect(t, ['le','la','les','et','de','est','un','une','pour','dans']))), 'l': 'fr'},
        |    {'s': len(list_distinct(list_intersect(t, ['el','la','los','y','de','es','un','una','por','con']))), 'l': 'es'}
        |  ]) AS best
        |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |        FROM documents))""".stripMargin,


    "profile_documents" ->
      """SELECT 'doc_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
        |  CAST(min(doc_id) AS VARCHAR) AS min_value, CAST(max(doc_id) AS VARCHAR) AS max_value
        |FROM documents
        |UNION ALL SELECT 'lang', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(lang) AS BIGINT), CAST(count(DISTINCT lang) AS BIGINT),
        |  CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
        |UNION ALL SELECT 'source', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(source) AS BIGINT), CAST(count(DISTINCT source) AS BIGINT),
        |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
        |UNION ALL SELECT 'n_chars', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(n_chars) AS BIGINT), CAST(count(DISTINCT n_chars) AS BIGINT),
        |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents""".stripMargin,


    // hybrid RRF: BM25 in integer micros (floor per (doc,term) BEFORE
    // the sum — rank never hangs on float addend order), hashEmbed
    // cosine on raw bit-identical folds, 1/(60+r) fusion floored to
    // nano-units; candidate cut 100 per channel, final top-20 on
    // (rrf_m desc, doc_id)
    "hybrid_rrf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
         |st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |q AS (SELECT tf.doc_id, tf.tok, tf.tf, dl.dl FROM tf JOIN dl USING (doc_id)
         |      WHERE tok IN ('spark', 'join', 'window')),
         |d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM q GROUP BY tok),
         |lex AS (SELECT q.doc_id,
         |    sum(CAST(floor(ln((st.n - d.df + 0.5) / (d.df + 0.5) + 1)
         |        * (q.tf * 2.2) / (q.tf + 1.2 * (0.25 + 0.75 * q.dl / st.avgdl)) * 1e6) AS BIGINT)) AS m
         |  FROM q JOIN d USING (tok), st GROUP BY q.doc_id),
         |lexr AS (SELECT doc_id, row_number() OVER (ORDER BY m DESC, doc_id) AS lr
         |         FROM lex QUALIFY lr <= 100),
         |cnt AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
         |h AS (SELECT doc_id, md5(tok) AS h, cnt FROM cnt),
         |cell AS (SELECT doc_id,
         |    list_sum(list_transform(range(8), j ->
         |      (strpos('0123456789abcdef', substr(h, (j+1)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 64 AS j,
         |    CASE WHEN list_sum(list_transform(range(8), j ->
         |      (strpos('0123456789abcdef', substr(h, (j+9)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 2 = 0
         |      THEN cnt ELSE -cnt END AS v
         |  FROM h),
         |agg AS (SELECT doc_id, j, sum(v) AS v FROM cell GROUP BY 1, 2),
         |grid AS (SELECT d2.doc_id, g.range AS j
         |  FROM (SELECT DISTINCT doc_id FROM cnt) d2 CROSS JOIN range(64) g),
         |rows0 AS (SELECT grid.doc_id, grid.j, coalesce(a.v, 0) AS v
         |  FROM grid LEFT JOIN agg a ON a.doc_id = grid.doc_id AND a.j = grid.j),
         |hv AS (SELECT doc_id, list(v::DOUBLE ORDER BY j) AS x FROM rows0 GROUP BY doc_id
         |       HAVING max(abs(v)) > 0),
         |qtok AS (SELECT tok, count(*) AS cnt FROM (VALUES ('spark'), ('join'), ('window')) t(tok) GROUP BY tok),
         |qh AS (SELECT md5(tok) AS h, cnt FROM qtok),
         |qcell AS (SELECT
         |    list_sum(list_transform(range(8), j ->
         |      (strpos('0123456789abcdef', substr(h, (j+1)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 64 AS j,
         |    CASE WHEN list_sum(list_transform(range(8), j ->
         |      (strpos('0123456789abcdef', substr(h, (j+9)::INT, 1))-1)::BIGINT << (4*(7-j))::INT)) % 2 = 0
         |      THEN cnt ELSE -cnt END AS v
         |  FROM qh),
         |qagg AS (SELECT j, sum(v) AS v FROM qcell GROUP BY 1),
         |qvec AS (SELECT list(coalesce(qa.v, 0)::DOUBLE ORDER BY g.range) AS qx
         |  FROM range(64) g LEFT JOIN qagg qa ON qa.j = g.range),
         |vs AS (SELECT hv.doc_id AS nb, list_cosine_similarity(qx, x) AS sim FROM hv, qvec),
         |vecr AS (SELECT nb, row_number() OVER (ORDER BY sim DESC, nb) AS vr
         |         FROM vs QUALIFY vr <= 100),
         |f AS (SELECT coalesce(l.doc_id, v.nb) AS doc_id, l.lr, v.vr
         |      FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.nb)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(coalesce(lr, 0) AS BIGINT) AS lex_rank,
         |  CAST(coalesce(vr, 0) AS BIGINT) AS vec_rank,
         |  CAST(floor((coalesce(1.0/(60+lr), 0) + coalesce(1.0/(60+vr), 0)) * 1e9) AS BIGINT) AS rrf_m
         |FROM f ORDER BY rrf_m DESC, doc_id LIMIT 20""".stripMargin,


    // BM25 closed form: Robertson idf ln((N-df+.5)/(df+.5)+1), k1=1.2,
    // b=0.75 (see TextOps.bm25Scores)
    "bm25_scores" ->
      """WITH ex AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
        |            FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM ex GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT tf.doc_id, tf.tok, tf.tf, dl.dl FROM tf JOIN dl USING (doc_id)
        |      WHERE tok IN ('spark', 'join', 'window')),
        |d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM q GROUP BY tok)
        |SELECT CAST(q.doc_id AS BIGINT) AS doc_id,
        |  round(sum(ln((st.n - d.df + 0.5) / (d.df + 0.5) + 1)
        |            * (q.tf * 2.2) / (q.tf + 1.2 * (0.25 + 0.75 * q.dl / st.avgdl))), 4) AS bm25
        |FROM q JOIN d USING (tok), st
        |GROUP BY q.doc_id""".stripMargin,
  )
}
