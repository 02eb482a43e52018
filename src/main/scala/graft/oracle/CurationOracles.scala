package graft.oracle

import Ctes._
import graft.pipeline.TextOps

/** DuckDB oracle twins — training-data curation: packing, splits,
  * decontamination, multimodal metadata, vocab/quantile artifacts.
  * Same column names/types/values as the SparkEntry.queries entries they
  * mirror; the driver hash-compares them per round. */
object CurationOracles {
  val sql: Map[String, String] = Map(

    // BFD packing contract (pack_invariants): everything but the bound
    // booleans re-derived from the raw docs; the packing-dependent bound
    // is emitted as a provable TRUE (see the query's scaladoc).
    // the BFD recurrence replayed per shard: items in (n desc, doc_id)
    // order step through a recursive CTE whose state is the per-bin
    // load list; the best-fit choice is the lexicographic min of
    // [remaining, index] over bins with remaining ≥ max(n, 1) — exactly
    // the aggregate's canonical (tightest, lowest-index) rule. Depth =
    // docs per shard; sf0.01-gate class (the sf1 replay carries
    // len(asg)≈6k list states — budget accordingly)
    "pack_sequences" ->
      """WITH RECURSIVE
        |t0 AS (SELECT doc_id, len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n FROM documents),
        |it AS (SELECT doc_id % 8 AS shard, doc_id, n,
        |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY n DESC, doc_id) AS pos
        |       FROM t0),
        |cnt AS (SELECT shard, count(*) AS m FROM it GROUP BY shard),
        |st AS (
        |  SELECT shard, 0::BIGINT AS step, []::BIGINT[] AS loads,
        |         []::STRUCT(d BIGINT, b INT)[] AS asg
        |  FROM cnt
        |  UNION ALL
        |  SELECT s.shard, s.step + 1,
        |    CASE WHEN x.best IS NULL THEN list_append(s.loads, i.n)
        |         ELSE list_transform(range(len(s.loads)), j ->
        |                CASE WHEN j = x.best THEN s.loads[(j+1)::INT] + i.n
        |                     ELSE s.loads[(j+1)::INT] END)
        |    END,
        |    list_append(s.asg, {d: i.doc_id, b: coalesce(x.best, len(s.loads))::INT})
        |  FROM st s
        |  JOIN it i ON i.shard = s.shard AND i.pos = s.step + 1
        |  CROSS JOIN LATERAL (SELECT list_sort(list_filter(
        |      list_transform(range(len(s.loads)), j -> [512 - s.loads[(j+1)::INT], j]),
        |      p -> p[1] >= greatest(i.n, 1)))[1][2] AS best) x
        |),
        |fin AS (SELECT s.shard, s.asg FROM st s JOIN cnt c ON s.shard = c.shard AND s.step = c.m),
        |mem AS (SELECT shard, a.d AS doc_id, a.b AS b
        |        FROM (SELECT shard, unnest(asg) AS a FROM fin))
        |SELECT shard || '-' || b AS bin_id, CAST(count(*) AS INT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS total_tokens
        |FROM mem JOIN it USING (shard, doc_id)
        |GROUP BY 1""".stripMargin,


    "pack_invariants" ->
      """WITH toks AS (SELECT doc_id, len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS distinct_docs,
        |  CAST(sum(n) AS BIGINT) AS total_tokens,
        |  CAST(count(*) FILTER (WHERE n > 512) AS BIGINT) AS oversize_bins,
        |  CAST(0 AS BIGINT) AS overfull_bins,
        |  TRUE AS bins_within_bound
        |FROM toks""".stripMargin,


    "label_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, round(sqrt(sum(m * m)), 4) AS centroid_norm
        |FROM (SELECT label, i, avg(x) AS m
        |      FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
        |                   unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)
        |      GROUP BY label, i)
        |GROUP BY label""".stripMargin,


    "label_centroid_vectors" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i, round(avg(x), 6) AS m
        |FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings)
        |GROUP BY label, i""".stripMargin,

    "similar_docs" ->
      s"""WITH $shingleCte,
        |q AS (SELECT doc_id AS qid, s AS qs FROM sh WHERE doc_id = 0),
        |scored AS (SELECT qid AS q, doc_id AS nb,
        |    len(list_intersect(qs, s)) / (len(qs) + len(s) - len(list_intersect(qs, s))) AS jac
        |  FROM sh, q WHERE doc_id <> qid AND len(qs) > 0
        |    AND (len(qs) + len(s) - len(list_intersect(qs, s))) > 0)
        |SELECT q, nb, round(jac, 4) AS jac FROM scored
        |ORDER BY scored.jac DESC, nb LIMIT 10""".stripMargin,


    "repetition_stats" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
        |ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |cnt AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY 1, 2),
        |agg AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top_c FROM cnt GROUP BY 1)
        |SELECT t.doc_id, CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
        |  round(coalesce(n_distinct / n_tokens, 0), 4) AS distinct_ratio,
        |  round(coalesce(top_c / n_tokens, 0), 4) AS top_token_ratio,
        |  CASE WHEN len(t.t) >= 2
        |    THEN round(len(list_distinct([t.t[i] || ' ' || t.t[i+1] for i in range(1, len(t.t))])) / (len(t.t) - 1), 4)
        |    ELSE 1.0 END AS bigram_distinct_ratio
        |FROM toks t LEFT JOIN agg ON t.doc_id = agg.doc_id""".stripMargin,


    "pii_scrub" ->
      ("""WITH pii AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com from 10.0.' ||
        |  (doc_id % 256) || '.1 call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || '-1234' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '""" + TextOps.emailPattern + """')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '""" + TextOps.ipv4Pattern + """')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '""" + TextOps.phonePattern + """')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '""" + TextOps.emailPattern + """', '[EMAIL]', 'g'),
        |    '""" + TextOps.ipv4Pattern + """', '[IP]', 'g'),
        |    '""" + TextOps.phonePattern + """', '[PHONE]', 'g') AS redacted
        |FROM pii""").stripMargin,


    // multimodal_meta: the Spark side renders real container bytes and
    // walks the headers back; the twin re-derives the SAME fields from
    // MediaSynth's doc_id arithmetic (MediaSynth.scala rules) — the
    // only way both agree is if the byte round-trip is exact.
    "multimodal_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
        |       WHEN 3 THEN 'wav' WHEN 4 THEN 'mp4/isom' ELSE 'jpeg' END AS format,
        |  CASE WHEN doc_id % 6 IN (0,1,2,4,5) THEN CAST(doc_id % 640 + 16 AS INT) END AS width,
        |  CASE WHEN doc_id % 6 IN (0,1,2,4,5) THEN CAST(doc_id % 360 + 9 AS INT) END AS height,
        |  CASE WHEN doc_id % 6 = 3 THEN CAST(doc_id % 2 + 1 AS INT) END AS channels,
        |  CASE WHEN doc_id % 6 = 3 THEN CAST(8000 * (doc_id % 3 + 1) AS INT) END AS sample_rate,
        |  CASE WHEN doc_id % 6 = 3 THEN CAST(100 * (doc_id % 10 + 1) AS BIGINT)
        |       WHEN doc_id % 6 = 4 THEN CAST(500 * (doc_id % 8 + 1) AS BIGINT) END AS duration_ms
        |FROM documents""".stripMargin,


    // the per-format aggregate of the same arithmetic: integer counts
    // and sums only (sum skips each format's null fields both sides)
    "media_stats" ->
      """WITH m AS (SELECT doc_id,
        |  CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
        |       WHEN 3 THEN 'wav' WHEN 4 THEN 'mp4/isom' ELSE 'jpeg' END AS format,
        |  CASE WHEN doc_id % 6 IN (0,1,2,4,5) THEN CAST(doc_id % 640 + 16 AS BIGINT) END AS width,
        |  CASE WHEN doc_id % 6 IN (0,1,2,4,5) THEN CAST(doc_id % 360 + 9 AS BIGINT) END AS height,
        |  CASE WHEN doc_id % 6 = 3 THEN CAST(100 * (doc_id % 10 + 1) AS BIGINT)
        |       WHEN doc_id % 6 = 4 THEN CAST(500 * (doc_id % 8 + 1) AS BIGINT) END AS duration_ms
        |FROM documents)
        |SELECT format, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(width) AS BIGINT) AS sum_width,
        |  CAST(sum(height) AS BIGINT) AS sum_height,
        |  CAST(sum(duration_ms) AS BIGINT) AS sum_duration_ms
        |FROM m GROUP BY format""".stripMargin,


    // content-equality classes re-derived from the GENERATIVE params
    // (bytes are a pure function of them: images/mp4 of d%6,d%640,d%360
    // [,d%8]; wav of d%2,d%3,d%10) — independent of the digest the
    // Spark side groups on, so a digest bug cannot self-confirm
    "multimodal_dedup" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 6 = 3 THEN 'audio'
        |         WHEN doc_id % 6 = 4 THEN 'video' ELSE 'image' END AS kind,
        |    CASE WHEN doc_id % 6 = 3
        |           THEN 'a:' || (doc_id % 2) || ':' || (doc_id % 3) || ':' || (doc_id % 10)
        |         WHEN doc_id % 6 = 4
        |           THEN 'v:' || (doc_id % 640) || ':' || (doc_id % 360) || ':' || (doc_id % 8)
        |         ELSE 'i' || (doc_id % 6) || ':' || (doc_id % 640) || ':' || (doc_id % 360)
        |    END AS k
        |  FROM documents),
        |g AS (SELECT k, min(media_id) AS rep, count(*) AS n_copies FROM m GROUP BY k)
        |SELECT CAST(m.media_id AS BIGINT) AS media_id, m.kind,
        |  CAST(g.rep AS BIGINT) AS rep, CAST(g.n_copies AS BIGINT) AS n_copies,
        |  m.media_id = g.rep AS keep
        |FROM m JOIN g USING (k)""".stripMargin,


    // byte-level near-dup classes re-derived generatively: originals ∪
    // the planted truncation (d%7=3 → +10⁹) and suffix (d%7=5 → +2·10⁹)
    // variants, clustered by the BASE's byte class — the Spark side must
    // recover exactly these clusters from aligned-chunk fingerprints
    // over the raw payloads (the twin never sees a byte)
    "multimodal_neardup" ->
      """WITH base AS (SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 3 THEN 'audio'
        |         WHEN doc_id % 6 = 4 THEN 'video' ELSE 'image' END AS kind,
        |    CASE WHEN doc_id % 6 = 3
        |           THEN 'a:' || (doc_id % 2) || ':' || (doc_id % 3) || ':' || (doc_id % 10)
        |         WHEN doc_id % 6 = 4
        |           THEN 'v:' || (doc_id % 640) || ':' || (doc_id % 360) || ':' || (doc_id % 8)
        |         ELSE 'i' || (doc_id % 6) || ':' || (doc_id % 640) || ':' || (doc_id % 360)
        |    END AS k
        |  FROM documents),
        |m AS (SELECT doc_id AS media_id, kind, k FROM base
        |  UNION ALL SELECT doc_id + 1000000000, kind, k FROM base WHERE doc_id % 7 = 3
        |  UNION ALL SELECT doc_id + 2000000000, kind, k FROM base WHERE doc_id % 7 = 5),
        |g AS (SELECT k, min(media_id) AS rep, count(*) AS n_members FROM m GROUP BY k)
        |SELECT CAST(m.media_id AS BIGINT) AS media_id, m.kind,
        |  CAST(g.rep AS BIGINT) AS rep, CAST(g.n_members AS BIGINT) AS n_members,
        |  m.media_id = g.rep AS keep
        |FROM m JOIN g USING (k)""".stripMargin,


    // perceptual near-dup classes re-derived generatively: decodable
    // fixture ids split even→image class (d//2)%24, odd→audio class
    // (d//2)%20; d%3==1 plants a +10⁹ variant (brightness-shifted
    // pixels / volume-halved samples) sharing the base's class but no
    // payload byte — the Spark side must recover exactly these
    // clusters from DECODED features (the twin never sees a byte)
    "multimodal_perceptual" ->
      """WITH base AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |    CASE WHEN doc_id % 2 = 0 THEN 'i:' || ((doc_id // 2) % 24)
        |         ELSE 'a:' || ((doc_id // 2) % 20) END AS k
        |  FROM documents),
        |m AS (SELECT doc_id AS media_id, kind, k FROM base
        |  UNION ALL SELECT doc_id + 1000000000, kind, k FROM base WHERE doc_id % 3 = 1),
        |g AS (SELECT kind, k, min(media_id) AS rep, count(*) AS n_members
        |      FROM m GROUP BY kind, k)
        |SELECT CAST(m.media_id AS BIGINT) AS media_id, m.kind,
        |  CAST(g.rep AS BIGINT) AS rep, CAST(g.n_members AS BIGINT) AS n_members,
        |  m.media_id = g.rep AS keep
        |FROM m JOIN g USING (kind, k)""".stripMargin,


    // GIF perceptual classes, same generative pattern: every id is a
    // GIF of class d % 24; d%3==1 plants a +10⁹ palette-permuted,
    // brightness-shifted re-encode sharing the class but no payload
    // byte — the Spark side must recover the class clusters from the
    // LZW-DECODED pixels (the twin never sees a byte)
    "multimodal_perceptual_gif" ->
      """WITH base AS (SELECT doc_id, 'image' AS kind,
        |    'g:' || (doc_id % 24) AS k FROM documents),
        |m AS (SELECT doc_id AS media_id, kind, k FROM base
        |  UNION ALL SELECT doc_id + 1000000000, kind, k FROM base WHERE doc_id % 3 = 1),
        |g AS (SELECT kind, k, min(media_id) AS rep, count(*) AS n_members
        |      FROM m GROUP BY kind, k)
        |SELECT CAST(m.media_id AS BIGINT) AS media_id, m.kind,
        |  CAST(g.rep AS BIGINT) AS rep, CAST(g.n_members AS BIGINT) AS n_members,
        |  m.media_id = g.rep AS keep
        |FROM m JOIN g USING (kind, k)""".stripMargin,


    // CDC near-dup invariants (the pack_invariants pattern): content-
    // defined chunk layouts can't be replayed in SQL, but the expected
    // invariant row is pure planted-id arithmetic — coverage counts
    // from the d%7 variant families (1→insertion, 2→exact copy,
    // 3→truncation, 5→suffix), violation columns pinned at 0
    "cdc_invariants" ->
      """WITH f AS (SELECT
        |    count(*) AS n_base,
        |    count(*) FILTER (WHERE doc_id % 7 = 1) AS n_ins,
        |    count(*) FILTER (WHERE doc_id % 7 = 2) AS n_exact,
        |    count(*) FILTER (WHERE doc_id % 7 = 3) AS n_trunc,
        |    count(*) FILTER (WHERE doc_id % 7 = 5) AS n_suffix
        |  FROM documents)
        |SELECT
        |  CAST(n_base + n_ins + n_exact + n_trunc + n_suffix AS BIGINT) AS n_rows,
        |  CAST(n_base + n_ins + n_exact + n_trunc + n_suffix AS BIGINT) AS n_media,
        |  CAST(0 AS BIGINT) AS bad_keep,
        |  CAST(0 AS BIGINT) AS multi_keep,
        |  CAST(0 AS BIGINT) AS bad_members,
        |  CAST(n_trunc AS BIGINT) AS n_trunc,
        |  CAST(0 AS BIGINT) AS trunc_split,
        |  CAST(n_suffix AS BIGINT) AS n_suffix,
        |  CAST(0 AS BIGINT) AS suffix_split,
        |  CAST(n_ins AS BIGINT) AS n_ins,
        |  CAST(0 AS BIGINT) AS ins_split,
        |  CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST(0 AS BIGINT) AS exact_split,
        |  CAST(0 AS BIGINT) AS short_chunks
        |FROM f""".stripMargin,


    // deterministic shard + shuffled in-shard position, both pure
    // portable integer-hash functions of doc_id (split_assign family;
    // the second multiplicative constant is the public xxhash prime)
    "shard_manifest" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST((((doc_id % 2147483648) * 2654435761) % 4294967296) % 8 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY (((doc_id % 2147483648) * 2654435761) % 4294967296) % 8
        |    ORDER BY ((doc_id % 2147483648) * 2246822519) % 4294967296, doc_id) AS BIGINT) AS pos
        |FROM documents""".stripMargin,

    "split_assign" ->
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST((((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS BIGINT) AS bucket
        |      FROM documents)""".stripMargin,


    // the dedup_clusters closure + split_assign's integer bucket
    // arithmetic keyed on cluster_id: every cluster member inherits one
    // split (quadratic exact-pair twin — sf0.01-gate class, like
    // dedup_clusters)
    "split_leakage_safe" ->
      s"""WITH RECURSIVE $clusterClosureCtes
         |SELECT doc_id, cluster_id, keep,
         |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT *,
         |        (((cluster_id % 2147483648) * 2654435761) % 4294967296) % 100 AS bucket
         |      FROM asg)""".stripMargin,


    "chunk_docs" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents)
        |SELECT doc_id, i AS chunk_id, array_to_string(t[(i*40+1):(i*40+50)], ' ') AS chunk,
        |       CAST(least(50, len(t) - i*40) AS BIGINT) AS n_chunk_tokens
        |FROM toks, UNNEST(range(0, ((len(t)-1)//40) + 1)) AS u(i)
        |WHERE len(t) >= 1""".stripMargin,


    "quantize_int8" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |s AS (SELECT vec_id, x, list_max(list_transform(x, a -> abs(a))) / 127 AS scale FROM v)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  round(sqrt(list_sum(list_transform(x, a -> pow(a - round(a/scale)*scale, 2))) / len(x)), 6) AS rms_err
        |FROM s WHERE scale > 0""".stripMargin,


    "decontaminate" ->
      s"""WITH $shingleCte,
        |ev AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 25 = 0),
        |tr AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id % 25 <> 0)
        |SELECT CAST(tr.doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id""".stripMargin,


    // max over eval cosines per train vector; each pairwise cosine is the
    // same left-to-right double fold in both engines (the ann_topk-proven
    // list_cosine_similarity twin) and max commutes exactly
    "decontaminate_semantic" ->
      """WITH ev AS (SELECT embedding::DOUBLE[] AS x FROM embeddings WHERE vec_id < 16),
        |tr AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings WHERE vec_id >= 16),
        |s AS (SELECT t.vec_id, max(list_cosine_similarity(t.x, e.x)) AS m
        |      FROM tr t CROSS JOIN ev e GROUP BY t.vec_id)
        |SELECT CAST(vec_id AS BIGINT) AS vec_id, round(m, 4) AS max_sim,
        |       m >= 0.35 AS contaminated
        |FROM s""".stripMargin,


    // the bloom-prefiltered path verifies exactly, so its contract — and
    // its twin — is decontaminate's
    "decontaminate_bloom" ->
      s"""WITH $shingleCte,
        |ev AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 25 = 0),
        |tr AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id % 25 <> 0)
        |SELECT CAST(tr.doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id""".stripMargin,


    "length_quantiles" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(quantile_cont(n_chars, 0.1), 4) AS p10,
        |  round(quantile_cont(n_chars, 0.5), 4) AS p50,
        |  round(quantile_cont(n_chars, 0.9), 4) AS p90
        |FROM documents GROUP BY lang""".stripMargin,


    "vocab_stats" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS total_tokens,
        |  CAST(count(DISTINCT tok) AS BIGINT) AS distinct_tokens
        |FROM (SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
        |      FROM documents)
        |GROUP BY lang""".stripMargin,


    // the portable-HLL register replay: h = md5 hex; register index =
    // first 3 hex chars (top 12 bits), tail = next 13 (remaining 52);
    // rank = 53 − bitlength(tail) (53 when 0) = the aggregate's
    // nlz64(tail) − p + 1; Z·2^53 summed as exact HUGEINT including the
    // 2^53-per-empty-register term; the estimate repeats the
    // aggregate's double sequence verbatim (left-assoc), linear
    // counting below 2.5·m with zero registers present
    "vocab_sketch" ->
      """WITH ex AS (SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
        |            FROM documents),
        |tot AS (SELECT lang, count(*) AS total_tokens FROM ex GROUP BY lang),
        |hh AS (SELECT DISTINCT lang, md5(tok) AS h FROM ex),
        |reg AS (SELECT lang,
        |    (strpos('0123456789abcdef', substr(h,1,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(h,2,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(h,3,1))-1) AS idx,
        |    list_sum(list_transform(range(13), i ->
        |      (strpos('0123456789abcdef', substr(h, (4+i)::INT, 1))-1)::BIGINT << (4*(12-i))::INT)) AS tail
        |  FROM hh),
        |rk AS (SELECT lang, idx,
        |    max(CASE WHEN tail = 0 THEN 53 ELSE 53 - length(format('{:b}', tail::BIGINT)) END) AS mj
        |  FROM reg GROUP BY lang, idx),
        |agg AS (SELECT lang, count(*) AS nonzero, sum(mj) AS rank_sum,
        |    sum(CAST(1::BIGINT << (53 - mj) AS HUGEINT))
        |      + CAST(4096 - count(*) AS HUGEINT) * CAST(1::BIGINT << 53 AS HUGEINT) AS s
        |  FROM rk GROUP BY lang)
        |SELECT t.lang, CAST(t.total_tokens AS BIGINT) AS total_tokens,
        |  CAST(a.nonzero AS BIGINT) AS nonzero_registers,
        |  CAST(a.rank_sum AS BIGINT) AS register_sum,
        |  round(CASE WHEN 4096 - a.nonzero > 0 AND
        |      0.7213 / (1 + 1.079/4096.0) * 4096.0 * 4096.0 * 9007199254740992.0 / a.s::DOUBLE <= 2.5 * 4096.0
        |    THEN 4096.0 * ln(4096.0 / (4096 - a.nonzero))
        |    ELSE 0.7213 / (1 + 1.079/4096.0) * 4096.0 * 4096.0 * 9007199254740992.0 / a.s::DOUBLE
        |  END, 4) AS est_distinct
        |FROM tot t JOIN agg a USING (lang)""".stripMargin,


    "unigram_logprob" ->
      """WITH ex AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
        |            FROM documents),
        |uni AS (SELECT tok, count(*)::DOUBLE / (SELECT count(*) FROM ex) AS p FROM ex GROUP BY tok)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(avg(ln(p)), 4) AS avg_logprob
        |FROM ex JOIN uni USING (tok) GROUP BY doc_id""".stripMargin,
  )
}
