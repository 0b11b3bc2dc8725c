"""Oracle SQL registry (moved verbatim from oracle_sql())."""

from amazon_personalize_connectors_spark.queries._shared import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries._sqlcte import *  # noqa: F401,F403


def build() -> dict:
    sqls = {
        "error_split_ok": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id, CAST(len(rec_items) AS BIGINT) AS num_recs
FROM recs WHERE error IS NULL
""",
        "error_split_errors": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id, error FROM recs WHERE error IS NOT NULL
""",
        "attribution_join": f"""
WITH {RECS_CTE.lstrip()}, {MAPPING_CTE.lstrip()}
SELECT r.query_item_id, m.user_id
FROM recs r JOIN mapping m ON r.query_item_id = m.item_id
WHERE r.error IS NULL
""",
        "explode_outer": f"""
WITH {RECS_CTE.lstrip()}, {_EXPLODE_OUTER.lstrip()}
SELECT query_item_id, pos, rec_item_id FROM exploded
""",
        "decorate_flat": f"""
WITH {RECS_CTE.lstrip()}, {META_CTE.lstrip()}, {_EXPLODE_OUTER.lstrip()}
SELECT e.query_item_id, e.pos, e.rec_item_id AS item_id,
       m.name, m.price, m.category, m.current_stock
FROM exploded e LEFT JOIN meta m ON e.rec_item_id = m.id
""",
        "renest_ordered": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id,
       CAST(coalesce(len(rec_items), 0) AS BIGINT) AS num_recs,
       coalesce(array_to_string(rec_items, ','), '') AS items_csv
FROM recs WHERE error IS NULL
""",
        "renest_capped": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id,
       CAST(coalesce(len(list_slice(rec_items, 1, 3)), 0) AS BIGINT) AS num_recs,
       coalesce(array_to_string(list_slice(rec_items, 1, 3), ','), '') AS items_csv
FROM recs WHERE error IS NULL
""",
        "flagship_related_flat": f"""
{_FLAGSHIP}
SELECT * FROM decorated
""",
        "user_pers_flat": f"""
WITH {USER_RECS_CTE.lstrip()}, {META_CTE.lstrip()},
flat AS (
  SELECT
    r.query_user_id,
    CAST(u.i - 1 AS BIGINT) AS pos,
    r.rec_items[u.i] AS item_id
  FROM user_recs r
  JOIN LATERAL (
    SELECT unnest(range(1, coalesce(len(rec_items), 0) + 1)) AS i
  ) u ON TRUE
  WHERE r.error IS NULL
)
SELECT f.query_user_id, f.pos, f.item_id, m.name, m.price, m.category
FROM flat f LEFT JOIN meta m ON f.item_id = m.id
""",
        "delta_except": f"""
{_FLAGSHIP}
SELECT * FROM decorated
EXCEPT
SELECT * FROM decorated WHERE CAST(user_id AS BIGINT) % 2 = 0
""",
        "payload_pivot": f"""
WITH {USER_RECS_CTE.lstrip()}, {META_CTE.lstrip()},
flat AS (
  SELECT
    r.query_user_id,
    CAST(u.i - 1 AS BIGINT) AS pos,
    r.rec_items[u.i] AS item_id
  FROM user_recs r
  JOIN LATERAL (
    SELECT unnest(range(1, coalesce(len(rec_items), 0) + 1)) AS i
  ) u ON TRUE
  WHERE r.error IS NULL
),
decorated AS (
  SELECT f.query_user_id, f.pos, f.item_id, m.price
  FROM flat f LEFT JOIN meta m ON f.item_id = m.id
)
SELECT
  query_user_id AS external_id,
  string_agg(item_id, ',' ORDER BY pos) AS item_ids_csv,
  string_agg(CAST(price AS VARCHAR), ',' ORDER BY pos) AS prices_csv,
  CAST(count(*) AS BIGINT) AS n_items,
  'custom' AS other_attrib1
FROM decorated
GROUP BY query_user_id
""",
        "topk_slice": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id,
       coalesce(array_to_string(rec_items[1:3], ','), '') AS top3_ids_csv
FROM recs WHERE error IS NULL
""",
        "stamp_literals": f"""
{_FLAGSHIP}
SELECT DISTINCT query_item_id, user_id,
       'flagship' AS job_name,
       '{RUN_TS.isoformat()}' AS run_datetime,
       'recs_' AS attribute_prefix
FROM attributed
""",
        "text_tokens": """
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_regex_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_measured
FROM documents
""",
        "text_quality": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
    CAST(len(list_filter(toks, x -> x IN ('a','the','of','and','to','in','is'))) AS BIGINT) AS hits
  FROM t
)
SELECT doc_id, n_tokens,
  CASE WHEN n_tokens > 0 THEN total_chars / n_tokens END AS avg_token_len,
  CASE WHEN n_tokens > 0 THEN hits / n_tokens END AS stopword_ratio,
  coalesce(CASE WHEN n_tokens > 0 THEN hits / n_tokens > 0.05 END, FALSE) AS is_english
FROM s
""",
        "lang_profile": f"""
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
  CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
""",
        "doc_fingerprint": """
SELECT doc_id,
  list_aggregate(
    list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                   i -> md5(substr(text, i, 8))),
    'min') AS fingerprint
FROM documents
""",
        "dedup_exact": """
SELECT md5(text) AS digest,
       CAST(min(doc_id) AS BIGINT) AS rep_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY md5(text)
""",
        "ngram_jaccard_pairs": f"""
WITH {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.n_shingles AS n_a, b.n_shingles AS n_b,
         count(*) AS common
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= 2
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(common AS BIGINT) AS common,
       CAST(n_a + n_b - common AS BIGINT) AS union_size,
       common / (n_a + n_b - common) AS jaccard
FROM pairs
""",
        "neardup_components": f"""
WITH RECURSIVE {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(lbl) AS BIGINT) AS component
FROM reach GROUP BY node
""",
        "neardup_triangles": f"""
WITH ev AS (
  SELECT label AS block, vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
e AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM ev a JOIN ev b ON a.block = b.block AND a.vec_id < b.vec_id
  WHERE {_COSINE.format(a='a.v', b='b.v')} >= 0.3
)
SELECT CAST(e1.a AS BIGINT) AS a, CAST(e1.b AS BIGINT) AS b,
       CAST(e2.b AS BIGINT) AS c
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
""",
        "minhash_lsh": f"""
WITH {_SHINGLES_CTE_2.lstrip()},
sig AS (
  SELECT doc_id,
    list_aggregate(list_transform(shingles, s -> md5('0|' || s)), 'min') AS mh0,
    list_aggregate(list_transform(shingles, s -> md5('1|' || s)), 'min') AS mh1,
    list_aggregate(list_transform(shingles, s -> md5('2|' || s)), 'min') AS mh2,
    list_aggregate(list_transform(shingles, s -> md5('3|' || s)), 'min') AS mh3,
    list_aggregate(list_transform(shingles, s -> md5('4|' || s)), 'min') AS mh4,
    list_aggregate(list_transform(shingles, s -> md5('5|' || s)), 'min') AS mh5
  FROM sh
),
bands AS (
  SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS bucket FROM sig
  UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
  UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
)
SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
        "simhash": f"""
WITH t0 AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 10 = 0
),
t1 AS (SELECT doc_id, t, list_distinct(t) AS dt FROM t0)
SELECT doc_id, CAST({_SIMHASH_SIG} AS BIGINT) AS simhash FROM t1
""",
        "simhash64": f"""
WITH t0 AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 10 = 0
)
SELECT doc_id, CAST({_SIMHASH64_SIG} AS BIGINT) AS simhash FROM t0
""",
        "state_digest_update": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders WHERE o_orderkey % 200 = 0
""",
        "chunk_documents": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
p AS (
  SELECT doc_id, toks,
         greatest(CAST(floor((len(toks) - 9) / 24.0) AS BIGINT), 0) * 24
           AS last_start
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS id,
       CAST(u.s // 24 AS BIGINT) AS chunk_no,
       CAST(len(list_slice(toks, u.s + 1, u.s + 32)) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, u.s + 1, u.s + 32), ' ') AS chunk_text
FROM p, LATERAL (SELECT unnest(range(0, last_start + 1, 24)) AS s) u
WHERE len(list_slice(toks, u.s + 1, u.s + 32)) > 0
""",
        "repetition_signals": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
uni AS (
  SELECT doc_id, u.tok AS gram, count(*) AS c
  FROM t, LATERAL (SELECT unnest(toks) AS tok) u
  GROUP BY 1, 2
),
unia AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_uni,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM uni GROUP BY 1
),
tb AS (
  SELECT doc_id,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
           AS bgs
  FROM t
),
big AS (
  SELECT doc_id, u.g AS gram, count(*) AS c
  FROM tb, LATERAL (SELECT unnest(bgs) AS g) u
  GROUP BY 1, 2
),
biga AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_big,
         CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM big GROUP BY 1
)
SELECT CAST(a.doc_id AS BIGINT) AS id, a.n_tokens,
       a.max_uni / a.n_tokens AS top_unigram_frac,
       b.max_big / b.n_bigrams AS top_bigram_frac,
       (a.max_uni / a.n_tokens > 0.20) OR
         coalesce(b.max_big / b.n_bigrams > 0.18, FALSE) AS flag_repetitive
FROM unia a LEFT JOIN biga b ON a.doc_id = b.doc_id
""",
        "quality_filter": f"""
WITH {_QUALITY_CTE.lstrip()}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       flag_too_short, flag_token_len, flag_low_stopword,
       flag_symbol_heavy, flag_digit_heavy,
       NOT (flag_too_short OR flag_token_len OR flag_low_stopword OR
            flag_symbol_heavy OR flag_digit_heavy) AS keep
FROM qflags
""",
        "llm_corpus_survivors": f"""
WITH {_QUALITY_CTE.lstrip()},
kept AS (
  SELECT doc_id, text, n_tokens FROM qflags
  WHERE NOT (flag_too_short OR flag_token_len OR flag_low_stopword OR
             flag_symbol_heavy OR flag_digit_heavy)
),
reps AS (
  SELECT md5(text) AS digest, CAST(min(doc_id) AS BIGINT) AS doc_id,
         CAST(count(*) AS BIGINT) AS n_copies
  FROM kept GROUP BY 1
)
SELECT r.doc_id, r.digest, r.n_copies, CAST(k.n_tokens AS BIGINT) AS n_tokens
FROM reps r JOIN kept k ON k.doc_id = r.doc_id
""",
        "simhash_neardup": f"""
WITH t0 AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
sigs AS (
  SELECT doc_id, CAST({_SIMHASH64_SIG} AS BIGINT) AS sig FROM t0
),
bands AS (
  SELECT doc_id, sig, b.band, (sig >> (b.band * 16)) & 65535 AS band_val
  FROM sigs, LATERAL (SELECT unnest(range(0, 4)) AS band) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.sig AS sig_a, b.sig AS sig_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
              AND a.doc_id < b.doc_id
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 16
""",
        "hybrid_filtered_ann": f"""
WITH {_QUALITY_CTE.lstrip()},
keep_ids AS (
  SELECT doc_id FROM qflags
  WHERE NOT (flag_too_short OR flag_token_len OR flag_low_stopword OR
             flag_symbol_heavy OR flag_digit_heavy)
),
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings JOIN keep_ids ON vec_id = doc_id
),
q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         {_COSINE.format(a='q.v', b='e.v')} AS score
  FROM q JOIN e ON e.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 3
""",
        "kmeans_refine": f"""
WITH {_CENTROID_CTE.lstrip()},
centroids AS (
  SELECT block, list(sum_val / n ORDER BY dim) AS centroid
  FROM centroid_sums GROUP BY block
),
assigned AS (
  SELECT id, v, block AS a_block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (
             PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC, c.block
           ) AS rn
    FROM ev, centroids c
  ) WHERE rn = 1
),
adim AS (
  SELECT a_block AS block, CAST(u.i - 1 AS BIGINT) AS dim, v[u.i] AS val
  FROM assigned, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
)
SELECT CAST(block AS BIGINT) AS block, dim,
       CAST(sum(CAST(floor(val * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_e6,
       CAST(count(*) AS BIGINT) AS n
FROM adim GROUP BY 1, 2
""",
        "ivf_probe_topk": f"""
WITH {_CENTROID_CTE.lstrip()},
centroids AS (
  SELECT block, list(sum_val / n ORDER BY dim) AS centroid
  FROM centroid_sums GROUP BY block
),
assigned AS (
  SELECT id, v, block AS assigned_block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (
             PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC, c.block
           ) AS rn
    FROM ev, centroids c
  ) WHERE rn = 1
),
q AS (SELECT * FROM assigned WHERE id % 50 = 0),
scored AS (
  SELECT q.id AS q_id, a.id AS n_id,
         {_COSINE.format(a='q.v', b='a.v')} AS score
  FROM q JOIN assigned a
    ON a.assigned_block = q.assigned_block AND a.id <> q.id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 5
""",
        "ann_topk": f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         {_COSINE.format(a='q.v', b='e.v')} AS score
  FROM q JOIN e ON e.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 5
""",
        "pq_adc": """
WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ed AS (
  SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM ev, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
sv AS (
  SELECT vec_id, CAST(dim // 8 AS INTEGER) AS sub,
         CAST(dim % 8 AS INTEGER) AS d, iv
  FROM ed
),
cb AS (
  SELECT sub, CAST(vec_id % 16 AS INTEGER) AS code, d,
         CAST(floor(CAST(sum(iv) AS DOUBLE) / count(*)) AS BIGINT) AS c
  FROM sv GROUP BY 1, 2, 3
),
enc_dist AS (
  SELECT sv.vec_id, sv.sub, cb.code,
         sum((sv.iv - cb.c) * (sv.iv - cb.c)) AS dist
  FROM sv JOIN cb ON cb.sub = sv.sub AND cb.d = sv.d
  GROUP BY 1, 2, 3
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
    FROM enc_dist
  ) WHERE rn = 1
),
qsv AS (SELECT * FROM sv WHERE vec_id % 50 = 0),
lut AS (
  SELECT qsv.vec_id AS q_id, qsv.sub, cb.code,
         sum((qsv.iv - cb.c) * (qsv.iv - cb.c)) AS ldist
  FROM qsv JOIN cb ON cb.sub = qsv.sub AND cb.d = qsv.d
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT lut.q_id, enc.vec_id AS n_id, sum(lut.ldist) AS adist
  FROM enc JOIN lut ON lut.sub = enc.sub AND lut.code = enc.code
  WHERE enc.vec_id <> lut.q_id
  GROUP BY 1, 2
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, CAST(adist AS BIGINT) AS adist
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
        "ann_quantized": f"""
WITH {_SQ8_CODES_CTE.lstrip()},
q AS (SELECT * FROM codes WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS q_id, c2.vec_id AS n_id,
         {_SQ8_DOT.format(a='q.c', b='c2.c')} AS qdot
  FROM q JOIN codes c2 ON c2.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY qdot DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, qdot
FROM ranked WHERE rank <= 5
""",
        "rrf_fusion": f"""
WITH {_SQ8_CODES_CTE.lstrip()},
qv AS (SELECT * FROM e WHERE vec_id % 50 = 0),
exact_scored AS (
  SELECT qv.vec_id AS q_id, e.vec_id AS n_id,
         {_COSINE.format(a='qv.v', b='e.v')} AS score
  FROM qv JOIN e ON e.vec_id <> qv.vec_id
),
exact_top AS (
  SELECT q_id, n_id, rank_a FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank_a
    FROM exact_scored
  ) WHERE rank_a <= 10
),
qc AS (SELECT * FROM codes WHERE vec_id % 50 = 0),
quant_scored AS (
  SELECT qc.vec_id AS q_id, c2.vec_id AS n_id,
         {_SQ8_DOT.format(a='qc.c', b='c2.c')} AS qdot
  FROM qc JOIN codes c2 ON c2.vec_id <> qc.vec_id
),
quant_top AS (
  SELECT q_id, n_id, rank_b FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY qdot DESC, n_id) AS rank_b
    FROM quant_scored
  ) WHERE rank_b <= 10
),
fused AS (
  SELECT COALESCE(a.q_id, b.q_id) AS q_id, COALESCE(a.n_id, b.n_id) AS n_id,
         COALESCE(CAST(1 AS DOUBLE) / (60 + a.rank_a), CAST(0 AS DOUBLE))
         + COALESCE(CAST(1 AS DOUBLE) / (60 + b.rank_b), CAST(0 AS DOUBLE))
           AS rrf_score
  FROM exact_top a FULL OUTER JOIN quant_top b
    ON a.q_id = b.q_id AND a.n_id = b.n_id
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rrf_rank AS BIGINT) AS rrf_rank, rrf_score
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rrf_score DESC, n_id)
           AS rrf_rank
  FROM fused
) WHERE rrf_rank <= 5
""",
        "embedding_neardup": f"""
WITH e AS (
  SELECT label AS block, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
scored AS (
  SELECT a.block, a.vec_id AS id_a, b.vec_id AS id_b,
         {_COSINE.format(a='a.v', b='b.v')} AS score
  FROM e a JOIN e b ON a.block = b.block AND a.vec_id < b.vec_id
)
SELECT CAST(block AS BIGINT) AS block, CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b, score
FROM scored WHERE score >= 0.3
""",
        "ivf_centroids": f"""
WITH {_CENTROID_CTE.lstrip()}
SELECT CAST(block AS BIGINT) AS block, dim, sum_e6, n FROM centroid_sums
""",
        "ivf_assign": f"""
WITH {_CENTROID_CTE.lstrip()},
centroids AS (
  SELECT block, list(sum_val / n ORDER BY dim) AS centroid
  FROM centroid_sums GROUP BY block
),
scored AS (
  SELECT ev.vec_id AS id, c.block,
         {_COSINE.format(a='ev.v', b='c.centroid')} AS score
  FROM ev, centroids c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY score DESC, block) AS rn
  FROM scored
)
SELECT CAST(id AS BIGINT) AS id, CAST(block AS BIGINT) AS assigned_block, score
FROM ranked WHERE rn = 1
""",
        "events_hourly": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""",
        "events_sessionize": """
WITH w AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800 * 1000 * 1000
              THEN 1 ELSE 0 END AS new_s
  FROM w
)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM flagged GROUP BY user_id
""",
        "events_props": """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
        "renest_legacy_window": f"""
{_FLAGSHIP}
SELECT * FROM decorated
""",
        "delta_anti_hash": f"""
{_FLAGSHIP}
SELECT * FROM decorated
EXCEPT
SELECT * FROM decorated WHERE CAST(user_id AS BIGINT) % 2 = 0
""",
        "asof_join": """
WITH od AS (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_orderkey) AS o_orderkey,
         max_by(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       o.o_orderkey, o.o_totalprice,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
FROM events e ASOF LEFT JOIN od o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
""",
        "band_join_features": """
SELECT o.o_orderkey,
       count(l.l_shipdate) AS n_shipped_60d,
       CAST(coalesce(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
         AS value_shipped_60d
FROM orders o
LEFT JOIN lineitem l
  ON o.o_orderkey = l.l_orderkey
 AND epoch(l.l_shipdate) >= epoch(o.o_orderdate)
 AND epoch(l.l_shipdate) <= epoch(o.o_orderdate) + 60*86400
GROUP BY o.o_orderkey
""",
        "band_join_bucketed": """
SELECT a.event_id,
       count(*) AS n_events_band,
       min(b.event_id) AS first_event_id
FROM events a
JOIN events b
  ON epoch(date_trunc('second', b.ts)) >= epoch(date_trunc('second', a.ts)) - 600
 AND epoch(date_trunc('second', b.ts)) <= epoch(date_trunc('second', a.ts)) + 600
GROUP BY a.event_id
""",
        "window_analytics": """
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER w AS INT) AS order_seq,
       CAST(lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS prev_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS run_spend,
       CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                 / sum(CAST(o_totalprice AS DECIMAL(18,2)))
                     OVER (PARTITION BY o_custkey)
                 AS DECIMAL(18,6)) AS DOUBLE) AS spend_share
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
        "sliding_windows": """
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM (
  SELECT unnest([
           to_timestamp(floor(epoch(ts) / 1800) * 1800),
           to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800)
         ]) AS ws,
         event_type, value
  FROM events
)
GROUP BY 1, 2
""",
        "cube_revenue": """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS TINYINT) AS g_priority,
       CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
        "semi_anti_join": """
SELECT c_custkey, 'has_open' AS bucket FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
UNION ALL
SELECT c_custkey, 'no_open' AS bucket FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
        "pivot_events": """
SELECT user_id,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'add_to_cart') AS n_add_to_cart,
       count(*) FILTER (event_type = 'search') AS n_search
FROM events GROUP BY user_id
""",
        "contiguous_ids": """
SELECT o_orderkey,
       row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1 AS row_id
FROM orders
""",
        "running_revenue": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (ORDER BY o_orderkey) AS DOUBLE) AS running_price
FROM orders
""",
        "cumulative_uniques": """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
),
d AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
""",
        "ann_recall": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         round(list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(e.v, e.v))), 6) AS score
  FROM q JOIN e ON e.vec_id <> q.vec_id
),
exact AS (
  SELECT q_id, n_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY score DESC, n_id) AS rank
    FROM scored
  ) WHERE rank <= 5
),
edim AS (
  SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
sq8_stats AS (SELECT dim, min(iv) AS lo, max(iv) AS hi FROM edim GROUP BY dim),
codes AS (
  SELECT vec_id,
         list(CASE WHEN hi = lo THEN 0
              ELSE greatest(0, least(255,
                   CAST(floor((iv - lo) * 255.0 / (hi - lo)) AS BIGINT)))
              END ORDER BY dim) AS c
  FROM edim JOIN sq8_stats USING (dim) GROUP BY vec_id
),
qc AS (SELECT * FROM codes WHERE vec_id % 50 = 0),
qscored AS (
  SELECT qc.vec_id AS q_id, c2.vec_id AS n_id,
         CAST(list_dot_product(CAST(qc.c AS DOUBLE[]), CAST(c2.c AS DOUBLE[]))
              AS BIGINT) AS qdot
  FROM qc JOIN codes c2 ON c2.vec_id <> qc.vec_id
),
quant AS (
  SELECT q_id, n_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY qdot DESC, n_id) AS rank
    FROM qscored
  ) WHERE rank <= 5
),
hits AS (
  SELECT e2.q_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM exact e2 JOIN quant ON quant.q_id = e2.q_id AND quant.n_id = e2.n_id
  GROUP BY e2.q_id
)
SELECT CAST(q.vec_id AS BIGINT) AS q_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) / 5.0 AS recall_at_5
FROM q LEFT JOIN hits h ON h.q_id = q.vec_id
""",
        "dedup_canonical": f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 5 = 0
),
sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(0, greatest(len(t) - 3, 0) + 1),
                          i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))
         ) AS shingles
  FROM toks
),
exploded_sh AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
),
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, d.n_chars,
         COALESCE(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
  WHERE d.doc_id % 5 = 0
)
SELECT CAST(component AS BIGINT) AS component,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(arg_max(doc_id, n_chars * 10000000000 - doc_id) AS BIGINT)
         AS canonical_id,
       CAST(max(n_chars) AS BIGINT) AS canonical_chars
FROM labeled GROUP BY component
""",
        "temporal_split": """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
cum AS (
  SELECT day, sum(n) OVER (ORDER BY day) AS cum FROM daily
),
tot AS (SELECT sum(n) AS total FROM daily),
k AS (SELECT CAST(floor((8 * total + 9) / 10) AS BIGINT) AS k, total FROM tot)
SELECT strftime(min(CASE WHEN cum >= k.k THEN day END), '%Y-%m-%d') AS split_day,
       CAST(min(CASE WHEN cum >= k.k THEN cum END) AS BIGINT) AS n_train,
       CAST(max(k.total) - min(CASE WHEN cum >= k.k THEN cum END) AS BIGINT)
         AS n_test
FROM cum, k
""",
        "rolling_distinct_users": """
WITH du AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM du),
fanned AS (
  SELECT DISTINCT du.user_id, du.day + v.j AS wday
  FROM du, LATERAL (SELECT unnest(range(0, 7)) AS j) v
)
SELECT CAST(f.wday AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_users_7d
FROM fanned f, bounds b
WHERE f.wday >= b.d0 AND f.wday <= b.d1
GROUP BY f.wday
""",
        "markov_transitions": """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
           FROM trans GROUP BY 1)
SELECT t.from_type, t.to_type, t.n,
       CAST(t.n AS DOUBLE) / CAST(tt.n_from AS DOUBLE) AS p
FROM trans t JOIN totals tt ON tt.from_type = t.from_type
""",
        "rfm_features": """
WITH per_user AS (
  SELECT user_id,
         CAST(max(floor(epoch(ts) / 86400)) AS BIGINT) AS last_day,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(CAST(value AS DECIMAL(18,6))) AS monetary_dec
  FROM events GROUP BY user_id
),
gmax AS (SELECT max(last_day) AS gday FROM per_user)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(g.gday - last_day AS BIGINT) AS recency_days,
       frequency,
       CAST(monetary_dec AS DOUBLE) AS monetary
FROM per_user, gmax g
""",
        "rolling_revenue_28d": """
WITH daily AS (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, day,
       CAST(spend AS DOUBLE) AS spend,
       CAST(sum(spend) OVER (PARTITION BY o_custkey ORDER BY day
                             RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS spend_28d
FROM daily
""",
        "gap_fill_daily": """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
cal AS (
  SELECT g.o_orderpriority, CAST(u.d AS DATE) AS day
  FROM (SELECT DISTINCT o_orderpriority FROM orders) g,
       bounds b,
       LATERAL (SELECT unnest(generate_series(b.d0, b.d1,
                                              INTERVAL 1 DAY)) AS d) u
)
SELECT c.o_orderpriority,
       strftime(c.day, '%Y-%m-%d') AS day,
       CAST(COALESCE(daily.n_orders, 0) AS BIGINT) AS n_orders
FROM cal c LEFT JOIN daily
  ON daily.o_orderpriority = c.o_orderpriority AND daily.day = c.day
""",
        "cohort_retention": """
WITH up AS (
  SELECT DISTINCT user_id AS u,
         CAST(floor(floor(epoch(ts) / 86400) / 7) AS BIGINT) AS p
  FROM events
),
cohorts AS (SELECT u, min(p) AS cohort FROM up GROUP BY u)
SELECT c.cohort, CAST(up.p - c.cohort AS BIGINT) AS offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM up JOIN cohorts c ON up.u = c.u
GROUP BY 1, 2
""",
        "orders_islands": """
WITH o AS (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         o_orderstatus
  FROM orders
),
flagged AS (
  SELECT *, CASE WHEN lag(o_orderstatus) OVER w IS NULL
                   OR lag(o_orderstatus) OVER w <> o_orderstatus
                 THEN 1 ELSE 0 END AS chg
  FROM o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)
),
islands AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
                                ORDER BY day, o_orderkey) AS BIGINT)
              AS island_id
  FROM flagged
)
SELECT o_custkey, island_id, min(o_orderstatus) AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(day) AS BIGINT) AS island_start,
       CAST(max(day) AS BIGINT) AS island_end
FROM islands GROUP BY 1, 2
""",
        "basket_lift": """
WITH bi AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
                  CAST(l_partkey AS BIGINT) AS i
  FROM lineitem
),
pairs AS (
  SELECT a.i AS item_a, c.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
  GROUP BY 1, 2 HAVING count(*) >= 3
),
freq AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY i),
total AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM bi)
SELECT p.item_a, p.item_b, p.n_ab, fa.n AS n_a, fb.n AS n_b,
       CAST(p.n_ab * t.n_baskets AS DOUBLE)
         / CAST(fa.n * fb.n AS DOUBLE) AS lift
FROM pairs p
JOIN freq fa ON fa.i = p.item_a
JOIN freq fb ON fb.i = p.item_b
CROSS JOIN total t
""",
        "priority_sample": """
WITH keyed AS (
  SELECT o_orderpriority,
         CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(concat('0x', substr(md5(CAST(CAST(o_orderkey AS BIGINT)
                                           AS VARCHAR)), 1, 8)) AS BIGINT)
           * 1000000 AS num
  FROM orders
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY num // cents, o_orderkey) AS rn
  FROM keyed
)
SELECT o_orderpriority, o_orderkey,
       CAST(CAST(cents AS DECIMAL(18,2)) / 100 AS DOUBLE) AS price
FROM ranked WHERE rn <= 5
""",
        "column_profile": """
WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
         o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders
)
SELECT 'o_orderkey' AS "column",
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       min(CAST(o_orderkey AS VARCHAR)) AS min_value,
       max(CAST(o_orderkey AS VARCHAR)) AS max_value
FROM o
UNION ALL
SELECT 'o_orderstatus',
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       min(o_orderstatus), max(o_orderstatus)
FROM o
UNION ALL
SELECT 'o_orderpriority',
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       min(o_orderpriority), max(o_orderpriority)
FROM o
UNION ALL
SELECT 'o_totalprice',
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       min(CAST(o_totalprice AS VARCHAR)), max(CAST(o_totalprice AS VARCHAR))
FROM o
""",
        "stratified_sample": f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       event_type,
       CAST(user_id AS BIGINT) AS user_id
FROM events
WHERE CAST(concat('0x', substr(md5(event_id || '|' || event_type), 1, 8))
           AS BIGINT) < {int(0.2 * 2**32)}
""",
        "event_funnel": """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(t_view, '%Y-%m-%d %H:%M:%S') AS first_view,
       strftime(t_purchase, '%Y-%m-%d %H:%M:%S') AS first_purchase
FROM per_user
WHERE t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
  AND t_view < t_click AND t_click < t_purchase
""",
        "tfidf_top_terms": f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE length(term) >= 3 GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         tf.tf * ln(n_docs / dfreq.df) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC
  ) AS rank FROM scored
) WHERE rank <= 5
""",
        "hash_split": """
SELECT count(*) AS n_total,
       count(DISTINCT doc_id) AS n_distinct_docs,
       CAST(3 AS BIGINT) AS n_splits
FROM documents
""",
        "salted_attribution": f"""
WITH {RECS_CTE.lstrip()}, {MAPPING_CTE.lstrip()}
SELECT r.query_item_id, m.user_id
FROM recs r JOIN mapping m ON r.query_item_id = m.item_id
WHERE r.error IS NULL
""",
        "intersect_items": f"""
WITH {RECS_CTE.lstrip()}, {META_CTE.lstrip()}
SELECT item_id FROM (
  SELECT unnest(rec_items) AS item_id FROM recs WHERE error IS NULL
)
INTERSECT
SELECT id AS item_id FROM meta
""",
        "stream_windowed_counts": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
        "stream_interval_join": """
WITH c AS (
  SELECT user_id, event_id AS click_id, ts AS l_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS r_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(c.user_id AS BIGINT) AS user_id,
       CAST(click_id AS BIGINT) AS click_id,
       CAST(purchase_id AS BIGINT) AS purchase_id,
       CAST((epoch_us(r_ts) - epoch_us(l_ts)) // 1000000 AS BIGINT) AS delay_s
FROM c JOIN p
  ON c.user_id = p.user_id
 AND p.r_ts >= c.l_ts
 AND p.r_ts <= c.l_ts + INTERVAL 10 MINUTE
""",
        "percentiles": """
SELECT o_orderpriority,
       quantile_cont(cents, 0.5) AS median_cents,
       quantile_cont(cents, 0.9) AS p90_cents,
       min(cents) AS min_cents,
       max(cents) AS max_cents
FROM (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
GROUP BY o_orderpriority
""",
        "rollup_revenue": """
SELECT o_orderpriority,
       order_year,
       CAST(grouping(o_orderpriority) AS TINYINT) AS g_priority,
       CAST(grouping(order_year) AS TINYINT) AS g_year,
       CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM (
  SELECT o_orderpriority,
         CAST(year(o_orderdate) AS INT) AS order_year,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
)
GROUP BY ROLLUP (o_orderpriority, order_year)
""",
        "approx_distinct": """
SELECT event_type,
       count(DISTINCT user_id) AS n_users_exact,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
""",
        "topk_per_group": """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(rank_in_group AS INT) AS rank_in_group
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rank_in_group
  FROM orders
)
WHERE rank_in_group <= 3
""",
        "lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "decontaminate": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(0, greatest(len(t) - 4, 0) + 1),
                          i -> concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4]))
         ) AS gs
  FROM toks
),
ex AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g FROM sh),
te AS (SELECT DISTINCT g FROM ex WHERE doc_id % 10 = 7)
SELECT CAST(e.doc_id AS BIGINT) AS train_id,
       CAST(e.n_grams AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_hit_grams,
       count(*) / e.n_grams AS hit_frac
FROM ex e JOIN te USING (g)
WHERE e.doc_id % 10 <> 7
GROUP BY e.doc_id, e.n_grams
""",
        "pack_sequences": f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS e
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
       CAST(e - n_tokens AS BIGINT) AS start_offset,
       CAST((e - n_tokens) // 512 AS BIGINT) AS bin_id,
       n_tokens > 0 AND (e - n_tokens) // 512 <> (e - 1) // 512
         AS spans_boundary
FROM c
""",
        "pii_scrub": """
WITH w AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 (555) 010-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t2
  FROM documents
),
s AS (
  SELECT doc_id,
         len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
         regexp_replace(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS ne
  FROM w
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(ne, '\\+[0-9]{1,2} \\(([0-9]{3})\\) [0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(ne, '\\+[0-9]{1,2} \\(([0-9]{3})\\) [0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrub_digest
FROM s
""",
        "rp_lsh_pairs": f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
edim AS (
  SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
dots AS (
  SELECT vec_id,
         sum(iv * (((dim + 1) * 12345) % 2001 - 1000)) AS d0,
         sum(iv * (((dim + 1) * 21521) % 2001 - 1000)) AS d1,
         sum(iv * (((dim + 1) * 30697) % 2001 - 1000)) AS d2,
         sum(iv * (((dim + 1) * 39873) % 2001 - 1000)) AS d3,
         sum(iv * (((dim + 1) * 49049) % 2001 - 1000)) AS d4,
         sum(iv * (((dim + 1) * 58225) % 2001 - 1000)) AS d5
  FROM edim GROUP BY vec_id
),
bk AS (SELECT vec_id, (CASE WHEN d0 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d1 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d2 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d3 >= 0 THEN 8 ELSE 0 END) + (CASE WHEN d4 >= 0 THEN 16 ELSE 0 END) + (CASE WHEN d5 >= 0 THEN 32 ELSE 0 END) AS bucket FROM dots),
withv AS (SELECT e.vec_id, bk.bucket, e.v FROM e JOIN bk USING (vec_id)),
scored AS (
  SELECT CAST(a.bucket AS BIGINT) AS bucket,
         CAST(a.vec_id AS BIGINT) AS id_a,
         CAST(b.vec_id AS BIGINT) AS id_b,
         {_COSINE.format(a='a.v', b='b.v')} AS score
  FROM withv a JOIN withv b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT * FROM scored WHERE score >= 0.3
""",
        "lang_mixture": """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
r AS (SELECT lang, sqrt((SELECT min(n) FROM c) / n) AS rate FROM c),
k AS (
  SELECT d.lang, r.rate FROM documents d JOIN r USING (lang)
  WHERE CAST(concat('0x',
          substr(md5(d.doc_id || '|' || 'mix-v1'), 1, 8)) AS BIGINT)
        < floor(rate * 4294967296.0)
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       round(min(rate), 6) AS keep_rate
FROM k GROUP BY lang
""",
        "stream_dedup": """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       event_type
FROM events
""",
        "ntile_quartiles": """
WITH c AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
t AS (
  SELECT o_orderpriority, cents,
         ntile(4) OVER (
           PARTITION BY o_orderpriority ORDER BY cents, o_orderkey
         ) AS q
  FROM c
)
SELECT o_orderpriority, CAST(q AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(cents) AS BIGINT) AS lo_cents,
       CAST(max(cents) AS BIGINT) AS hi_cents
FROM t GROUP BY 1, 2
""",
        "sample_k_per_group": """
WITH r AS (
  SELECT event_type, event_id,
         md5(event_id || '|' || 'sample-v1') AS k,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(event_id || '|' || 'sample-v1'), event_id
         ) AS rank
  FROM events
)
SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
""",
        "approx_median_check": """
SELECT o_orderpriority,
       quantile_cont(cents, 0.5) AS median_cents,
       TRUE AS approx_within_2pct
FROM (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
GROUP BY o_orderpriority
""",
        "corpus_prep_pipeline": f"""
WITH {_QUALITY_CTE.lstrip()},
kept AS (
  SELECT q.doc_id, d.lang, q.text, q.n_tokens
  FROM qflags q JOIN documents d USING (doc_id)
  WHERE NOT (flag_too_short OR flag_token_len OR flag_low_stopword OR
             flag_symbol_heavy OR flag_digit_heavy)
),
reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
train AS (
  SELECT k.* FROM kept k JOIN reps r USING (doc_id)
  WHERE k.doc_id % 10 <> 7
),
ttoks AS (SELECT doc_id, {_TOKS} AS t FROM train),
tg AS (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(len(t) - 4, 0) + 1),
                i -> concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4]))) AS g
  FROM ttoks
),
btoks AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 10 = 7),
bg AS (
  SELECT DISTINCT
         unnest(list_transform(range(0, greatest(len(t) - 4, 0) + 1),
                i -> concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4]))) AS g
  FROM btoks
),
contaminated AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (g)),
clean AS (
  SELECT * FROM train
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
cnt AS (SELECT lang, count(*) AS n FROM clean GROUP BY lang),
rt AS (SELECT lang, sqrt((SELECT min(n) FROM cnt) / n) AS rate FROM cnt),
bal AS (
  SELECT c.* FROM clean c JOIN rt USING (lang)
  WHERE CAST(concat('0x',
          substr(md5(c.doc_id || '|' || 'mix-v1'), 1, 8)) AS BIGINT)
        < floor(rate * 4294967296.0)
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS e
  FROM bal
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(e - n_tokens AS BIGINT) AS start_offset,
       CAST((e - n_tokens) // 512 AS BIGINT) AS bin_id
FROM packed
""",
        "session_window_native": """
WITH w AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800 * 1000 * 1000
              THEN 1 ELSE 0 END AS new_s
  FROM w
),
sess AS (
  SELECT user_id, ts_us,
         sum(new_s) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(min(ts_us) AS BIGINT) AS start_us,
       CAST(max(ts_us) + 1800 * 1000 * 1000 AS BIGINT) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
""",
        "variant_props": """
SELECT CAST(event_id AS BIGINT) AS event_id,
       event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0 AS k_even
FROM events
""",
        "line_dedup": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
segs AS (
  SELECT doc_id, CAST(ceil(len(t) / 3.0) AS BIGINT) AS n_segs, u.i,
         concat_ws(' ', t[i*3+1], t[i*3+2], t[i*3+3]) AS seg
  FROM toks, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(t) / 3.0) AS BIGINT))) AS i
  ) u
),
freq AS (SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) <= 2),
kept AS (SELECT s.* FROM segs s JOIN freq f USING (seg))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(min(n_segs) AS BIGINT) AS n_segs,
       CAST(count(*) AS BIGINT) AS n_kept,
       md5(string_agg(seg, ' ' ORDER BY i)) AS clean_digest
FROM kept GROUP BY doc_id
""",
        "neardup_pagerank": f"""
WITH {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (
  SELECT src AS node, deg, 1000000000000 // n AS rank FROM deg, nn
),
c1 AS (
  SELECT s.dst, sum(r.rank // r.deg) AS in_sum
  FROM sym s JOIN r0 r ON s.src = r.node GROUP BY s.dst
),
r1 AS (
  SELECT d.src AS node, d.deg,
         ((15 * 1000000000000) // 100) // nn.n
           + (85 * coalesce(c1.in_sum, 0)) // 100 AS rank
  FROM deg d CROSS JOIN nn LEFT JOIN c1 ON c1.dst = d.src
),
c2 AS (
  SELECT s.dst, sum(r.rank // r.deg) AS in_sum
  FROM sym s JOIN r1 r ON s.src = r.node GROUP BY s.dst
),
r2 AS (
  SELECT d.src AS node, d.deg,
         ((15 * 1000000000000) // 100) // nn.n
           + (85 * coalesce(c2.in_sum, 0)) // 100 AS rank
  FROM deg d CROSS JOIN nn LEFT JOIN c2 ON c2.dst = d.src
)
SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank FROM r2
""",
        "bigram_stats": f"""
WITH toks AS (
  SELECT {_TOKS} AS t FROM documents
),
big AS (
  SELECT t[i+1] AS w1, t[i+2] AS w2
  FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 1)) AS i) u
  WHERE len(t) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
       c12 / c1 AS p
FROM c12 JOIN c1 USING (w1)
WHERE c12 >= 5
""",
        "lm_coverage": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
big AS (
  SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
  FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 1)) AS i) u
  WHERE len(t) >= 2
),
lm AS (
  SELECT w1, w2, count(*) AS c12 FROM big WHERE doc_id % 10 <> 7 GROUP BY 1, 2
),
held AS (SELECT doc_id, w1, w2 FROM big WHERE doc_id % 10 = 7)
SELECT CAST(h.doc_id AS BIGINT) AS id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN lm.c12 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(sum(COALESCE(lm.c12, 0)) AS BIGINT) AS hit_mass,
       CAST(sum(CASE WHEN lm.c12 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         / CAST(count(*) AS BIGINT) AS coverage
FROM held h LEFT JOIN lm ON h.w1 = lm.w1 AND h.w2 = lm.w2
GROUP BY h.doc_id
""",
        "bpe_pair_stats": f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS tok FROM documents
),
pairs AS (
  SELECT substr(tok, CAST(u.i AS INTEGER), 2) AS pair
  FROM toks, LATERAL (SELECT unnest(range(1, length(tok))) AS i) u
)
SELECT pair, CAST(count(*) AS BIGINT) AS c
FROM pairs GROUP BY pair ORDER BY c DESC, pair LIMIT 20
""",
        "expectations_audit": """
WITH r AS (
  SELECT COALESCE(o_totalprice > 0, FALSE) AS r1,
         COALESCE(o_totalprice <= 300000, FALSE) AS r2,
         COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE) AS r3,
         COALESCE(CAST(o_orderdate AS DATE) < DATE '2001-01-01', FALSE) AS r4,
         COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE) AS r5
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN r1 THEN 0 ELSE 1 END) AS BIGINT) AS price_positive,
       CAST(sum(CASE WHEN r2 THEN 0 ELSE 1 END) AS BIGINT) AS price_under_cap,
       CAST(sum(CASE WHEN r3 THEN 0 ELSE 1 END) AS BIGINT) AS status_known,
       CAST(sum(CASE WHEN r4 THEN 0 ELSE 1 END) AS BIGINT) AS date_in_range,
       CAST(sum(CASE WHEN r5 THEN 0 ELSE 1 END) AS BIGINT) AS priority_format,
       CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 THEN 0 ELSE 1 END)
            AS BIGINT) AS n_quarantined
FROM r
""",
        "stream_static_join": """
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       c.c_mktsegment AS segment,
       CAST(c.c_nationkey AS BIGINT) AS nation
FROM events e JOIN customer c ON c.c_custkey - 1 = e.user_id
""",
        "substring_dedup": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
pos_tok AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, t[u.i] AS tok
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
),
g AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS start,
         concat_ws(' ', {", ".join(f"t[u.i+{j+1}]" for j in range(8))}) AS gram
  FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 7)) AS i) u
  WHERE len(t) >= 8
),
rep AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT g.doc_id, g.start + v.j AS pos
  FROM g JOIN rep USING (gram), LATERAL (SELECT unnest(range(0, 8)) AS j) v
),
surv AS (
  SELECT pt.doc_id, pt.pos, pt.tok
  FROM pos_tok pt LEFT JOIN cov ON cov.doc_id = pt.doc_id AND cov.pos = pt.pos
  WHERE cov.doc_id IS NULL
),
reb AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned
  FROM surv GROUP BY doc_id
)
SELECT CAST(t.doc_id AS BIGINT) AS id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_removed,
       md5(COALESCE(reb.cleaned, '')) AS clean_md5
FROM toks t LEFT JOIN reb ON reb.doc_id = t.doc_id
""",
        "zorder_layout": f"""
WITH base AS (
  SELECT o_orderkey, o_custkey % 1024 AS x,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 1024
           AS y
  FROM orders
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       CAST({" + ".join(
           f"(((x >> {b}) & 1) * {1 << (2 * b)})"
           f" + (((y >> {b}) & 1) * {1 << (2 * b + 1)})"
           for b in range(10)
       )} AS BIGINT) AS zkey
FROM base
""",
        "leakage_safe_split": f"""
WITH RECURSIVE {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
wc AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
  LEFT JOIN comp c USING (doc_id)
),
assigned AS (
  SELECT doc_id, component,
         CASE
           WHEN CAST(concat('0x', substr(md5(component || '|' || 'split-v1'), 1, 8))
                     AS BIGINT) < 3435973836 THEN 'train'
           WHEN CAST(concat('0x', substr(md5(component || '|' || 'split-v1'), 1, 8))
                     AS BIGINT) < 3865470566 THEN 'val'
           ELSE 'test'
         END AS split
  FROM wc
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT component) AS BIGINT) AS n_components
FROM assigned GROUP BY split
""",
        # hll_user_rollup: intentionally absent (rows-only) — the
        # Datasketches HLL estimate has no DuckDB equivalent; merge
        # equivalence + accuracy are pytest-pinned.
        "scd2_dimension": """
WITH log AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d,
         o_orderpriority AS prio
  FROM orders
),
w AS (
  SELECT cust, d, prio,
         CASE WHEN lag(prio) OVER (PARTITION BY cust ORDER BY d, prio)
                   IS DISTINCT FROM prio
              THEN 1 ELSE 0 END AS chg
  FROM log
),
pts AS (SELECT cust, d, prio FROM w WHERE chg = 1),
iv AS (
  SELECT cust, prio, d AS valid_from,
         lead(d) OVER (PARTITION BY cust ORDER BY d, prio) AS nxt
  FROM pts
)
SELECT cust, prio,
       strftime(valid_from, '%Y-%m-%d') AS valid_from,
       strftime(coalesce(nxt, DATE '9999-12-31'), '%Y-%m-%d') AS valid_to,
       nxt IS NULL AS is_current
FROM iv
""",
        "incremental_rollup_merge": """
SELECT o_orderpriority AS prio,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
""",
        "distinct_rollup_bitmap": """
SELECT o_orderpriority AS prio,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
FROM orders GROUP BY o_orderpriority
""",
        "bloom_prune_semi": """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 45)
GROUP BY l_returnflag
""",
        "snapshot_cdc": """
WITH o AS (
  SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  GROUP BY 1
),
n AS (
  SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY 1
),
d AS (
  SELECT coalesce(o.cust, n.cust) AS cust,
         CASE WHEN o.cust IS NULL THEN 'insert'
              WHEN n.cust IS NULL THEN 'delete'
              WHEN o.n <> n.n OR o.revenue <> n.revenue THEN 'update'
         END AS op,
         n.n AS n, n.revenue AS revenue
  FROM o FULL OUTER JOIN n ON o.cust = n.cust
)
SELECT cust, op, n, revenue FROM d WHERE op IS NOT NULL
""",
        "cdc_roundtrip": """
SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1
""",
        "editdist_join": """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
""",
        "interval_overlap": """
WITH l AS (
  SELECT o_orderkey AS oid,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS ls,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           + o_orderkey % 20 + 1 AS le
  FROM orders WHERE o_orderkey % 7 = 0
),
r AS (
  SELECT p_partkey AS pid,
         9131 + (p_partkey * 17) % 3000 AS rs,
         9131 + (p_partkey * 17) % 3000 + p_partkey % 30 + 1 AS re
  FROM part
)
SELECT pid, CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(sum(least(le, re) - greatest(ls, rs)) AS BIGINT) AS sum_overlap
FROM l JOIN r ON l.ls < r.re AND r.rs < l.le
GROUP BY pid
""",
        "histogram_quantiles": """
WITH b AS (
  SELECT o_orderpriority AS prio,
         CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bin,
         count(*) AS bin_n
  FROM orders GROUP BY 1, 2
),
c AS (
  SELECT prio, bin,
         sum(bin_n) OVER (PARTITION BY prio ORDER BY bin) AS cum_n,
         sum(bin_n) OVER (PARTITION BY prio) AS total
  FROM b
)
SELECT prio, CAST(0.5 AS DOUBLE) AS q, CAST(min(bin) * 10000.0 AS DOUBLE) AS value
FROM c WHERE cum_n >= ceil(0.5 * total) GROUP BY prio
UNION ALL
SELECT prio, CAST(0.9 AS DOUBLE) AS q, CAST(min(bin) * 10000.0 AS DOUBLE) AS value
FROM c WHERE cum_n >= ceil(0.9 * total) GROUP BY prio
UNION ALL
SELECT prio, CAST(0.99 AS DOUBLE) AS q, CAST(min(bin) * 10000.0 AS DOUBLE) AS value
FROM c WHERE cum_n >= ceil(0.99 * total) GROUP BY prio
""",
        "er_clusters": """
WITH RECURSIVE pairs AS (
  SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b
  FROM supplier a JOIN supplier b
    ON a.s_suppkey < b.s_suppkey AND a.s_nationkey = b.s_nationkey
  WHERE levenshtein(a.s_name, b.s_name) <= 1
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT coalesce(c.component, s.s_suppkey) AS cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       min(s.s_name) AS canonical_name
FROM supplier s LEFT JOIN comp c ON s.s_suppkey = c.node
GROUP BY 1
""",
        "tpch_q3": """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DOUBLE) AS revenue,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) DESC,
         l_orderkey
LIMIT 10
""",
        "tpch_q5": """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
""",
        "covisitation_topk": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item, n_common,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
)
SELECT item, rec_item, n_common, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        "rec_coverage": """
WITH npart AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
recs AS (
  SELECT
    CAST(p_partkey AS VARCHAR) AS query_item_id,
    CASE
      WHEN p_partkey % 10 = 0 THEN NULL
      WHEN p_partkey % 13 = 0 THEN CAST([] AS VARCHAR[])
      ELSE list_transform(range(1, 5 + 1),
                          i -> CAST((p_partkey + i) % n AS VARCHAR))
    END AS rec_items,
    CASE WHEN p_partkey % 10 = 0 THEN 'ITEM_NOT_IN_DATASET' END AS error
  FROM part, npart
),
exploded AS (
  SELECT query_item_id, unnest(rec_items) AS rec_item
  FROM recs WHERE error IS NULL
),
cat AS (SELECT CAST(p_partkey AS VARCHAR) AS cat_item FROM part
        WHERE p_partkey % 7 <> 0),
per_item AS (
  SELECT e.rec_item,
         count(*) AS n_recs,
         max(CASE WHEN c.cat_item IS NOT NULL THEN 1 ELSE 0 END) AS in_catalog
  FROM exploded e LEFT JOIN cat c ON e.rec_item = c.cat_item
  GROUP BY e.rec_item
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM cat) AS catalog_size,
       CAST(sum(in_catalog) AS BIGINT) AS items_covered,
       CAST(count(*) AS BIGINT) AS items_recommended,
       CAST(sum(CASE WHEN in_catalog = 0 THEN n_recs ELSE 0 END) AS BIGINT)
         AS dead_rec_rows,
       CAST(sum(n_recs) AS BIGINT) AS total_rec_rows
FROM per_item
""",
        "rec_hitrate": """
WITH npart AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
recs AS (
  SELECT
    CAST(p_partkey AS VARCHAR) AS query_item_id,
    CASE
      WHEN p_partkey % 10 = 0 THEN NULL
      WHEN p_partkey % 13 = 0 THEN CAST([] AS VARCHAR[])
      ELSE list_transform(range(1, 5 + 1),
                          i -> CAST((p_partkey + i) % n AS VARCHAR))
    END AS rec_items,
    CASE WHEN p_partkey % 10 = 0 THEN 'ITEM_NOT_IN_DATASET' END AS error
  FROM part, npart
),
exploded AS (
  SELECT query_item_id, unnest(rec_items) AS rec_item
  FROM recs WHERE error IS NULL
),
m AS (
  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS u, CAST(l_partkey AS VARCHAR) AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
truth AS (
  SELECT DISTINCT a.i AS qi, b.i AS ri
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
)
SELECT e.query_item_id,
       CAST(count(*) AS BIGINT) AS n_recs,
       CAST(sum(CASE WHEN t.qi IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
FROM exploded e
LEFT JOIN truth t ON e.query_item_id = t.qi AND e.rec_item = t.ri
GROUP BY e.query_item_id
""",
        "negative_sampling": """
WITH n AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
users AS (SELECT DISTINCT u FROM m),
cand AS (
  SELECT users.u, t.j,
         CAST(concat('0x', substr(md5(
           CAST(users.u AS VARCHAR) || '|' || CAST(t.j AS VARCHAR) || '|neg-v1'
         ), 1, 8)) AS BIGINT) % n.n AS neg_item
  FROM users, n, (SELECT unnest(range(1, 16)) AS j) t
),
nohist AS (
  SELECT c.u, c.j, c.neg_item
  FROM cand c LEFT JOIN m h ON c.u = h.u AND c.neg_item = h.i
  WHERE h.u IS NULL
),
dedup AS (SELECT u, neg_item, min(j) AS j FROM nohist GROUP BY 1, 2),
ranked AS (
  SELECT u, neg_item,
         row_number() OVER (PARTITION BY u ORDER BY j) AS rank
  FROM dedup
)
SELECT u AS user_id, neg_item, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        "user_profile_vectors": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nv AS (SELECT count(*) AS n FROM embeddings),
j AS (
  SELECT m.u, e.embedding
  FROM m, nv
  JOIN embeddings e ON e.vec_id = m.i % nv.n
),
dims AS (SELECT unnest(range(64)) AS dim),
x AS (
  SELECT j.u, d.dim,
         CAST(list_extract(j.embedding, d.dim + 1) AS DOUBLE) AS v
  FROM j CROSS JOIN dims d
)
SELECT u AS user_id, CAST(dim AS INT) AS dim,
       CAST(sum(CAST(round(v * 1000000.0) AS BIGINT)) AS BIGINT) AS vsum_micro,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM x GROUP BY 1, 2
""",
        "funnel_windows": """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
s1 AS (
  SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts_us) AS t2
  FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts_us > s1.t1
    AND e.ts_us <= s1.t1 + 7200000000
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts_us) AS t3
  FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
    AND e.ts_us <= s2.t2 + 86400000000
  GROUP BY 1
)
SELECT s1.user_id,
       CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
            AS INT) AS steps_completed,
       s1.t1, s2.t2, s3.t3
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
""",
        "gap_fill_locf": """
WITH daily AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1995-03-01'
  GROUP BY 1, 2
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
offsets AS (
  SELECT p.prio, bounds.d0,
         unnest(range(0, datediff('day', bounds.d0, bounds.d1) + 1)) AS o
  FROM (SELECT DISTINCT prio FROM daily) p, bounds
),
cal AS (
  SELECT prio, CAST(d0 + o * INTERVAL 1 DAY AS DATE) AS day FROM offsets
),
dense AS (
  SELECT cal.prio, cal.day, daily.revenue
  FROM cal LEFT JOIN daily USING (prio, day)
)
SELECT prio, strftime(day, '%Y-%m-%d') AS day,
       CAST(last_value(revenue IGNORE NULLS) OVER (
         PARTITION BY prio ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS revenue
FROM dense
""",
        "price_outliers": """
WITH b AS (
  SELECT o_orderpriority AS prio,
         CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bin,
         count(*) AS bin_n
  FROM orders GROUP BY 1, 2
),
c AS (
  SELECT prio, bin,
         sum(bin_n) OVER (PARTITION BY prio ORDER BY bin) AS cum_n,
         sum(bin_n) OVER (PARTITION BY prio) AS total
  FROM b
),
bands AS (
  SELECT prio, min(bin) * 10000.0 AS p90_band
  FROM c WHERE cum_n >= ceil(0.9 * total) GROUP BY prio
)
SELECT o.o_orderpriority AS prio,
       CAST(count(*) AS BIGINT) AS n_outliers,
       CAST(max(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders o JOIN bands ON o.o_orderpriority = bands.prio
WHERE o.o_totalprice >= bands.p90_band + 10000.0
GROUP BY 1
""",
        "revenue_trend": """
WITH daily AS (
  SELECT o_orderpriority AS prio,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY 1, 2
),
stats AS (
  SELECT prio,
         CAST(count(*) AS DECIMAL(38,6)) AS n,
         sum(CAST(day_idx AS DECIMAL(38,6))) AS sx,
         sum(CAST(revenue AS DECIMAL(38,6))) AS sy,
         sum(CAST(day_idx AS DECIMAL(38,6)) * CAST(revenue AS DECIMAL(38,6))) AS sxy,
         sum(CAST(day_idx AS DECIMAL(38,6)) * CAST(day_idx AS DECIMAL(38,6))) AS sxx
  FROM daily GROUP BY prio
)
SELECT prio,
       round(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE), 6) AS slope,
       round((CAST(CAST(sy AS VARCHAR) AS DOUBLE)
              - (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept,
       CAST(n AS BIGINT) AS n_points
FROM stats
""",
        "bm25_search": """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term FROM documents
),
tf AS (
  SELECT doc_id AS id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY id),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
qtf AS (SELECT * FROM tf WHERE term IN ('hash', 'join', 'window')),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT q.id,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (q.tf * 2.2) / (q.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
           AS s
  FROM qtf q JOIN dfreq d USING (term) JOIN dl ON q.id = dl.id, stats s
),
per_doc AS (
  SELECT id, round(sum(s), 6) AS score,
         CAST(count(*) AS INT) AS n_terms_hit
  FROM scored GROUP BY id
)
SELECT CAST(id AS BIGINT) AS doc_id, score, n_terms_hit,
       CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank
FROM per_doc
ORDER BY score DESC, id LIMIT 10
""",
        "scd2_durations": """
WITH log AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d,
         o_orderpriority AS prio
  FROM orders
),
w AS (
  SELECT cust, d, prio,
         CASE WHEN lag(prio) OVER (PARTITION BY cust ORDER BY d, prio)
                   IS DISTINCT FROM prio
              THEN 1 ELSE 0 END AS chg
  FROM log
),
pts AS (SELECT cust, d, prio FROM w WHERE chg = 1),
iv AS (
  SELECT cust, prio, d AS valid_from,
         lead(d) OVER (PARTITION BY cust ORDER BY d, prio) AS valid_to
  FROM pts
),
closed AS (
  SELECT prio, datediff('day', valid_from, valid_to) AS days
  FROM iv WHERE valid_to IS NOT NULL
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(days) AS BIGINT) AS total_days,
       round(avg(days), 6) AS avg_days
FROM closed GROUP BY prio
""",
        "hashed_features": """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term
  FROM documents WHERE doc_id % 5 = 0
),
tf AS (
  SELECT doc_id AS id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE length(term) >= 3 GROUP BY 1, 2
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs
       FROM documents WHERE doc_id % 5 = 0),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
mapped AS (
  SELECT tf.id,
         CAST(concat('0x', substr(md5(tf.term || '|feat-v1'), 1, 8)) AS BIGINT)
           % 64 AS dim,
         tf.tf * ln(nd.n_docs / dfreq.df) AS w
  FROM tf JOIN dfreq USING (term), nd
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(dim AS INT) AS dim,
       round(sum(w), 6) AS weight
FROM mapped GROUP BY 1, 2
""",
        "price_percentile_rank": """
WITH ranked AS (
  SELECT o_orderpriority AS prio, o_totalprice AS price,
         percent_rank() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice) AS pr
  FROM orders
)
SELECT prio,
       CAST(least(CAST(floor(pr * 10) AS INT), 9) AS INT) AS decile,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(min(pr), 6) AS min_pr
FROM ranked GROUP BY 1, 2
""",
        "skew_report": """
WITH per_key AS (
  SELECT CAST(l_partkey AS VARCHAR) AS key, count(*) AS n
  FROM lineitem GROUP BY 1
),
scalars AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM per_key
)
SELECT key, CAST(n AS BIGINT) AS n_rows,
       round(n / (total_rows * 1.0 / n_keys), 6) AS skew_factor,
       round(n * 1.0 / total_rows, 6) AS row_share,
       total_rows, n_keys
FROM per_key, scalars
ORDER BY n DESC, key LIMIT 10
""",
        "session_paths": """
WITH w AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL
                   OR ts_us - prev_us > 1800 * 1000 * 1000
                 THEN 1 ELSE 0 END AS new_s
  FROM w
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
paths AS (
  SELECT user_id, sid,
         list(event_type ORDER BY ts_us, event_id) AS path
  FROM sess GROUP BY user_id, sid
),
tri AS (
  SELECT path[o] || '>' || path[o + 1] || '>' || path[o + 2] AS trigram
  FROM paths, unnest(range(1, greatest(len(path) - 2, 0) + 1)) AS t(o)
)
SELECT trigram, CAST(count(*) AS BIGINT) AS n
FROM tri GROUP BY trigram
ORDER BY n DESC, trigram LIMIT 20
""",
        "revenue_contribution": """
WITH cell AS (
  SELECT o_orderpriority AS prio, o_orderstatus AS status,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT sum(revenue) AS grand FROM cell)
SELECT prio, status,
       CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
       round(CAST(CAST(revenue AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sum(revenue) OVER (PARTITION BY prio) AS VARCHAR)
                    AS DOUBLE), 6)
         AS share_of_prio,
       round(CAST(CAST(revenue AS VARCHAR) AS DOUBLE)
             / CAST(CAST(grand AS VARCHAR) AS DOUBLE), 6)
         AS share_of_total
FROM cell, tot
""",
        "skipgram_pairs": """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS t
  FROM documents WHERE doc_id % 5 = 0
),
fwd AS (
  SELECT t[CAST(i AS INT)] AS center, t[CAST(i + d AS INT)] AS context
  FROM toks,
       unnest(range(1, len(t) + 1)) AS a(i),
       (SELECT unnest([1, 2]) AS d) b
  WHERE i + d <= len(t)
),
sym_pairs AS (
  SELECT center, context FROM fwd
  UNION ALL
  SELECT context, center FROM fwd
)
SELECT center, context, CAST(count(*) AS BIGINT) AS n
FROM sym_pairs GROUP BY 1, 2
""",
        "vocab_coverage": """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
counts AS (SELECT term, sum(tf) AS n FROM tf GROUP BY term),
vocab AS (SELECT term FROM counts ORDER BY n DESC, term LIMIT 1000),
inv AS (
  SELECT sum(tf.tf) AS in_vocab_tokens
  FROM tf JOIN vocab USING (term)
),
tot AS (
  SELECT sum(tf) AS total_tokens, count(DISTINCT term) AS distinct_terms
  FROM tf
)
SELECT CAST(total_tokens AS BIGINT) AS total_tokens,
       CAST(distinct_terms AS BIGINT) AS distinct_terms,
       CAST(in_vocab_tokens AS BIGINT) AS in_vocab_tokens,
       CAST(total_tokens - in_vocab_tokens AS BIGINT) AS oov_tokens
FROM tot, inv
""",
        "trending_items": """
WITH counts AS (
  SELECT CAST(floor(datediff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS week,
         l_partkey AS part, count(*) AS n
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT week, part, n,
         row_number() OVER (PARTITION BY week ORDER BY n DESC, part) AS rank
  FROM counts
)
SELECT week, part, CAST(n AS BIGINT) AS n, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        "cohort_revenue": """
WITH o AS (
  SELECT o_custkey AS cust,
         year(CAST(o_orderdate AS DATE)) * 12
           + month(CAST(o_orderdate AS DATE)) AS m,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
firstm AS (SELECT cust, min(m) AS cohort FROM o GROUP BY cust),
cells AS (
  SELECT cohort, o.m - cohort AS "offset", sum(price) AS revenue
  FROM o JOIN firstm USING (cust)
  GROUP BY 1, 2
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST("offset" AS BIGINT) AS "offset",
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(sum(revenue) OVER (PARTITION BY cohort ORDER BY "offset"
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         AS cum_revenue
FROM cells
""",
        "covisitation_mrr": """
WITH mtrain AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate < TIMESTAMP '1997-01-01'
),
mtest AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, count(*) AS n_common
  FROM mtrain a JOIN mtrain b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
),
recs AS (SELECT * FROM ranked WHERE rank <= 5),
truth AS (
  SELECT DISTINCT a.i AS item, b.i AS rec_item
  FROM mtest a JOIN mtest b ON a.u = b.u AND a.i <> b.i
),
hits AS (
  SELECT r.item, r.rank
  FROM recs r JOIN truth t ON r.item = t.item AND r.rec_item = t.rec_item
),
first_hit AS (SELECT item, min(rank) AS first_rank FROM hits GROUP BY item)
SELECT CAST(first_rank AS INT) AS first_rank,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(1.0 / first_rank), 6) AS rr_sum
FROM first_hit GROUP BY first_rank
""",
        "decayed_popularity": """
WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS r FROM orders),
scored AS (
  SELECT l_partkey AS part,
         pow(0.98, CAST(datediff('day', CAST(o_orderdate AS DATE), ref.r)
                        AS DOUBLE)) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey, ref
),
pop AS (
  SELECT part, round(sum(w), 6) AS score,
         CAST(count(*) AS BIGINT) AS n_events
  FROM scored GROUP BY part
)
SELECT part, score, n_events FROM pop
ORDER BY score DESC, part LIMIT 20
""",
        "asof_nearest": """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch_us(ts) AS c_us, max(event_id) AS click_event_id
  FROM events WHERE event_type = 'click'
  GROUP BY 1, 2
),
cand AS (
  SELECT p.event_id, p.user_id, c.click_event_id,
         c.c_us - p.t_us AS sd, abs(c.c_us - p.t_us) AS ad
  FROM p JOIN c ON p.user_id = c.user_id
  WHERE abs(c.c_us - p.t_us) <= CAST(3600 AS BIGINT) * 1000000
),
pick AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_id
    ORDER BY ad, CASE WHEN sd <= 0 THEN 0 ELSE 1 END, click_event_id
  ) AS rn
  FROM cand
)
SELECT event_id, user_id, click_event_id, CAST(sd AS BIGINT) AS delta_us
FROM pick WHERE rn = 1
""",
        # LOO mean: exact bigint group sums, ONE bigint/bigint -> double
        # division at the end (deterministic in both engines); singleton
        # categories -> NULL in both (n-1 = 0 guarded to NULL).
        "target_encoding": """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_orderpriority,
       CASE WHEN count(*) OVER w > 1
            THEN (sum(cents) OVER w - cents) / (count(*) OVER w - 1)
       END AS te_loo_cents
FROM o
WINDOW w AS (PARTITION BY o_orderpriority)
""",
        # discrete (inverse-CDF) percentile bounds at integer ranks —
        # (n*p + 99) // 100 — over integer cents: every bound, clamp,
        # count, and sum is integer-exact; one final division.
        "winsorize_prices": """
WITH v AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
r AS (
  SELECT l_returnflag, cents,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM v
),
b AS (
  SELECT l_returnflag,
         min(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END) AS lo_bound,
         min(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END) AS hi_bound,
         CAST(max(n) AS BIGINT) AS n_rows
  FROM r GROUP BY 1
)
SELECT v.l_returnflag, n_rows, lo_bound, hi_bound,
       CAST(sum(greatest(lo_bound, least(hi_bound, cents))) AS DOUBLE)
         / count(*) AS winsorized_mean,
       CAST(sum(CASE WHEN cents < lo_bound THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_lo,
       CAST(sum(CASE WHEN cents > hi_bound THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_hi
FROM v JOIN b USING (l_returnflag)
GROUP BY 1, 2, 3, 4
""",
        # per-user ordered purchase stream -> (context, label) pairs;
        # the lateral position generator mirrors the row-local window
        # frame (up to 3 immediately preceding items, 1-based slices).
        "next_item_examples": """
WITH inter AS (
  SELECT o_custkey AS u, CAST(l_partkey AS BIGINT) AS i,
         o_orderdate AS d, o_orderkey AS ok, l_linenumber AS ln
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
seq AS (
  SELECT u, list(i ORDER BY d, ok, ln) AS items FROM inter GROUP BY u
)
SELECT u AS user_id, CAST(gs.pos AS BIGINT) AS pos,
       items[gs.pos] AS label,
       array_to_string(
         list_slice(items, greatest(1, gs.pos - 3), gs.pos - 1), ','
       ) AS context_csv
FROM seq, LATERAL (
  SELECT unnest(range(2, len(items) + 1)) AS pos
) gs
""",
        # plain exact GROUP BY/HAVING — the two-pass candidate/recount
        # plan must be result-identical to the naive exact aggregate
        "frequent_tokens": f"""
WITH tok AS (
  SELECT unnest({_TOKS}) AS token FROM documents
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok)
SELECT token, CAST(count(*) AS BIGINT) AS n,
       count(*) / (SELECT total FROM tot) AS share
FROM tok
GROUP BY token
HAVING count(*) > 0.002::DOUBLE * (SELECT total FROM tot)
""",
        # integer sup |cum_a*n_b - cum_b*n_a| over the per-value grid,
        # one bigint/bigint division at the end — engine-exact
        "ks_drift": """
WITH v AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS fa,
         CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END AS fb
  FROM lineitem
),
per AS (SELECT c, sum(fa) AS a, sum(fb) AS b FROM v GROUP BY c),
cum AS (
  SELECT c, sum(a) OVER (ORDER BY c) AS ca, sum(b) OVER (ORDER BY c) AS cb
  FROM per
),
tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b FROM per
)
SELECT n_a, n_b,
       CAST(max(abs(ca * n_b - cb * n_a)) AS BIGINT) AS ks_num,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         CAST(max(abs(ca * n_b - cb * n_a)) AS BIGINT) / (n_a * n_b)
       END AS ks_stat
FROM cum, tot
GROUP BY n_a, n_b
""",
        # same rare-shingle candidates as ngram_jaccard_pairs; both
        # containment directions are integer/integer divisions.
        # numerator and denominators share the RARE universe: common
        # can only count rare shingles, so n_a/n_b are per-doc RARE
        # counts (raw counts would understate containment for pairs
        # sharing frequent shingles)
        "containment_pairs": f"""
WITH {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
fn AS (SELECT doc_id, count(*) AS n_rare FROM filtered GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         na.n_rare AS n_a, nb.n_rare AS n_b,
         count(*) AS common
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN fn na ON na.doc_id = a.doc_id
  JOIN fn nb ON nb.doc_id = b.doc_id
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= 2
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(common AS BIGINT) AS common,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       common / n_a AS c_a_in_b,
       common / n_b AS c_b_in_a
FROM pairs
""",
        # FULL recompute over all interactions — the incremental merge
        # law is exactly that this equals state-pairs + increments
        "covisitation_incremental": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey % 4 = 0
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item, n_common,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
)
SELECT item, rec_item, n_common, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        # batch gap-island sessions MINUS each user's final session
        # (still open in stream state when the AvailableNow run ends)
        "stream_sessionize_stateful": """
WITH w AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
           AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800 * 1000 * 1000
              THEN 1 ELSE 0 END AS new_s
  FROM w
),
sess AS (
  SELECT user_id, ts_us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us) AS sid
  FROM flagged
),
agg AS (
  SELECT user_id, sid,
         min(ts_us) AS session_start_us,
         max(ts_us) AS session_end_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sess GROUP BY 1, 2
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       session_start_us, session_end_us, n_events
FROM agg
QUALIFY sid < max(sid) OVER (PARTITION BY user_id)
""",
        "tpch_q10": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DOUBLE) AS revenue,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal,
       n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)), n_name
ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) DESC,
         c_custkey
LIMIT 20
""",
        "tpch_q18": """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
        # EXISTS = semi join; "late" adapted to the fixture schema
        # (shipped > 60 days after order date)
        "tpch_q4": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1
""",
        "tpch_q6": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(18,6)) >= CAST('0.05' AS DECIMAL(18,6))
  AND CAST(l_discount AS DECIMAL(18,6)) <= CAST('0.07' AS DECIMAL(18,6))
  AND l_quantity < 24
""",
        "tpch_q14": """
WITH x AS (
  SELECT p_type,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
              AS DECIMAL(30,8)) AS rev
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate < TIMESTAMP '1996-10-01'
)
SELECT CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
                     ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
         AS promo_revenue,
       CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS total_revenue,
       CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
                     ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
         * 100.0
         / CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS promo_pct
FROM x
""",
        # threshold compare is division-free (qty*5*n < sum_qty) so the
        # "below 20% of the part's average" predicate is integer-exact
        "tpch_q17": """
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12'),
li AS (
  SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS qty,
         l_extendedprice
  FROM lineitem JOIN bp ON l_partkey = p_partkey
),
st AS (
  SELECT l_partkey AS pk, sum(qty) AS sum_qty, count(*) AS n
  FROM li GROUP BY 1
)
SELECT CAST(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small
FROM li JOIN st ON li.l_partkey = st.pk
WHERE qty * 5 * n < sum_qty
""",
        # arg-max by encoded ts*8+code bigint; RANGE to 1 PRECEDING =
        # strictly-before by timestamp value
        # linear multi-touch: integer micro-unit shares, remainder to
        # the latest touch — credit conserves exactly per conversion
        "linear_attribution": """
WITH convs AS (
  SELECT user_id AS u, epoch_us(ts) AS cts, event_id AS cid,
         CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS vmicro
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id AS tu, epoch_us(ts) AS tts, event_id AS tid, event_type
  FROM events WHERE event_type IN ('view', 'click')
),
pairs AS (
  SELECT event_type AS touch_type, cid, vmicro, tts, tid
  FROM convs JOIN touches
    ON u = tu AND tts < cts AND tts >= cts - 86400000000
),
ranked AS (
  SELECT touch_type, cid, vmicro,
         count(*) OVER (PARTITION BY cid) AS k,
         row_number() OVER (PARTITION BY cid
                            ORDER BY tts DESC, tid DESC) AS rn
  FROM pairs
),
credited AS (
  SELECT touch_type, cid,
         vmicro // k + CASE WHEN rn = 1 THEN vmicro % k ELSE 0 END AS credit
  FROM ranked
)
SELECT touch_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(count(DISTINCT cid) AS BIGINT) AS n_conversions,
       CAST(sum(credit) AS BIGINT) AS credit_micro,
       CAST(sum(credit) AS DOUBLE) / 1000000.0 AS credit_value
FROM credited GROUP BY 1
""",
        "last_touch_attribution": """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              ELSE NULL END AS code
  FROM events
),
enc AS (
  SELECT user_id, event_type, ts_us,
         max(CASE WHEN code IS NOT NULL THEN ts_us * 8 + code END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_enc
  FROM e
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       ts_us AS conv_ts_us,
       last_enc // 8 AS touch_ts_us,
       CAST(last_enc % 8 AS INT) AS touch_type_code,
       CAST(CASE WHEN last_enc IS NULL THEN 0
                 WHEN last_enc // 8 >= ts_us - 86400000000 THEN 1
                 ELSE 0 END AS INT) AS attributed
FROM enc WHERE event_type = 'purchase'
""",
        "audience_overlap": """
WITH m AS (
  SELECT user_id,
         bit_or(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                     WHEN 'purchase' THEN 4 ELSE 0 END) AS mask
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY 1
)
SELECT CAST(mask AS INT) AS mask, CAST(count(*) AS BIGINT) AS n_users
FROM m GROUP BY 1
""",
        # integer residual 7*v - trailing sum vs k*MAD of the residual
        # grid — division-free end to end
        "revenue_anomalies": """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, v, sum(v) OVER w AS s, count(*) OVER w AS n
  FROM d
  WINDOW w AS (ORDER BY datediff('day', DATE '1970-01-01', day)
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
),
r AS (SELECT day, v, CAST(7 * v - s AS BIGINT) AS residual FROM win WHERE n = 7),
grid AS (SELECT abs(residual) AS a, count(*) AS c FROM r GROUP BY 1),
g2 AS (
  SELECT a, sum(c) OVER (ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum
  FROM grid
),
tot AS (SELECT sum(c) AS n FROM grid),
mad AS (
  SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN a END) AS mad
  FROM g2, tot
)
SELECT strftime(day, '%Y-%m-%d') AS day, v AS cents, residual,
       CAST(mad.mad AS BIGINT) AS mad,
       CAST(CASE WHEN abs(residual) > 5 * mad.mad THEN 1 ELSE 0 END
            AS INT) AS is_anomaly
FROM r, mad
""",
        # DCG/IDCG as exact decimal sums of fixed 9-dp gain literals;
        # one double division at the end (see recsys._NDCG_GAINS)
        "rec_ndcg": """
WITH mtrain AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate < TIMESTAMP '1997-01-01'
),
mtest AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, count(*) AS n_common
  FROM mtrain a JOIN mtrain b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
),
recs AS (SELECT * FROM ranked WHERE rank <= 5),
truth AS (
  SELECT a.i AS item, b.i AS partner
  FROM mtest a JOIN mtest b ON a.u = b.u AND a.i <> b.i
),
hits AS (
  SELECT DISTINCT r.item, r.rank
  FROM recs r JOIN truth t ON r.item = t.item AND r.rec_item = t.partner
),
dcg AS (
  SELECT item,
         sum(CASE rank WHEN 1 THEN CAST('1.000000000' AS DECIMAL(12,9))
                       WHEN 2 THEN CAST('0.630929754' AS DECIMAL(12,9))
                       WHEN 3 THEN CAST('0.500000000' AS DECIMAL(12,9))
                       WHEN 4 THEN CAST('0.430676558' AS DECIMAL(12,9))
                       WHEN 5 THEN CAST('0.386852807' AS DECIMAL(12,9))
             END) AS dcg_dec,
         count(*) AS n_hits
  FROM hits GROUP BY 1
),
nrel AS (
  SELECT item, count(DISTINCT partner) AS n_rel FROM truth GROUP BY 1
),
base AS (SELECT DISTINCT item FROM recs)
SELECT CAST(base.item AS BIGINT) AS item,
       CAST(coalesce(n_rel, 0) AS BIGINT) AS n_rel,
       CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(dcg_dec, CAST('0' AS DECIMAL(12,9))) AS DOUBLE) AS dcg,
       CAST(CASE least(coalesce(n_rel, 0), 5)
                 WHEN 1 THEN CAST('1.000000000' AS DECIMAL(12,9))
                 WHEN 2 THEN CAST('1.630929754' AS DECIMAL(12,9))
                 WHEN 3 THEN CAST('2.130929754' AS DECIMAL(12,9))
                 WHEN 4 THEN CAST('2.561606312' AS DECIMAL(12,9))
                 WHEN 5 THEN CAST('2.948459119' AS DECIMAL(12,9))
            END AS DOUBLE) AS idcg,
       CAST(coalesce(dcg_dec, CAST('0' AS DECIMAL(12,9))) AS DOUBLE)
         / CAST(CASE least(coalesce(n_rel, 0), 5)
                     WHEN 1 THEN CAST('1.000000000' AS DECIMAL(12,9))
                     WHEN 2 THEN CAST('1.630929754' AS DECIMAL(12,9))
                     WHEN 3 THEN CAST('2.130929754' AS DECIMAL(12,9))
                     WHEN 4 THEN CAST('2.561606312' AS DECIMAL(12,9))
                     WHEN 5 THEN CAST('2.948459119' AS DECIMAL(12,9))
                END AS DOUBLE) AS ndcg
FROM base
LEFT JOIN dcg ON dcg.item = base.item
LEFT JOIN nrel ON nrel.item = base.item
""",
        "embedding_drift": """
WITH x AS (
  SELECT CAST(label AS BIGINT) AS label, vec_id % 2 AS half, d.dim,
         CAST(round(CAST(list_extract(embedding, d.dim + 1) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS sv
  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS dim) d
),
agg AS (
  SELECT label, half, dim,
         CAST(sum(sv) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM x GROUP BY 1, 2, 3
),
j AS (
  SELECT a.label, a.dim, a.s AS sa, a.n AS na, b.s AS sb, b.n AS nb
  FROM (SELECT * FROM agg WHERE half = 0) a
  JOIN (SELECT * FROM agg WHERE half = 1) b
    ON a.label = b.label AND a.dim = b.dim
)
SELECT label,
       CAST(min(na) AS BIGINT) AS n_a,
       CAST(min(nb) AS BIGINT) AS n_b,
       CAST(sum(abs(sa * nb - sb * na)) AS BIGINT) AS drift_num,
       CAST(sum(abs(sa * nb - sb * na)) AS DOUBLE)
         / CAST(min(na) * min(nb) * 1000000 AS DOUBLE) AS l1_drift
FROM j GROUP BY 1
""",
        "source_quality": f"""
WITH t AS (
  SELECT source, md5(text) AS dig, {_TOKS} AS toks,
         CAST(length(text) AS BIGINT) AS nc
  FROM documents
),
s AS (
  SELECT source, dig,
         CAST(len(toks) AS BIGINT) AS nt,
         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
              AS BIGINT) AS tc,
         CAST(len(list_filter(toks,
              x -> x IN ('a','the','of','and','to','in','is')))
              AS BIGINT) AS sh,
         nc
  FROM t
),
dc AS (SELECT dig, count(*) AS dn FROM s GROUP BY 1),
f AS (
  SELECT s.source, s.nt, s.tc, s.sh, s.nc,
         CASE WHEN dc.dn > 1 THEN 1 ELSE 0 END AS dup,
         CASE WHEN s.nt > 0 AND s.sh / s.nt > 0.05 THEN 1 ELSE 0 END AS eng
  FROM s JOIN dc ON s.dig = dc.dig
),
a AS (
  SELECT source, count(*) AS n_docs, sum(nt) AS n_tokens,
         sum(sh) AS n_sh, sum(nc) AS n_chars,
         sum(dup) AS n_dup_docs, sum(eng) AS n_english_docs
  FROM f GROUP BY 1
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_dup_docs AS BIGINT) AS n_dup_docs,
       CAST(n_english_docs AS BIGINT) AS n_english_docs,
       n_tokens / n_docs AS tokens_per_doc,
       n_sh / n_tokens AS stopword_rate,
       n_dup_docs / n_docs AS dup_rate,
       n_english_docs / n_docs AS english_share
FROM a
""",
        "scd2_pit_revenue": """
WITH log AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d,
         o_orderpriority AS prio
  FROM orders
),
w AS (
  SELECT cust, d, prio,
         CASE WHEN lag(prio) OVER (PARTITION BY cust ORDER BY d, prio)
                   IS DISTINCT FROM prio
              THEN 1 ELSE 0 END AS chg
  FROM log
),
pts AS (SELECT cust, d, prio FROM w WHERE chg = 1),
iv AS (
  SELECT cust, prio, d AS valid_from,
         coalesce(lead(d) OVER (PARTITION BY cust ORDER BY d, prio),
                  DATE '9999-12-31') AS valid_to
  FROM pts
),
facts AS (
  SELECT o_custkey AS cust, CAST(l_shipdate AS DATE) AS ship_d,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)
SELECT iv.prio, CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM facts
JOIN iv ON facts.cust = iv.cust
       AND facts.ship_d >= iv.valid_from
       AND facts.ship_d < iv.valid_to
GROUP BY 1
""",
        "tpch_q1": """
WITH x AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS DECIMAL(18,2)) AS qty,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         CAST(l_discount AS DECIMAL(8,6)) AS disc,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
              AS DECIMAL(18,6)) AS disc_price,
         CAST(l_tax AS DECIMAL(8,6)) AS tax
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2001-06-01'
)
SELECT l_returnflag, l_linestatus,
       -- decimal -> double via VARCHAR: DuckDB's direct cast divides
       -- the scaled int128 by 10^scale in doubles (two roundings, off
       -- by 1 ulp at half-ulp boundaries — caught at sf0.001 on
       -- sum_charge), while the string parse is correctly rounded,
       -- matching Spark's BigDecimal.doubleValue
       CAST(CAST(sum(qty) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(sum(disc_price) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(sum(disc_price * (CAST(1 AS DECIMAL(8,6)) + tax))
                 AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(sum(qty) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
       CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
       CAST(CAST(sum(disc) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM x GROUP BY 1, 2
""",
        "tpch_q19": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
        "rec_diversity_ils": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
prs AS (
  SELECT a.i AS item, b.i AS rec_item, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
recs AS (
  SELECT item, rec_item,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM prs QUALIFY rank <= 5
),
nv AS (SELECT count(*) AS n FROM embeddings),
rv AS (
  SELECT r.item, r.rank, d.dim,
         CAST(round(CAST(list_extract(e.embedding, d.dim + 1) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS sv
  FROM recs r, nv
  JOIN embeddings e ON e.vec_id = r.rec_item % nv.n
  CROSS JOIN (SELECT unnest(range(64)) AS dim) d
),
n2 AS (
  SELECT item, rank, CAST(sum(sv * sv) AS BIGINT) AS n2
  FROM rv GROUP BY 1, 2
),
dots AS (
  SELECT a.item, a.rank AS ri, b.rank AS rj,
         CAST(sum(a.sv * b.sv) AS BIGINT) AS dot
  FROM rv a JOIN rv b ON a.item = b.item AND a.dim = b.dim
                     AND a.rank < b.rank
  GROUP BY 1, 2, 3
),
cosines AS (
  SELECT d.item,
         CAST(round(CAST(d.dot AS DOUBLE)
                    / (sqrt(CAST(na.n2 AS DOUBLE))
                       * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
              AS DECIMAL(8,6)) AS c
  FROM dots d
  JOIN n2 na ON na.item = d.item AND na.rank = d.ri
  JOIN n2 nb ON nb.item = d.item AND nb.rank = d.rj
)
SELECT CAST(item AS BIGINT) AS item,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(c) AS DOUBLE) / count(*) AS ils
FROM cosines GROUP BY 1
""",
        "survival_repurchase": """
WITH dd AS (SELECT DISTINCT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d
            FROM orders),
rk AS (
  SELECT cust, d, row_number() OVER (PARTITION BY cust ORDER BY d) AS rn
  FROM dd
),
mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS m FROM orders),
obs AS (
  SELECT CASE WHEN t2.d IS NOT NULL
              THEN datediff('day', t1.d, t2.d)
              ELSE datediff('day', t1.d, mx.m) END AS dur,
         CASE WHEN t2.d IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM (SELECT cust, d FROM rk WHERE rn = 1) t1
  LEFT JOIN (SELECT cust, d FROM rk WHERE rn = 2) t2 ON t1.cust = t2.cust
  CROSS JOIN mx
),
grid AS (
  SELECT dur AS duration, CAST(sum(event) AS BIGINT) AS n_events,
         CAST(sum(1 - event) AS BIGINT) AS n_censored,
         count(*) AS cnt
  FROM obs GROUP BY 1
),
tot AS (SELECT sum(cnt) AS n FROM grid),
cum AS (
  SELECT duration, n_events, n_censored, cnt,
         sum(cnt) OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS c
  FROM grid
)
SELECT duration, CAST(n - c + cnt AS BIGINT) AS n_at_risk,
       n_events, n_censored
FROM cum, tot
""",
        "grouping_sets_revenue": """
WITH j AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT CAST(grouping(nation) AS INT) AS g_nation,
       CAST(grouping(segment) AS INT) AS g_segment,
       nation, segment,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM j
GROUP BY GROUPING SETS ((nation), (segment), ())
""",
        "except_all_returns": """
WITH r AS (SELECT CAST(l_partkey AS BIGINT) AS part FROM lineitem
           WHERE l_returnflag = 'R'),
a AS (SELECT CAST(l_partkey AS BIGINT) AS part FROM lineitem
      WHERE l_returnflag = 'A'),
x AS (SELECT part FROM r EXCEPT ALL SELECT part FROM a)
SELECT part, CAST(count(*) AS BIGINT) AS n_surplus FROM x GROUP BY 1
""",
        "unpivot_metrics": """
WITH w AS (
  SELECT l_returnflag AS flag,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS qty_cents,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS price_cents,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
)
SELECT flag, 'qty_cents' AS metric, qty_cents AS value FROM w
UNION ALL
SELECT flag, 'price_cents' AS metric, price_cents AS value FROM w
UNION ALL
SELECT flag, 'n_rows' AS metric, n_rows AS value FROM w
""",
        "tpch_q13": """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
    ON c_custkey = o_custkey
  GROUP BY 1
)
GROUP BY 1
""",
        "tpch_q15": """
WITH r AS (
  SELECT l_suppkey AS sk,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
             AS DECIMAL(30,8))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
),
m AS (SELECT max(total) AS mx FROM r)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(total AS DOUBLE) AS total_revenue
FROM r
JOIN supplier ON s_suppkey = r.sk
CROSS JOIN m
WHERE r.total = m.mx
""",
        # above-average compare is division-free (cents * n > sum);
        # the no-orders anti is LEFT JOIN ... IS NULL (no fan-out:
        # only matchless rows survive)
        "tpch_q22": """
WITH c AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
a AS (SELECT sum(cents) AS s, count(*) AS n FROM c WHERE cents > 0),
rich AS (SELECT c.* FROM c, a WHERE c.cents * a.n > a.s),
noord AS (
  SELECT rich.* FROM rich
  LEFT JOIN (SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '2000-09-01') o
    ON rich.c_custkey = o.o_custkey
  WHERE o.o_custkey IS NULL
)
SELECT nation, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(cents) AS BIGINT) AS totacctbal_cents
FROM noord GROUP BY 1
""",
        "tpch_q7": """
WITH rev AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
           AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
SELECT supp_nation, cust_nation, l_year,
       CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS revenue
FROM rev GROUP BY 1, 2, 3
""",
        "tpch_q8": """
WITH x AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
              AS DECIMAL(30,8)) AS volume,
         n2.n_name AS supp_nation
  FROM orders
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
    AND p_type = 'STANDARD' AND r_name = 'ASIA'
)
SELECT o_year,
       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                     ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
         AS nation_revenue,
       CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS total_revenue,
       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                     ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
FROM x GROUP BY 1
""",
        # fixture Q2: cost = cheapest shipment in exact cents (no
        # partsupp); per-part MIN joined back on exact-cents equality
        "tpch_q2": """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cost_cents
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, cost_cents, s_name, s_acctbal, n_name
  FROM ps
  JOIN part ON p_partkey = l_partkey AND p_size = 15
  JOIN eu ON s_suppkey = l_suppkey
),
mn AS (SELECT p_partkey AS pk, min(cost_cents) AS mn FROM cand GROUP BY 1)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
       CAST(p_partkey AS BIGINT) AS p_partkey, cost_cents
FROM cand JOIN mn ON p_partkey = pk AND cost_cents = mn
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
        # fixture Q9: unit cost = p_retailprice; decimal-exact
        # profit, sum -> double via VARCHAR (correctly-rounded parse)
        "tpch_q9": """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(CAST(sum(
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
              AS DECIMAL(30,8))
         - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,8))
       ) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY 1, 2
""",
        # fixture Q11: stock value = shipped cents for NATION_3
        # suppliers; scale-free above-2x-average threshold,
        # division-free (value*n_parts > 2*total)
        "tpch_q11": """
WITH val AS (
  SELECT l_partkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS value_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
),
t AS (SELECT sum(value_cents) AS tot, count(*) AS np FROM val)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       CAST(value_cents AS BIGINT) AS value_cents
FROM val, t
WHERE value_cents * np > 2 * tot
""",
        # fixture Q12: class = l_linestatus, late = shipped > 90 days
        # after order date; conditional bigint counts
        "tpch_q12": """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY 1
""",
        # fixture Q16: pair grid = DISTINCT lineitem pairs; complaint
        # suppliers = negative balance, excluded via anti pattern
        "tpch_q16": """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
good AS (
  SELECT p.* FROM pairs p
  LEFT JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) b
    ON p.l_suppkey = b.s_suppkey
  WHERE b.s_suppkey IS NULL
)
SELECT p_brand, p_type, CAST(p_size AS INT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM good
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY 1, 2, 3
""",
        # fixture Q20: excess = pair shipped > half its lifetime
        # quantity in 1996; integer centiqty, semi via IN
        "tpch_q20": """
WITH per AS (
  SELECT l_partkey, l_suppkey,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate < TIMESTAMP '1997-01-01'
             THEN CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS q96,
         sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS qtot
  FROM lineitem
  JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
  GROUP BY 1, 2
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM per WHERE q96 * 2 > qtot)
""",
        # fixture Q21: EXISTS/NOT-EXISTS pair collapsed to one
        # per-order aggregate (exactly-one-late => MAX is the culprit)
        "tpch_q21": """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN l_suppkey END) AS n_late,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             THEN l_suppkey END) AS late_supp
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
  GROUP BY 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order
JOIN supplier ON s_suppkey = late_supp
WHERE n_supp > 1 AND n_late = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
""",
        # calendar lags via day-index equi-joins; one double division
        # of two exact integer products
        "forecast_mase": """
WITH d AS (
  SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS di,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_seasonal,
         CAST(coalesce(sum(abs(a.v - b.v)), 0) AS BIGINT)
           AS sum_abs_err_seasonal
  FROM d a JOIN d b ON a.di = b.di + 7
),
n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_naive,
         CAST(coalesce(sum(abs(a.v - b.v)), 0) AS BIGINT)
           AS sum_abs_err_naive
  FROM d a JOIN d b ON a.di = b.di + 1
)
SELECT n_seasonal, sum_abs_err_seasonal, n_naive, sum_abs_err_naive,
       CASE WHEN sum_abs_err_naive > 0 AND n_seasonal > 0 THEN
         CAST(sum_abs_err_seasonal * n_naive AS DOUBLE)
           / CAST(n_seasonal * sum_abs_err_naive AS DOUBLE)
       END AS mase
FROM s, n
""",
        # FULL recompute over the new window — the merge law is
        # exactly that the maintained rollup equals this
        "retractable_rollup": """
SELECT CAST(o_custkey % 100 AS BIGINT) AS grp,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1
""",
        # pmod banding: cents - ((cents % w) + w) % w = floor band,
        # exact for negative balances too
        "k_anonymity": """
WITH c AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
b AS (
  SELECT nation, segment,
         cents - ((cents % 100000) + 100000) % 100000 AS band, cents
  FROM c
),
cls AS (
  SELECT nation, segment, band,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT cents) AS BIGINT) AS n_sensitive
  FROM b GROUP BY 1, 2, 3
)
SELECT nation, segment, CAST(band AS BIGINT) AS band, class_size,
       n_sensitive,
       CAST(CASE WHEN class_size < 5 THEN 1 ELSE 0 END AS INT)
         AS k_violation,
       CAST(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END AS INT)
         AS l_violation
FROM cls
""",
        "privacy_gate": """
WITH c AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
b AS (
  SELECT nation, segment,
         cents - ((cents % 100000) + 100000) % 100000 AS band, cents
  FROM c
),
cls AS (
  SELECT nation, segment, band,
         count(*) AS class_size,
         count(DISTINCT cents) AS n_sensitive
  FROM b GROUP BY 1, 2, 3
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_records,
       CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_classes,
       CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
            AS BIGINT) AS n_risky_records,
       CAST(min(class_size) AS BIGINT) AS min_class_size,
       CAST(sum(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_diversity_classes
FROM cls
""",
        # exact-integer EMD: |N·cumc - n·cumg| summed over the ordered
        # nation domain, then ONE integer quotient — HUGEINT on the
        # DuckDB side, decimal(38,0) `div` on the Spark side
        "t_closeness": """
WITH c AS (
  SELECT c_mktsegment AS segment,
         cents - ((cents % 200000) + 200000) % 200000 AS band,
         CAST(c_nationkey AS BIGINT) AS nation
  FROM (SELECT c_mktsegment,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents,
               c_nationkey
        FROM customer)
),
g AS (
  SELECT nation AS cat, CAST(count(*) AS HUGEINT) AS gcnt
  FROM c GROUP BY 1
),
gg AS (
  SELECT cat, SUM(gcnt) OVER (ORDER BY cat) AS cumg,
         (SELECT count(*) FROM g) AS m
  FROM g
),
tot AS (SELECT CAST(count(*) AS HUGEINT) AS n_tot FROM c),
cls AS (
  SELECT segment, band, CAST(count(*) AS BIGINT) AS class_size
  FROM c GROUP BY 1, 2
),
cc AS (
  SELECT segment, band, nation AS cat, CAST(count(*) AS HUGEINT) AS ccnt
  FROM c GROUP BY 1, 2, 3
),
fan AS (
  SELECT cls.segment, cls.band, cls.class_size, gg.cat, gg.cumg, gg.m,
         COALESCE(cc.ccnt, 0) AS ccnt
  FROM cls CROSS JOIN gg
  LEFT JOIN cc ON cc.segment = cls.segment AND cc.band = cls.band
              AND cc.cat = gg.cat
),
terms AS (
  SELECT segment, band, class_size, m,
         ABS((SELECT n_tot FROM tot)
               * SUM(ccnt) OVER (PARTITION BY segment, band ORDER BY cat)
             - CAST(class_size AS HUGEINT) * cumg) AS term
  FROM fan
),
per AS (
  SELECT segment, band, class_size, m, SUM(term) AS t_num
  FROM terms GROUP BY 1, 2, 3, 4
),
q AS (
  SELECT segment, band, class_size,
         CAST(CASE WHEN m > 1
              THEN (t_num * 1000000000)
                   // (CAST(m - 1 AS HUGEINT) * class_size
                       * (SELECT n_tot FROM tot))
              ELSE 0 END AS BIGINT) AS t_q
  FROM per
)
SELECT segment, CAST(band AS BIGINT) AS band, class_size, t_q,
       CAST(CASE WHEN t_q > 375000000 THEN 1 ELSE 0 END AS INT)
         AS t_violation
FROM q
""",
        # FULL recompute — the stream-maintained store must serve
        # identical top-k no matter how files split into micro-batches
        "stream_model_refresh": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey % 4 = 0
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item, n_common,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
)
SELECT item, rec_item, n_common, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        # discrete lower-median + MAD, all-integer: rank (n+1)//2 over
        # values, then over absolute deviations; k*MAD band count
        "mad_outliers": """
WITH v AS (
  SELECT l_returnflag AS g,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM lineitem
),
r AS (
  SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM v
),
med AS (
  SELECT g, min(CASE WHEN rn = (n + 1) // 2 THEN c END) AS median,
         CAST(max(n) AS BIGINT) AS n_rows
  FROM r GROUP BY g
),
d AS (
  SELECT v.g, abs(c - median) AS ad, median, n_rows
  FROM v JOIN med USING (g)
),
dr AS (
  SELECT g, ad, median, n_rows,
         row_number() OVER (PARTITION BY g ORDER BY ad) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM d
),
mad AS (
  SELECT g, min(CASE WHEN rn = (n + 1) // 2 THEN ad END) AS mad
  FROM dr GROUP BY g
)
SELECT v.g AS l_returnflag,
       max(n_rows) AS n_rows,
       max(median) AS median,
       max(mad.mad) AS mad,
       CAST(sum(CASE WHEN abs(c - median) > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(max(abs(c - median)) AS BIGINT) AS max_abs_dev
FROM v JOIN med USING (g) JOIN mad USING (g)
GROUP BY v.g
""",
        # exact Mann–Whitney AUC on the (segment, score) grid — bigint
        # rank-sum, one final division; tie correction via neg-at-score
        "rec_auc_segments": """
WITH e AS (
  SELECT CAST(user_id % 4 AS BIGINT) AS segment,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events WHERE value IS NOT NULL
),
grid AS (
  SELECT segment, score,
         CAST(sum(label) AS BIGINT) AS pos,
         CAST(count(*) - sum(label) AS BIGINT) AS neg
  FROM e GROUP BY 1, 2
),
c AS (
  SELECT segment, pos, neg,
         COALESCE(sum(neg) OVER (PARTITION BY segment ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
  FROM grid
)
SELECT segment,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(neg) AS BIGINT) AS n_neg,
       CAST(sum(pos * (2 * cnb + neg)) AS BIGINT) AS auc_num2,
       CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
         CAST(sum(pos * (2 * cnb + neg)) AS DOUBLE)
         / CAST(2 * sum(pos) * sum(neg) AS DOUBLE) END AS auc
FROM c GROUP BY segment
""",
        # fixed-width 500-cent bins; every fraction one bigint division
        "score_calibration": """
WITH e AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events WHERE value IS NOT NULL
),
bins AS (
  SELECT score // 500 AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS n_pos
  FROM e GROUP BY 1
),
cum AS (
  SELECT bin, n, n_pos,
         sum(n) OVER (ORDER BY bin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         sum(n_pos) OVER (ORDER BY bin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
         sum(n_pos) OVER () AS total_pos
  FROM bins
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(bin * 500 AS BIGINT) AS bin_lo,
       n, n_pos,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
       CAST(cum_n AS BIGINT) AS cum_n,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       CASE WHEN total_pos > 0 THEN
         CAST(cum_pos AS DOUBLE) / CAST(total_pos AS DOUBLE) END AS capture,
       CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE) AS cum_precision
FROM cum
""",
        # two-sigma Wilson bounds: the SAME IEEE expression tree as
        # operators/evaluation.py:wilson_bounds (z^2 = 4 exactly; only
        # +,-,*,/,sqrt — all correctly rounded, so doubles match
        # bit-for-bit)
        "wilson_ctr": """
WITH e AS (
  SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS label
  FROM events WHERE event_type IN ('view', 'click')
),
a AS (
  SELECT hour,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS n_pos
  FROM e GROUP BY hour
)
SELECT hour, n, n_pos,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       greatest(0.0,
         (((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
            + 2.0 / CAST(n AS DOUBLE))
          - 2.0 * sqrt((((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))))
                         + 1.0 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
         / (1.0 + 4.0 / CAST(n AS DOUBLE))) AS wilson_lo,
       least(1.0,
         (((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
            + 2.0 / CAST(n AS DOUBLE))
          + 2.0 * sqrt((((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))))
                         + 1.0 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
         / (1.0 + 4.0 / CAST(n AS DOUBLE))) AS wilson_hi
FROM a
""",
        # exact Gini via the rank-sum identity — bigint rank-sums with
        # closed-form tie runs on the value grid, one final division
        "revenue_gini": """
WITH pc AS (
  SELECT o_custkey,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cust_cents
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c.c_mktsegment, pc.cust_cents
  FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey
),
grid AS (
  SELECT c_mktsegment, cust_cents AS v, CAST(count(*) AS BIGINT) AS c
  FROM j GROUP BY 1, 2
),
r AS (
  SELECT c_mktsegment, v, c,
         COALESCE(sum(c) OVER (PARTITION BY c_mktsegment ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
  FROM grid
)
SELECT c_mktsegment,
       CAST(sum(c) AS BIGINT) AS n,
       CAST(sum(v * c) AS BIGINT) AS total,
       CAST(sum(v * (2 * c * k + c * (c + 1)))
            - (sum(c) + 1) * sum(v * c) AS BIGINT) AS gini_num,
       CASE WHEN sum(v * c) > 0 THEN
         CAST(sum(v * (2 * c * k + c * (c + 1)))
              - (sum(c) + 1) * sum(v * c) AS DOUBLE)
         / CAST(sum(c) * sum(v * c) AS DOUBLE) END AS gini
FROM r GROUP BY c_mktsegment
""",
        # capless user-user Jaccard (the Spark cap is inert at driver
        # SFs); jaccard is one bigint/bigint division so rank ties
        # compare identical doubles in both engines
        "user_similarity": f"""
WITH {MAPPING_CTE.lstrip()},
m AS (
  SELECT CAST(user_id AS BIGINT) AS u, CAST(item_id AS BIGINT) AS i
  FROM mapping
),
half AS (
  SELECT a.u AS user_a, b.u AS user_b, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.i = b.i AND a.u < b.u
  GROUP BY 1, 2 HAVING count(*) >= 2
),
sizes AS (SELECT u, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY u),
sym AS (
  SELECT user_a, user_b, n_common FROM half
  UNION ALL
  SELECT user_b, user_a, n_common FROM half
),
jx AS (
  SELECT s.user_a, s.user_b, s.n_common, su.n AS n_user, sv.n AS n_neighbor,
         CAST(s.n_common AS DOUBLE)
         / CAST(su.n + sv.n - s.n_common AS DOUBLE) AS jaccard
  FROM sym s
  JOIN sizes su ON s.user_a = su.u
  JOIN sizes sv ON s.user_b = sv.u
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY user_a
             ORDER BY jaccard DESC, user_b) AS rank
  FROM jx
)
SELECT user_a AS user, user_b AS neighbor, n_common, n_user, n_neighbor,
       jaccard, CAST(rank AS INT) AS rank
FROM rk WHERE rank <= 5
""",
    }
    return sqls
