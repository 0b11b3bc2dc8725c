"""Oracle SQL for the round-12 corpus-analytics wave (q07.py).

Every log term mirrors the Spark side's floor-quantization step for
step (the ``mutual_information`` exactness pattern); wide integer
products route HUGEINT -> VARCHAR -> DOUBLE (the r5 lesson: direct
HUGEINT/decimal -> double casts differ from Spark's BigDecimal
rounding at half-ulp boundaries)."""

from amazon_personalize_connectors_spark.queries._sqlcte import _TOKS  # noqa: F401

_G5 = "concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4], t[i+5])"
_G8 = ", ".join(f"t[i+{j + 1}]" for j in range(8))


def add(sqls: dict) -> None:
    # instance-weighted duplicated-5-gram fraction per doc; grams via
    # the gram_table window formula (partial gram for short docs)
    sqls["dup_ngram_fraction"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 3 = 0
),
grams AS (
  SELECT doc_id, {_G5} AS g
  FROM toks, unnest(range(0, greatest(len(t) - 5, 0) + 1)) AS u(i)
),
cells AS (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY 1, 2
),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_grams
  FROM cells GROUP BY 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_grams, dup_grams,
       CAST(dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_frac,
       (CAST(dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)) > 0.30
         AS flag_repetitive
FROM per
"""
    # top-100 collocations by exact-quanta PMI; total order
    # (pmi_q DESC, w1, w2) makes the LIMIT deterministic
    sqls["token_pmi"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 5 = 0
),
pairs AS (
  SELECT t[CAST(i + 1 AS INT)] AS w1, t[CAST(i + 2 AS INT)] AS w2
  FROM toks, unnest(range(0, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
cb AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM pairs GROUP BY 1, 2
),
nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_b FROM cb),
uni AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest({_TOKS}) AS term FROM documents WHERE doc_id % 5 = 0
  ) GROUP BY 1
),
nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni),
j AS (
  SELECT cb.w1, cb.w2, cb.c_ab,
         CAST(floor(ln(
           CAST(CAST(CAST(c_ab AS HUGEINT) * n_tok * n_tok AS VARCHAR) AS DOUBLE)
           / CAST(CAST(CAST(n_b AS HUGEINT) * a.c * b.c AS VARCHAR) AS DOUBLE)
         ) * 1000000000.0) AS BIGINT) AS pmi_q
  FROM cb
  JOIN uni a ON cb.w1 = a.term
  JOIN uni b ON cb.w2 = b.term
  CROSS JOIN nb CROSS JOIN nt
  WHERE c_ab >= 5
)
SELECT w1, w2, c_ab, pmi_q,
       CAST(pmi_q AS DOUBLE) / 1000000000.0 AS pmi
FROM j ORDER BY pmi_q DESC, w1, w2 LIMIT 100
"""
    # per-doc unigram entropy in exact nano-nat quanta
    sqls["doc_entropy"] = f"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT doc_id, unnest({_TOKS}) AS term
    FROM documents WHERE doc_id % 3 = 0
  ) GROUP BY 1, 2
),
g AS (
  SELECT doc_id, c,
         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
  FROM tf
),
q AS (
  SELECT doc_id, n,
         CAST(floor((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                    * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
                    * 1000000000.0) AS BIGINT) AS qq
  FROM g
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n AS n_tokens,
       CAST(count(*) AS BIGINT) AS distinct_tokens,
       CAST(sum(qq) AS BIGINT) AS h_q,
       CAST(CAST(sum(qq) AS BIGINT) AS DOUBLE) / 1000000000.0 AS entropy
FROM q GROUP BY 1, 2
"""
    # Zipf OLS slope over top-500 ranks; moments in exact HUGEINT
    # quanta, VARCHAR-bridged to double
    _xq = "CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000000.0) AS HUGEINT)"
    _yq = "CAST(floor(ln(CAST(f AS DOUBLE)) * 1000000000.0) AS HUGEINT)"
    sqls["zipf_alpha"] = f"""
WITH counts AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS f FROM (
    SELECT lang, unnest({_TOKS}) AS term FROM documents
  ) GROUP BY 1, 2
),
ranked AS (
  SELECT lang, f,
         row_number() OVER (PARTITION BY lang ORDER BY f DESC, term) AS r
  FROM counts
),
m AS (
  SELECT lang,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum({_xq}) AS HUGEINT) AS sx,
         CAST(sum({_yq}) AS HUGEINT) AS sy,
         CAST(sum({_xq} * {_yq}) AS HUGEINT) AS sxy,
         CAST(sum({_xq} * {_xq}) AS HUGEINT) AS sxx
  FROM ranked WHERE r <= 500 GROUP BY 1
)
SELECT lang, CAST(n AS BIGINT) AS n_ranked,
       CASE WHEN CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) <> 0.0
       THEN -(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
              / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
       END AS alpha
FROM m
"""
    # cross-source distinct-8-gram overlap matrix (word_shingles
    # mirror: distinct per-doc windows incl. the short-doc partial
    # gram, then source-level DISTINCT)
    sqls["source_overlap"] = f"""
WITH toks AS (SELECT source, {_TOKS} AS t FROM documents),
sh AS (
  SELECT source,
         list_distinct(
           list_transform(range(0, greatest(len(t) - 8, 0) + 1),
                          i -> concat_ws(' ', {_G8}))
         ) AS gs
  FROM toks
),
sg AS (
  SELECT DISTINCT source AS s, g FROM (
    SELECT source, unnest(gs) AS g FROM sh
  ) WHERE g <> ''
),
sizes AS (SELECT s, CAST(count(*) AS BIGINT) AS n_g FROM sg GROUP BY 1),
cm AS (
  SELECT a.s AS source_a, b.s AS source_b,
         CAST(count(*) AS BIGINT) AS common
  FROM sg a JOIN sg b ON a.g = b.g AND a.s < b.s
  GROUP BY 1, 2
)
SELECT source_a, source_b, sa.n_g AS n_a, sb.n_g AS n_b, common,
       CAST(common AS DOUBLE)
         / CAST(sa.n_g + sb.n_g - common AS DOUBLE) AS jaccard,
       CAST(common AS DOUBLE) / CAST(sa.n_g AS DOUBLE) AS containment_a
FROM cm
JOIN sizes sa ON source_a = sa.s
JOIN sizes sb ON source_b = sb.s
"""
    # per-doc cross-entropy under the corpus's own add-one bigram LM
    sqls["bigram_perplexity"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 5 = 0
),
pairs AS (
  SELECT doc_id, t[CAST(i + 1 AS INT)] AS w1, t[CAST(i + 2 AS INT)] AS w2
  FROM toks, unnest(range(0, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
cb AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pairs GROUP BY 1, 2
),
cu AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM pairs GROUP BY 1),
vv AS (
  SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM (
    SELECT unnest({_TOKS}) AS term FROM documents WHERE doc_id % 5 = 0
  )
),
scored AS (
  SELECT p.doc_id,
         CAST(floor(ln(CAST(c1 + v AS DOUBLE) / CAST(c12 + 1 AS DOUBLE))
                    * 1000000000.0) AS BIGINT) AS q
  FROM pairs p JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN vv
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(q) AS BIGINT) AS h_q,
       CAST(CAST(sum(q) AS BIGINT) AS DOUBLE)
         / (CAST(count(*) AS DOUBLE) * 1000000000.0) AS cross_entropy
FROM scored GROUP BY 1
"""
