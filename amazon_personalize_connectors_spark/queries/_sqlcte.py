"""Oracle-side SQL fragment constants/helpers (moved verbatim
from __spark_entry__.py, between queries() and oracle_sql())."""

from __future__ import annotations

from amazon_personalize_connectors_spark.queries._shared import *  # noqa: F401,F403



# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — built on the shared fixture CTEs
# ---------------------------------------------------------------------------

# tokenizer mirror of functions/text.py::tokens
_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"

# word-shingle mirror of functions/dedup.py::word_shingles (n=3):
# 0-based windows over tokens; 1-based list indexing; concat_ws skips
# out-of-range NULLs in both engines.
def _shingles_cte(n: int) -> str:
    grams = ", ".join(f"t[i+{j+1}]" for j in range(n))
    return f"""
toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 5 = 0
),
sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(0, greatest(len(t) - {n}, 0) + 1),
                          i -> concat_ws(' ', {grams}))
         ) AS shingles
  FROM toks
),
exploded_sh AS (
  SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS shingle FROM sh
)"""


_SHINGLES_CTE = _shingles_cte(3)
_SHINGLES_CTE_2 = _shingles_cte(2)

# 16-bit simhash mirror of functions/dedup.py::simhash16
_SIMHASH_BIT = (
    "list_sum(list_transform(dt, tok -> "
    "len(list_filter(t, x -> x = tok)) * "
    "(((CAST(concat('0x', substr(md5(tok), 1, 4)) AS INTEGER) >> {i}) & 1) * 2 - 1)))"
)
_SIMHASH_SIG = " + ".join(
    f"(CASE WHEN ({_SIMHASH_BIT.format(i=i)}) >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(16)
)


def _simhash64_bit(i: int) -> str:
    # bits 0-31 from md5 hex digits 9-16, bits 32-63 from digits 1-8
    # (mirrors functions/dedup.py::simhash64); sum over occurrences,
    # coalesce(…, 0) so empty docs get the all-ones signature like Spark
    start, shift = (9, i) if i < 32 else (1, i - 32)
    word = f"CAST(concat('0x', substr(md5(tok), {start}, 8)) AS BIGINT)"
    return (
        f"coalesce(list_sum(list_transform(t, "
        f"tok -> ((({word} >> {shift}) & 1) * 2 - 1))), 0)"
    )


_SIMHASH64_SIG = " + ".join(
    f"(CASE WHEN ({_simhash64_bit(i)}) >= 0 "
    f"THEN {(1 << i) if i < 63 else -(1 << 63)} ELSE 0 END)"
    for i in range(64)
)

_COSINE = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

# quality_filter_flags mirror (functions/text.py): CTE `qflags` ending
# with per-doc flag columns + keep. bigint/bigint division is DOUBLE in
# both engines; ratios guard zero denominators identically.
_QUALITY_CTE = """
qt AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM documents
),
qs AS (
  SELECT doc_id, text,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
    CAST(len(list_filter(toks, x -> x IN ('a','the','of','and','to','in','is')))
         AS BIGINT) AS hits,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS BIGINT)
         AS symbols,
    CAST(length(regexp_replace(lower(text), '[^0-9]', '', 'g')) AS BIGINT)
         AS digits
  FROM qt
),
qflags AS (
  SELECT doc_id, text, n_tokens,
    n_tokens < 10 AS flag_too_short,
    NOT coalesce(
      CASE WHEN n_tokens > 0 THEN total_chars / n_tokens END
        BETWEEN 2.0 AND 12.0, FALSE) AS flag_token_len,
    coalesce(CASE WHEN n_tokens > 0 THEN hits / n_tokens END, 0.0) < 0.02
      AS flag_low_stopword,
    (CASE WHEN n_chars > 0 THEN symbols / n_chars ELSE 0.0 END) > 0.10
      AS flag_symbol_heavy,
    (CASE WHEN n_chars > 0 THEN digits / n_chars ELSE 0.0 END) > 0.30
      AS flag_digit_heavy
  FROM qs
)"""

_CENTROID_CTE = """
ev AS (
  SELECT label AS block, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
edim AS (
  SELECT block, vec_id, CAST(u.i - 1 AS BIGINT) AS dim, v[u.i] AS val
  FROM ev, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
centroid_sums AS (
  SELECT block, dim,
         CAST(sum(CAST(val AS DECIMAL(27,12))) AS DOUBLE) AS sum_val,
         CAST(sum(CAST(floor(val * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_e6,
         CAST(count(*) AS BIGINT) AS n
  FROM edim GROUP BY block, dim
)"""

# SQ8 mirror of functions/similarity.py::sq8_codes: integer-valued
# quantizer stats and codes. (iv - lo) * 255.0 is an exact double
# (< 2^53), so floor of the IEEE quotient matches Spark bit-for-bit.
_SQ8_CODES_CTE = """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
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
)"""

# exact int64 dot product of two SQ8 code lists (values <= 255, sums
# <= 4.2e6 — exactly representable in the double accumulator)
_SQ8_DOT = (
    "CAST(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])) AS BIGINT)"
)

_EXPLODE_OUTER = """
exploded AS (
  SELECT
    query_item_id,
    CAST(u.i - 1 AS BIGINT) AS pos,
    rec_items[u.i] AS rec_item_id
  FROM recs
  LEFT JOIN LATERAL (
    SELECT unnest(range(1, coalesce(len(rec_items), 0) + 1)) AS i
  ) u ON TRUE
  WHERE error IS NULL
)"""

_FLAGSHIP = f"""
WITH {RECS_CTE.lstrip()}, {MAPPING_CTE.lstrip()}, {META_CTE.lstrip()},
attributed AS (
  SELECT r.query_item_id, m.user_id, r.rec_items
  FROM recs r JOIN mapping m ON r.query_item_id = m.item_id
  WHERE r.error IS NULL
),
flat AS (
  SELECT
    a.query_item_id, a.user_id,
    CAST(u.i - 1 AS BIGINT) AS pos,
    a.rec_items[u.i] AS item_id
  FROM attributed a
  JOIN LATERAL (
    SELECT unnest(range(1, coalesce(len(rec_items), 0) + 1)) AS i
  ) u ON TRUE
),
decorated AS (
  SELECT f.query_item_id, f.user_id, f.pos, f.item_id,
         mt.name, mt.price, mt.category
  FROM flat f LEFT JOIN meta mt ON f.item_id = mt.id
)"""

__all__ = [
    "_TOKS",
    "_shingles_cte",
    "_SHINGLES_CTE",
    "_SHINGLES_CTE_2",
    "_SIMHASH_BIT",
    "_SIMHASH_SIG",
    "_simhash64_bit",
    "_SIMHASH64_SIG",
    "_COSINE",
    "_QUALITY_CTE",
    "_CENTROID_CTE",
    "_SQ8_CODES_CTE",
    "_SQ8_DOT",
    "_EXPLODE_OUTER",
    "_FLAGSHIP",
]
