"""Oracle SQL registry (moved verbatim from oracle_sql())."""

from amazon_personalize_connectors_spark.queries._shared import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries._sqlcte import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q06 import _mmr_oracle_sql  # noqa: F401
from amazon_personalize_connectors_spark.queries.q06 import _walks_oracle_sql  # noqa: F401


def add(sqls: dict) -> None:
    sqls["isotonic_calibration"] = """
WITH binned AS (
  SELECT CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 500
              AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
pre AS (
  SELECT bin, n, pos,
         ROW_NUMBER() OVER w AS i,
         CAST(SUM(n) OVER w AS BIGINT) AS cn,
         CAST(SUM(pos) OVER w AS BIGINT) AS cp
  FROM binned
  WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
mins AS (
  SELECT j.i AS j,
         MIN(CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
             / CAST(k.cn - (j.cn - j.n) AS DOUBLE)) AS mj
  FROM pre j JOIN pre k ON k.i >= j.i
  GROUP BY j.i
)
SELECT p.bin, p.n, p.pos,
       CAST(p.pos AS DOUBLE) / CAST(p.n AS DOUBLE) AS rate,
       MAX(m.mj) OVER (ORDER BY p.i
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fitted
FROM pre p JOIN mins m ON p.i = m.j
"""
    sqls["graph_walks"] = _walks_oracle_sql(4)
    sqls["did_purchase_value"] = """
WITH rows_ AS (
  SELECT (user_id % 2 = 0) AS tr,
         (ts >= TIMESTAMP '2024-01-16 00:00:00') AS po,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN tr AND NOT po THEN v ELSE 0 END) AS BIGINT) AS s_t_pre,
    CAST(COUNT(*) FILTER (WHERE tr AND NOT po) AS BIGINT) AS n_t_pre,
    CAST(SUM(CASE WHEN tr AND po THEN v ELSE 0 END) AS BIGINT) AS s_t_post,
    CAST(COUNT(*) FILTER (WHERE tr AND po) AS BIGINT) AS n_t_post,
    CAST(SUM(CASE WHEN NOT tr AND NOT po THEN v ELSE 0 END) AS BIGINT) AS s_c_pre,
    CAST(COUNT(*) FILTER (WHERE NOT tr AND NOT po) AS BIGINT) AS n_c_pre,
    CAST(SUM(CASE WHEN NOT tr AND po THEN v ELSE 0 END) AS BIGINT) AS s_c_post,
    CAST(COUNT(*) FILTER (WHERE NOT tr AND po) AS BIGINT) AS n_c_post
  FROM rows_
)
SELECT s_t_pre, n_t_pre, s_t_post, n_t_post,
       s_c_pre, n_c_pre, s_c_post, n_c_post,
  CASE WHEN n_t_pre > 0 THEN CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE) END AS mean_t_pre,
  CASE WHEN n_t_post > 0 THEN CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE) END AS mean_t_post,
  CASE WHEN n_c_pre > 0 THEN CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE) END AS mean_c_pre,
  CASE WHEN n_c_post > 0 THEN CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE) END AS mean_c_post,
  CASE WHEN n_t_pre > 0 AND n_t_post > 0 AND n_c_pre > 0 AND n_c_post > 0 THEN
    (CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
     - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
    - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
       - CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE))
  END AS did
FROM agg
"""
    sqls["mmr_rerank"] = _mmr_oracle_sql(5)
    sqls["dbscan_embeddings"] = f"""
WITH RECURSIVE ev AS (
  SELECT label AS block, vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
e AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM ev a JOIN ev b ON a.block = b.block AND a.vec_id < b.vec_id
  WHERE {_COSINE.format(a='a.v', b='b.v')} >= 0.3
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM e
  UNION SELECT id_b, id_a FROM e
),
deg AS (SELECT src, COUNT(*) AS d FROM sym GROUP BY src),
ids AS (SELECT vec_id AS id FROM ev),
cores AS (
  SELECT i.id FROM ids i LEFT JOIN deg ON i.id = deg.src
  WHERE COALESCE(deg.d, 0) + 1 >= 3
),
ce AS (
  SELECT s.src, s.dst FROM sym s
  JOIN cores c1 ON s.src = c1.id JOIN cores c2 ON s.dst = c2.id
),
reach(node, lbl) AS (
  SELECT src, src FROM ce
  UNION
  SELECT s.src, r.lbl FROM ce s JOIN reach r ON s.dst = r.node
),
comp AS (SELECT node AS id, MIN(lbl) AS component FROM reach GROUP BY node),
core_lbl AS (
  SELECT c.id, COALESCE(p.component, c.id) AS cluster
  FROM cores c LEFT JOIN comp p ON c.id = p.id
),
border AS (
  SELECT s.src AS id, MIN(cl.cluster) AS cluster
  FROM sym s JOIN core_lbl cl ON s.dst = cl.id
  WHERE s.src NOT IN (SELECT id FROM cores)
  GROUP BY s.src
),
lab AS (
  SELECT id, 'core' AS role, cluster FROM core_lbl
  UNION ALL SELECT id, 'border', cluster FROM border
)
SELECT CAST(i.id AS BIGINT) AS id, COALESCE(l.role, 'noise') AS role,
       CAST(l.cluster AS BIGINT) AS cluster
FROM ids i LEFT JOIN lab l ON i.id = l.id
"""
    sqls["winnowing_dedup"] = """
WITH hs AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(length(text) - 7, 1) + 1),
           i -> md5(substring(text, CAST(i AS INTEGER), 8))) AS h
  FROM documents
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, greatest(len(h) - 3, 1) + 1),
             j -> list_aggregate(
               list_slice(h, CAST(j AS INTEGER),
                          CAST(j AS INTEGER) + 3), 'min')))) AS fp
    FROM hs)
),
rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 5
),
filtered AS (SELECT f.* FROM fps f JOIN rare USING (fp))
SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM filtered a JOIN filtered b
  ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
"""
    sqls["eb_shrunk_ctr"] = """
WITH keys AS (
  SELECT CAST(user_id AS BIGINT) AS key,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM events GROUP BY 1
),
wq AS (SELECT *, CAST((pos * 1000000000) // n AS BIGINT) AS pq FROM keys),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(pq) AS BIGINT) AS s1,
         CAST(SUM(CAST(pq AS DECIMAL(38,0)) * CAST(pq AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS s2
  FROM wq
),
m AS (
  SELECT CAST(s1 AS DOUBLE) / (CAST(k AS DOUBLE) * 1000000000.0) AS m1,
         CAST(s2 AS DOUBLE)
           / (CAST(k AS DOUBLE) * 1000000000.0 * 1000000000.0) AS m2
  FROM mom
),
f AS (
  SELECT m1, m2 - m1 * m1 AS var,
         (m1 * (1.0 - m1) - (m2 - m1 * m1)) / (m2 - m1 * m1) AS ab
  FROM m
),
prior AS (
  SELECT CASE WHEN var > 0.0 AND m1 * ab > 0.0
                   AND (1.0 - m1) * ab > 0.0
              THEN m1 * ab END AS alpha,
         CASE WHEN var > 0.0 AND m1 * ab > 0.0
                   AND (1.0 - m1) * ab > 0.0
              THEN (1.0 - m1) * ab END AS beta
  FROM f
)
SELECT k.key, k.n, k.pos,
       CAST(k.pos AS DOUBLE) / CAST(k.n AS DOUBLE) AS rate,
       p.alpha, p.beta,
       CASE WHEN p.alpha IS NOT NULL THEN
         (CAST(k.pos AS DOUBLE) + p.alpha)
         / (CAST(k.n AS DOUBLE) + p.alpha + p.beta)
       ELSE CAST(k.pos AS DOUBLE) / CAST(k.n AS DOUBLE) END AS shrunk
FROM keys k, prior p
"""
    sqls["bootstrap_ci"] = """
WITH xs AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase'
),
reps AS (
  SELECT x, CAST(r.range AS BIGINT) AS r FROM xs, range(32) r
),
weighted AS (
  SELECT r, x,
    CASE
      WHEN hx < '5e2d58d8b3bce' THEN 0
      WHEN hx < 'bc5ab1b16779c' THEN 1
      WHEN hx < 'eb715e1dc1583' THEN 2
      WHEN hx < 'fb23979734a25' THEN 3
      ELSE 4 END AS w
  FROM (
    SELECT r, x,
           substring(md5(concat('b|', CAST(r AS VARCHAR), '|',
                                CAST(x AS VARCHAR))), 1, 13) AS hx
    FROM reps)
),
means AS (
  SELECT r,
         CASE WHEN SUM(w) > 0
              THEN CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
         END AS m
  FROM weighted GROUP BY r
),
idx AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rk FROM means),
lo AS (SELECT MIN(m) AS ci_lo FROM idx WHERE rk = 2),
hi AS (SELECT MIN(m) AS ci_hi FROM idx WHERE rk = 31),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(x) AS BIGINT) AS sx
  FROM xs
)
SELECT b.n_rows, CAST(32 AS BIGINT) AS n_replicates,
       CAST(b.sx AS DOUBLE) / CAST(b.n_rows AS DOUBLE) AS mean,
       l.ci_lo, h.ci_hi
FROM base b, lo l, hi h
"""
    sqls["woe_iv_priority"] = """
WITH cells AS (
  SELECT o_orderpriority AS bin,
         CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 0 ELSE 1 END)
              AS BIGINT) AS n_neg
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS tp, CAST(SUM(n_neg) AS BIGINT) AS tn
  FROM cells
),
g AS (
  SELECT c.bin, c.n_pos, c.n_neg, t.tp, t.tn,
         CAST(c.n_pos AS DECIMAL(38,0)) * CAST(t.tn AS DECIMAL(38,0)) AS pn,
         CAST(c.n_neg AS DECIMAL(38,0)) * CAST(t.tp AS DECIMAL(38,0)) AS np_
  FROM cells c, tot t
),
terms AS (
  SELECT bin, n_pos, n_neg,
         CASE WHEN n_pos > 0 AND n_neg > 0
              THEN ln(CAST(pn AS DOUBLE) / CAST(np_ AS DOUBLE)) END AS woe,
         CASE WHEN n_pos > 0 AND n_neg > 0 THEN CAST(FLOOR(
           (CAST(pn - np_ AS DOUBLE)
            / (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)))
           * ln(CAST(pn AS DOUBLE) / CAST(np_ AS DOUBLE))
           * 1000000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS q
  FROM g
),
iv AS (SELECT CAST(SUM(q) AS BIGINT) AS iv_q FROM terms)
SELECT t.bin, t.n_pos, t.n_neg, t.woe,
       CAST(i.iv_q AS DOUBLE) / 1000000000.0 AS iv
FROM terms t, iv i
"""
    sqls["rolling_ols_slope"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
base AS (
  SELECT day, v, CAST(day - DATE '1970-01-01' AS BIGINT) AS t FROM daily
),
m AS (
  SELECT day, v,
         CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
         CAST(SUM(t) OVER w AS BIGINT) AS st,
         CAST(SUM(v) OVER w AS BIGINT) AS sv,
         CAST(SUM(t * v) OVER w AS BIGINT) AS stv,
         CAST(SUM(t * t) OVER w AS BIGINT) AS stt
  FROM base
  WINDOW w AS (ORDER BY t RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
)
SELECT CAST(day AS VARCHAR) AS day, v, n_window,
  CASE WHEN n_window >= 2 AND
       CAST(n_window AS DOUBLE) * CAST(stt AS DOUBLE)
       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) <> 0.0 THEN
    (CAST(n_window AS DOUBLE) * CAST(stv AS DOUBLE)
     - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
    / (CAST(n_window AS DOUBLE) * CAST(stt AS DOUBLE)
       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
  END AS slope
FROM m
"""
    sqls["growth_accounting"] = """
WITH up AS (
  SELECT DISTINCT user_id AS u,
         CAST(CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS BIGINT) AS p
  FROM events
),
lab AS (
  SELECT p,
         CASE WHEN prev IS NULL THEN 'new'
              WHEN prev = p - 1 THEN 'retained'
              ELSE 'resurrected' END AS cls
  FROM (SELECT u, p, LAG(p) OVER (PARTITION BY u ORDER BY p) AS prev FROM up)
),
active AS (
  SELECT p,
         CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resurrected
  FROM lab GROUP BY p
),
churned AS (
  SELECT s.p, CAST(COUNT(*) AS BIGINT) AS n_churned
  FROM (SELECT p + 1 AS p, u FROM up) s
  LEFT JOIN up ON up.p = s.p AND up.u = s.u
  WHERE up.u IS NULL GROUP BY s.p
),
maxp AS (SELECT MAX(p) AS m FROM up)
SELECT COALESCE(a.p, c.p) AS period,
       CAST(COALESCE(a.n_new, 0) + COALESCE(a.n_retained, 0)
            + COALESCE(a.n_resurrected, 0) AS BIGINT) AS n_active,
       CAST(COALESCE(a.n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(a.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(a.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
FROM active a FULL JOIN churned c ON a.p = c.p, maxp
WHERE COALESCE(a.p, c.p) <= maxp.m
"""
    sqls["oof_target_encoding"] = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_custkey AS BIGINT) AS cust,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(((CAST(o_custkey AS BIGINT) % 2147483647) * 48271
               % 2147483647) % 5 AS BIGINT) AS fold
  FROM orders
),
grid AS (
  SELECT o_orderpriority AS c, fold AS f,
         CAST(SUM(cents) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY 1, 2
),
tots AS (
  SELECT c, CAST(SUM(s) AS BIGINT) AS ts, CAST(SUM(n) AS BIGINT) AS tn
  FROM grid GROUP BY c
),
oof AS (
  SELECT g.c, g.f, t.ts - g.s AS os, t.tn - g.n AS onn
  FROM grid g JOIN tots t ON g.c = t.c
)
SELECT b.o_orderkey, b.o_orderpriority, b.fold,
       CASE WHEN o.onn > 0
            THEN CAST(o.os AS DOUBLE) / CAST(o.onn AS DOUBLE) END AS te_oof
FROM base b LEFT JOIN oof o ON b.o_orderpriority = o.c AND b.fold = o.f
"""
    sqls["cuped_purchase"] = """
WITH per_user AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS BIGINT) AS pre,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS BIGINT) AS post
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre) AS BIGINT) AS sx,
         CAST(SUM(post) AS BIGINT) AS sy,
         CAST(SUM(pre * post) AS BIGINT) AS sxy,
         CAST(SUM(pre * pre) AS BIGINT) AS sxx,
         CAST(COUNT(*) FILTER (WHERE u % 2 = 0) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN u % 2 = 0 THEN pre ELSE 0 END) AS BIGINT) AS sx_a,
         CAST(SUM(CASE WHEN u % 2 = 0 THEN post ELSE 0 END) AS BIGINT) AS sy_a,
         CAST(COUNT(*) FILTER (WHERE u % 2 = 1) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN u % 2 = 1 THEN pre ELSE 0 END) AS BIGINT) AS sx_b,
         CAST(SUM(CASE WHEN u % 2 = 1 THEN post ELSE 0 END) AS BIGINT) AS sy_b
  FROM per_user
)
SELECT n_a, n_b,
  CASE WHEN n_a > 0 AND n_b > 0 AND
       CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
  END AS theta,
  CASE WHEN n_a > 0 AND n_b > 0 THEN
    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
    - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
  END AS diff_raw,
  CASE WHEN n_a > 0 AND n_b > 0 AND
       CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
    (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
     - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
  END AS diff_cuped
FROM agg
"""
    # caliper matching: bucket band join, argmin per treated,
    # exact diff sum, one fixed-order float division
    sqls["caliper_match_att"] = """
WITH units AS (
  SELECT CAST(c_custkey AS BIGINT) AS key,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treat,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS score,
         COALESCE(sp.spend, 0) AS y
  FROM customer
  LEFT JOIN (
    SELECT o_custkey AS ck,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS spend
    FROM orders GROUP BY 1
  ) sp ON c_custkey = sp.ck
),
t AS (SELECT key AS tk, score AS ts, y AS ty FROM units WHERE treat = 1),
c AS (
  SELECT key AS ck, score AS cs, y AS cy,
         (score - ((score % 1000 + 1000) % 1000)) // 1000 AS b
  FROM units WHERE treat = 0
),
probes AS (
  SELECT tk, ts, ty,
         (ts - ((ts % 1000 + 1000) % 1000)) // 1000 + d.o AS b
  FROM t, (SELECT unnest([-1, 0, 1]) AS o) d
),
cands AS (
  SELECT tk, ts, ty, ck, cs, cy
  FROM probes JOIN c USING (b)
  WHERE ABS(ts - cs) <= 1000
),
best AS (
  SELECT tk, ty, cy,
         row_number() OVER (PARTITION BY tk
                            ORDER BY ABS(ts - cs), ck) AS rn
  FROM cands
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_matched,
         SUM(CAST(ty AS HUGEINT) - cy) AS diff_sum
  FROM best WHERE rn = 1
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_treated,
       n_matched,
       CASE WHEN n_matched > 0
            THEN CAST(diff_sum AS DOUBLE) / CAST(n_matched AS DOUBLE)
       END AS att
FROM m
"""
    # ANOVA: exact quantized per-group quadratic terms, fixed IEEE tail
    sqls["anova_price_flag"] = """
WITH v AS (
  SELECT l_returnflag AS g,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
           AS cents
  FROM lineitem
),
pg AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS ng, SUM(cents) AS sg
  FROM v GROUP BY 1
),
col AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         SUM((sg * sg * 1000000) // ng) AS aq
  FROM pg
),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, SUM(cents) AS s,
         SUM(cents * cents) AS t2
  FROM v
)
SELECT k, CAST(n AS BIGINT) AS n,
       (CAST(aq AS DOUBLE) - CAST((s * s * 1000000) // n AS DOUBLE))
         / 1000000.0 AS ssb,
       CAST(t2 AS DOUBLE) - CAST(aq AS DOUBLE) / 1000000.0 AS ssw,
       CASE WHEN k > 1 AND n > k THEN
         (((CAST(aq AS DOUBLE) - CAST((s * s * 1000000) // n AS DOUBLE))
           / 1000000.0) / CAST(k - 1 AS DOUBLE))
         / ((CAST(t2 AS DOUBLE) - CAST(aq AS DOUBLE) / 1000000.0)
            / CAST(n - k AS DOUBLE))
       END AS f_stat
FROM tot, col
"""
    # dyadic EWMA: power-of-two weights, exact integer quotient
    sqls["priority_revenue_ewma"] = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
sm AS (
  SELECT priority, day, cents AS value,
         (COALESCE(CAST(lag(cents, 0) OVER w AS HUGEINT), 0) * 128 + COALESCE(CAST(lag(cents, 1) OVER w AS HUGEINT), 0) * 64 + COALESCE(CAST(lag(cents, 2) OVER w AS HUGEINT), 0) * 32 + COALESCE(CAST(lag(cents, 3) OVER w AS HUGEINT), 0) * 16 + COALESCE(CAST(lag(cents, 4) OVER w AS HUGEINT), 0) * 8 + COALESCE(CAST(lag(cents, 5) OVER w AS HUGEINT), 0) * 4 + COALESCE(CAST(lag(cents, 6) OVER w AS HUGEINT), 0) * 2 + COALESCE(CAST(lag(cents, 7) OVER w AS HUGEINT), 0) * 1) AS _num,
         CAST((CASE WHEN lag(cents, 0) OVER w IS NOT NULL THEN 128 ELSE 0 END + CASE WHEN lag(cents, 1) OVER w IS NOT NULL THEN 64 ELSE 0 END + CASE WHEN lag(cents, 2) OVER w IS NOT NULL THEN 32 ELSE 0 END + CASE WHEN lag(cents, 3) OVER w IS NOT NULL THEN 16 ELSE 0 END + CASE WHEN lag(cents, 4) OVER w IS NOT NULL THEN 8 ELSE 0 END + CASE WHEN lag(cents, 5) OVER w IS NOT NULL THEN 4 ELSE 0 END + CASE WHEN lag(cents, 6) OVER w IS NOT NULL THEN 2 ELSE 0 END + CASE WHEN lag(cents, 7) OVER w IS NOT NULL THEN 1 ELSE 0 END) AS HUGEINT) AS _den
  FROM daily WINDOW w AS (PARTITION BY priority ORDER BY day)
)
SELECT priority, strftime(day, '%Y-%m-%d') AS day, value,
       CAST((_num * 1000000) // _den AS BIGINT) AS ewma_q
FROM sm
"""
    # all-pairs over the calendar-bounded window grid; exact bigint
    # whole-dollar SSD (cents sum // 100 — keeps the daily value
    # range inside the operator's isqrt(int64max/m) guard through
    # ~sf8; ranking is scale-invariant); argmin rank per subsequence
    # with idx ties
    sqls["revenue_matrix_profile"] = """
WITH s AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) // 100 AS BIGINT) AS v
  FROM orders GROUP BY 1
),
g AS (SELECT day, v, row_number() OVER (ORDER BY day) AS idx FROM s),
wins AS (
  SELECT idx, day, v AS v0,
         lead(v, 1) OVER w AS v1,
         lead(v, 2) OVER w AS v2,
         lead(v, 3) OVER w AS v3,
         lead(v, 4) OVER w AS v4,
         lead(v, 5) OVER w AS v5,
         lead(v, 6) OVER w AS v6
  FROM g WINDOW w AS (ORDER BY idx)
),
ww AS (SELECT * FROM wins WHERE v6 IS NOT NULL),
pairs AS (
  SELECT a.idx AS ia, a.day AS day_a, b.idx AS ib,
         CAST(a.v0 - b.v0 AS HUGEINT) * CAST(a.v0 - b.v0 AS HUGEINT) + CAST(a.v1 - b.v1 AS HUGEINT) * CAST(a.v1 - b.v1 AS HUGEINT) + CAST(a.v2 - b.v2 AS HUGEINT) * CAST(a.v2 - b.v2 AS HUGEINT) + CAST(a.v3 - b.v3 AS HUGEINT) * CAST(a.v3 - b.v3 AS HUGEINT) + CAST(a.v4 - b.v4 AS HUGEINT) * CAST(a.v4 - b.v4 AS HUGEINT) + CAST(a.v5 - b.v5 AS HUGEINT) * CAST(a.v5 - b.v5 AS HUGEINT) + CAST(a.v6 - b.v6 AS HUGEINT) * CAST(a.v6 - b.v6 AS HUGEINT) AS ssd
  FROM ww a JOIN ww b ON ABS(a.idx - b.idx) > 3
),
best AS (
  SELECT ia, day_a, ib, ssd,
         row_number() OVER (PARTITION BY ia ORDER BY ssd, ib) AS rn
  FROM pairs
)
SELECT CAST(ia AS BIGINT) AS idx, strftime(day_a, '%Y-%m-%d') AS day,
       CAST(ssd AS BIGINT) AS ssd_min, CAST(ib AS BIGINT) AS match_idx
FROM best WHERE rn = 1
"""
    # sequential packing: bin = cum-before div target, per partition
    sqls["compaction_plan"] = """
WITH s AS (
  SELECT lang, source, doc_id AS _key,
         CAST(n_chars AS HUGEINT) AS _sz,
         SUM(CAST(n_chars AS HUGEINT))
           OVER (PARTITION BY lang, source ORDER BY doc_id)
           - CAST(n_chars AS HUGEINT) AS _cum_before
  FROM documents
),
b AS (
  SELECT lang, source, _key, _sz,
         CAST(_cum_before // 65536 AS BIGINT) AS bin_id
  FROM s
)
SELECT lang, source, bin_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(SUM(_sz) AS BIGINT) AS bin_bytes,
       CAST(min(_key) AS BIGINT) AS first_key,
       CAST(max(_key) AS BIGINT) AS last_key
FROM b GROUP BY 1, 2, 3
"""
    # sweep-line: intervals collapse to calendar change days, running
    # sum over the bounded day grid
    sqls["open_orders_sweep"] = """
WITH iv AS (
  SELECT CAST(o_orderdate AS DATE) AS s, CAST(l_shipdate AS DATE) AS e
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
d AS (
  SELECT day, CAST(SUM(d) AS BIGINT) AS net_delta FROM (
    SELECT s AS day, CAST(count(*) AS BIGINT) AS d FROM iv GROUP BY 1
    UNION ALL
    SELECT e + 1 AS day, -CAST(count(*) AS BIGINT) AS d FROM iv GROUP BY 1
  ) GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, net_delta,
       CAST(SUM(net_delta) OVER (ORDER BY day) AS BIGINT) AS open_cnt
FROM d
"""
    # AMS sketch: same md5 sign hash, same single-element median —
    # the estimator reproduces bit-for-bit in SQL
    sqls["ams_f2"] = """
WITH k AS (
  SELECT CAST(l_partkey AS BIGINT) AS key FROM lineitem
),
s AS (
  SELECT j,
         CAST(SUM(CASE WHEN substring(
                md5(CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)),
                1, 1) < '8' THEN 1 ELSE -1 END) AS BIGINT) AS s
  FROM k CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS j) js
  GROUP BY j
),
est AS (
  SELECT CAST(s * s AS BIGINT) AS f2_est,
         row_number() OVER (ORDER BY s * s, j) AS rn
  FROM s
),
ex AS (
  SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS f2_exact,
         CAST(SUM(c) AS BIGINT) AS n_rows
  FROM (SELECT count(*) AS c FROM k GROUP BY key)
)
SELECT n_rows, f2_exact, f2_est,
       CAST((ABS(CAST(f2_est AS HUGEINT) - f2_exact) * 1000000)
            // f2_exact AS BIGINT) AS abs_err_ppm
FROM ex, est WHERE rn = 9
"""
    # independent brute-force 3-way join oracle: the Apriori pruning
    # must be lossless
    sqls["basket_triples"] = """
WITH f AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
                  CAST(l_partkey AS BIGINT) AS i
  FROM lineitem
)
SELECT a.i AS item_a, x.i AS item_b, c.i AS item_c,
       CAST(count(*) AS BIGINT) AS n_abc
FROM f a
JOIN f x ON a.b = x.b AND a.i < x.i
JOIN f c ON x.b = c.b AND x.i < c.i
GROUP BY 1, 2, 3 HAVING count(*) >= 2
"""
    # exact hierarchy shares: pmod-floor quotients on HUGEINT
    sqls["revenue_share_hierarchy"] = """
WITH facts AS (
  SELECT r_name AS region, n_name AS nation,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
           AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
leaf AS (
  SELECT region, nation, SUM(cents) AS v
  FROM facts GROUP BY 1, 2
),
lv AS (
  SELECT region, nation, v,
         SUM(v) OVER (PARTITION BY region) AS pv,
         SUM(v) OVER () AS tot
  FROM leaf
)
SELECT region, nation, CAST(v AS BIGINT) AS value,
       CAST(CASE WHEN pv <> 0 THEN (v * 1000000) // pv END
            AS BIGINT) AS share_of_parent_q,
       CAST(CASE WHEN tot <> 0 THEN (pv * 1000000) // tot END
            AS BIGINT) AS parent_share_q
FROM lv
"""
    # weighted quantile: per-distinct-value collapse, rational crossing
    sqls["weighted_median_price"] = """
WITH v AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents,
         CAST(l_quantity AS HUGEINT) AS qty
  FROM lineitem
),
pv AS (
  SELECT l_returnflag, cents, SUM(qty) AS w
  FROM v GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, cents,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cumw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM pv
)
SELECT l_returnflag, CAST(min(cents) AS BIGINT) AS wq_value,
       CAST(max(tot) AS BIGINT) AS total_w
FROM cum WHERE cumw * 2 >= tot
GROUP BY 1
"""
    # all pairwise moments in one pass; same IEEE tail as pearson
    sqls["lineitem_corr_matrix"] = """
WITH v AS (
  SELECT CAST(l_quantity AS HUGEINT) AS qty,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
           AS price_c,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS HUGEINT) AS disc_c,
         CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS HUGEINT) AS tax_c
  FROM lineitem
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         SUM(qty) AS s0,
         SUM(qty * qty) AS p0_0,
         SUM(qty * price_c) AS p0_1,
         SUM(qty * disc_c) AS p0_2,
         SUM(qty * tax_c) AS p0_3,
         SUM(price_c) AS s1,
         SUM(price_c * price_c) AS p1_1,
         SUM(price_c * disc_c) AS p1_2,
         SUM(price_c * tax_c) AS p1_3,
         SUM(disc_c) AS s2,
         SUM(disc_c * disc_c) AS p2_2,
         SUM(disc_c * tax_c) AS p2_3,
         SUM(tax_c) AS s3,
         SUM(tax_c * tax_c) AS p3_3
  FROM v
)
SELECT 'qty' AS m_a, 'price_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p0_0 - s0 * s0) > 0 AND (n * p1_1 - s1 * s1) > 0 THEN
         CAST((n * p0_1 - s0 * s1) AS DOUBLE)
         / sqrt(CAST((n * p0_0 - s0 * s0) AS DOUBLE) * CAST((n * p1_1 - s1 * s1) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'qty' AS m_a, 'disc_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p0_0 - s0 * s0) > 0 AND (n * p2_2 - s2 * s2) > 0 THEN
         CAST((n * p0_2 - s0 * s2) AS DOUBLE)
         / sqrt(CAST((n * p0_0 - s0 * s0) AS DOUBLE) * CAST((n * p2_2 - s2 * s2) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'qty' AS m_a, 'tax_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p0_0 - s0 * s0) > 0 AND (n * p3_3 - s3 * s3) > 0 THEN
         CAST((n * p0_3 - s0 * s3) AS DOUBLE)
         / sqrt(CAST((n * p0_0 - s0 * s0) AS DOUBLE) * CAST((n * p3_3 - s3 * s3) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'price_c' AS m_a, 'disc_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p1_1 - s1 * s1) > 0 AND (n * p2_2 - s2 * s2) > 0 THEN
         CAST((n * p1_2 - s1 * s2) AS DOUBLE)
         / sqrt(CAST((n * p1_1 - s1 * s1) AS DOUBLE) * CAST((n * p2_2 - s2 * s2) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'price_c' AS m_a, 'tax_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p1_1 - s1 * s1) > 0 AND (n * p3_3 - s3 * s3) > 0 THEN
         CAST((n * p1_3 - s1 * s3) AS DOUBLE)
         / sqrt(CAST((n * p1_1 - s1 * s1) AS DOUBLE) * CAST((n * p3_3 - s3 * s3) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'disc_c' AS m_a, 'tax_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p2_2 - s2 * s2) > 0 AND (n * p3_3 - s3 * s3) > 0 THEN
         CAST((n * p2_3 - s2 * s3) AS DOUBLE)
         / sqrt(CAST((n * p2_2 - s2 * s2) AS DOUBLE) * CAST((n * p3_3 - s3 * s3) AS DOUBLE))
       END AS r
FROM m
"""
    # trimmed mean: rank-count trim, exact integer quotient
    sqls["trimmed_mean_price"] = """
WITH v AS (
  SELECT o_orderpriority AS priority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT priority, cents,
         row_number() OVER (PARTITION BY priority ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY priority) AS n
  FROM v
),
kept AS (
  SELECT priority, cents, n
  FROM r WHERE rn > (n * 10) // 100 AND rn <= n - (n * 10) // 100
)
SELECT priority, CAST(max(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST((SUM(CAST(cents AS HUGEINT)) * 1000000)
            // count(*) AS BIGINT) AS tmean_q
FROM kept GROUP BY 1
"""
    # stream-maintained bitmaps == batch COUNT(DISTINCT)
    sqls["stream_distinct_users"] = """
SELECT o_orderpriority AS prio,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
FROM orders GROUP BY 1
"""
    # six unrolled peeling rounds, mirroring the fixed-round contract
    sqls["kcore_parts"] = """
WITH li AS MATERIALIZED (
  SELECT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
  FROM lineitem WHERE l_orderkey % 4 = 0
),
edges AS MATERIALIZED (
  SELECT DISTINCT a.p AS id_a, b.p AS id_b
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
),
e0 AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION
  SELECT id_b AS src, id_a AS dst FROM edges
),
k0 AS MATERIALIZED (
  SELECT src FROM e0 GROUP BY src HAVING count(*) >= 3
),
e1 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e0 e
  JOIN k0 a ON e.src = a.src
  JOIN k0 b ON e.dst = b.src
),
k1 AS MATERIALIZED (
  SELECT src FROM e1 GROUP BY src HAVING count(*) >= 3
),
e2 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e1 e
  JOIN k1 a ON e.src = a.src
  JOIN k1 b ON e.dst = b.src
),
k2 AS MATERIALIZED (
  SELECT src FROM e2 GROUP BY src HAVING count(*) >= 3
),
e3 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e2 e
  JOIN k2 a ON e.src = a.src
  JOIN k2 b ON e.dst = b.src
),
k3 AS MATERIALIZED (
  SELECT src FROM e3 GROUP BY src HAVING count(*) >= 3
),
e4 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e3 e
  JOIN k3 a ON e.src = a.src
  JOIN k3 b ON e.dst = b.src
),
k4 AS MATERIALIZED (
  SELECT src FROM e4 GROUP BY src HAVING count(*) >= 3
),
e5 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e4 e
  JOIN k4 a ON e.src = a.src
  JOIN k4 b ON e.dst = b.src
),
k5 AS MATERIALIZED (
  SELECT src FROM e5 GROUP BY src HAVING count(*) >= 3
),
e6 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e5 e
  JOIN k5 a ON e.src = a.src
  JOIN k5 b ON e.dst = b.src
)
SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
FROM e6 GROUP BY 1
"""
    # the oracle reproduces the synthetic pixels and the exact integer
    # NN-resize index map; the Spark side runs the real PNG roundtrip
    sqls["image_ahash"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(p_partkey % 9 + 4 AS BIGINT) AS w,
         CAST(p_partkey % 7 + 4 AS BIGINT) AS h
  FROM part WHERE p_partkey % 20 = 0
),
cells AS (
  SELECT media_id, w, h, gx.x, gy.y,
         (media_id * 7 + 3 * ((gx.x * w) // 8)
          + 11 * ((gy.y * h) // 8)) % 256 AS p
  FROM ids,
       (SELECT unnest(generate_series(0, 7)) AS x) gx,
       (SELECT unnest(generate_series(0, 7)) AS y) gy
),
means AS (
  SELECT media_id, SUM(p) // 64 AS m FROM cells GROUP BY 1
)
SELECT c.media_id, MIN(c.w) AS width, MIN(c.h) AS height,
       CAST(SUM(CASE WHEN c.p >= ms.m AND c.y * 8 + c.x >= 32
                THEN 1::BIGINT << (c.y * 8 + c.x - 32) ELSE 0 END)
            AS BIGINT) AS ahash_hi,
       CAST(SUM(CASE WHEN c.p >= ms.m AND c.y * 8 + c.x < 32
                THEN 1::BIGINT << (c.y * 8 + c.x) ELSE 0 END)
            AS BIGINT) AS ahash_lo
FROM cells c JOIN means ms USING (media_id)
GROUP BY 1
"""
    # resize path: the oracle reproduces the resized pixels with the
    # same integer index map, no codec; the Spark side round-trips a
    # real PNG and aggregates the resized buffer JVM-side
    # fake-decoder byte histogram, replayed from md5 hex digits —
    # (strpos into '0123456789abcdef') - 1 is the nibble value; the
    # content is md5(id-as-string) repeated id%8+1 times (VERDICT r7
    # item 7: multimodal_decode leaves the rows-only tier)
    sqls["multimodal_decode"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(p_partkey % 8 + 1 AS BIGINT) AS reps
  FROM part WHERE p_partkey % 20 = 0
),
hx AS (
  SELECT media_id, reps, md5(CAST(media_id AS VARCHAR)) AS h FROM ids
),
bytes AS (
  SELECT media_id, reps,
         (strpos('0123456789abcdef',
                 substr(h, CAST((u.i % 16) * 2 + 1 AS BIGINT), 1)) - 1) * 16
       + (strpos('0123456789abcdef',
                 substr(h, CAST((u.i % 16) * 2 + 2 AS BIGINT), 1)) - 1) AS b
  FROM hx, LATERAL (SELECT unnest(range(0, reps * 16)) AS i) u
)
SELECT media_id,
       CAST(count(*) AS BIGINT) AS n_bytes,
       CAST(SUM(CASE WHEN b // 32 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS hist0,
       CAST(SUM(CASE WHEN b // 32 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hist1,
       CAST(SUM(CASE WHEN b // 32 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS hist2,
       CAST(SUM(CASE WHEN b // 32 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hist3,
       CAST(SUM(CASE WHEN b // 32 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS hist4,
       CAST(SUM(CASE WHEN b // 32 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS hist5,
       CAST(SUM(CASE WHEN b // 32 = 6 THEN 1 ELSE 0 END) AS BIGINT) AS hist6,
       CAST(SUM(CASE WHEN b // 32 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS hist7
FROM bytes GROUP BY 1
"""
    # HLL rollup accuracy contract: the oracle pins the exact distinct
    # count AND asserts the Spark-side estimate sat within its
    # documented +/-5% bound (within_5pct must come back TRUE)
    sqls["hll_user_rollup"] = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS within_5pct
FROM events GROUP BY 1
"""
    sqls["image_palette_resize"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(p_partkey % 9 + 4 AS BIGINT) AS w,
         CAST(p_partkey % 7 + 4 AS BIGINT) AS h
  FROM part WHERE p_partkey % 20 = 3
),
cells AS (
  SELECT media_id, gx.x, gy.y,
         (media_id + 3 * ((gx.x * w) // 4)
          + 5 * ((gy.y * h) // 3)) % 16 AS j
  FROM ids,
       (SELECT unnest(generate_series(0, 3)) AS x) gx,
       (SELECT unnest(generate_series(0, 2)) AS y) gy
),
chans AS (
  SELECT media_id, x, y, 0 AS ch, (media_id * 13 + 17 * j) % 256 AS v
  FROM cells
  UNION ALL
  SELECT media_id, x, y, 1, (media_id * 7 + 29 * j) % 256 FROM cells
  UNION ALL
  SELECT media_id, x, y, 2, (media_id * 11 + 43 * j) % 256 FROM cells
  UNION ALL
  SELECT media_id, x, y, 3,
         CASE WHEN j < 8 THEN (media_id * 5 + 31 * j) % 256 ELSE 255 END
  FROM cells
)
SELECT media_id,
       CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
       CAST(4 AS BIGINT) AS nch,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(SUM(v * ((y * 4 + x) * 4 + ch)) AS BIGINT) AS px_possum
FROM chans GROUP BY 1
"""
    sqls["image_resize_pixels"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(p_partkey % 9 + 4 AS BIGINT) AS w,
         CAST(p_partkey % 7 + 4 AS BIGINT) AS h
  FROM part WHERE p_partkey % 20 = 0
),
cells AS (
  SELECT media_id, gx.x, gy.y,
         (media_id * 7 + 3 * ((gx.x * w) // 4)
          + 11 * ((gy.y * h) // 3)) % 256 AS p
  FROM ids,
       (SELECT unnest(generate_series(0, 3)) AS x) gx,
       (SELECT unnest(generate_series(0, 2)) AS y) gy
)
SELECT media_id,
       CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS nch,
       CAST(SUM(p) AS BIGINT) AS px_sum,
       CAST(SUM(p * (y * 4 + x)) AS BIGINT) AS px_possum
FROM cells GROUP BY 1
"""
    # the oracle reproduces the synthetic PCM samples arithmetically;
    # the Spark side goes through a real WAV encode+decode roundtrip
    sqls["audio_frame_energy"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id
  FROM part WHERE p_partkey % 20 = 0
),
s AS (
  SELECT media_id, u.i,
         ((media_id * 31 + u.i * 7) % 256) - 128 AS v
  FROM ids,
       LATERAL (SELECT unnest(generate_series(
                0, CAST(media_id % 50 + 9 AS BIGINT))) AS i) u
)
SELECT media_id, CAST(i // 16 AS BIGINT) AS frame_idx,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(SUM(v * v) AS BIGINT) AS energy
FROM s GROUP BY 1, 2
"""
    # stream-maintained sketch == batch sketch (mergeable cells):
    # the oracle is the identical batch recompute
    sqls["stream_cms_topk"] = """
WITH keys AS (
  SELECT CAST(l_partkey AS BIGINT) AS part FROM lineitem
),
cells AS (
  SELECT d.d, substring(md5(concat(CAST(d.d AS VARCHAR), ':',
                                   CAST(k.part AS VARCHAR))), 1, 2) AS cell
  FROM keys k, (SELECT CAST(range AS BIGINT) AS d FROM range(4)) d
),
sketch AS (
  SELECT d, cell, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY d, cell
),
exact AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS exact
  FROM keys GROUP BY part
),
top AS (
  SELECT part, exact FROM exact
  ORDER BY exact DESC, part ASC LIMIT 20
),
probes AS (
  SELECT t.part, d.d,
         substring(md5(concat(CAST(d.d AS VARCHAR), ':',
                              CAST(t.part AS VARCHAR))), 1, 2) AS cell
  FROM top t, (SELECT CAST(range AS BIGINT) AS d FROM range(4)) d
),
est AS (
  SELECT p.part,
         CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est
  FROM probes p LEFT JOIN sketch s ON p.d = s.d AND p.cell = s.cell
  GROUP BY p.part
)
SELECT t.part, t.exact, e.est, CAST(e.est - t.exact AS BIGINT) AS over
FROM top t JOIN est e ON t.part = e.part
"""
    sqls["cms_heavy_hitters"] = """
WITH keys AS (
  SELECT CAST(l_partkey AS BIGINT) AS part FROM lineitem
),
cells AS (
  SELECT d.d, substring(md5(concat(CAST(d.d AS VARCHAR), ':',
                                   CAST(k.part AS VARCHAR))), 1, 2) AS cell
  FROM keys k, (SELECT CAST(range AS BIGINT) AS d FROM range(4)) d
),
sketch AS (
  SELECT d, cell, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY d, cell
),
exact AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS exact
  FROM keys GROUP BY part
),
top AS (
  SELECT part, exact FROM exact
  ORDER BY exact DESC, part ASC LIMIT 20
),
probes AS (
  SELECT t.part, d.d,
         substring(md5(concat(CAST(d.d AS VARCHAR), ':',
                              CAST(t.part AS VARCHAR))), 1, 2) AS cell
  FROM top t, (SELECT CAST(range AS BIGINT) AS d FROM range(4)) d
),
est AS (
  SELECT p.part,
         CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est
  FROM probes p LEFT JOIN sketch s ON p.d = s.d AND p.cell = s.cell
  GROUP BY p.part
)
SELECT t.part, t.exact, e.est, CAST(e.est - t.exact AS BIGINT) AS over
FROM top t JOIN est e ON t.part = e.part
"""
    sqls["quota_allocation"] = """
WITH groups AS (
  SELECT lang, source, CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS weight
  FROM documents GROUP BY lang, source
),
tot AS (SELECT CAST(SUM(weight) AS HUGEINT) AS w_tot FROM groups),
shared AS (
  SELECT lang, source, weight,
         CAST((CAST(10000 AS HUGEINT) * CAST(weight AS HUGEINT)) // t.w_tot
              AS BIGINT) AS flr,
         (CAST(10000 AS HUGEINT) * CAST(weight AS HUGEINT)) % t.w_tot AS rem
  FROM groups, tot t
),
floors AS (SELECT CAST(SUM(flr) AS BIGINT) AS f_sum FROM shared)
SELECT lang, source, weight,
       CAST(flr + CASE WHEN ROW_NUMBER() OVER (
              ORDER BY rem DESC, lang ASC, source ASC)
            <= 10000 - f.f_sum THEN 1 ELSE 0 END AS BIGINT) AS slots
FROM shared, floors f
"""
    sqls["theilsen_revenue"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
base AS (
  SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS t, v FROM daily
),
pairs AS (
  SELECT CAST((b.v - a.v) * 1000000 AS BIGINT) AS num,
         CAST(b.t - a.t AS BIGINT) AS dt
  FROM base a JOIN base b ON b.t > a.t
),
qs AS (
  SELECT CAST((num - ((num % dt) + dt) % dt) // dt AS BIGINT) AS slope_q
  FROM pairs
),
cells AS (
  SELECT slope_q, CAST(COUNT(*) AS BIGINT) AS c FROM qs GROUP BY slope_q
),
ranked AS (
  SELECT slope_q,
         CAST(SUM(c) OVER (ORDER BY slope_q
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS np
  FROM cells
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_days,
       np AS n_pairs,
       CAST(MIN(slope_q) AS BIGINT) AS slope_q,
       CAST(1000000 AS BIGINT) AS scale
FROM ranked WHERE 2 * cum >= np
GROUP BY np
"""
    sqls["mannwhitney_value"] = """
WITH vals AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS ga
  FROM events WHERE event_type IN ('purchase', 'view')
),
cells AS (
  SELECT v, CAST(SUM(ga) AS BIGINT) AS ca, CAST(COUNT(*) AS BIGINT) AS c
  FROM vals GROUP BY v
),
ranked AS (
  SELECT ca, c,
         CAST(2 * COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS two_r
  FROM cells
),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(c - ca) AS BIGINT) AS n_b,
         CAST(SUM(CAST(ca AS DECIMAL(38,0)) * CAST(two_r AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS _2ra,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))
                  * CAST(c AS DECIMAL(38,0)) - CAST(c AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS tie_cubes
  FROM ranked
),
fin AS (
  -- exact columns land as BIGINT: a DECIMAL in a final SELECT converts
  -- engine-dependently across DuckDB/pandas versions (r6 parity
  -- incident); every double below is one bigint->double conversion
  SELECT n_a, n_b,
         CAST(tie_cubes AS BIGINT) AS tie_cubes,
         CAST(n_a + n_b AS BIGINT) AS n,
         CAST(_2ra - CAST(CAST(n_a AS DECIMAL(38,0))
              * CAST(n_a + 1 AS DECIMAL(38,0)) AS DECIMAL(38,0))
              AS BIGINT) AS two_u_a
  FROM agg
)
SELECT n_a, n_b, two_u_a, tie_cubes,
  CASE WHEN n_a > 0 AND n_b > 0 AND n > 1
        AND CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
            * (CAST(n + 1 AS DOUBLE)
               - CAST(tie_cubes AS DOUBLE)
                 / CAST(CAST(n AS BIGINT) * CAST(n - 1 AS BIGINT) AS DOUBLE))
            / 12.0 > 0 THEN
    CAST(two_u_a - n_a * n_b AS DOUBLE)
    / (2.0 * sqrt(
        CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        * (CAST(n + 1 AS DOUBLE)
           - CAST(tie_cubes AS DOUBLE)
             / CAST(CAST(n AS BIGINT) * CAST(n - 1 AS BIGINT) AS DOUBLE))
        / 12.0))
  END AS z,
  CASE WHEN n_a > 0 AND n_b > 0 THEN
    CAST(two_u_a - n_a * n_b AS DOUBLE)
    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
  END AS r_rb
FROM fin
"""
    sqls["stream_js_drift"] = sqls["js_drift"]
    # Lindley recursion replayed literally (the engine uses the
    # closed-form reflection identity — independent derivations)
    sqls["stock_balance_floor"] = """
WITH RECURSIVE base AS (
  SELECT CAST(l_suppkey AS BIGINT) AS supp,
         CAST(l_orderkey AS BIGINT) AS okey,
         CAST(l_linenumber AS BIGINT) AS lno,
         CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
                   ELSE -l_quantity END AS BIGINT) AS delta,
         ROW_NUMBER() OVER (
           PARTITION BY l_suppkey
           ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber
         ) AS rn
  FROM lineitem
),
rec AS (
  SELECT supp, okey, lno, delta, rn,
         GREATEST(CAST(0 AS BIGINT), delta) AS bal
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.supp, b.okey, b.lno, b.delta, b.rn,
         GREATEST(CAST(0 AS BIGINT), r.bal + b.delta)
  FROM rec r
  JOIN base b ON b.supp = r.supp AND b.rn = r.rn + 1
)
SELECT supp, okey, lno, delta, CAST(bal AS BIGINT) AS balance FROM rec
"""
    # two-sided clamp: no closed form exists (the clamp erases
    # history), so the stream's per-key state fold is checked against
    # the literal recursion over the full ordered history
    sqls["stream_capped_balance"] = """
WITH RECURSIVE base AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(CASE WHEN event_type IN ('purchase', 'signup')
                   THEN 1 ELSE -1 END AS BIGINT)
           * CAST(CAST(COALESCE(value, 0.0) AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS delta,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS rn
  FROM events
),
rec AS (
  SELECT user_id, rn,
         LEAST(CAST(25000 AS BIGINT),
               GREATEST(CAST(0 AS BIGINT), delta)) AS bal
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.rn,
         LEAST(CAST(25000 AS BIGINT),
               GREATEST(CAST(0 AS BIGINT), r.bal + b.delta))
  FROM rec r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
)
SELECT r.user_id, CAST(r.rn AS BIGINT) AS n_events,
       CAST(r.bal AS BIGINT) AS balance
FROM rec r
JOIN (SELECT user_id, MAX(rn) AS m FROM rec GROUP BY 1) t
  ON t.user_id = r.user_id AND t.m = r.rn
"""
    # reachability: the engine's fixed-depth frontier loop vs the
    # recursive CTE SQL engines use for the same question
    sqls["part_reach_bfs"] = """
WITH RECURSIVE f AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
                  CAST(l_partkey AS BIGINT) AS i
  FROM lineitem
),
e AS (
  SELECT a.i AS u, x.i AS v
  FROM f a JOIN f x ON a.b = x.b AND a.i < x.i
  GROUP BY 1, 2 HAVING count(*) >= 2
),
sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
r AS (
  SELECT CAST(p_partkey AS BIGINT) AS node, 0 AS hop
  FROM part WHERE p_partkey % 97 = 0
  UNION
  SELECT s.v, r.hop + 1
  FROM r JOIN sym s ON s.u = r.node
  WHERE r.hop < 3
)
SELECT node, CAST(MIN(hop) AS INT) AS hops FROM r GROUP BY node
"""
    # exact floor-div interpolation: DuckDB's // and % TRUNCATE for
    # negative numerators, so the pmod-floor is spelled out
    sqls["price_interpolate_daily"] = """
WITH agg AS (
  SELECT o_orderpriority AS priority,
         CAST(DATE_DIFF('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day_i,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cents
  FROM orders GROUP BY 1, 2
),
bounds AS (SELECT MIN(day_i) AS d0, MAX(day_i) AS d1 FROM agg),
cal AS (
  SELECT p.priority, c.day_i
  FROM (SELECT DISTINCT priority FROM agg) p
  CROSS JOIN (
    SELECT UNNEST(generate_series(d0, d1)) AS day_i FROM bounds
  ) c
),
dense AS (
  SELECT cal.priority, cal.day_i, agg.cents
  FROM cal LEFT JOIN agg
    ON agg.priority = cal.priority AND agg.day_i = cal.day_i
),
win AS (
  SELECT priority, day_i, cents,
    LAST_VALUE(CASE WHEN cents IS NOT NULL THEN day_i END IGNORE NULLS)
      OVER wb AS p0,
    LAST_VALUE(CASE WHEN cents IS NOT NULL THEN cents END IGNORE NULLS)
      OVER wb AS v0,
    FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN day_i END IGNORE NULLS)
      OVER wf AS p1,
    FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN cents END IGNORE NULLS)
      OVER wf AS v1
  FROM dense
  WINDOW
    wb AS (PARTITION BY priority ORDER BY day_i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY priority ORDER BY day_i
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
calc AS (
  SELECT priority, day_i, cents, p0, p1, v0,
         CAST(v1 - v0 AS HUGEINT) * 100
           * CAST(day_i - p0 AS HUGEINT) AS num,
         CAST(p1 - p0 AS HUGEINT) AS den
  FROM win
)
SELECT priority, day_i,
  CAST(CASE
    WHEN cents IS NOT NULL THEN CAST(cents AS HUGEINT) * 100
    WHEN p0 IS NOT NULL AND p1 IS NOT NULL THEN
      CAST(v0 AS HUGEINT) * 100
      + (num - (((num % den) + den) % den)) / den
  END AS BIGINT) AS value_q,
  CAST((cents IS NULL AND p0 IS NOT NULL AND p1 IS NOT NULL) AS INT)
    AS is_interpolated
FROM calc
"""
    # r9 serving-path aliases: the persisted/stream-assembled serve
    # queries are LAW-IDENTICAL to their in-plan/batch twins
    # (tests/test_functions.py indexed-serve law;
    # tests/test_ann_monitor.py full-index-from-stream law), so the
    # oracle replays the same SQL — the driver hash row then covers
    # the alternative physical strategy end to end
    sqls["ivf_refined_index_probe"] = sqls["ivf_refined_probe"]
    sqls["hnsw_stream_index_probe"] = sqls["hnsw_topk"]
