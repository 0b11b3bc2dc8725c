"""Oracle SQL registry (moved verbatim from oracle_sql())."""

from amazon_personalize_connectors_spark.queries._shared import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries._sqlcte import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q06 import _bpe_oracle_sql  # noqa: F401
from amazon_personalize_connectors_spark.queries.q06 import _bpe_vocab_oracle_sql  # noqa: F401


def add(sqls: dict) -> None:
    # the stream-maintained score grid must reproduce the batch AUC
    sqls["stream_auc_monitor"] = sqls["rec_auc_segments"]
    # ... and, collapsed over groups, the batch calibration table
    sqls["stream_calibration"] = sqls["score_calibration"]
    # exact Pearson: int128 moment sums, same final double conversions
    sqls["price_qty_corr"] = """
WITH v AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
),
a AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM v GROUP BY g
)
SELECT g AS l_returnflag,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS r_num,
       CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS r_dx,
       CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS r_dy,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) END AS r
FROM a
"""
    # exact Spearman: doubled average ranks off the value grid
    # (2k + c + 1 per tie run), then the same int128 Pearson core
    sqls["qty_price_spearman"] = """
WITH v AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
),
gx AS (
  SELECT g, x,
         CAST(2 * COALESCE(sum(c) OVER (PARTITION BY g ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS rx2
  FROM (SELECT g, x, count(*) AS c FROM v GROUP BY 1, 2)
),
gy AS (
  SELECT g, y,
         CAST(2 * COALESCE(sum(c) OVER (PARTITION BY g ORDER BY y
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS ry2
  FROM (SELECT g, y, count(*) AS c FROM v GROUP BY 1, 2)
),
rr AS (
  SELECT v.g, gx.rx2 AS x, gy.ry2 AS y
  FROM v JOIN gx ON v.g = gx.g AND v.x = gx.x
         JOIN gy ON v.g = gy.g AND v.y = gy.y
),
a AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM rr GROUP BY g
)
SELECT g AS l_returnflag,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS r_num,
       CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS r_dx,
       CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS r_dy,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) END AS rho
FROM a
"""
    # exact OLS: int128 moments, identical fixed IEEE expression tree
    sqls["price_qty_ols"] = """
WITH v AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
),
a AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM v GROUP BY g
)
SELECT g AS l_returnflag,
       CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) END AS slope,
       CASE WHEN n * sxx - sx * sx > 0 THEN
         (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
          - (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
         / CAST(n AS DOUBLE) END AS intercept,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
          * CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE))
         / (CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
            * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) END AS r2
FROM a
"""
    # chi-square independence: exact int128 cross-multiplied cell
    # deviations, per-cell IEEE tail quantized to nano-units, exact
    # bigint quanta sum, one final division (+ Cramér's V)
    sqls["chi2_flag_status"] = """
WITH cells AS (
  SELECT l_returnflag AS a, l_linestatus AS b, CAST(count(*) AS BIGINT) AS o
  FROM lineitem GROUP BY 1, 2
),
rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS rtot FROM cells GROUP BY 1),
ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS ctot FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS nn,
         CAST(count(DISTINCT a) AS BIGINT) AS ra,
         CAST(count(DISTINCT b) AS BIGINT) AS cb
  FROM cells
),
q AS (
  SELECT nn, ra, cb,
         CAST(floor(
           (CAST(CAST(CAST(o AS HUGEINT) * nn
                 - CAST(rtot AS HUGEINT) * ctot AS VARCHAR) AS DOUBLE)
            * CAST(CAST(CAST(o AS HUGEINT) * nn
                   - CAST(rtot AS HUGEINT) * ctot AS VARCHAR) AS DOUBLE)
            / CAST(CAST(CAST(rtot AS HUGEINT) * CAST(ctot AS HUGEINT) * nn
                   AS VARCHAR) AS DOUBLE))
           * 1000000000.0) AS BIGINT) AS qq
  FROM cells
  JOIN rt USING (a)
  JOIN ct USING (b)
  CROSS JOIN tot
)
SELECT nn AS n,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST((ra - 1) * (cb - 1) AS BIGINT) AS dof,
       CAST(sum(qq) AS DOUBLE) / 1000000000.0 AS chi2,
       CASE WHEN nn > 0 AND (ra - 1) * (cb - 1) > 0 THEN
         sqrt((CAST(sum(qq) AS DOUBLE) / 1000000000.0)
              / (CAST(nn AS DOUBLE)
                 * CAST(least(ra - 1, cb - 1) AS DOUBLE))) END AS cramers_v
FROM q GROUP BY nn, ra, cb
"""
    # mutual information: same cell grid + marginals as chi2 above;
    # every log argument is a HUGEINT cross-product routed through
    # VARCHAR before DOUBLE (correctly-rounded parse, matching
    # Spark's BigDecimal->double); per-cell/per-class terms quantized
    # floor(term*1e9) so sums are exact bigints; GREATEST(.,0) clamps
    # the floor bias exactly as the engine does
    sqls["mi_priority_status"] = """
WITH cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
),
rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS rtot FROM cells GROUP BY 1),
ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS ctot FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
q_mi AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(o AS DOUBLE) / CAST(nn AS DOUBLE))
           * ln(CAST(CAST(CAST(o AS HUGEINT) * nn AS VARCHAR) AS DOUBLE)
                / CAST(CAST(CAST(rtot AS HUGEINT) * ctot AS VARCHAR)
                       AS DOUBLE))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS qm,
         nn
  FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot
  GROUP BY nn
),
q_x AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(rtot AS DOUBLE) / CAST(nn AS DOUBLE))
           * ln(CAST(nn AS DOUBLE) / CAST(rtot AS DOUBLE))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS qx,
         CAST(count(*) AS BIGINT) AS classes_x
  FROM rt CROSS JOIN tot
),
q_y AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(ctot AS DOUBLE) / CAST(nn AS DOUBLE))
           * ln(CAST(nn AS DOUBLE) / CAST(ctot AS DOUBLE))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS qy,
         CAST(count(*) AS BIGINT) AS classes_y
  FROM ct CROSS JOIN tot
)
SELECT nn AS n, classes_x, classes_y,
       CAST(GREATEST(qm, 0) AS DOUBLE) / 1000000000.0 AS mi,
       CAST(qx AS DOUBLE) / 1000000000.0 AS h_x,
       CAST(qy AS DOUBLE) / 1000000000.0 AS h_y,
       CASE WHEN LEAST(qx, qy) > 0 THEN
         CAST(GREATEST(qm, 0) AS DOUBLE) / CAST(LEAST(qx, qy) AS DOUBLE)
       END AS nmi
FROM q_mi CROSS JOIN q_x CROSS JOIN q_y
"""
    # sorted-neighborhood: rank + range self-join + exact token
    # Jaccard (the Spark side never builds the range join — the
    # bucket trick keeps pairs linear)
    sqls["sorted_neighborhood"] = """
WITH d AS (
  SELECT doc_id, substr(lower(text), 1, 24) AS k,
         list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
           t -> t <> '')) AS t
  FROM documents
),
r AS (
  SELECT doc_id, t, row_number() OVER (ORDER BY k, doc_id) - 1 AS rid
  FROM d
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(b.rid - a.rid AS INT) AS rank_dist,
         CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS common,
         CAST(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))
              AS BIGINT) AS union_size
  FROM r a JOIN r b ON b.rid > a.rid AND b.rid - a.rid < 5
)
SELECT id_a, id_b, rank_dist, common, union_size,
       CAST(common AS DOUBLE) / CAST(union_size AS DOUBLE) AS jaccard
FROM p
"""
    # streaming join-IVM: same full-recompute oracle as the batch
    # form — the delta rule must hold across any batch interleaving
    sqls["stream_ivm_rollup"] = """
SELECT o_orderpriority,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS sum_v,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
"""
    # join-IVM: the oracle is the FULL recompute — equality is the
    # two-sided delta rule holding end-to-end
    sqls["ivm_join_rollup"] = """
SELECT o_orderpriority,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS sum_v,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
"""
    # Benford audit: first digit from the bigint's string form (exact
    # everywhere); reference probabilities as VARCHAR-parsed literals
    # (correctly-rounded, matching Spark's pinned doubles bit-for-bit)
    sqls["benford_audit"] = """
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM orders
),
counts AS (
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM c WHERE v > 0 GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM counts),
p AS (
  SELECT * FROM (VALUES
    (1, CAST('0.3010299956639812' AS DOUBLE)),
    (2, CAST('0.17609125905568124' AS DOUBLE)),
    (3, CAST('0.12493873660829992' AS DOUBLE)),
    (4, CAST('0.09691001300805642' AS DOUBLE)),
    (5, CAST('0.07918124604762482' AS DOUBLE)),
    (6, CAST('0.06694678963061322' AS DOUBLE)),
    (7, CAST('0.05799194697768673' AS DOUBLE)),
    (8, CAST('0.05115252244738129' AS DOUBLE)),
    (9, CAST('0.04575749056067514' AS DOUBLE))
  ) v(digit, benford_p)
)
SELECT counts.digit, n,
       CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) AS share,
       benford_p,
       abs(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) - benford_p) AS abs_dev
FROM counts JOIN p USING (digit) CROSS JOIN t
"""
    # lag-k ACF: day-index equi-join pairs, int128 Pearson core
    sqls["revenue_acf"] = """
WITH d AS (
  SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS di,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT l.lag, a.v AS x, b.v AS y
  FROM (VALUES (1), (7), (28)) l(lag)
  JOIN d a ON TRUE
  JOIN d b ON b.di = a.di + l.lag
),
a AS (
  SELECT lag, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS r_num,
       CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS r_dx,
       CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS r_dy,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) END AS r
FROM a
"""
    # total-variation drift: pointwise integer mass differences
    sqls["tv_drift"] = """
WITH v AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS fa,
         CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END AS fb
  FROM lineitem
),
per AS (SELECT c, sum(fa) AS a, sum(fb) AS b FROM v GROUP BY c),
tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b FROM per
)
SELECT n_a, n_b,
       CAST(sum(abs(a * n_b - b * n_a)) AS BIGINT) AS tv_num,
       CAST(sum(abs(a * n_b - b * n_a)) AS DOUBLE)
         / CASE WHEN n_a > 0 AND n_b > 0
             THEN CAST(2 * n_a * n_b AS DOUBLE) END AS tv_stat
FROM per, tot
GROUP BY n_a, n_b
"""
    # inclusion-dependency profile: distinct-key containment per
    # candidate relation + one negative control
    sqls["fk_discovery"] = """
WITH rel AS (
  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
         (SELECT count(DISTINCT l_orderkey) FROM lineitem
          WHERE l_orderkey IS NOT NULL) AS n_child_keys,
         (SELECT count(DISTINCT o_orderkey) FROM orders
          WHERE o_orderkey IS NOT NULL) AS n_parent_keys,
         (SELECT count(*) FROM
            (SELECT DISTINCT l_orderkey AS k FROM lineitem
             WHERE l_orderkey IS NOT NULL) c
          WHERE k IN (SELECT o_orderkey FROM orders)) AS n_matched
  UNION ALL
  SELECT 'lineitem.l_partkey->part.p_partkey',
         (SELECT count(DISTINCT l_partkey) FROM lineitem
          WHERE l_partkey IS NOT NULL),
         (SELECT count(DISTINCT p_partkey) FROM part
          WHERE p_partkey IS NOT NULL),
         (SELECT count(*) FROM
            (SELECT DISTINCT l_partkey AS k FROM lineitem
             WHERE l_partkey IS NOT NULL) c
          WHERE k IN (SELECT p_partkey FROM part))
  UNION ALL
  SELECT 'orders.o_custkey->customer.c_custkey',
         (SELECT count(DISTINCT o_custkey) FROM orders
          WHERE o_custkey IS NOT NULL),
         (SELECT count(DISTINCT c_custkey) FROM customer
          WHERE c_custkey IS NOT NULL),
         (SELECT count(*) FROM
            (SELECT DISTINCT o_custkey AS k FROM orders
             WHERE o_custkey IS NOT NULL) c
          WHERE k IN (SELECT c_custkey FROM customer))
  UNION ALL
  SELECT 'part.p_partkey->customer.c_custkey',
         (SELECT count(DISTINCT p_partkey) FROM part
          WHERE p_partkey IS NOT NULL),
         (SELECT count(DISTINCT c_custkey) FROM customer
          WHERE c_custkey IS NOT NULL),
         (SELECT count(*) FROM
            (SELECT DISTINCT p_partkey AS k FROM part
             WHERE p_partkey IS NOT NULL) c
          WHERE k IN (SELECT c_custkey FROM customer))
)
SELECT relation,
       CAST(n_child_keys AS BIGINT) AS n_child_keys,
       CAST(n_parent_keys AS BIGINT) AS n_parent_keys,
       CAST(n_matched AS BIGINT) AS n_matched,
       CASE WHEN n_child_keys > 0 THEN
         CAST(n_matched AS DOUBLE) / CAST(n_child_keys AS DOUBLE)
       END AS containment
FROM rel
"""
    # functional-dependency discovery: NULL-aware distinct dependents
    sqls["fd_discovery"] = """
WITH f1 AS (
  SELECT count(DISTINCT l_partkey)
           + max(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS nd
  FROM lineitem GROUP BY l_orderkey, l_linenumber
),
f2 AS (
  SELECT count(DISTINCT l_linestatus)
           + max(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS nd
  FROM lineitem GROUP BY l_orderkey
),
f3 AS (
  SELECT count(DISTINCT o_orderpriority)
           + max(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nd
  FROM orders GROUP BY o_custkey
),
rolled AS (
  SELECT 'lineitem(l_orderkey,l_linenumber)->l_partkey' AS relation,
         count(*) AS n_groups,
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating,
         max(nd) AS max_fanout
  FROM f1
  UNION ALL
  SELECT 'lineitem.l_orderkey->l_linestatus', count(*),
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), max(nd) FROM f2
  UNION ALL
  SELECT 'orders.o_custkey->o_orderpriority', count(*),
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), max(nd) FROM f3
)
SELECT relation,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(n_violating AS BIGINT) AS n_violating,
       CAST(max_fanout AS BIGINT) AS max_fanout,
       CASE WHEN n_groups > 0 THEN
         CAST(n_violating AS DOUBLE) / CAST(n_groups AS DOUBLE)
       END AS violation_rate,
       CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS INT) AS holds
FROM rolled
"""
    # the drift grid's second statistic: exact inverse-CDF quantiles
    # of everything drained (population = A union B)
    sqls["stream_quantiles"] = """
WITH v AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM lineitem
),
per AS (SELECT c, count(*) AS cnt FROM v GROUP BY c),
cum AS (SELECT c, sum(cnt) OVER (ORDER BY c) AS cm FROM per),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
p AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
SELECT CAST(pct AS INT) AS pct,
       n,
       (SELECT CAST(min(c) AS BIGINT) FROM cum
        WHERE cm >= (n * pct + 99) // 100) AS value
FROM p, tot
"""
    # pooled two-proportion z: the SAME IEEE tree as
    # operators/evaluation.py:two_proportion_ztest
    sqls["ab_test_purchase"] = """
WITH e AS (
  SELECT user_id % 2 AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
),
a AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 0 THEN label ELSE 0 END) AS BIGINT) AS pos_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN arm = 1 THEN label ELSE 0 END) AS BIGINT) AS pos_b
  FROM e
)
SELECT n_a, pos_a, n_b, pos_b,
       CAST(pos_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
       CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
       (CAST(pos_a AS DOUBLE) / CAST(n_a AS DOUBLE))
         - (CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS diff,
       CASE WHEN n_a > 0 AND n_b > 0 AND pos_a + pos_b > 0
                 AND pos_a + pos_b < n_a + n_b THEN
         ((CAST(pos_a AS DOUBLE) / CAST(n_a AS DOUBLE))
           - (CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
         / sqrt((CAST(pos_a + pos_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                * (1.0 - (CAST(pos_a + pos_b AS DOUBLE)
                          / CAST(n_a + n_b AS DOUBLE)))
                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
       END AS z
FROM a
"""
    # first-order Markov backtest: argmax transitions on pre-cutoff
    # pairs, top-1 accuracy on post-cutoff pairs
    sqls["markov_backtest"] = """
WITH p0 AS (
  SELECT event_type AS from_type, epoch_us(ts) AS ts_us,
         lead(event_type) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) AS to_type
  FROM events
),
pairs AS (SELECT * FROM p0 WHERE to_type IS NOT NULL),
grid AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE ts_us < 1705881600000000 GROUP BY 1, 2
),
model AS (
  SELECT from_type, to_type AS predicted
  FROM (SELECT *, row_number() OVER (PARTITION BY from_type
          ORDER BY n DESC, to_type) AS r FROM grid)
  WHERE r = 1
),
test AS (SELECT * FROM pairs WHERE ts_us >= 1705881600000000)
SELECT t.from_type, m.predicted,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(COALESCE(sum(CASE WHEN t.to_type = m.predicted THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_hits,
       CAST(COALESCE(sum(CASE WHEN t.to_type = m.predicted THEN 1 ELSE 0 END), 0)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
FROM test t LEFT JOIN model m ON t.from_type = m.from_type
GROUP BY t.from_type, m.predicted
"""
    # quantized-IPW debiased hit rate over the rec_hitrate fold
    sqls["ipw_hitrate"] = """
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
),
hits AS (
  SELECT e.query_item_id,
         CAST(count(*) AS BIGINT) AS n_recs,
         CAST(sum(CASE WHEN t.qi IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM exploded e
  LEFT JOIN truth t ON e.query_item_id = t.qi AND e.rec_item = t.ri
  GROUP BY e.query_item_id
),
pop AS (SELECT i AS item_id, CAST(count(DISTINCT u) AS BIGINT) AS pop FROM m GROUP BY i),
j AS (
  SELECT COALESCE(p.pop, 1) AS pop, h.n_hits, h.n_recs
  FROM hits h LEFT JOIN pop p ON h.query_item_id = p.item_id
),
w AS (
  SELECT pop, n_hits, n_recs,
         CAST(1000000 AS BIGINT) // greatest(pop, 1) AS wt
  FROM j
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(wt * n_hits) AS BIGINT) AS sum_w_num,
       CAST(sum(wt * n_recs) AS BIGINT) AS sum_w_den,
       CASE WHEN sum(wt * n_recs) > 0 THEN
         CAST(sum(wt * n_hits) AS DOUBLE) / CAST(sum(wt * n_recs) AS DOUBLE)
       END AS weighted_ratio,
       CASE WHEN sum(n_recs) > 0 THEN
         CAST(sum(n_hits) AS DOUBLE) / CAST(sum(n_recs) AS DOUBLE)
       END AS raw_ratio
FROM w
"""
    # skyline: independent NOT-EXISTS dominance formulation — must
    # agree exactly with the running-min-window implementation
    sqls["pareto_skyline"] = """
WITH pts AS (
  SELECT CAST(p_size AS BIGINT) AS size,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM part
),
cells AS (
  SELECT size, cents, CAST(count(*) AS BIGINT) AS n_at_point
  FROM pts GROUP BY size, cents
),
cand AS (
  SELECT p.size, p.min_cents, c.n_at_point, p.n_at_x
  FROM (
    SELECT size, min(cents) AS min_cents,
           CAST(sum(n_at_point) AS BIGINT) AS n_at_x
    FROM cells GROUP BY size
  ) p JOIN cells c ON p.size = c.size AND p.min_cents = c.cents
)
SELECT size, min_cents, n_at_point, n_at_x
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM cand d
  WHERE d.size > c.size AND d.min_cents <= c.min_cents
)
"""
    # PSI: identical fixed IEEE tree ((diff/(na*nb)) * ln * scale,
    # floored) over exact HUGEINT cross-products — quanta sum exactly
    sqls["psi_drift"] = """
WITH li AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           // 100000 AS bin,
         l_returnflag = 'R' AS ia
  FROM lineitem
),
cells AS (
  SELECT bin,
         sum(CASE WHEN ia THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN NOT ia THEN 1 ELSE 0 END) AS b
  FROM li GROUP BY bin
),
tot AS (SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b
        FROM cells),
g AS (
  SELECT a, b, n_a, n_b,
         CASE WHEN a > 0 AND b > 0 THEN
           CAST(floor(
             (CAST(CAST(a AS HUGEINT) * n_b - CAST(b AS HUGEINT) * n_a
                   AS DOUBLE)
              / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
             * ln((CAST(a AS DOUBLE) * CAST(n_b AS DOUBLE))
                  / (CAST(b AS DOUBLE) * CAST(n_a AS DOUBLE)))
             * 1000000000.0) AS BIGINT)
         ELSE 0 END AS q,
         CASE WHEN a > 0 AND b > 0 THEN 1 ELSE 0 END AS sh,
         CASE WHEN b = 0 THEN a ELSE 0 END AS oa,
         CASE WHEN a = 0 THEN b ELSE 0 END AS ob
  FROM cells, tot
)
SELECT n_a, n_b,
       CAST(sum(sh) AS BIGINT) AS n_bins_shared,
       CAST(sum(q) AS DOUBLE) / 1000000000.0 AS psi,
       CAST(sum(oa) AS BIGINT) AS only_a_num,
       CAST(sum(ob) AS BIGINT) AS only_b_num
FROM g GROUP BY n_a, n_b
"""
    # bitemporal as-of: HUGEINT mirrors the decimal(38,0) (valid, tx)
    # packing — both engines argmax the identical encoded key
    sqls["bitemporal_report"] = """
WITH log AS (
  SELECT o_custkey AS cust,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lv,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           + (o_orderkey % 7) AS ltx,
         o_orderpriority AS prio
  FROM orders
),
facts AS (
  SELECT o_custkey AS cust, o_orderkey AS fid,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS fv,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 10 AS ft
  FROM orders WHERE o_orderstatus = 'F'
),
cands AS (
  SELECT f.fid, l.prio, l.lv, l.ltx,
         CAST(l.lv AS HUGEINT) * CAST('10000000000000000000' AS HUGEINT)
           + CAST(l.ltx AS HUGEINT) AS enc
  FROM facts f JOIN log l
    ON f.cust = l.cust AND l.ltx <= f.ft AND l.lv <= f.fv
),
best AS (SELECT fid, max(enc) AS b FROM cands GROUP BY fid),
picked AS (
  SELECT c.prio, c.lv, c.ltx
  FROM cands c JOIN best ON c.fid = best.fid AND c.enc = best.b
)
SELECT prio, CAST(count(*) AS BIGINT) AS n_facts,
       CAST(sum(ltx - lv) AS BIGINT) AS sum_lag_days
FROM picked GROUP BY 1
"""
    # the materialized-shingle Jaccard is result-identical to the
    # recompute form — same oracle pins both physical strategies
    sqls["ngram_jaccard_materialized"] = sqls["ngram_jaccard_pairs"]
    # the stream-maintained KS grid must reproduce the batch statistic
    sqls["stream_ks_drift"] = sqls["ks_drift"]
    # materialized line dedup is result-identical to the recompute form
    sqls["line_dedup_materialized"] = sqls["line_dedup"]
    # the persisted-index IVF probe serves the same results as in-plan
    sqls["embedding_decontaminate"] = f"""
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
ho AS (SELECT v AS hv FROM e WHERE id % 50 = 0),
scored AS (
  SELECT e.id, {_COSINE.format(a='e.v', b='ho.hv')} AS s
  FROM e, ho
),
hits AS (
  SELECT id,
         CAST(sum(CASE WHEN s >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
         max(s) AS max_cosine
  FROM scored GROUP BY id
)
SELECT e.id, COALESCE(h.n_hits, 0) AS n_hits, h.max_cosine,
       COALESCE(h.n_hits, 0) = 0 AS keep
FROM e LEFT JOIN hits h USING (id)
"""
    sqls["sq8_cosine_topk"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
nr AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
cd AS (
  SELECT id,
         CASE WHEN nrm > 0
              THEN list_transform(v, x -> CAST(floor(127.0 * x / nrm) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS codes
  FROM nr
),
q AS (SELECT id AS q_id, codes AS qc FROM cd WHERE id % 50 = 0),
s AS (
  SELECT q.q_id, c.id AS n_id,
         CAST(list_dot_product(c.codes, q.qc) AS BIGINT) AS qdot
  FROM cd c, q WHERE c.id <> q.q_id
)
SELECT q_id, n_id, rank, qdot FROM (
  SELECT q_id, n_id,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY qdot DESC, n_id) AS BIGINT) AS rank,
         qdot
  FROM s
) WHERE rank <= 5
"""
    # MaxSim late interaction: exact int dots on the floor(v*1e6) grid
    # are <= 64 * (6e5)^2 ~ 2.3e13 and 8-token sums <= 1.9e14 — both
    # exactly representable integers in DuckDB's DOUBLE accumulation
    # (< 2^53), so list_dot_product replays Spark's int64 dot bit-for-bit
    sqls["maxsim_multivector"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
tok AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
  FROM e
),
q AS (SELECT doc_id AS q_id, tok AS q_tok, qv AS q_qv
      FROM tok WHERE doc_id % 10 = 0),
pairs AS (
  SELECT t.doc_id, q.q_id, q.q_tok,
         CAST(list_dot_product(t.qv, q.q_qv) AS BIGINT) AS dot
  FROM tok t, q
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
scores AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
)
SELECT q_id, doc_id, rank, score FROM (
  SELECT q_id, doc_id,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         score
  FROM scores WHERE doc_id <> q_id
) WHERE rank <= 5
"""
    # full serving stack: token-level SQ8-cosine probe (unit codes,
    # k=10 per query token) -> parent-doc candidates -> exact MaxSim
    sqls["maxsim_ann_pipeline"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
nr AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
cd AS (
  SELECT id,
         CASE WHEN nrm > 0
              THEN list_transform(v, x -> CAST(floor(127.0 * x / nrm) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS codes
  FROM nr
),
qc AS (SELECT id AS q_tok_id, codes AS qcodes FROM cd
       WHERE CAST(id // 8 AS BIGINT) % 10 = 0),
tokscore AS (
  SELECT q.q_tok_id, c.id AS n_tok_id,
         CAST(list_dot_product(c.codes, q.qcodes) AS BIGINT) AS qdot
  FROM cd c, qc q WHERE c.id <> q.q_tok_id
),
tokhits AS (
  SELECT q_tok_id, n_tok_id FROM (
    SELECT q_tok_id, n_tok_id,
           row_number() OVER (PARTITION BY q_tok_id
             ORDER BY qdot DESC, n_tok_id) AS rn
    FROM tokscore
  ) WHERE rn <= 10
),
cand AS (
  SELECT DISTINCT CAST(q_tok_id // 8 AS BIGINT) AS q_id,
                  CAST(n_tok_id // 8 AS BIGINT) AS doc_id
  FROM tokhits
  WHERE CAST(q_tok_id // 8 AS BIGINT) <> CAST(n_tok_id // 8 AS BIGINT)
),
tokq AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
  FROM e
),
qt AS (SELECT doc_id AS q_id, tok AS q_tok, qv AS q_qv
       FROM tokq WHERE doc_id % 10 = 0),
pairs AS (
  SELECT c.doc_id, c.q_id, qt.q_tok,
         CAST(list_dot_product(t.qv, qt.q_qv) AS BIGINT) AS dot
  FROM cand c
  JOIN tokq t ON t.doc_id = c.doc_id
  JOIN qt ON qt.q_id = c.q_id
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
scores AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
)
SELECT q_id, doc_id,
       CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       score
FROM scores
"""
    # multi-vector near-dup: 6-bit RP-LSH token blocking (symmetric by
    # construction), directed MaxSim over candidate (q, doc) pairs,
    # conservative min-symmetrization, global top-20
    sqls["maxsim_neardup"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
edim AS (
  SELECT id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
dots AS (
  SELECT id,
         sum(iv * (((dim + 1) * 12345) % 2001 - 1000)) AS d0,
         sum(iv * (((dim + 1) * 21521) % 2001 - 1000)) AS d1,
         sum(iv * (((dim + 1) * 30697) % 2001 - 1000)) AS d2,
         sum(iv * (((dim + 1) * 39873) % 2001 - 1000)) AS d3,
         sum(iv * (((dim + 1) * 49049) % 2001 - 1000)) AS d4,
         sum(iv * (((dim + 1) * 58225) % 2001 - 1000)) AS d5
  FROM edim GROUP BY id
),
bk AS (SELECT id,
         (CASE WHEN d0 >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN d1 >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN d2 >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN d3 >= 0 THEN 8 ELSE 0 END)
       + (CASE WHEN d4 >= 0 THEN 16 ELSE 0 END)
       + (CASE WHEN d5 >= 0 THEN 32 ELSE 0 END) AS bucket
       FROM dots),
cand AS (
  SELECT DISTINCT CAST(a.id // 8 AS BIGINT) AS q_id,
                  CAST(b.id // 8 AS BIGINT) AS doc_id
  FROM bk a JOIN bk b ON a.bucket = b.bucket
  WHERE CAST(a.id // 8 AS BIGINT) <> CAST(b.id // 8 AS BIGINT)
),
tokq AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
  FROM e
),
pairs AS (
  SELECT c.doc_id, c.q_id, qt.tok AS q_tok,
         CAST(list_dot_product(t.qv, qt.qv) AS BIGINT) AS dot
  FROM cand c
  JOIN tokq t ON t.doc_id = c.doc_id
  JOIN tokq qt ON qt.doc_id = c.q_id
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
directed AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
),
ab AS (SELECT q_id AS id_a, doc_id AS id_b, score AS score_ab
       FROM directed WHERE q_id < doc_id),
ba AS (SELECT doc_id AS id_a, q_id AS id_b, score AS score_ba
       FROM directed WHERE q_id > doc_id),
sym AS (
  SELECT ab.id_a, ab.id_b, ab.score_ab, ba.score_ba,
         CAST(row_number() OVER (
           ORDER BY least(ab.score_ab, ba.score_ba) DESC,
                    ab.id_a, ab.id_b) AS BIGINT) AS sym_rank
  FROM ab JOIN ba ON ab.id_a = ba.id_a AND ab.id_b = ba.id_b
)
SELECT id_a, id_b, score_ab, score_ba, sym_rank
FROM sym WHERE sym_rank <= 20
"""
    # anisotropic-fixture variant: the clustered transform is exact
    # int64 centroid arithmetic + two IEEE double mul-adds, replayed
    # per-dim; auto_n_bits(500, 8) = 6 at both gate SFs, so the
    # static SQL unrolls 6 signature bits (sf0.1 is a scale
    # measurement, not an oracle gate — the Spark side auto-sizes)
    sqls["maxsim_neardup_clustered"] = """
WITH e0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
ed AS (
  SELECT id, CAST(u.i - 1 AS BIGINT) AS dim,
         (CAST((((id // 32) + 1) * ((u.i - 1) + 7) * 1103515245) % 2001
               - 1000 AS DOUBLE) / 1000.0) * 0.75
         + v[u.i] * 0.25 AS cv
  FROM e0, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
edim AS (
  SELECT id, dim, CAST(floor(cv * 1000000.0) AS BIGINT) AS iv FROM ed
),
dots AS (
  SELECT id,
         sum(iv * (((dim + 1) * 12345) % 2001 - 1000)) AS d0,
         sum(iv * (((dim + 1) * 21521) % 2001 - 1000)) AS d1,
         sum(iv * (((dim + 1) * 30697) % 2001 - 1000)) AS d2,
         sum(iv * (((dim + 1) * 39873) % 2001 - 1000)) AS d3,
         sum(iv * (((dim + 1) * 49049) % 2001 - 1000)) AS d4,
         sum(iv * (((dim + 1) * 58225) % 2001 - 1000)) AS d5
  FROM edim GROUP BY id
),
bk AS (SELECT id,
         (CASE WHEN d0 >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN d1 >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN d2 >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN d3 >= 0 THEN 8 ELSE 0 END)
       + (CASE WHEN d4 >= 0 THEN 16 ELSE 0 END)
       + (CASE WHEN d5 >= 0 THEN 32 ELSE 0 END) AS bucket
       FROM dots),
cand AS (
  SELECT DISTINCT CAST(a.id // 8 AS BIGINT) AS q_id,
                  CAST(b.id // 8 AS BIGINT) AS doc_id
  FROM bk a JOIN bk b ON a.bucket = b.bucket
  WHERE CAST(a.id // 8 AS BIGINT) <> CAST(b.id // 8 AS BIGINT)
),
tokq AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list(CAST(floor(cv * 1000000.0) AS BIGINT) ORDER BY dim) AS qv
  FROM ed GROUP BY 1, 2
),
pairs AS (
  SELECT c.doc_id, c.q_id, qt.tok AS q_tok,
         CAST(list_dot_product(t.qv, qt.qv) AS BIGINT) AS dot
  FROM cand c
  JOIN tokq t ON t.doc_id = c.doc_id
  JOIN tokq qt ON qt.doc_id = c.q_id
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
directed AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
),
ab AS (SELECT q_id AS id_a, doc_id AS id_b, score AS score_ab
       FROM directed WHERE q_id < doc_id),
ba AS (SELECT doc_id AS id_a, q_id AS id_b, score AS score_ba
       FROM directed WHERE q_id > doc_id),
sym AS (
  SELECT ab.id_a, ab.id_b, ab.score_ab, ba.score_ba,
         CAST(row_number() OVER (
           ORDER BY least(ab.score_ab, ba.score_ba) DESC,
                    ab.id_a, ab.id_b) AS BIGINT) AS sym_rank
  FROM ab JOIN ba ON ab.id_a = ba.id_a AND ab.id_b = ba.id_b
)
SELECT id_a, id_b, score_ab, score_ba, sym_rank
FROM sym WHERE sym_rank <= 20
"""
    # two-stage retrieve-then-rerank: pooled per-dim int sums (<= 8·6e5
    # per dim; pooled dots <= 1.5e15 — still exact-integer DOUBLEs),
    # top-20 by pooled dot, exact MaxSim over exactly those pairs
    sqls["maxsim_rerank"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
tokq AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
  FROM e
),
dimsum AS (
  SELECT doc_id, u.i AS dim, CAST(sum(qv[u.i]) AS BIGINT) AS s
  FROM tokq, LATERAL (SELECT unnest(range(1, len(qv) + 1)) AS i) u
  GROUP BY doc_id, u.i
),
pooled AS (
  SELECT doc_id, list(s ORDER BY dim) AS pv FROM dimsum GROUP BY doc_id
),
qp AS (SELECT doc_id AS q_id, pv AS q_pv FROM pooled WHERE doc_id % 10 = 0),
cand AS (
  SELECT q_id, doc_id FROM (
    SELECT p.doc_id, qp.q_id,
           row_number() OVER (PARTITION BY qp.q_id
             ORDER BY CAST(list_dot_product(p.pv, qp.q_pv) AS BIGINT) DESC,
                      p.doc_id) AS rn
    FROM pooled p, qp WHERE p.doc_id <> qp.q_id
  ) WHERE rn <= 20
),
qt AS (SELECT doc_id AS q_id, tok AS q_tok, qv AS q_qv
       FROM tokq WHERE doc_id % 10 = 0),
pairs AS (
  SELECT c.doc_id, c.q_id, qt.q_tok,
         CAST(list_dot_product(t.qv, qt.q_qv) AS BIGINT) AS dot
  FROM cand c
  JOIN tokq t ON t.doc_id = c.doc_id
  JOIN qt ON qt.q_id = c.q_id
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
scores AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
)
SELECT q_id, doc_id,
       CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       score
FROM scores
"""
    # refined IVF: every centroid coordinate (seed and both Lloyd
    # rounds) is CAST(sum_e6 AS DOUBLE)/n — one IEEE division of two
    # exact integers, identical cross-engine; assignments replay the
    # canonical (score desc, block asc) tie-break
    sqls["ivf_refined_probe"] = f"""
WITH {_CENTROID_CTE.lstrip()},
c0 AS (
  SELECT block, list(CAST(sum_e6 AS DOUBLE) / n ORDER BY dim) AS centroid
  FROM centroid_sums GROUP BY block
),
a1 AS (
  SELECT id, v, block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC,
                      c.block) AS rn
    FROM ev, c0 c
  ) WHERE rn = 1
),
s1 AS (
  SELECT block, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(sum(CAST(floor(v[u.i] * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sum_e6,
         count(*) AS n
  FROM a1, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
  GROUP BY block, u.i
),
c1 AS (
  SELECT block, list(CAST(sum_e6 AS DOUBLE) / n ORDER BY dim) AS centroid
  FROM s1 GROUP BY block
),
a2 AS (
  SELECT id, v, block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC,
                      c.block) AS rn
    FROM ev, c1 c
  ) WHERE rn = 1
),
s2 AS (
  SELECT block, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(sum(CAST(floor(v[u.i] * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sum_e6,
         count(*) AS n
  FROM a2, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
  GROUP BY block, u.i
),
c2 AS (
  SELECT block, list(CAST(sum_e6 AS DOUBLE) / n ORDER BY dim) AS centroid
  FROM s2 GROUP BY block
),
corpus AS (
  SELECT id, v, block AS cell FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC,
                      c.block) AS rn
    FROM ev, c2 c
  ) WHERE rn = 1
),
qp AS (
  SELECT id, v, block AS cell FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC,
                      c.block) AS rn
    FROM ev, c2 c
  ) WHERE rn <= 2
),
q AS (SELECT * FROM qp WHERE id % 50 = 0),
scored AS (
  SELECT q.id AS q_id, a.id AS n_id,
         {_COSINE.format(a='q.v', b='a.v')} AS score
  FROM q JOIN corpus a ON a.cell = q.cell AND a.id <> q.id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 5
"""
    sqls["ivf_index_probe"] = sqls["ivf_probe_topk"]
    # multi-probe: identical derivation, but each QUERY keeps its top-2
    # cells (corpus assignment stays rn = 1 — a vector lives in one list)
    sqls["ivf_multiprobe"] = sqls["ivf_probe_topk"].replace(
        """q AS (SELECT * FROM assigned WHERE id % 50 = 0),""",
        """qp AS (
  SELECT id, v, block AS assigned_block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (
             PARTITION BY ev.vec_id
             ORDER BY """ + _COSINE.format(a='ev.v', b='c.centroid')
        + """ DESC, c.block
           ) AS rn
    FROM ev, centroids c
  ) WHERE rn <= 2
),
q AS (SELECT * FROM qp WHERE id % 50 = 0),""",
    )
    # HNSW-style graph ANN: the oracle replays BOTH the deterministic
    # two-layer build (per-block top-4 exact-int kNN edges + 2
    # cross-block hub links) and the 2-round ef=6 beam search, each
    # sum CAST to BIGINT immediately (DuckDB widens sums to HUGEINT)
    sqls["hnsw_topk"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
qd AS (
  SELECT id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
dots AS (
  SELECT id,
         sum(iv * (((dim + 1) * 12345) % 2001 - 1000)) AS d0,
         sum(iv * (((dim + 1) * 21521) % 2001 - 1000)) AS d1,
         sum(iv * (((dim + 1) * 30697) % 2001 - 1000)) AS d2,
         sum(iv * (((dim + 1) * 39873) % 2001 - 1000)) AS d3,
         sum(iv * (((dim + 1) * 49049) % 2001 - 1000)) AS d4,
         sum(iv * (((dim + 1) * 58225) % 2001 - 1000)) AS d5,
         sum(iv * (((dim + 1) * 67401) % 2001 - 1000)) AS d6,
         sum(iv * (((dim + 1) * 76577) % 2001 - 1000)) AS d7,
         sum(iv * (((dim + 1) * 85753) % 2001 - 1000)) AS d8,
         sum(iv * (((dim + 1) * 94929) % 2001 - 1000)) AS d9,
         sum(iv * (((dim + 1) * 104105) % 2001 - 1000)) AS d10,
         sum(iv * (((dim + 1) * 113281) % 2001 - 1000)) AS d11,
         sum(iv * (((dim + 1) * 122457) % 2001 - 1000)) AS d12,
         sum(iv * (((dim + 1) * 131633) % 2001 - 1000)) AS d13,
         sum(iv * (((dim + 1) * 140809) % 2001 - 1000)) AS d14,
         sum(iv * (((dim + 1) * 149985) % 2001 - 1000)) AS d15
  FROM qd GROUP BY id
),
bk AS (
  SELECT id,
       CAST((CASE WHEN d0 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d1 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d2 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d3 >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS t0,
       CAST((CASE WHEN d4 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d5 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d6 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d7 >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS t1,
       CAST((CASE WHEN d8 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d9 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d10 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d11 >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS t2,
       CAST((CASE WHEN d12 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d13 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d14 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d15 >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS t3
  FROM dots
),
cand AS (
  SELECT a.id AS src, b.id AS dst
  FROM bk a JOIN bk b ON b.t0 = a.t0 AND b.id <> a.id
  UNION
  SELECT a.id AS src, b.id AS dst
  FROM bk a JOIN bk b ON b.t1 = a.t1 AND b.id <> a.id
  UNION
  SELECT a.id AS src, b.id AS dst
  FROM bk a JOIN bk b ON b.t2 = a.t2 AND b.id <> a.id
  UNION
  SELECT a.id AS src, b.id AS dst
  FROM bk a JOIN bk b ON b.t3 = a.t3 AND b.id <> a.id
),
cd AS (
  SELECT c.src, c.dst, CAST(sum(qa.iv * qb.iv) AS BIGINT) AS qdot
  FROM cand c JOIN qd qa ON qa.id = c.src
  JOIN qd qb ON qb.id = c.dst AND qb.dim = qa.dim
  GROUP BY 1, 2
),
out_m AS (
  SELECT src, dst, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY src ORDER BY qdot DESC, dst) AS rn
    FROM cd) WHERE rn <= 12
),
sym AS (SELECT src, dst, qdot FROM out_m
        UNION SELECT dst, src, qdot FROM out_m),
loc_e AS (
  SELECT src, dst FROM (
    SELECT *, row_number() OVER (PARTITION BY src ORDER BY qdot DESC, dst) AS rn
    FROM sym) WHERE rn <= 24
),
hubs AS (
  SELECT 0 AS htab, t0 AS hblk, min(id) AS hub FROM bk GROUP BY 2
  UNION ALL SELECT 1, t1, min(id) FROM bk GROUP BY 2
  UNION ALL SELECT 2, t2, min(id) FROM bk GROUP BY 2
  UNION ALL SELECT 3, t3, min(id) FROM bk GROUP BY 2
),
uhubs AS (SELECT DISTINCT hub FROM hubs),
crossp AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a.id AS src, h.hub AS dst
    FROM bk a JOIN hubs h ON h.htab = 0 AND h.hblk <> a.t0
    UNION ALL SELECT a.id, h.hub
    FROM bk a JOIN hubs h ON h.htab = 1 AND h.hblk <> a.t1
    UNION ALL SELECT a.id, h.hub
    FROM bk a JOIN hubs h ON h.htab = 2 AND h.hblk <> a.t2
    UNION ALL SELECT a.id, h.hub
    FROM bk a JOIN hubs h ON h.htab = 3 AND h.hblk <> a.t3
  )
),
crossd AS (
  SELECT c.src, c.dst, CAST(sum(qa.iv * qb.iv) AS BIGINT) AS qdot
  FROM crossp c JOIN qd qa ON qa.id = c.src
  JOIN qd qb ON qb.id = c.dst AND qb.dim = qa.dim
  GROUP BY 1, 2
),
cross_e AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY qdot DESC, dst) AS rn
    FROM crossd) WHERE rn <= 2
),
edges AS (SELECT src, dst FROM loc_e UNION SELECT src, dst FROM cross_e),
qs AS (SELECT id, dim, iv FROM qd WHERE id % 50 = 0),
b0s AS (
  SELECT q.id AS q_id, h.hub AS n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM qs q JOIN uhubs h ON TRUE
  JOIN qd n ON n.id = h.hub AND n.dim = q.dim
  GROUP BY 1, 2
),
beam0 AS (
  SELECT q_id, n_id, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn FROM b0s) WHERE rn <= 16
),
exp1 AS (SELECT DISTINCT b.q_id, ed.dst AS n_id
         FROM beam0 b JOIN edges ed ON ed.src = b.n_id),
sc1 AS (
  SELECT x.q_id, x.n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM exp1 x JOIN qs q ON q.id = x.q_id
  JOIN qd n ON n.id = x.n_id AND n.dim = q.dim
  GROUP BY 1, 2
),
m1 AS (SELECT q_id, n_id, CAST(max(qdot) AS BIGINT) AS qdot
       FROM (SELECT * FROM beam0 UNION ALL SELECT * FROM sc1)
       GROUP BY 1, 2),
beam1 AS (
  SELECT q_id, n_id, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn FROM m1) WHERE rn <= 16
),
exp2 AS (SELECT DISTINCT b.q_id, ed.dst AS n_id
         FROM beam1 b JOIN edges ed ON ed.src = b.n_id),
sc2 AS (
  SELECT x.q_id, x.n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM exp2 x JOIN qs q ON q.id = x.q_id
  JOIN qd n ON n.id = x.n_id AND n.dim = q.dim
  GROUP BY 1, 2
),
m2 AS (SELECT q_id, n_id, CAST(max(qdot) AS BIGINT) AS qdot
       FROM (SELECT * FROM beam1 UNION ALL SELECT * FROM sc2)
       GROUP BY 1, 2),
beam2 AS (
  SELECT q_id, n_id, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn FROM m2) WHERE rn <= 16
),
exp3 AS (SELECT DISTINCT b.q_id, ed.dst AS n_id
         FROM beam2 b JOIN edges ed ON ed.src = b.n_id),
sc3 AS (
  SELECT x.q_id, x.n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM exp3 x JOIN qs q ON q.id = x.q_id
  JOIN qd n ON n.id = x.n_id AND n.dim = q.dim
  GROUP BY 1, 2
),
m3 AS (SELECT q_id, n_id, CAST(max(qdot) AS BIGINT) AS qdot
       FROM (SELECT * FROM beam2 UNION ALL SELECT * FROM sc3)
       GROUP BY 1, 2),
beam3 AS (
  SELECT q_id, n_id, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn FROM m3) WHERE rn <= 16
)
SELECT q_id, n_id, rank, qdot FROM (
  SELECT q_id, n_id,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY qdot DESC, n_id) AS BIGINT) AS rank,
         qdot
  FROM beam3 WHERE n_id <> q_id
) WHERE rank <= 5
"""
    # streaming law: maintained edges == the batch out_m stage of the
    # hnsw pyramid above (prefix reuse, new final select)
    _hnsw_outm_prefix = sqls["hnsw_topk"].split(
        "\nsym AS (SELECT src, dst, qdot FROM out_m"
    )[0].rstrip().rstrip(",")
    sqls["stream_hnsw_edges"] = (
        _hnsw_outm_prefix + "\nSELECT src, dst, qdot FROM out_m\n"
    )
    # compaction must be invisible to the assembled edge set: same law,
    # same oracle (build via two folds + compact instead of a stream)
    sqls["hnsw_compact"] = sqls["stream_hnsw_edges"]
    # recall@5 of the beam search vs the EXACT quantized-int top-5 —
    # shares the whole build+search pyramid above, adds the exact
    # ground truth and the per-query intersection count
    _hnsw_prefix = sqls["hnsw_topk"].split(
        "SELECT q_id, n_id, rank, qdot FROM ("
    )[0]
    sqls["hnsw_recall"] = _hnsw_prefix + """, hn AS (
  SELECT q_id, n_id FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn
    FROM beam3 WHERE n_id <> q_id) WHERE rn <= 5
),
exact_s AS (
  SELECT q.id AS q_id, n.id AS n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM qs q JOIN qd n ON n.dim = q.dim AND n.id <> q.id
  GROUP BY 1, 2
),
exact5 AS (
  SELECT q_id, n_id FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn
    FROM exact_s) WHERE rn <= 5
)
SELECT e.q_id,
       CAST(count(h.n_id) AS BIGINT) AS n_hits,
       CAST(count(h.n_id) AS BIGINT) / 5.0 AS recall_at_5
FROM exact5 e LEFT JOIN hn h ON h.q_id = e.q_id AND h.n_id = e.n_id
GROUP BY 1
"""
    # likewise the two-stage partial top-k vs the window form
    sqls["ann_topk_partial"] = sqls["ann_topk"]
    # LSH-prefiltered variant (VERDICT r7 item 3): same verdict, but
    # only corpus rows sharing >=1 of the 4 RP-LSH table buckets with
    # a held-out row are scored. The oracle REPLAYS the prefilter
    # (the hnsw signature CTEs, identical hyperplane constants) so
    # Spark and DuckDB agree bit-for-bit even where the prefilter
    # trades away a non-candidate's sub-threshold max_cosine.
    _bk_prefix = (
        sqls["hnsw_topk"].split("\ncand AS (")[0].rstrip().rstrip(",")
    )
    sqls["embedding_decontaminate_lsh"] = _bk_prefix + f""",
ho AS (SELECT v AS hv FROM e WHERE id % 50 = 0),
cands AS (
  SELECT a.id FROM bk a
  WHERE EXISTS (SELECT 1 FROM bk h WHERE h.id % 50 = 0 AND
        (h.t0 = a.t0 OR h.t1 = a.t1 OR h.t2 = a.t2 OR h.t3 = a.t3))
),
scored AS (
  SELECT c.id, {_COSINE.format(a='ev.v', b='ho.hv')} AS s
  FROM cands c JOIN e ev ON ev.id = c.id, ho
),
hits AS (
  SELECT id,
         CAST(sum(CASE WHEN s >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
         max(s) AS max_cosine
  FROM scored GROUP BY id
)
SELECT e.id, COALESCE(h.n_hits, 0) AS n_hits, h.max_cosine,
       COALESCE(h.n_hits, 0) = 0 AS keep
FROM e LEFT JOIN hits h USING (id)
"""
    # merge_upsert == FULL OUTER JOIN + clause CASEs (update when
    # matched, insert when source-only, keep when target-only)
    sqls["merge_upsert"] = """
WITH t AS (
  SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS nk,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
  FROM customer
),
rev AS (
  SELECT o_custkey AS k, CAST(o_custkey % 25 AS BIGINT) AS nk,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS bal_cents
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998 GROUP BY 1
),
s AS (
  SELECT * FROM rev
  UNION ALL
  SELECT k + 10000000, nk, bal_cents FROM rev
)
SELECT COALESCE(t.k, s.k) AS k,
       CASE WHEN s.k IS NOT NULL THEN s.nk ELSE t.nk END AS nk,
       CASE WHEN s.k IS NOT NULL THEN s.bal_cents ELSE t.bal_cents
            END AS bal_cents
FROM t FULL OUTER JOIN s ON t.k = s.k
"""
    # variant drift scan == relational reconstruction of the fixture
    sqls["variant_drift_scan"] = """
WITH n AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
k AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part)
SELECT
  CASE WHEN k % 10 = 0 OR k % 3 = 0
            OR NOT (k % 17 = 0) THEN CAST(k AS VARCHAR) END AS item_id,
  CASE WHEN k % 10 <> 0 AND (k % 3 = 0 OR k % 17 <> 0)
       THEN CAST(2 AS BIGINT) END AS n_recs,
  CASE WHEN k % 10 <> 0 AND (k % 3 = 0 OR k % 17 <> 0)
       THEN CAST((k + 1) % n.n AS VARCHAR) END AS first_rec,
  CASE WHEN k % 10 = 0 THEN 'ITEM_NOT_IN_DATASET' END AS error,
  CASE WHEN k % 10 = 0 THEN FALSE
       WHEN k % 3 = 0 THEN TRUE
       WHEN k % 17 = 0 THEN NULL
       ELSE FALSE END AS drift,
  (k % 10 <> 0 AND k % 3 <> 0 AND k % 17 = 0) AS is_corrupt
FROM k, n
"""
    # stream running stats == batch aggregate (drain-and-keep-last law)
    sqls["stream_running_stats"] = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(epoch_us(ts)) AS BIGINT) AS first_ts_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us
FROM events
GROUP BY 1
"""
    # FS linkage + kfold: identical bigint arithmetic in SQL
    sqls["linkage_fs"] = """
WITH c AS (
  SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS nk,
         c_mktsegment AS seg,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal,
         CAST(length(c_name) AS BIGINT) AS nlen
  FROM customer
),
pairs AS (
  SELECT (abs(a.bal - b.bal) <= 10000) AS agree_balband,
         (a.k % 97 = b.k % 97) AS agree_keymod,
         (a.nlen = b.nlen) AS agree_namelen
  FROM c a JOIN c b
    ON a.nk = b.nk AND a.seg = b.seg
   AND a.k // 5000 = b.k // 5000 AND a.k < b.k
),
scored AS (
  SELECT CAST(
           CASE WHEN agree_balband THEN 4169925 ELSE -3247928 END
         + CASE WHEN agree_keymod THEN 3087462 ELSE -2584963 END
         + CASE WHEN agree_namelen THEN 1222392 ELSE -1222393 END
         AS BIGINT) AS score_micro
  FROM pairs
)
SELECT CASE WHEN score_micro >= 4000000 THEN 'match'
            WHEN score_micro < 0 THEN 'non_match'
            ELSE 'possible' END AS decision,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(score_micro) AS BIGINT) AS score_sum
FROM scored GROUP BY 1
"""
    sqls["kfold_report"] = """
SELECT o_orderpriority AS priority,
       CAST(((o_custkey % 2147483647) * 48271 % 2147483647) % 5 AS INT) AS fold,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_keys
FROM orders
GROUP BY 1, 2
"""
    sqls["annotator_kappa"] = """
WITH l AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 'hot' ELSE 'cold' END AS a,
         CASE WHEN o_custkey % 3 = 0 THEN 'hot' ELSE 'cold' END AS b
  FROM orders
),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM l GROUP BY 1, 2),
na AS (SELECT a, sum(c) AS na FROM cells GROUP BY 1),
nb AS (SELECT b, sum(c) AS nb FROM cells GROUP BY 1),
pe AS (
  SELECT CAST(COALESCE(sum(na.na * nb.nb), 0) AS BIGINT) AS pe_num
  FROM na JOIN nb ON na.a = nb.b
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree
  FROM cells
)
SELECT n, n_agree,
       CAST(n * n_agree - pe_num AS BIGINT) AS kappa_num,
       CAST(n * n - pe_num AS BIGINT) AS kappa_den,
       CASE WHEN n * n - pe_num <> 0
            THEN CAST(n * n_agree - pe_num AS DOUBLE)
                 / CAST(n * n - pe_num AS DOUBLE) END AS kappa
FROM tot, pe
"""
    sqls["score_ece"] = """
WITH s AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
),
bins AS (
  SELECT score // 500 AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(y) AS BIGINT) AS pos_b
  FROM s GROUP BY 1
),
agg AS (
  SELECT CAST(sum(n_b) AS BIGINT) AS n,
         CAST(sum(abs(2 * 10000 * pos_b - n_b * (2 * 500 * bin + 500)))
              AS BIGINT) AS ece_num
  FROM bins
)
SELECT n, ece_num,
       CAST(2 * 10000 * n AS BIGINT) AS ece_den,
       CASE WHEN n > 0
            THEN CAST(ece_num AS DOUBLE) / CAST(2 * 10000 * n AS DOUBLE)
       END AS ece
FROM agg
"""
    sqls["revenue_changepoint"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
pre AS (
  SELECT day, v,
         CAST(row_number() OVER w AS BIGINT) AS i,
         CAST(sum(v) OVER w AS BIGINT) AS s,
         CAST(sum(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)))
              OVER w AS DECIMAL(38,0)) AS q
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sn,
         CAST(sum(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS qn
  FROM daily
),
cand AS (
  SELECT day, i, s, q, n, sn, qn,
         (CAST(q AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(i AS DOUBLE))
         + (CAST(qn - q AS DOUBLE)
            - CAST(sn - s AS DOUBLE) * CAST(sn - s AS DOUBLE)
              / CAST(n - i AS DOUBLE)) AS cost,
         CAST(qn AS DOUBLE)
         - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)
           AS c0
  FROM pre, tot
  WHERE i < n
),
best AS (SELECT * FROM cand ORDER BY cost, day LIMIT 1)
SELECT strftime(day, '%Y-%m-%d') AS split_day,
       i AS n_left,
       CAST(n - i AS BIGINT) AS n_right,
       s AS sum_left,
       CAST(sn - s AS BIGINT) AS sum_right,
       cost,
       c0 - cost AS gain
FROM best
"""
    # incremental LSH maintenance == batch recompute (delta law)
    sqls["stream_minhash_lsh"] = sqls["minhash_lsh"]
    sqls["seasonal_decompose"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, v,
         CAST(SUM(v) OVER w AS BIGINT) AS trend_num,
         COUNT(*) OVER w AS wn,
         CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT day, v, trend_num, dow,
         CAST(7 * v - trend_num AS BIGINT) AS d
  FROM win WHERE wn = 7
),
slots AS (
  SELECT dow, CAST(SUM(d) AS BIGINT) AS seasonal_num,
         CAST(COUNT(*) AS BIGINT) AS slot_cnt
  FROM detr GROUP BY dow
)
SELECT CAST(t.day AS VARCHAR) AS day, t.v, t.trend_num, t.dow,
       s.seasonal_num, s.slot_cnt,
       -- decimal internal, BIGINT emitted: a DECIMAL in a final SELECT
       -- converts engine-dependently across DuckDB/pandas versions
       CAST(CAST(CAST(t.d AS DECIMAL(38,0)) * CAST(s.slot_cnt AS DECIMAL(38,0))
            - CAST(s.seasonal_num AS DECIMAL(38,0)) AS DECIMAL(38,0))
         AS BIGINT) AS residual_num
FROM detr t JOIN slots s USING (dow)
"""
    sqls["als_user_step"] = """
WITH ratings AS (
  SELECT CAST(o.o_custkey AS BIGINT) AS u,
         CAST(l.l_partkey AS BIGINT) AS i,
         CAST(l.l_quantity AS HUGEINT) AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
factors AS (
  SELECT i, CAST(i % 1000 AS HUGEINT) AS f1,
         CAST((i * 7 + 3) % 1000 AS HUGEINT) AS f2
  FROM (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS i FROM lineitem)
),
agg AS (
  SELECT r.u, CAST(COUNT(*) AS BIGINT) AS n_items,
         SUM(f.f1 * f.f1) AS s11, SUM(f.f1 * f.f2) AS s12,
         SUM(f.f2 * f.f2) AS s22,
         SUM(f.f1 * r.r) AS b1, SUM(f.f2 * r.r) AS b2
  FROM ratings r JOIN factors f ON r.i = f.i
  GROUP BY r.u
)
SELECT u AS user_id, n_items,
  1000.0 * (CAST((s22 + 100000) * b1 - s12 * b2 AS DOUBLE)
            / CAST((s11 + 100000) * (s22 + 100000)
                   - s12 * s12 AS DOUBLE)) AS u1,
  1000.0 * (CAST((s11 + 100000) * b2 - s12 * b1 AS DOUBLE)
            / CAST((s11 + 100000) * (s22 + 100000)
                   - s12 * s12 AS DOUBLE)) AS u2
FROM agg
"""
    sqls["shapley_attribution"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
              WHEN 'signup' THEN 4 WHEN 'error' THEN 8
              ELSE 0 END) AS BIGINT) AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
grid AS (
  SELECT mask, CAST(SUM(conv) AS BIGINT) AS n_conv
  FROM per_user GROUP BY mask
),
s_grid AS (SELECT CAST(range AS BIGINT) AS s FROM range(16)),
v AS (
  SELECT s, CAST(COALESCE(SUM(g.n_conv), 0) AS BIGINT) AS v
  FROM s_grid LEFT JOIN grid g ON (g.mask & s_grid.s) = g.mask
  GROUP BY s
),
chan AS (SELECT * FROM (VALUES (0, 'click'), (1, 'view'),
                               (2, 'signup'), (3, 'error')) t(i, channel)),
pairs AS (
  SELECT c.i, c.channel, v0.s AS s0, v0.v AS v0
  FROM chan c JOIN v v0 ON (v0.s & (1 << c.i)) = 0
),
wu AS (
  SELECT p.*, v1.v AS v1
  FROM pairs p JOIN v v1 ON v1.s = p.s0 + (1 << p.i)
)
SELECT channel,
  CAST(SUM((CASE bit_count(CAST(s0 AS BIGINT))
            WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
            WHEN 3 THEN 6 END) * (v1 - v0)) AS BIGINT) AS phi_num,
  CAST(24 AS BIGINT) AS phi_den,
  CAST(CAST(SUM((CASE bit_count(CAST(s0 AS BIGINT))
            WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
            WHEN 3 THEN 6 END) * (v1 - v0)) AS BIGINT) AS DOUBLE)
    / 24.0 AS phi
FROM wu GROUP BY channel
"""
    sqls["stream_conformal"] = """
WITH scored AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s
  FROM events WHERE event_type = 'purchase'
),
cells AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c FROM scored GROUP BY s),
ranked AS (
  SELECT s,
         CAST(SUM(c) OVER (ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM cells
),
wk AS (SELECT *, CAST((9 * (n + 1) + 9) // 10 AS BIGINT) AS k FROM ranked)
SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
       CAST(MIN(CASE WHEN cum >= k THEN s END) AS BIGINT) AS threshold
FROM wk
"""
    sqls["bpe_train"] = _bpe_oracle_sql(8)
    sqls["bpe_vocab"] = _bpe_vocab_oracle_sql(8)
    sqls["conformal_threshold"] = """
WITH scored AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s
  FROM events WHERE value IS NOT NULL
),
cells AS (
  SELECT event_type, s, CAST(COUNT(*) AS BIGINT) AS c
  FROM scored GROUP BY event_type, s
),
ranked AS (
  SELECT event_type, s,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM cells
),
with_k AS (
  SELECT *, CAST((9 * (n + 1) + 9) // 10 AS BIGINT) AS k FROM ranked
),
picked AS (
  SELECT event_type, n, k, CAST(MIN(s) AS BIGINT) AS threshold
  FROM with_k WHERE cum >= k GROUP BY event_type, n, k
),
base AS (SELECT DISTINCT event_type, n, k FROM with_k)
SELECT b.event_type, b.n, b.k, p.threshold
FROM base b LEFT JOIN picked p
  ON b.event_type = p.event_type AND b.n = p.n AND b.k = p.k
"""
    sqls["js_drift"] = """
WITH li AS (
  SELECT CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              // 100000 AS BIGINT) AS bin,
         l_returnflag
  FROM lineitem
),
cells AS (
  SELECT bin,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM li GROUP BY bin
),
tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
  FROM cells
),
terms AS (
  SELECT t.n_a, t.n_b,
    CASE WHEN c.a > 0 THEN CAST(FLOOR(
      (CAST(c.a AS DOUBLE) / CAST(t.n_a AS DOUBLE))
      * ln(CAST(CAST(CAST(2 AS DECIMAL(38,0))
                * (CAST(c.a AS DECIMAL(38,0)) * CAST(t.n_b AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS DOUBLE)
           / CAST(CAST(CAST(c.a AS DECIMAL(38,0)) * CAST(t.n_b AS DECIMAL(38,0))
                  + CAST(c.b AS DECIMAL(38,0)) * CAST(t.n_a AS DECIMAL(38,0))
                  AS DECIMAL(38,0)) AS DOUBLE))
      * 1000000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS qa,
    CASE WHEN c.b > 0 THEN CAST(FLOOR(
      (CAST(c.b AS DOUBLE) / CAST(t.n_b AS DOUBLE))
      * ln(CAST(CAST(CAST(2 AS DECIMAL(38,0))
                * (CAST(c.b AS DECIMAL(38,0)) * CAST(t.n_a AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS DOUBLE)
           / CAST(CAST(CAST(c.a AS DECIMAL(38,0)) * CAST(t.n_b AS DECIMAL(38,0))
                  + CAST(c.b AS DECIMAL(38,0)) * CAST(t.n_a AS DECIMAL(38,0))
                  AS DECIMAL(38,0)) AS DOUBLE))
      * 1000000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS qb
  FROM cells c, tot t
)
SELECT n_a, n_b, CAST(COUNT(*) AS BIGINT) AS n_bins,
       CASE WHEN n_a > 0 AND n_b > 0
         THEN CAST(SUM(qa + qb) AS DOUBLE) / 2000000000.0 END AS jsd
FROM terms GROUP BY n_a, n_b
"""
