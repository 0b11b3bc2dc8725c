"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship related-items pipeline on sf0.001.
``queries()`` exposes one named PySpark callable per implemented
operator (SURVEY.md §2) and ``oracle_sql()`` the matching DuckDB SQL.
All oracle-checked queries return FLAT primitive columns (the driver
hash-compares values column-name-sorted); nested results are flattened
or summarized (size/first/last) before returning.

Fixture derivations (both sides) live in
``amazon_personalize_connectors_spark/sources/synthetic.py`` — the SQL
CTE constants there are the single source of truth for the oracle side.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_personalize_connectors_spark.config import ConnectorConfig, PipelineConfig
from amazon_personalize_connectors_spark.operators.attribution import attribute_users
from amazon_personalize_connectors_spark.operators.decorate import (
    decorate_items,
    explode_recommendations,
)
from amazon_personalize_connectors_spark.operators.payload import (
    build_user_track_payloads,
)
from amazon_personalize_connectors_spark.operators.split import split_errors
from amazon_personalize_connectors_spark.operators.topk import limit_recommendations
from amazon_personalize_connectors_spark.plans.pipeline import (
    related_items_pipeline,
    user_personalization_pipeline,
)
from amazon_personalize_connectors_spark.sources import synthetic
from amazon_personalize_connectors_spark.sources.synthetic import (
    MAPPING_CTE,
    META_CTE,
    RECS_CTE,
    USER_RECS_CTE,
)

RUN_TS = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)

_CONNECTOR = ConnectorConfig(
    name="braze",
    item_metadata_fields=("name", "price", "category"),
    attribute_prefix="recs_",
    other_attributes={"other_attrib1": "custom"},
)

_CONFIG = PipelineConfig(
    batch_inference_path="unused",
    connectors=(_CONNECTOR,),
    perform_delta_check=False,
    job_name="flagship",
    run_datetime=RUN_TS,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full related-items pipeline (scan → split → attribution
    join → explode → decorate → ordered re-nest → stamp) on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    res = related_items_pipeline(
        synthetic.related_items_batch_inference(spark, sf_dir),
        synthetic.user_item_mapping(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    )
    return res.decorated


# ---------------------------------------------------------------------------
# helpers shared by several queries
# ---------------------------------------------------------------------------


def _ok_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ok, _ = split_errors(
        synthetic.related_items_batch_inference(spark, sf_dir), cache=False
    )
    return ok


def _decorated_related(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution + decoration, nested form (pre-stamp)."""
    return related_items_pipeline(
        synthetic.related_items_batch_inference(spark, sf_dir),
        synthetic.user_item_mapping(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    ).pre_delta


def _flatten_decorated(decorated: DataFrame, key_cols: list[str]) -> DataFrame:
    """Explode the final nested array back to flat rows for hashing."""
    return decorated.select(
        *key_cols, F.posexplode("recommendations").alias("pos", "rec")
    ).select(
        *key_cols,
        F.col("pos").cast("bigint").alias("pos"),
        F.col("rec.itemId").alias("item_id"),
        F.col("rec.name").alias("name"),
        F.col("rec.price").alias("price"),
        F.col("rec.category").alias("category"),
    )


# ---------------------------------------------------------------------------
# queries — each with a matching oracle_sql entry
# ---------------------------------------------------------------------------


def q_error_split_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 success branch: rows without error, rec-list length."""
    return _ok_recs(spark, sf_dir).select(
        F.col("input.itemId").alias("query_item_id"),
        F.size("output.recommendedItems").cast("bigint").alias("num_recs"),
    )


def q_error_split_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 error branch (K2 error sink contents)."""
    _, errors = split_errors(
        synthetic.related_items_batch_inference(spark, sf_dir), cache=False
    )
    return errors.select(
        F.col("input.itemId").alias("query_item_id"), F.col("error").alias("error")
    )


def q_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: recs ⋈ user-item mapping (fan-out to users)."""
    attributed = attribute_users(
        _ok_recs(spark, sf_dir), synthetic.user_item_mapping(spark, sf_dir)
    )
    return attributed.select(
        F.col("input.itemId").alias("query_item_id"),
        F.col("userId").alias("user_id"),
    )


def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: posexplode_outer with rank position; empty/null lists kept."""
    exploded = explode_recommendations(
        _ok_recs(spark, sf_dir), [("input.itemId", "query_item_id")]
    )
    return exploded.select(
        "query_item_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("recItemId").alias("rec_item_id"),
    )


def q_decorate_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+E1: exploded recs left-joined to item metadata (misses kept)."""
    exploded = explode_recommendations(
        _ok_recs(spark, sf_dir), [("input.itemId", "query_item_id")]
    )
    meta = synthetic.item_metadata(spark, sf_dir)
    joined = exploded.join(
        F.broadcast(meta), exploded["recItemId"] == meta["id"], "left_outer"
    )
    return joined.select(
        "query_item_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("recItemId").alias("item_id"),
        "name",
        "price",
        "category",
        "current_stock",
    )


def q_renest_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 idiomatic re-nest: per query item — list size, first and last
    element (order-sensitive summary of the nested array)."""
    decorated = decorate_items(
        _ok_recs(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        key_cols=[("input.itemId", "query_item_id")],
        metadata_fields=["name"],
    )
    return decorated.select(
        "query_item_id",
        F.size("recommendations").cast("bigint").alias("num_recs"),
        F.try_element_at("recommendations", F.lit(1))["itemId"].alias("first_item"),
        F.try_element_at(
            "recommendations", F.greatest(F.size("recommendations"), F.lit(1))
        )["itemId"].alias("last_item"),
    )


def q_flagship_related_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship related-items pipeline, flattened for hashing."""
    return _flatten_decorated(
        _decorated_related(spark, sf_dir), ["queryItemId", "userId"]
    ).withColumnsRenamed({"queryItemId": "query_item_id", "userId": "user_id"})


def q_user_pers_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-personalization pipeline (no attribution join), flattened."""
    decorated = user_personalization_pipeline(
        synthetic.user_personalization_batch_inference(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    ).pre_delta
    return _flatten_decorated(decorated, ["queryUserId"]).withColumnRenamed(
        "queryUserId", "query_user_id"
    )


def q_delta_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: EXCEPT DISTINCT of current vs simulated last-sync state
    (state = records of even user ids, as if already synced)."""
    current = q_flagship_related_flat(spark, sf_dir).cache()
    state = current.where(F.col("user_id").cast("bigint") % 2 == 0)
    return current.subtract(state)


def q_payload_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3/E4: user-track payload algebra, arrays joined to CSV
    strings for hashing (rank order therefore checked)."""
    decorated = user_personalization_pipeline(
        synthetic.user_personalization_batch_inference(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    ).pre_delta
    payloads, _ = build_user_track_payloads(decorated, _CONNECTOR)
    return payloads.select(
        "external_id",
        F.array_join("recs_itemId", ",").alias("item_ids_csv"),
        F.array_join(
            F.transform("recs_price", lambda p: p.cast("string")), ","
        ).alias("prices_csv"),
        F.size("recs_itemId").cast("bigint").alias("n_items"),
        F.col("other_attrib1"),
    )


def q_topk_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k knob: first 3 of the ordered recommendations array."""
    decorated = decorate_items(
        _ok_recs(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        key_cols=[("input.itemId", "query_item_id")],
        metadata_fields=["name"],
    )
    top3 = limit_recommendations(decorated, 3)
    return top3.select(
        "query_item_id",
        F.array_join(
            F.transform("recommendations", lambda r: r["itemId"]), ","
        ).alias("top3_ids_csv"),
    )


def q_stamp_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: job/sync stamp as literal columns (flattened jobInfo)."""
    stamped = related_items_pipeline(
        synthetic.related_items_batch_inference(spark, sf_dir),
        synthetic.user_item_mapping(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    ).decorated
    return stamped.select(
        F.col("queryItemId").alias("query_item_id"),
        F.col("userId").alias("user_id"),
        F.col("jobInfo.name").alias("job_name"),
        F.col("jobInfo.runDateTime").alias("run_datetime"),
        F.col("syncDirectives.attributePrefix").alias("attribute_prefix"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "error_split_ok": q_error_split_ok,
        "error_split_errors": q_error_split_errors,
        "attribution_join": q_attribution_join,
        "explode_outer": q_explode_outer,
        "decorate_flat": q_decorate_flat,
        "renest_ordered": q_renest_ordered,
        "flagship_related_flat": q_flagship_related_flat,
        "user_pers_flat": q_user_pers_flat,
        "delta_except": q_delta_except,
        "payload_pivot": q_payload_pivot,
        "topk_slice": q_topk_slice,
        "stamp_literals": q_stamp_literals,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — built on the shared fixture CTEs
# ---------------------------------------------------------------------------

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


def oracle_sql() -> dict[str, str]:
    return {
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
       rec_items[1] AS first_item,
       rec_items[len(rec_items)] AS last_item
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
    }
