"""Shared imports/constants for the split query modules (moved
verbatim from __spark_entry__.py's header)."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

__all__ = [
    "os",
    "sys",
    "Callable",
    "datetime",
    "timezone",
    "DataFrame",
    "SparkSession",
    "F",
    "ConnectorConfig",
    "PipelineConfig",
    "attribute_users",
    "decorate_items",
    "explode_recommendations",
    "build_user_track_payloads",
    "split_errors",
    "limit_recommendations",
    "related_items_pipeline",
    "user_personalization_pipeline",
    "synthetic",
    "MAPPING_CTE",
    "META_CTE",
    "RECS_CTE",
    "USER_RECS_CTE",
    "RUN_TS",
    "_CONNECTOR",
    "_CONFIG",
]
