"""P1 — job/sync metadata stamp, as literal structs (zero UDF).

Reference ``add_job_and_sync_info`` is a row-at-a-time Python
``Map.apply`` closure (related_items_etl.py:277-297) — the only
operator in the reference that breaks whole-stage codegen. Every field
it adds is a constant for the run, so here it's two literal struct
columns Catalyst folds for free; the run timestamp is pinned ISO-8601
UTC (SURVEY.md §7.4 timestamp determinism).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.config import ConnectorConfig


def add_job_and_sync_info(
    df: DataFrame,
    job_name: str,
    run_datetime: datetime,
    connector: ConnectorConfig | None = None,
) -> DataFrame:
    """Stamp ``jobInfo{name, runDateTime}`` and, when the connector
    carries sync directives, ``syncDirectives{attributePrefix,
    otherAttributes}`` (ri:279-289)."""
    out = df.withColumn(
        "jobInfo",
        F.struct(
            F.lit(job_name).alias("name"),
            F.lit(run_datetime.isoformat()).alias("runDateTime"),
        ),
    )
    if connector is not None and (
        connector.attribute_prefix or connector.other_attributes
    ):
        other = (
            F.create_map(
                *[
                    x
                    for k, v in sorted(connector.other_attributes.items())
                    for x in (F.lit(k), F.lit(v))
                ]
            )
            if connector.other_attributes
            else F.lit(None).cast("map<string,string>")
        )
        out = out.withColumn(
            "syncDirectives",
            F.struct(
                F.lit(connector.attribute_prefix).alias("attributePrefix"),
                other.alias("otherAttributes"),
            ),
        )
    return out
