"""K1/K2 — JSONL sinks with Hive-style date/time partition paths.

Reference writes to ``output/<connector>/year=YYYY/month=MM/day=DD/
time=HHMMSS/`` with the partition values encoded in the path string
(related_items_etl.py:299-315) — one run = one leaf directory,
Hive-readable. We keep that layout (downstream partition pruning works
unchanged) and gzip by default like the Lambda half expects
(enqueue.py:40-43 is gzip-aware).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame


def partitioned_output_path(base: str, connector: str, run_datetime: datetime) -> str:
    """``<base>/<connector>/year=…/month=…/day=…/time=HHMMSS`` (ri:303)."""
    return (
        f"{base.rstrip('/')}/{connector}/year={run_datetime:%Y}/"
        f"month={run_datetime:%m}/day={run_datetime:%d}/time={run_datetime:%H%M%S}"
    )


def write_connector_output(
    df: DataFrame,
    base: str,
    connector: str,
    run_datetime: datetime,
    compression: str | None = "gzip",
) -> str:
    """K1 — per-connector decorated output (ri:299-315)."""
    path = partitioned_output_path(base, connector, run_datetime)
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    return path


def write_errors(
    errors: DataFrame,
    base: str,
    run_datetime: datetime,
    compression: str | None = "gzip",
) -> str | None:
    """K2 — failed inference rows, only when nonempty (ri:114-133)."""
    if errors.isEmpty():
        return None
    path = partitioned_output_path(base, "errors", run_datetime)
    writer = errors.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    return path
