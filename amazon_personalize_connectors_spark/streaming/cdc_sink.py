"""Streaming upsert sink: apply each micro-batch as a CDC change set
onto a keyed parquet snapshot (MERGE semantics via foreachBatch).

The pattern: a stream of keyed records (latest-wins) lands as
insert/update ops against the store; an op column can carry explicit
deletes. Each micro-batch runs ``operators/cdc.py:apply_changes`` —
anti-join eviction + union — and atomically replaces the snapshot.

Plain parquet cannot rewrite in place, so the store is double-buffered:
each batch writes a fresh versioned directory and flips a tiny
``_VERSION`` pointer file LAST (the one-writer-at-a-time discipline
Structured Streaming's serialized foreachBatch already gives). At
warehouse scale the same operator body targets a table format with
real transactions (Delta/Iceberg MERGE); the batch algebra — and its
cost, ∝ |snapshot| + |batch| per trigger — is identical. For
snapshots too large to rewrite per trigger, partition the store by a
key hash and rewrite only partitions containing batch keys (the
digest-store pattern in operators/delta.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _version_file(store_path: str) -> str:
    return os.path.join(store_path, "_VERSION")


def read_snapshot(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Current snapshot, or None before the first applied batch."""
    vf = _version_file(store_path)
    if not os.path.exists(vf):
        return None
    with open(vf) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(store_path, f"v{version}"))


def apply_batch(
    batch: DataFrame, store_path: str, key_cols: list[str], op_col: str | None
) -> None:
    """Apply one micro-batch to the store (the foreachBatch body).

    Rows are upserts keyed by ``key_cols`` (duplicates within the
    batch collapse to an arbitrary-but-deterministic single row via
    max over the value struct); ``op_col`` rows equal to 'delete'
    evict their key."""
    from amazon_personalize_connectors_spark.operators.cdc import apply_changes

    spark = batch.sparkSession
    value_cols = [c for c in batch.columns if c not in key_cols and c != op_col]
    # collapse in-batch duplicates deterministically
    collapsed = (
        batch.groupBy(*key_cols)
        .agg(
            F.max(
                F.struct(
                    *(
                        [F.col(op_col)] if op_col else [F.lit("upsert").alias("_op")]
                    ),
                    *[F.col(c) for c in value_cols],
                )
            ).alias("_m")
        )
        .select(
            *key_cols,
            (F.col(f"_m.{op_col}") if op_col else F.lit("upsert")).alias("op"),
            *[F.col(f"_m.{c}").alias(c) for c in value_cols],
        )
    )
    current = read_snapshot(spark, store_path)
    if current is None:
        # null-safe: a NULL op is an upsert, never a silent delete
        # (same rule as operators/cdc.py apply_changes)
        merged = collapsed.where(~F.col("op").eqNullSafe("delete")).select(
            *key_cols, *value_cols
        )
        version = 0
    else:
        with open(_version_file(store_path)) as f:
            version = int(f.read().strip()) + 1
        merged = apply_changes(current, collapsed, key_cols, op_col="op")
    out = os.path.join(store_path, f"v{version}")
    merged.write.mode("overwrite").parquet(out)
    # flip the pointer LAST: readers only ever see a complete version
    tmp = _version_file(store_path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _version_file(store_path))


def stream_apply_changes(
    stream: DataFrame,
    store_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    op_col: str | None = None,
    timeout_s: float = 300.0,
) -> None:
    """Drain a stream (Trigger.AvailableNow) applying every micro-batch
    onto the keyed snapshot at ``store_path``."""
    os.makedirs(store_path, exist_ok=True)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _epoch: apply_batch(b, store_path, key_cols, op_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"cdc sink still running after {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
