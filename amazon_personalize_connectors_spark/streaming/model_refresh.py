"""Streaming co-visitation model refresh: maintain the pair-count
model from an interaction stream, one micro-batch of increments at a
time — the "retrain nightly" job replaced by continuous maintenance.

Each micro-batch runs ``operators/recsys.py:covisitation_increments``
against the accumulated per-user item state, merges the increments
into the pair-count store (one unionByName + sum groupBy — the
incremental_rollup_merge shape), and writes the next item-state
version alongside. Old x old pairs are NEVER regenerated;
pair-generation cost per trigger is ∝ |batch| x items-per-touched-
user, not |history|².

Storage uses the cdc_sink double-buffer discipline with ONE pointer
committing BOTH stores: each version directory holds ``pairs/`` and
``items/`` written together, and the ``_VERSION`` pointer flips last.
A retried batch (foreachBatch redelivery after a crash anywhere
before the flip) re-reads the previous version's item state, so it
recomputes identical increments and overwrites its own version
directory idempotently — an append-only item log would instead
absorb the retry's items into state and silently DROP its pair
increments (caught by the retry test). Per-trigger cost includes
rewriting the item state (∝ accumulated distinct (u, i)); at
warehouse scale partition both stores by a user-hash and rewrite
only partitions touched by the batch.

Serving reads the pair store and applies the same mirror + rank
window as ``covisitation_topk`` — see ``serve_topk``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.operators.recsys import (
    covisitation_increments,
)
from amazon_personalize_connectors_spark.streaming.cdc_sink import (
    _version_file,
)

_PAIR_SCHEMA = "item long, rec_item long, n_common long"


def _current_version(store_path: str) -> int | None:
    vf = _version_file(store_path)
    if not os.path.exists(vf):
        return None
    with open(vf) as f:
        return int(f.read().strip())


def read_item_state(spark: SparkSession, store_path: str) -> DataFrame:
    """Accumulated (u, i) state at the committed version; empty frame
    before the first batch."""
    v = _current_version(store_path)
    if v is None:
        return spark.createDataFrame([], "u long, i long")
    return spark.read.parquet(os.path.join(store_path, f"v{v}", "items"))


def apply_interactions_batch(
    batch: DataFrame, store_path: str
) -> None:
    """foreachBatch body: merge one interaction micro-batch into the
    pair-count model. ``batch`` columns: (u, i)."""
    spark = batch.sparkSession
    state_items = read_item_state(spark, store_path)
    # the batch is read twice (increments + item-state union) and the
    # anti-join inside covisitation_increments must observe a stable
    # row set — pin it
    batch = batch.localCheckpoint(eager=True)
    inc = covisitation_increments(state_items, batch).withColumnRenamed(
        "n_common_delta", "n_common"
    )
    prev = _current_version(store_path)
    version = 0 if prev is None else prev + 1
    if prev is None:
        merged = inc
    else:
        current = spark.read.parquet(
            os.path.join(store_path, f"v{prev}", "pairs")
        )
        merged = (
            current.unionByName(inc)
            .groupBy("item", "rec_item")
            .agg(F.sum("n_common").cast("bigint").alias("n_common"))
        )
    out = os.path.join(store_path, f"v{version}")
    merged.write.mode("overwrite").parquet(os.path.join(out, "pairs"))
    next_items = state_items.unionByName(
        batch.select("u", "i")
    ).distinct()
    next_items.write.mode("overwrite").parquet(os.path.join(out, "items"))
    # flip LAST — commits pairs and items together; a retry re-reads
    # v{prev} for BOTH and idempotently overwrites v{version}
    tmp = _version_file(store_path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _version_file(store_path))


def refresh_from_stream(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    timeout_s: float = 300.0,
) -> None:
    """Drain an interaction stream (Trigger.AvailableNow), folding
    every micro-batch into the co-visitation model at ``store_path``.
    ``stream`` columns: (u, i)."""
    os.makedirs(store_path, exist_ok=True)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _epoch: apply_interactions_batch(b, store_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"model refresh still running after {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()


def serve_topk(
    spark: SparkSession, store_path: str, k: int = 10, min_common: int = 1
) -> DataFrame:
    """Top-k recommendations from the maintained pair store — the
    same mirror + rank window as ``covisitation_topk`` over counts
    that were never recomputed from history."""
    v = _current_version(store_path)
    if v is None:
        return spark.createDataFrame([], _PAIR_SCHEMA + ", rank int")
    half = spark.read.parquet(os.path.join(store_path, f"v{v}", "pairs"))
    if min_common > 1:
        half = half.where(F.col("n_common") >= min_common)
    pairs = half.unionByName(
        half.select(
            F.col("rec_item").alias("item"),
            F.col("item").alias("rec_item"),
            "n_common",
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("n_common").desc(), F.col("rec_item")
    )
    return pairs.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
