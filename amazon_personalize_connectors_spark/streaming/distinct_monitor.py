"""Streaming EXACT distinct-count maintenance: fold each
micro-batch's per-(group, id-bucket) bitmaps into a versioned store
and serve exact distincts on demand — the "how many unique users has
each segment touched so far" aggregate that approximate sketches
(HLL) only estimate, kept exact in bounded state: a compressed
bitmap per 32768-id bucket, state ∝ touched buckets, never ∝ rows.

Why this is exactly mergeable: ``functions/sketches.py:
bitmap_partials`` reduces rows to (group, id_bucket, bitmap), and
bitmaps merge by OR — associative, commutative AND idempotent, so
the fold tolerates any micro-batch split (pinned by the oracle
query: stream-maintained distincts == batch COUNT(DISTINCT)).
Idempotence notwithstanding, folds stay epoch-keyed (streaming/
epoch_store.py) for uniformity with the other stores: replays
overwrite their own version, stale epochs are refused.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.functions.sketches import (
    bitmap_partials,
)
from amazon_personalize_connectors_spark.streaming.epoch_store import (
    checkpoint_identity,
    commit_version,
    current_version as _current_version,
    plan_fold,
)


def _store_schema(group_cols: list[str]) -> str:
    gs = ", ".join(f"{g} string" for g in group_cols)
    return f"{gs}, id_bucket long, bm binary"


def read_bitmaps(
    spark: SparkSession, store_path: str, group_cols: list[str]
) -> DataFrame:
    """Accumulated (group..., id_bucket, bm) partials at the committed
    version; empty before the first batch."""
    ver = _current_version(store_path)
    schema = _store_schema(group_cols)
    if ver is None:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        os.path.join(store_path, f"v{ver}")
    )


def apply_bitmap_batch(
    batch: DataFrame,
    epoch_id: int,
    store_path: str,
    group_cols: list[str],
    id_col: str,
    checkpoint_token: str | None = None,
) -> None:
    """foreachBatch body: OR one micro-batch's bitmap partials into
    the store. Epoch-keyed; replayed epochs overwrite their own
    version from the same prior."""
    spark = batch.sparkSession
    delta = bitmap_partials(batch, group_cols, id_col)
    version, prior, _meta = plan_fold(store_path, epoch_id, checkpoint_token)
    if prior is None:
        merged = delta
    else:
        current = spark.read.schema(_store_schema(group_cols)).parquet(
            os.path.join(store_path, f"v{prior}")
        )
        merged = (
            current.unionByName(delta)
            .groupBy(*group_cols, "id_bucket")
            .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
        )
    merged.write.mode("overwrite").parquet(
        os.path.join(store_path, f"v{version}")
    )
    commit_version(store_path, version, int(epoch_id), prior,
                   int(epoch_id), token=checkpoint_token)


def maintain_from_stream(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    group_cols: list[str],
    id_col: str,
    timeout_s: float = 300.0,
) -> None:
    """Drain a stream (Trigger.AvailableNow), folding every
    micro-batch's bitmap partials into the store."""
    os.makedirs(store_path, exist_ok=True)
    # per-checkpoint nonce, not the path: a recreated checkpoint
    # at the same location must read as a FOREIGN stream (ADVICE r9)
    _stream_token = checkpoint_identity(checkpoint_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: apply_bitmap_batch(
                b, e, store_path, group_cols, id_col,
                checkpoint_token=_stream_token,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"distinct monitor still running after {timeout_s}s"
            )
    finally:
        if q.isActive:
            q.stop()


def distinct_from_store(
    spark: SparkSession, store_path: str, group_cols: list[str]
) -> DataFrame:
    """Serve exact per-group distinct counts from the maintained
    bitmaps: one tiny sum over bucket counts (rows ∝ groups ×
    touched buckets)."""
    return (
        read_bitmaps(spark, store_path, group_cols)
        .groupBy(*group_cols)
        .agg(
            F.sum(F.bitmap_count(F.col("bm")))
            .cast("bigint")
            .alias("n_distinct")
        )
    )
