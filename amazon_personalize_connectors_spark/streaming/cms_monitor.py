"""Streaming Count-Min sketch maintenance: fold each micro-batch's
CMS cells into a versioned bounded store and serve frequency
estimates on demand — "roughly how often has key k appeared so far"
over an unbounded stream, in O(depth·width) state no matter how many
keys or rows have flowed past.

Why this is exactly mergeable: ``functions/sketches.py:cms_sketch``
reduces rows to (d, cell, cnt) bucket counts, and bucket counts merge
by SUM — so the sketch of the whole history equals the fold of
per-batch sketches REGARDLESS of how rows split into micro-batches
(pinned by the oracle query: stream-maintained estimates ==
batch-computed estimates, bit for bit). Per-trigger cost ∝ the
batch's distinct cells, state ≤ depth·16^hex_chars rows forever.

Storage is the shared pointer-flip + epoch-keyed fold discipline
(streaming/epoch_store.py): a replayed epoch — even after the
pointer flip — overwrites its own version from the same immutable
prior, and a stale epoch (fresh checkpoint on an old store) is
refused instead of double-counting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.functions.sketches import (
    cms_estimate,
    cms_sketch,
)
from amazon_personalize_connectors_spark.streaming.epoch_store import (
    checkpoint_identity,
    commit_version,
    current_version as _current_version,
    plan_fold,
)

_CMS_SCHEMA = "d int, cell string, cnt long"


def read_cms(spark: SparkSession, store_path: str) -> DataFrame:
    """Accumulated (d, cell, cnt) sketch at the committed version;
    empty before the first batch."""
    ver = _current_version(store_path)
    if ver is None:
        return spark.createDataFrame([], _CMS_SCHEMA)
    return spark.read.schema(_CMS_SCHEMA).parquet(
        os.path.join(store_path, f"v{ver}")
    )


def apply_cms_batch(
    batch: DataFrame,
    epoch_id: int,
    store_path: str,
    key_col: str,
    depth: int = 4,
    hex_chars: int = 2,
    checkpoint_token: str | None = None,
) -> None:
    """foreachBatch body: fold one micro-batch's CMS cells into the
    store. Epoch-keyed (epoch_store.plan_fold): a replayed epoch
    overwrites its own version from the same prior."""
    spark = batch.sparkSession
    delta = cms_sketch(batch, key_col, depth=depth, hex_chars=hex_chars)
    version, prior, _meta = plan_fold(store_path, epoch_id, checkpoint_token)
    if prior is None:
        merged = delta
    else:
        current = spark.read.schema(_CMS_SCHEMA).parquet(
            os.path.join(store_path, f"v{prior}")
        )
        merged = (
            current.unionByName(delta)
            .groupBy("d", "cell")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
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
    key_col: str,
    depth: int = 4,
    hex_chars: int = 2,
    timeout_s: float = 300.0,
) -> None:
    """Drain a stream (Trigger.AvailableNow), folding every
    micro-batch's CMS cells into the sketch at ``store_path``."""
    os.makedirs(store_path, exist_ok=True)
    # per-checkpoint nonce, not the path: a recreated checkpoint
    # at the same location must read as a FOREIGN stream (ADVICE r9)
    _stream_token = checkpoint_identity(checkpoint_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: apply_cms_batch(
                b, e, store_path, key_col, depth=depth, hex_chars=hex_chars,
                checkpoint_token=_stream_token,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"cms monitor still running after {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()


def estimate_from_store(
    spark: SparkSession,
    store_path: str,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    hex_chars: int = 2,
) -> DataFrame:
    """Serve point estimates for ``keys`` from the maintained sketch —
    identical read path to the batch ``cms_estimate`` (the store IS a
    cms_sketch output), so stream-maintained and batch-built sketches
    answer identically."""
    return cms_estimate(
        read_cms(spark, store_path), keys, key_col, depth=depth,
        hex_chars=hex_chars,
    )
