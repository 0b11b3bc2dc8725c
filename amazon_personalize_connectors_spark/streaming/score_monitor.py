"""Streaming score-quality monitor: maintain the per-(group, score)
positive/negative count GRID from a micro-batched stream and answer
the exact ROC-AUC on demand — continuous "is the model's score still
discriminating" monitoring without re-scanning history.

The sibling of the KS drift monitor (streaming/drift_monitor.py), on
the same two pillars:

* **Mergeable grid.** ``operators/evaluation.py:roc_auc`` reduces the
  scored rows to a (group, score, pos, neg) grid first, and grids
  merge by SUM — each micro-batch folds its batch-local grid into the
  store (unionByName + sum groupBy), so per-trigger cost is ∝ the
  batch's distinct (group, score) pairs and state size is ∝ the score
  domain (cents of a bounded range — small at any data scale). The
  AUC read-side calls the SAME ``auc_from_grid`` the batch operator
  uses, so the stream-maintained statistic must equal a full batch
  recompute over everything drained (the law the oracle checks).
* **Pointer-flip store** (cdc_sink discipline) with **epoch-keyed
  folds** (streaming/epoch_store.py): each version records the
  foreachBatch epoch that produced it and the prior version it read,
  so a replayed epoch — even after the pointer flip, when the
  checkpoint commit was lost — re-reads the same immutable prior and
  overwrites its own version directory. Counts are never
  double-folded, and a stale epoch (fresh checkpoint against an old
  store) is refused.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.operators.evaluation import (
    auc_from_grid,
)
from amazon_personalize_connectors_spark.streaming.epoch_store import (
    checkpoint_identity,
    commit_version,
    current_version as _current_version,
    plan_fold,
)

_GRID_SCHEMA = "g long, _s long, _pos long, _neg long"


def read_score_grid(spark: SparkSession, store_path: str) -> DataFrame:
    """Accumulated (g, _s, _pos, _neg) grid at the committed version;
    empty before the first batch."""
    ver = _current_version(store_path)
    if ver is None:
        return spark.createDataFrame([], _GRID_SCHEMA)
    return spark.read.schema(_GRID_SCHEMA).parquet(
        os.path.join(store_path, f"v{ver}")
    )


def apply_score_batch(
    batch: DataFrame,
    epoch_id: int,
    store_path: str,
    group_col: str,
    score_col: str,
    label_col: str,
    checkpoint_token: str | None = None,
) -> None:
    """foreachBatch body: fold one micro-batch's (group, score) counts
    into the grid store. ``epoch_id`` keys the fold
    (epoch_store.plan_fold): a replayed epoch overwrites its own
    version from the same prior, even after the pointer flip."""
    spark = batch.sparkSession
    delta = batch.groupBy(
        F.col(group_col).cast("long").alias("g"),
        F.col(score_col).cast("long").alias("_s"),
    ).agg(
        F.sum(F.col(label_col).cast("long")).alias("_pos"),
        F.sum(F.lit(1) - F.col(label_col).cast("long")).alias("_neg"),
    )
    version, prior, _meta = plan_fold(store_path, epoch_id, checkpoint_token)
    if prior is None:
        merged = delta
    else:
        current = spark.read.schema(_GRID_SCHEMA).parquet(
            os.path.join(store_path, f"v{prior}")
        )
        merged = (
            current.unionByName(delta)
            .groupBy("g", "_s")
            .agg(
                F.sum("_pos").cast("long").alias("_pos"),
                F.sum("_neg").cast("long").alias("_neg"),
            )
        )
    merged.write.mode("overwrite").parquet(
        os.path.join(store_path, f"v{version}")
    )
    commit_version(store_path, version, int(epoch_id), prior,
                   int(epoch_id), token=checkpoint_token)


def monitor_scores_from_stream(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    group_col: str,
    score_col: str,
    label_col: str,
    timeout_s: float = 300.0,
) -> None:
    """Drain a stream (Trigger.AvailableNow), folding every
    micro-batch's (group, score) counts into the grid at
    ``store_path``."""
    os.makedirs(store_path, exist_ok=True)
    # per-checkpoint nonce, not the path: a recreated checkpoint
    # at the same location must read as a FOREIGN stream (ADVICE r9)
    _stream_token = checkpoint_identity(checkpoint_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: apply_score_batch(
                b, e, store_path, group_col, score_col, label_col,
                checkpoint_token=_stream_token,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"score monitor still running after {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()


def auc_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Exact per-group ROC-AUC from the maintained grid — the SAME
    ``auc_from_grid`` the batch operator uses (bigint rank-sum, one
    division), so stream == batch bit-for-bit."""
    grid = read_score_grid(spark, store_path).localCheckpoint(eager=True)
    return auc_from_grid(grid, ["g"])


def calibration_from_store(
    spark: SparkSession, store_path: str, bin_width: int
) -> DataFrame:
    """Calibration/gains table from the SAME maintained grid that
    serves AUC — one pointer-flip state, two exact statistics
    (operators/evaluation.py:bins_from_grid): the grid collapses over
    its group column (grids merge by SUM) and bins with the batch
    operator's integer DIV, so stream == batch score_bin_report over
    everything drained."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        bins_from_grid,
    )

    grid = (
        read_score_grid(spark, store_path)
        .groupBy("_s")
        .agg(
            F.sum("_pos").cast("long").alias("_pos"),
            F.sum("_neg").cast("long").alias("_neg"),
        )
    )
    return bins_from_grid(grid, bin_width)
