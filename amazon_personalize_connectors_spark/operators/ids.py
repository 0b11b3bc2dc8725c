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


def add_running_total(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    total_name: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global cumulative sum of ``value_col`` in ``order_cols`` order —
    the distributed prefix-sum twin of ``add_contiguous_ids``. A plain
    ``sum() OVER (ORDER BY ...)`` collapses the dataset into one task;
    here: range-partition on the order key, one tiny per-partition sum
    collect, prefix-sum the offsets on the driver, then add each
    partition's offset to its local running sum. No task ever sees
    more than one partition.

    Sum ``value_col`` as decimal for exactness — double accumulation
    would make the running value partition-layout-dependent.
    ``order_cols`` must be a unique ordering (add a tiebreaker).
    """
    return add_running_totals(
        df, order_cols, {value_col: total_name}, num_partitions
    )


def add_running_totals(
    df: DataFrame,
    order_cols: Sequence[str],
    value_cols: dict[str, str],
    num_partitions: int | None = None,
    total_names: dict[str, str] | None = None,
) -> DataFrame:
    """Multi-column twin of ``add_running_total``: one range
    repartition + one per-partition offsets collect + one window pass
    carries ALL the cumulative sums (``{value_col: output_name}``) —
    callers needing several prefix sums over the same ordering (e.g.
    the two-sample KS cumulative distribution pair) pay the
    range-shuffle once, not per column.

    ``total_names`` (``{value_col: output_name}``, r12) additionally
    attaches each column's GRAND total as a constant column, for
    callers that need cumulative/total together (e.g. a median
    selection's ``2*cum >= n``). It is free: the total is the last
    prefix of the per-partition sums this function already collects —
    no extra job, no second pass over ``df``."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(
        *order_cols
    )
    with_pid = ordered.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    sums_frame = with_pid.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__s_{i}") for i, v in enumerate(value_cols)]
    )
    part_sums = sums_frame.orderBy("__pid").collect()
    offsets, acc = {}, [None] * len(value_cols)
    for row in part_sums:
        offsets[row["__pid"]] = list(acc)
        for i in range(len(value_cols)):
            s = row[f"__s_{i}"]
            # a partition where every summed value is NULL yields a
            # NULL partition sum — treat as 0 (contributes nothing to
            # downstream offsets) instead of raising on None + int
            if s is not None:
                acc[i] = s if acc[i] is None else acc[i] + s
    # offsets are SUMS — use the aggregate's (widened) types, not the
    # input value types, or large datasets overflow narrower decimals
    sum_types = dict(sums_frame.dtypes)
    offset_schema = "__pid int, " + ", ".join(
        f"__offset_{i} {sum_types[f'__s_{i}']}" for i in range(len(value_cols))
    )
    offset_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, *offs) for pid, offs in offsets.items()], offset_schema
        )
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = with_pid.join(offset_df, "__pid")
    for i, (value_col, total_name) in enumerate(value_cols.items()):
        out = out.withColumn(
            total_name,
            F.coalesce(F.col(f"__offset_{i}"), F.lit(0))
            + F.sum(value_col).over(w),
        )
    if total_names:
        vcols = list(value_cols)
        for value_col, tname in total_names.items():
            i = vcols.index(value_col)
            out = out.withColumn(
                tname,
                F.lit(acc[i]).cast(sum_types[f"__s_{i}"]),
            )
    return out.drop(
        "__pid", *[f"__offset_{i}" for i in range(len(value_cols))]
    )


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
