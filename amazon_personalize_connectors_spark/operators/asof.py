"""As-of join — a point-in-time lookup Spark's DataFrame API lacks.

``asof_join(left, right, ...)`` attaches, to each left row, the most
recent right row with the same key and time <= the left row's time
(e.g. each event gets the customer's latest prior order).

Implementation is the scalable union+window pattern, not a range join:

1. tag both sides and union them by name into one stream of
   (key, time, side, payload) rows;
2. one window per key ordered by (time, side-priority) computes
   ``last(payload, ignorenulls)`` over the unbounded-preceding frame —
   i.e. "the latest right payload seen so far";
3. keep only left rows.

Cost: ONE shuffle on the key (same as any groupBy on it) + a per-key
sort — no cross join, no O(left x right) candidate pairs, no range
explosion. This is the pattern that survives 100 TB: skewed keys can
additionally be range-bucketed by time before the window.

DuckDB's native ``ASOF JOIN`` serves as the correctness oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row: fields of the latest right row with matching
    ``on`` key and ``right_time`` <= ``left_time`` (< when ``strict``);
    nulls when no prior right row exists (left-outer semantics).

    Ties (right_time == left_time, non-strict): the right row wins —
    it sorts before the left row via the side-priority column.

    Duplicate right rows at the same (key, time): the window ordering
    carries a final payload-hash tiebreak, so which duplicate's
    payload wins is deterministic across partition layouts and reruns
    (highest xxhash64 of the payload struct). WHICH one that is is
    still arbitrary — pre-deduplicate right to one row per
    (key, time) when the choice matters, as ``asof_nearest_join``
    already requires.
    """
    lt = F.col(left_time).cast("timestamp")
    rt = F.col(right_time).cast("timestamp")

    # side ordering at equal times: non-strict → right first (visible
    # to the left row); strict → right after (invisible).
    right_prio = 1 if strict else 0
    left_prio = 1 - right_prio if strict else 1

    tagged_left = left.select(
        F.col(on).alias("__key"),
        lt.alias("__t"),
        F.lit(left_prio).alias("__prio"),
        F.lit(True).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload
            ) + ">"
        ).alias("__right"),
    )
    tagged_right = right.select(
        F.col(on).alias("__key"),
        rt.alias("__t"),
        F.lit(right_prio).alias("__prio"),
        F.lit(False).alias("__is_left"),
        F.lit(None).cast(tagged_left.schema["__left"].dataType.simpleString()).alias(
            "__left"
        ),
        F.struct(*[F.col(c) for c in right_payload]).alias("__right"),
    )
    combined = tagged_left.unionByName(tagged_right)

    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__prio", F.xxhash64("__right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_latest = combined.withColumn(
        "__latest_right", F.last("__right", ignorenulls=True).over(w)
    )
    out = with_latest.where(F.col("__is_left")).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__latest_right.{c}").alias(c) for c in right_payload],
    )
    return out


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: Sequence[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """Nearest-as-of: each left row gets the right row with matching
    key whose time is CLOSEST in either direction (|Δ| tie → the
    earlier/backward row), optionally within ``tolerance_us``
    microseconds. Adds ``asof_delta_us`` (signed: negative = right
    precedes left) to the payload columns; all-null when nothing
    matches inside the tolerance.

    Same cost as the backward-only ``asof_join``: the union sorts ONCE
    per key and BOTH directions read that one sorted window — backward
    as last(right, ignorenulls) over unbounded-preceding, forward as
    first(right, ignorenulls) over current-to-unbounded-following.
    Catalyst plans a single exchange + sort for the two frames. The
    choice between candidates is a row-local expression. ``right``
    should be pre-deduplicated to one row per (key, time) so
    tie-breaks are deterministic.
    """
    if right_time not in right_payload:
        right_payload = [*right_payload, right_time]
    lt = F.col(left_time).cast("timestamp")
    rt = F.col(right_time).cast("timestamp")

    right_struct_type = (
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload
        ) + ">"
    )
    tagged_left = left.select(
        F.col(on).alias("__key"),
        lt.alias("__t"),
        F.lit(1).alias("__prio"),  # right rows sort first at equal times
        F.lit(True).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(right_struct_type).alias("__right"),
    )
    tagged_right = right.select(
        F.col(on).alias("__key"),
        rt.alias("__t"),
        F.lit(0).alias("__prio"),
        F.lit(False).alias("__is_left"),
        F.lit(None)
        .cast(tagged_left.schema["__left"].dataType.simpleString())
        .alias("__left"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__right"),
    )
    combined = tagged_left.unionByName(tagged_right)
    base = Window.partitionBy("__key").orderBy("__t", "__prio")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cands = combined.withColumn(
        "__back", F.last("__right", ignorenulls=True).over(wb)
    ).withColumn("__fwd", F.first("__right", ignorenulls=True).over(wf))

    t_us = F.unix_micros(F.col("__t"))
    back_us = F.unix_micros(F.col(f"__back.{right_time}").cast("timestamp"))
    fwd_us = F.unix_micros(F.col(f"__fwd.{right_time}").cast("timestamp"))
    d_back = t_us - back_us          # >= 0
    d_fwd = fwd_us - t_us            # >= 0 (right rows at t sort before)
    ok_back = F.col("__back").isNotNull() & (
        F.lit(True) if tolerance_us is None else (d_back <= tolerance_us)
    )
    ok_fwd = F.col("__fwd").isNotNull() & (
        F.lit(True) if tolerance_us is None else (d_fwd <= tolerance_us)
    )
    use_back = ok_back & (~ok_fwd | (d_back <= d_fwd))
    chosen = F.when(use_back, F.col("__back")).when(ok_fwd, F.col("__fwd"))
    delta = F.when(use_back, -d_back).when(ok_fwd, d_fwd)
    return cands.where(F.col("__is_left")).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[chosen[c].alias(c) for c in right_payload],
        delta.cast("bigint").alias("asof_delta_us"),
    )
