"""Band (interval/range) join — "right rows within a time window of
each left row".

Not present in the reference (SURVEY.md §2.4 lists only equi joins),
but essential for a training-data pipeline (feature windows: "orders
in the 7 days before the event"). Two physical shapes:

* ``band_join`` with ``equi_keys`` — the common case. Catalyst plans
  an equi shuffle/broadcast join on the keys and evaluates the band
  predicate as a post-join filter; cost is the equi join's cost. This
  is exactly the plan you want at 100 TB, because the equi key bounds
  the candidate set per row.

* ``band_join`` without equi keys — a pure interval join would be a
  cross join in naive Spark. We bucket both sides by coarse time
  buckets of width >= the band width: each left row lands in one
  bucket, each right row is replicated into every bucket its
  visibility range [t+lower, t+upper] overlaps (at most
  ``ceil(band/bucket)+1`` copies), the join becomes an equi join on
  the bucket id, and the exact band predicate filters the residue.
  Replication factor is bounded and chosen by ``bucket_width``;
  shuffle is one hash exchange per side — no O(n x m) blowup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
    equi_keys: Sequence[tuple[str, str]] = (),
    how: str = "inner",
    bucket_width_seconds: int | None = None,
) -> DataFrame:
    """Join rows where ``right_time`` is within
    ``[left_time + lower_seconds, left_time + upper_seconds]`` and all
    ``equi_keys`` (pairs of (left_col, right_col)) match.

    Column-name collisions between the two inputs must be resolved by
    the caller (select/alias) before the join.
    """
    if lower_seconds > upper_seconds:
        raise ValueError("lower_seconds must be <= upper_seconds")
    lt = F.col(left_time).cast("timestamp").cast("long")
    rt = F.col(right_time).cast("timestamp").cast("long")
    band = (rt >= lt + lower_seconds) & (rt <= lt + upper_seconds)

    if equi_keys:
        cond = band
        for lc, rc in equi_keys:
            cond = cond & (left[lc] == right[rc])
        return left.join(right, cond, how)

    if how != "inner":
        raise ValueError("bucketed pure-band join supports inner only")
    width = bucket_width_seconds or max(upper_seconds - lower_seconds, 1)
    lb = left.withColumn("__bucket", F.floor(lt / F.lit(width)))
    # right row r is visible to left rows with lt in
    # [rt - upper, rt - lower] → replicate into that bucket range.
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((rt - upper_seconds) / F.lit(width)),
                F.floor((rt - lower_seconds) / F.lit(width)),
            )
        ),
    )
    return lb.join(rb, ["__bucket"], "inner").where(band).drop("__bucket")


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Top-k rows per group via ``row_number`` over one window shuffle.

    ``order_cols`` should end with a unique tiebreaker for
    deterministic results. At scale this is the right physical plan:
    one hash exchange on ``group_cols``, per-partition sort, early
    filter — AQE handles skewed groups; no global sort.
    """
    from pyspark.sql.window import Window

    ordering = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols[:-1]
    ] + [F.col(order_cols[-1]).asc()]
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank_in_group")
    )
