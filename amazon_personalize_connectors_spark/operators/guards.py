"""Cardinality guards for domain-bounded grids.

Several operators deliberately run a GLOBAL ordered window over a
small derived grid (value histogram, duration table, score bins,
Pareto axis) — sanctioned because the grid is bounded by a calendar,
a bin width, or a dimension domain, never by the data. Those
contracts were honor-system: a caller passing an unbucketed
data-sized column would turn the single-task window into a
data-sized sort that "works" at test scale and melts at 100×.

``enforce_bounded_grid`` makes the contract executable without
breaking laziness or adding a job: the grid's row count rides a
1-row aggregate broadcast back onto the grid (the sanctioned scalar
broadcast-nested-loop pattern), and ``raise_error`` fires during
that projection — BEFORE the ordered window consumes the rows.
Catalyst reuses the grid's aggregation exchange for the count, so
the guard costs one tiny broadcast, not a recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enforce_bounded_grid(
    grid: DataFrame, max_rows: int, what: str, keep_count_col: bool = False
) -> DataFrame:
    """Return ``grid`` unchanged when it holds at most ``max_rows``
    rows; otherwise the returned plan raises at execution time with a
    message naming the operator and the observed cardinality. Lazy —
    no job is triggered at call time.

    ``keep_count_col=True`` retains the broadcast ``_grid_n`` column
    so the caller can use it as the PARTITION KEY of its grid window:
    it is constant-valued (single partition, same execution as a
    global window) but NOT foldable (it rides in from an aggregate),
    so the optimizer cannot strip it the way it strips a ``lit()``
    partition key — and WindowExec stops warning about an undeclared
    global window, which is correct here because the guard has made
    the boundedness contract executable."""
    cnt = grid.agg(F.count(F.lit(1)).alias("_grid_n"))
    # the check must ride a FILTER, not a projected-then-dropped
    # column — Catalyst's column pruning would eliminate a dropped
    # raise_error projection and the guard would never evaluate.
    # assert_true returns NULL on success, so the predicate is
    # tautological for conforming grids and the optimizer cannot fold
    # it away (the condition references a runtime column).
    check = F.assert_true(
        F.col("_grid_n") <= max_rows,
        F.concat(
            F.lit(f"{what}: domain grid has "),
            F.col("_grid_n").cast("string"),
            F.lit(
                f" rows, over max_grid_rows={max_rows}. The ordered "
                f"window here is sized for a bounded domain (calendar "
                f"days, bins, dimension values) — bucket or bin the "
                f"column first, or raise max_grid_rows deliberately."
            ),
        ),
    )
    out = grid.crossJoin(F.broadcast(cnt)).where(check.isNull())
    return out if keep_count_col else out.drop("_grid_n")
