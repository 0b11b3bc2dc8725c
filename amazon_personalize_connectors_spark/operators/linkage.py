"""Probabilistic record linkage (Fellegi–Sunter) over BLOCKED
candidate pairs — the classic entity-resolution scorer that sits
between a blocking stage (LSH buckets, sorted neighborhoods, equi
blocks — all already in functions/dedup.py) and a clustering stage
(er_clusters): each candidate pair gets a log-likelihood-ratio match
weight from per-field agreement patterns, then a threshold pair
classifies it match / possible / non-match.

Why integer micro-weights: the FS weight for a field is
log2(m/u) on agreement and log2((1-m)/(1-u)) on disagreement, with
(m, u) the match/unmatch agreement probabilities. Those are CALLER
CONSTANTS, so the logs are computed once in Python, scaled to exact
1e6-micro integers, and the per-pair score is a bigint SUM of
literals selected by boolean agreement columns — deterministic at
any partitioning, portable to the SQL oracle verbatim, no floating
accumulation anywhere.

Scale shape: input is the blocked pair table (the blocking stage
bounds it — this operator never generates pairs); scoring is
row-local codegen (one projection), classification a filter. Cost
∝ |candidate pairs|, zero shuffles added.
"""

from __future__ import annotations

import math
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def fs_field_weights(
    m: float, u: float
) -> tuple[int, int]:
    """Exact micro-integer (agree_weight, disagree_weight) for one
    field given its (m, u) probabilities. Raises on degenerate
    probabilities instead of emitting ±inf."""
    if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
        raise ValueError(f"m and u must be in (0, 1); got m={m}, u={u}")
    if m <= u:
        raise ValueError(
            f"m must exceed u for a discriminating field; got m={m}, u={u}"
        )
    agree = int(math.floor(math.log2(m / u) * _SCALE))
    disagree = int(math.floor(math.log2((1 - m) / (1 - u)) * _SCALE))
    return agree, disagree


def linkage_scores(
    pairs: DataFrame,
    fields: Mapping[str, tuple[Column, float, float]],
    upper_micro: int,
    lower_micro: int,
) -> DataFrame:
    """Score blocked candidate pairs with Fellegi–Sunter weights.

    ``fields`` maps a field name to ``(agreement_col, m, u)`` where
    ``agreement_col`` is a BOOLEAN Column over the pair row (NULL
    counts as disagreement — a missing value cannot support a match).
    Appends per-field boolean columns ``agree_<name>``, the bigint
    ``score_micro`` (sum of selected micro-weights), and ``decision``
    in ('match', 'possible', 'non_match') from the threshold pair.
    """
    if upper_micro < lower_micro:
        raise ValueError(
            f"upper_micro ({upper_micro}) must be >= lower_micro "
            f"({lower_micro})"
        )
    out = pairs
    score = F.lit(0).cast("bigint")
    for name, (col, m, u) in fields.items():
        agree_w, disagree_w = fs_field_weights(m, u)
        flag = F.coalesce(col.cast("boolean"), F.lit(False))
        out = out.withColumn(f"agree_{name}", flag)
        score = score + F.when(
            F.col(f"agree_{name}"), F.lit(agree_w).cast("bigint")
        ).otherwise(F.lit(disagree_w).cast("bigint"))
    out = out.withColumn("score_micro", score.cast("bigint"))
    return out.withColumn(
        "decision",
        F.when(F.col("score_micro") >= upper_micro, F.lit("match"))
        .when(F.col("score_micro") < lower_micro, F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )
