"""Privacy-risk audit operators for training-data release — the
checks a team runs before a connector export or a training corpus
leaves the boundary: k-anonymity (is any quasi-identifier combination
rare enough to single someone out?) and l-diversity (does a class
leak its sensitive value because everyone in it shares one?). These
complement the content-level ``functions/text.py:pii_scrub`` — that
removes identifiers from text; this measures re-identification risk
in the STRUCTURE of tabular exports.

Reference context: the connectors ship user-level payloads
(up:90-180) — any downstream sharing of those exports needs exactly
this audit.

Scale shape: ONE groupBy on the quasi-identifier tuple carrying both
the class size and the exact distinct-sensitive count (Spark plans
count_distinct inside a grouped aggregate as a two-phase expand +
partial aggregate — map-side combinable, no self-join), then the
summary is a second aggregate over the class table (rows ∝ classes,
not records). Generalization (banding) happens in the projection, so
re-auditing at a coarser grain is a plan change, not a data pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def numeric_band(col: Column, width: int) -> Column:
    """Generalize a numeric column to its band floor (``floor(v /
    width) * width`` as bigint) — the standard quasi-identifier
    coarsening. Integer arithmetic so the band edges are exact and
    engine-portable (pass an already-integer column, e.g. cents)."""
    return (col.cast("bigint") - (F.pmod(col.cast("bigint"), F.lit(width)))).cast(
        "bigint"
    )


def k_anonymity_classes(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l_threshold: int = 2,
) -> DataFrame:
    """Per-equivalence-class privacy report: one row per distinct
    quasi-identifier combination with its size, its exact distinct
    count of the sensitive attribute, and violation flags —
    ``k_violation`` (class smaller than k: re-identification risk)
    and ``l_violation`` (fewer than l distinct sensitive values:
    attribute disclosure even without re-identification).

    Returns (quasi..., class_size, n_sensitive, k_violation,
    l_violation)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).cast("bigint").alias("n_sensitive")
        )
    classes = df.groupBy(*quasi_cols).agg(*aggs)
    if sensitive_col is None:
        classes = classes.withColumn("n_sensitive", F.lit(None).cast("bigint"))
    return classes.select(
        *quasi_cols,
        "class_size",
        "n_sensitive",
        (F.col("class_size") < k).cast("int").alias("k_violation"),
        F.when(
            F.col("n_sensitive").isNotNull(),
            (F.col("n_sensitive") < l_threshold).cast("int"),
        ).alias("l_violation"),
    )


def k_anonymity_summary(classes: DataFrame) -> DataFrame:
    """One-row release gate over a ``k_anonymity_classes`` report:
    class/record totals, how many classes and RECORDS are at risk
    (risky records are what leak — a 2-person class risks 2 people),
    and the minimum class size (the dataset's effective k)."""
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("class_size").cast("bigint").alias("n_records"),
        F.sum("k_violation").cast("bigint").alias("n_risky_classes"),
        F.sum(F.col("class_size") * F.col("k_violation"))
        .cast("bigint")
        .alias("n_risky_records"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.coalesce(F.sum("l_violation"), F.lit(0))
        .cast("bigint")
        .alias("n_low_diversity_classes"),
    )
