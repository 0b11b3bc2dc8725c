"""Data-quality expectations: declarative validation in ONE pass.

Generalizes the reference's record-validity predicates
(src/etl_jobs/job.py error-split filters, F10 in SURVEY §2.3) into a
Deequ-style audit: a set of named boolean expectations evaluated as a
single map-side-combinable aggregate — one scan, zero shuffles wider
than the one-row result, regardless of how many rules run. The same
rules reused row-wise feed a quarantine split (the F1/F2 shape).

At 100 TB this is the difference between N validation scans and one:
every rule is a conditional-count column inside the same physical
aggregate, so adding a rule is free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A named row-level rule: ``predicate`` is True when the row
    PASSES. Violations are rows where the predicate is False or NULL
    (NULL comparisons are failures, not unknowns — an audit that
    ignores NULLs undercounts exactly the rows most likely broken)."""

    name: str
    predicate: Column


def expectations_audit(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """One-row audit frame: total row count plus one violation-count
    column per rule, computed in a single aggregate pass."""
    if not rules:
        raise ValueError("need at least one expectation")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for r in rules:
        aggs.append(
            F.sum(
                F.when(F.coalesce(r.predicate, F.lit(False)), 0).otherwise(1)
            )
            .cast("bigint")
            .alias(r.name)
        )
    return df.agg(*aggs)


def valid_row(rules: list[Expectation]) -> Column:
    """Row-level conjunction of all expectations (NULL-safe), for
    quarantine splits: ``df.where(valid_row(rules))`` keeps clean
    rows, ``~`` routes the rest to an error sink (K2)."""
    if not rules:
        raise ValueError("need at least one expectation")
    acc = F.lit(True)
    for r in rules:
        acc = acc & F.coalesce(r.predicate, F.lit(False))
    return acc
