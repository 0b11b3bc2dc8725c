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

from collections.abc import Sequence
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


def key_containment(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    relation: str,
) -> DataFrame:
    """Referential-integrity / FK-discovery profile for one candidate
    relation: what fraction of the child's distinct keys exist in the
    parent? containment ≈ 1 says "this is a foreign key" (the classic
    inclusion-dependency signal a schema-discovery pass runs over
    every plausible column pair); containment near 0 kills the
    candidate.

    Shape: both sides collapse to distinct keys first (map-side
    combinable), the membership probe is one equi-join on the
    deduplicated keys — never raw x raw — and the parent's distinct
    count rides in as a 1-row broadcast. NULL child keys are excluded
    (SQL FK semantics). All counts bigint; containment is ONE
    division.

    Output: ONE row (relation, n_child_keys, n_parent_keys,
    n_matched, containment)."""
    c = (
        child.select(F.col(child_col).alias("k"))
        .where(F.col("k").isNotNull())
        .distinct()
    )
    p = (
        parent.select(F.col(parent_col).alias("k"))
        .where(F.col("k").isNotNull())
        .distinct()
    )
    probed = c.join(p.withColumn("_hit", F.lit(1)), "k", "left")
    stats = probed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_child_keys"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_matched"),
    )
    pn = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_parent_keys"))
    return stats.crossJoin(F.broadcast(pn)).select(
        F.lit(relation).alias("relation"),
        "n_child_keys",
        "n_parent_keys",
        "n_matched",
        F.when(
            F.col("n_child_keys") > 0,
            F.col("n_matched").cast("double")
            / F.col("n_child_keys").cast("double"),
        ).alias("containment"),
    )


def functional_dependency(
    df: DataFrame,
    determinant_cols: Sequence[str],
    dependent_col: str,
    relation: str,
) -> DataFrame:
    """Functional-dependency discovery for one candidate ``A -> B``:
    does each distinct determinant combination map to exactly one
    dependent value? The other half of schema discovery next to
    ``key_containment`` — FD violations are how you find dirty
    denormalizations ("order_id -> status, except the 400 orders
    where it isn't").

    One aggregate to (determinant, n_distinct_dependent) — map-side
    combinable, exact distincts — then one 1-row rollup counting
    violating groups and the worst fan-out. NULL dependents count as
    a value (a group mixing NULL and 'x' IS a violation). ``holds``
    is exact, violation_rate one division.

    Output: ONE row (relation, n_groups, n_violating, max_fanout,
    violation_rate, holds)."""
    groups = df.groupBy(*determinant_cols).agg(
        F.countDistinct(F.col(dependent_col)).alias("_nd"),
        F.max(F.col(dependent_col).isNull().cast("int")).alias("_has_null"),
    )
    # countDistinct ignores NULLs; fold the NULL "value" back in so a
    # {NULL, 'x'} group counts 2 distinct dependents
    nd = F.col("_nd") + F.col("_has_null")
    return groups.agg(
        F.lit(relation).alias("relation"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum((nd > 1).cast("long")).cast("bigint").alias("n_violating"),
        F.max(nd).cast("bigint").alias("max_fanout"),
    ).select(
        "relation",
        "n_groups",
        "n_violating",
        "max_fanout",
        F.when(
            F.col("n_groups") > 0,
            F.col("n_violating").cast("double")
            / F.col("n_groups").cast("double"),
        ).alias("violation_rate"),
        (F.col("n_violating") == 0).cast("int").alias("holds"),
    )


# Benford first-digit probabilities log10(1 + 1/d), pinned as exact
# repr literals so BOTH engines parse the identical correctly-rounded
# doubles instead of each computing log10 (whose last ulp is
# engine-specific for non-power arguments).
BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive INTEGER column —
    the classic fabricated-amounts / broken-ETL screen: naturally
    occurring multiplicative amounts put ~30.1% of first digits at 1,
    uniform or synthetic fills don't.

    The first significant digit comes from the bigint's STRING form
    (substring, exact in every engine) — never floor(v/10^floor(log10
    v)), whose log10 is only exactness-guaranteed at powers of ten on
    the JVM and not at all elsewhere. Counts are exact bigints; the
    observed share is one division per digit row against a broadcast
    1-row total, and the reference probability joins in as a pinned
    literal (BENFORD_P), so ``abs_dev`` subtracts identical bits in
    both engines. Non-positive values are excluded (Benford is
    defined on positive magnitudes) but reported via ``n_total`` vs
    the digit-row sum.

    Output: 9 rows (digit, n, share, benford_p, abs_dev) — tiny at
    any input scale; the single shuffle is the 9-key digit count."""
    digit = F.substring(F.col(value_col).cast("string"), 1, 1).cast("int")
    pos = df.where(F.col(value_col) > 0)
    counts = pos.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = counts.agg(F.sum("n").cast("bigint").alias("_t"))
    p = F.lit(None).cast("double")
    for d, v in reversed(sorted(BENFORD_P.items())):
        p = F.when(F.col("digit") == d, F.lit(v)).otherwise(p)
    share = F.col("n").cast("double") / F.col("_t").cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            share.alias("share"),
            p.alias("benford_p"),
            F.abs(share - p).alias("abs_dev"),
        )
    )
