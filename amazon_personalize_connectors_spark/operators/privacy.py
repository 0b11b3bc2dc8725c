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


def t_closeness_classes(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t_threshold_q: int = 375_000_000,
    scale: int = 10**9,
    max_categories: int = 10_000,
) -> DataFrame:
    """t-closeness audit for an ORDERED sensitive attribute: per
    quasi-identifier equivalence class, the Earth Mover's Distance
    between the class's sensitive-value distribution and the global
    one. k-anonymity/l-diversity miss the "skewed class" leak — a
    class whose members all sit in the top salary decile discloses
    plenty even with k large and l diverse; t-closeness is the
    standard fix (Li, Li & Venkatasubramanian, ICDE 2007).

    For m equal-spaced ordered categories, EMD(P, Q) =
    (1/(m-1)) * Σ_i |cumP_i - cumQ_i|. Everything stays in exact
    integer arithmetic: with class counts c_i (size n) and global
    counts g_i (total N), |cumP_i - cumQ_i| = |N·cumc_i - n·cumg_i| /
    (n·N), so the reported statistic is the exact integer quotient
    ``t_q = (Σ_i |N·cumc_i - n·cumg_i| · scale) div ((m-1)·n·N)`` —
    engine-portable, no float accumulation. t_q/scale ∈ [0, 1].

    Scale shape: ONE record-level groupBy collapses to the
    (class × present-category) table; the category grid is a
    dimension domain (``enforce_bounded_grid``) that BROADCASTS onto
    the class table (fan-out m rows per class — rows ∝ classes·m,
    never ∝ records); cumulative sums run in windows PARTITIONED BY
    the class key (m rows per partition, no global sort). The global
    total rides back as a 1-row broadcast.

    Returns (quasi..., class_size, t_q, t_violation) — one row per
    class; ``t_violation = t_q > t_threshold_q`` (default 0.375,
    the ICDE paper's running example threshold)."""
    from pyspark.sql import Window

    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    d38 = "decimal(38,0)"
    s = F.col(sensitive_col)

    cats = df.groupBy(s.alias("_cat")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_g")
    )
    cats = enforce_bounded_grid(
        cats, max_categories, "t_closeness_classes", keep_count_col=True
    )
    w_cat = (
        Window.partitionBy("_grid_n")
        .orderBy(F.col("_cat").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cat_grid = cats.select(
        "_grid_n",
        "_cat",
        F.sum("_g").over(w_cat).cast(d38).alias("_cumg"),
    )
    tot = df.agg(F.count(F.lit(1)).cast(d38).alias("_N"))

    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )
    cc = df.groupBy(*quasi_cols, s.alias("_cat")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    # class × full category grid (missing categories still move mass:
    # their cumulative term is nonzero), then the per-class cumsum
    fan = (
        classes.join(F.broadcast(cat_grid), how="cross")
        .join(cc, [*quasi_cols, "_cat"], "left")
        .crossJoin(F.broadcast(tot))
    )
    w_cls = (
        Window.partitionBy(*quasi_cols)
        .orderBy(F.col("_cat").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    terms = fan.select(
        *quasi_cols,
        "class_size",
        "_grid_n",
        "_N",
        F.abs(
            F.col("_N")
            * F.sum(F.coalesce(F.col("_c"), F.lit(0)).cast(d38)).over(w_cls)
            - F.col("class_size").cast(d38) * F.col("_cumg")
        )
        .cast(d38)
        .alias("_term"),
    )
    per_class = terms.groupBy(*quasi_cols, "class_size", "_grid_n", "_N").agg(
        F.sum("_term").cast(d38).alias("_t_num")
    )
    # `div` on decimal(38,0) is EXACT integer quotient (oracle: HUGEINT //)
    t_q = F.when(
        F.col("_grid_n") > 1,
        F.expr(
            f"(_t_num * CAST({scale} AS decimal(38,0))) div "
            "((_grid_n - 1) * class_size * _N)"
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return per_class.select(
        *quasi_cols,
        "class_size",
        t_q.alias("t_q"),
        (t_q > F.lit(t_threshold_q)).cast("int").alias("t_violation"),
    )
