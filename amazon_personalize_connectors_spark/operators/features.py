"""Feature-engineering operators for training-data preparation — the
transforms a team feeding the reference's interaction exports into a
model (Personalize or their own) runs between the raw connector
output and the training job: leakage-safe categorical encodings,
robust numeric clamping, and sequence-example generation.

Scale shapes:

* ``target_encoding_loo`` is groupBy-aggregate + equi-join-back, NOT
  a window over the category partition: a window would pull every row
  of a hot category into one task (the exact skew a popularity-
  skewed catalog guarantees), while the join-back form shuffles both
  sides hash-partitioned — AQE's skew-join splitting applies — and
  the per-category aggregate side is tiny, usually broadcast.
* ``winsorize_stats`` and ``robust_outlier_stats`` use the DISCRETE
  (inverse-CDF) percentile — the group value at rank
  ``ceil(pct/100 * n)`` — not interpolated ``percentile``: rank
  selection is pure integer arithmetic, so the bounds are actual
  data values and every downstream clamp/count/sum is engine-exact
  (the histogram_quantiles portability lesson). Both collapse the
  raw rows to the (group, value, count) GRID before any ranking —
  the window sorts grid rows (bounded by value-domain cardinality),
  never raw rows, so a low-cardinality group key cannot funnel a
  group's full row set through one task at scale.
* ``next_item_examples`` is row-local generation: one sort-shuffle
  per user (the window), then each example's context is a bounded
  slice of the running collect_list frame — rows out ∝ interactions,
  memory bounded by ``context_len``, no self-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.operators.ids import (
    add_running_totals,
)


def target_encoding_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "te_loo",
) -> DataFrame:
    """Leave-one-out target encoding: each row's category is encoded
    as the mean of ``target_col`` over all OTHER rows of the same
    category — ``(sum_cat - y) / (n_cat - 1)`` — the standard
    leakage-safe mean encoding (including the row's own target leaks
    the label into its feature). Singleton categories encode NULL
    (no other rows to average).

    Shape: per-category (sum, count) via one map-side-combinable
    aggregate, joined back on the category key. The aggregate side
    has one row per category — Spark auto-broadcasts it under the
    threshold, and past it the equi-join stays skew-splittable under
    AQE, unlike a window over the category partition which would pin
    each hot category to a single task."""
    stats = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("_te_sum"),
        F.count(target_col).alias("_te_n"),
    )
    joined = df.join(stats, cat_col, "left")
    loo = F.when(
        F.col("_te_n") > 1,
        # integer zero: a 0.0 literal would promote the numerator to
        # double and break the "exact integral sums, one promoting
        # division at the end" contract past 2^53
        (F.col("_te_sum") - F.coalesce(F.col(target_col), F.lit(0)))
        / (F.col("_te_n") - F.when(F.col(target_col).isNotNull(), 1).otherwise(0)),
    )
    return joined.withColumn(out_col, loo).drop("_te_sum", "_te_n")


def winsorize_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Winsorized summary per group: clamp ``value_col`` into the
    group's [lo_pct, hi_pct] discrete-percentile band, then report
    per group the bounds, the clamped mean, and how many rows hit
    each side — the outlier-robust version of a grouped mean (a
    single fat-finger price doesn't drag the feature).

    The bound at percentile p is the group's value at rank
    ``ceil(p/100 * n)`` (inverse CDF) — rank math is integer-exact
    (``(n*p + 99) div 100``), the bounds are actual data values, and
    with an integer ``value_col`` (the engine's cents convention)
    every clamp, count, and sum downstream is exact and
    engine-portable — no interpolation, no float drift.

    Scale shape: the raw rows are NEVER ranked. The input collapses
    to the (group, value, count) GRID in one map-side-combinable
    aggregate (the ks_two_sample / histogram_quantiles pattern), the
    rank-r bound is read off the grid's running count (``min value
    whose cumulative count >= r``), and the clamp statistics are
    grid-side sums (``count * clamp(value)``). The only sort is a
    window over the GRID partition — bounded by the value-domain
    cardinality (cents of a bounded price range), not by row count,
    so a 100x data scale-up grows the grid sublinearly while a
    raw-row ``row_number()`` over a 3-value group key would funnel
    every row of a group through one task. Raw data is scanned
    exactly once."""
    grid = df.groupBy(
        *group_cols, F.col(value_col).alias("_v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("_cum", F.sum("_c").over(w_cum))
    tot = grid.groupBy(*group_cols).agg(F.sum("_c").alias("_n"))
    g2 = cum.join(F.broadcast(tot), list(group_cols))
    lo_rank = F.expr(f"(_n * {lo_pct} + 99) div 100")
    hi_rank = F.expr(f"(_n * {hi_pct} + 99) div 100")
    bounds = g2.groupBy(*group_cols).agg(
        F.min(F.when(F.col("_cum") >= lo_rank, F.col("_v"))).alias("lo_bound"),
        F.min(F.when(F.col("_cum") >= hi_rank, F.col("_v"))).alias("hi_bound"),
        F.max("_n").cast("bigint").alias("n_rows"),
    )
    clamped = grid.join(F.broadcast(bounds), list(group_cols)).select(
        *group_cols,
        "n_rows",
        "lo_bound",
        "hi_bound",
        (
            F.col("_c")
            * F.greatest(
                F.col("lo_bound"), F.least(F.col("hi_bound"), F.col("_v"))
            )
        ).alias("_wsum"),
        F.when(F.col("_v") < F.col("lo_bound"), F.col("_c"))
        .otherwise(F.lit(0))
        .alias("_clo"),
        F.when(F.col("_v") > F.col("hi_bound"), F.col("_c"))
        .otherwise(F.lit(0))
        .alias("_chi"),
        F.col("_c"),
    )
    return clamped.groupBy(*group_cols).agg(
        F.first("n_rows").alias("n_rows"),
        F.first("lo_bound").alias("lo_bound"),
        F.first("hi_bound").alias("hi_bound"),
        (F.sum("_wsum").cast("double") / F.sum("_c")).alias(
            "winsorized_mean"
        ),
        F.sum("_clo").cast("bigint").alias("n_clamped_lo"),
        F.sum("_chi").cast("bigint").alias("n_clamped_hi"),
    )


def next_item_examples(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    order_cols: Sequence[str],
    context_len: int = 3,
) -> DataFrame:
    """Sequence-model training examples from interaction histories:
    for each user's interaction stream (ordered by ``order_cols``,
    which must be a deterministic total order within user), emit one
    (context, label) example per interaction after the first — the
    context is the up-to-``context_len`` immediately preceding items.
    This is the sequential-recommendation dataset builder (next-item
    prediction over the reference's interaction export).

    Row-local: ONE sort-shuffle on the user partition; each row's
    context is the running ``collect_list`` over a bounded preceding
    frame (``context_len`` rows), so memory per row is bounded by the
    context, rows out = interactions - users, and no self-join or
    per-user re-scan happens. Output: (user, pos, context array,
    label)."""
    w = Window.partitionBy(user_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    ctx_frame = w.rowsBetween(-context_len, -1)
    return (
        interactions.select(
            F.col(user_col).alias("user"),
            F.col(item_col).alias("label"),
            F.row_number().over(w).alias("pos"),
            F.collect_list(item_col).over(ctx_frame).alias("context"),
        )
        .where(F.col("pos") >= 2)
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    in_a: Column,
    in_b: Column,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the
    distributions of ``value_col`` in subpopulation A (rows where
    ``in_a``) and B (rows where ``in_b``) — the train-vs-serve /
    yesterday-vs-today drift check a feature pipeline runs before
    trusting a refresh. Returns ONE row: (n_a, n_b, ks_num, ks_stat)
    where ks_stat = max_x |F_A(x) − F_B(x)|.

    Exactness: with an integer-ish value column the whole computation
    is integer until the final division — the sup is taken over
    ``|cum_a·n_b − cum_b·n_a|`` (bigint) and divided by ``n_a·n_b``
    once, so the statistic is engine-portable bit-for-bit.

    Scale: per-value pair counts are one map-side-combinable
    aggregate (rows ∝ distinct values); the two cumulative
    distributions ride ONE distributed prefix-sum
    (``add_running_totals`` — range-partition + per-partition offset
    collect, no single-task global window); totals ride in as a
    broadcast 1-row aggregate. The KS sup only needs F evaluated at
    sample points, which the per-value grid is."""
    # materialize the per-value grid ONCE: the range partitioner's
    # boundary sampling, the prefix-sum shuffle, and the totals
    # aggregate all read this frame — without the checkpoint each one
    # re-runs the full input aggregation (measured 3x the runtime)
    per_v = (
        df.groupBy(F.col(value_col).alias("_v"))
        .agg(
            F.sum(in_a.cast("long")).alias("_a"),
            F.sum(in_b.cast("long")).alias("_b"),
        )
        .localCheckpoint(eager=True)
    )
    cum = add_running_totals(per_v, ["_v"], {"_a": "_ca", "_b": "_cb"})
    tot = per_v.agg(
        F.sum("_a").cast("bigint").alias("n_a"),
        F.sum("_b").cast("bigint").alias("n_b"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n_a",
            "n_b",
            F.abs(
                F.col("_ca") * F.col("n_b") - F.col("_cb") * F.col("n_a")
            ).alias("_num"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("_num").cast("bigint").alias("ks_num"))
        .select(
            "n_a",
            "n_b",
            "ks_num",
            # an empty subpopulation has no distribution to compare —
            # ks_stat is NULL, not an ANSI 0/0 (degenerate-input guard)
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.col("ks_num") / (F.col("n_a") * F.col("n_b")),
            ).alias("ks_stat"),
        )
    )


def robust_outlier_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 5,
) -> DataFrame:
    """Median/MAD outlier screen per group: a value is an outlier when
    ``|v - median| > k * MAD`` (MAD = median absolute deviation) — the
    robust alternative to mean/std bands (one fat-finger row moves a
    mean band; it cannot move the median or the MAD).

    Both medians are DISCRETE (the value at rank ``ceil(n/2)`` — the
    lower median): with an integer ``value_col`` every statistic,
    deviation, threshold, and count is integer-exact and
    engine-portable, the same portability rule as winsorize_stats.

    Scale shape: the raw rows are NEVER ranked. One map-side-
    combinable aggregate collapses the input to the (group, value,
    count) grid; the median is the grid value whose running count
    first reaches rank ``(n+1) div 2``; the deviation DISTRIBUTION is
    the grid re-keyed on ``|v - median|`` (a second grid aggregate —
    values below and above the median collide, so counts re-merge);
    the MAD is the deviation grid's rank read; the outlier count and
    max deviation are grid-side sums. Every window sorts GRID rows
    (bounded by value-domain cardinality, not row count), and raw
    data is scanned exactly once."""
    grid = df.groupBy(
        *group_cols, F.col(value_col).alias("_v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("_cum", F.sum("_c").over(w_cum))
    tot = grid.groupBy(*group_cols).agg(F.sum("_c").alias("_n"))
    g2 = cum.join(F.broadcast(tot), list(group_cols))
    med_rank = F.expr("(_n + 1) div 2")
    med = g2.groupBy(*group_cols).agg(
        F.min(F.when(F.col("_cum") >= med_rank, F.col("_v"))).alias("median"),
        F.max("_n").cast("bigint").alias("n_rows"),
    )
    # deviation grid: re-key the value grid on |v - median| and
    # re-merge counts (v = median - d and v = median + d collide)
    dev_grid = (
        grid.join(F.broadcast(med), list(group_cols))
        .groupBy(
            *group_cols,
            "median",
            "n_rows",
            F.abs(F.col("_v") - F.col("median")).alias("_d"),
        )
        .agg(F.sum("_c").alias("_dc"))
    )
    wd_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev_cum = dev_grid.withColumn("_dcum", F.sum("_dc").over(wd_cum))
    mad = dev_cum.groupBy(*group_cols).agg(
        F.min(
            F.when(F.col("_dcum") >= F.expr("(n_rows + 1) div 2"), F.col("_d"))
        ).alias("mad")
    )
    flagged = dev_grid.join(F.broadcast(mad), list(group_cols)).select(
        *group_cols,
        "n_rows",
        "median",
        "mad",
        F.when(F.col("_d") > F.lit(k) * F.col("mad"), F.col("_dc"))
        .otherwise(F.lit(0))
        .alias("_out"),
        "_d",
    )
    return flagged.groupBy(*group_cols).agg(
        F.first("n_rows").alias("n_rows"),
        F.first("median").alias("median"),
        F.first("mad").alias("mad"),
        F.sum("_out").cast("bigint").alias("n_outliers"),
        F.max("_d").cast("bigint").alias("max_abs_dev"),
    )


def grouped_pearson(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact Pearson correlation per group over two INTEGER columns
    (the engine's cents convention) — "does quantity actually track
    price in this segment?" without ever trusting a float
    accumulator.

    The five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) are accumulated
    as decimal(38,0) — exact and associative, so partition layout
    cannot change them (a double Σxy drifts in the last ulp with
    accumulation order). The correlation is then one fixed IEEE tail
    on the exact moments:

        num = n·Σxy − Σx·Σy;  dx = n·Σx² − (Σx)²;  dy likewise
        r   = num / sqrt(dx · dy)        (NULL when either var is 0)

    Bound check for 100-TB inputs: with |x|,|y| ≤ 10^7 (cents) and
    10^12 rows, n·Σxy ≤ 10^33 — inside decimal(38,0).

    Output: (*group_cols, n, r_num, r_dx, r_dy, r). The moment
    combinations are computed EXACTLY in decimal and then emitted as
    doubles — a correctly-rounded conversion of an exact value is
    deterministic (layout-independent), unlike a double ACCUMULATOR;
    the oracle computes the same exact integers (int128) and performs
    the same final conversions."""
    d = "decimal(38,0)"
    x = F.col(x_col).cast(d)
    y = F.col(y_col).cast(d)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(d).alias("_n"),
        F.sum(x).cast(d).alias("_sx"),
        F.sum(y).cast(d).alias("_sy"),
        F.sum((x * y).cast(d)).cast(d).alias("_sxy"),
        F.sum((x * x).cast(d)).cast(d).alias("_sxx"),
        F.sum((y * y).cast(d)).cast(d).alias("_syy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(d)
    dx = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(d)
    dy = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(d)
    return agg.select(
        *group_cols,
        F.col("_n").cast("bigint").alias("n"),
        num.cast("double").alias("r_num"),
        dx.cast("double").alias("r_dx"),
        dy.cast("double").alias("r_dy"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("r"),
    )


def grouped_spearman(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact Spearman rank correlation per group — the monotone-trend
    check that is robust to the outliers Pearson chases.

    Ranks come from the value GRID with the closed-form tie run: a
    value with c occurrences and k values-below occupies average rank
    k + (c+1)/2, so DOUBLED ranks ``2k + c + 1`` are integers and
    rank assignment needs no raw-row window (the winsorize/KS grid
    rule) — one grid per column, ranks joined back on (group, value).
    Spearman is then Pearson on the doubled ranks (scale-invariant),
    reusing ``grouped_pearson``'s exact decimal moment machinery.

    Output: (*group_cols, n, r_num, r_dx, r_dy, rho)."""
    def rank2(col: str, out: str) -> DataFrame:
        grid = df.groupBy(
            *group_cols, F.col(col).alias("_v")
        ).agg(F.count(F.lit(1)).alias("_c"))
        w = (
            Window.partitionBy(*group_cols)
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return grid.select(
            *group_cols,
            F.col("_v").alias(col),
            (
                2 * F.coalesce(F.sum("_c").over(w), F.lit(0))
                + F.col("_c")
                + 1
            ).cast("bigint").alias(out),
        )
    keys = [*group_cols]
    ranked = (
        df.select(*group_cols, x_col, y_col)
        .join(rank2(x_col, "_rx2"), [*keys, x_col])
        .join(rank2(y_col, "_ry2"), [*keys, y_col])
    )
    out = grouped_pearson(ranked, group_cols, "_rx2", "_ry2")
    return out.withColumnRenamed("r", "rho")


def tv_distance(
    df: DataFrame,
    value_col: str,
    in_a: Column,
    in_b: Column,
) -> DataFrame:
    """Total-variation distance between the distributions of
    ``value_col`` in subpopulations A and B — the pointwise drift
    metric that complements the KS sup (``ks_two_sample``): KS sees
    the worst single CDF gap, TV sees the total mass that moved.

        TV = ½ Σ_v |p_A(v) − p_B(v)|
           = Σ_v |a_v·n_b − b_v·n_a| / (2·n_a·n_b)

    Integer-exact: per-value counts, cross-multiplied absolute
    differences summed in bigint, ONE division — engine-portable
    bit-for-bit. Even simpler than KS at scale: no cumulative pass at
    all, just the map-side-combinable (value, count_a, count_b) grid,
    the 1-row totals broadcast, and one aggregate. Returns ONE row
    (n_a, n_b, tv_num, tv_stat); tv_stat ∈ [0, 1]."""
    per_v = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.sum(in_a.cast("long")).alias("_a"),
        F.sum(in_b.cast("long")).alias("_b"),
    )
    tot = per_v.agg(
        F.sum("_a").cast("bigint").alias("n_a"),
        F.sum("_b").cast("bigint").alias("n_b"),
    )
    return (
        per_v.crossJoin(F.broadcast(tot))
        .select(
            "n_a",
            "n_b",
            F.abs(
                F.col("_a") * F.col("n_b") - F.col("_b") * F.col("n_a")
            ).alias("_d"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.sum("_d").cast("bigint").alias("tv_num"))
        .select(
            "n_a",
            "n_b",
            "tv_num",
            # empty subpopulation: no distribution — NULL, never an
            # ANSI 0/0 (Spark 4 ANSI raises even on double division)
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.col("tv_num").cast("double")
                / (2 * F.col("n_a") * F.col("n_b")).cast("double"),
            ).alias("tv_stat"),
        )
    )


def grouped_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact simple-linear-regression (OLS) fit per group over two
    INTEGER columns — slope/intercept/R² for "how many cents does one
    more unit add?" features, without a float accumulator anywhere.

    Reuses ``grouped_pearson``'s decimal(38,0) moment sums (exact and
    associative — partition layout cannot change them), then the
    closed forms ride a FIXED IEEE expression tree over the exact
    moments:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n        (doubles, fixed order)
        r2        = num² / (dx·dy)             (num/dx/dy exact)

    A correctly-rounded conversion of an exact decimal is
    deterministic, and each subsequent double op is IEEE-defined, so
    the result is bit-stable across partitionings and engines — the
    oracle mirrors the identical expression tree on int128 moments.
    Degenerate groups (zero x-variance) yield NULL slope/intercept;
    r2 is NULL when either variance is 0.

    Output: (*group_cols, n, slope, intercept, r2)."""
    d = "decimal(38,0)"
    x = F.col(x_col).cast(d)
    y = F.col(y_col).cast(d)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(d).alias("_n"),
        F.sum(x).cast(d).alias("_sx"),
        F.sum(y).cast(d).alias("_sy"),
        F.sum((x * y).cast(d)).cast(d).alias("_sxy"),
        F.sum((x * x).cast(d)).cast(d).alias("_sxx"),
        F.sum((y * y).cast(d)).cast(d).alias("_syy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(d)
    dx = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(d)
    dy = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(d)
    slope = F.when(dx > 0, num.cast("double") / dx.cast("double"))
    intercept = F.when(
        dx > 0,
        (
            F.col("_sy").cast("double")
            - (num.cast("double") / dx.cast("double"))
            * F.col("_sx").cast("double")
        )
        / F.col("_n").cast("double"),
    )
    r2 = F.when(
        (dx > 0) & (dy > 0),
        (num.cast("double") * num.cast("double"))
        / (dx.cast("double") * dy.cast("double")),
    )
    return agg.select(
        *group_cols,
        F.col("_n").cast("bigint").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def chi2_independence(
    df: DataFrame,
    a_col: str,
    b_col: str,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Chi-square test of independence between two categorical
    columns, deterministic at any partitioning — the "are these two
    labels actually related?" screen for drift and feature audits.

    All counts (cells o, row totals rt, column totals ct, grand N)
    are exact bigints; the per-cell deviation is formed EXACTLY in
    decimal(38,0) by cross-multiplication (o·N − rt·ct — no expected
    value is ever divided out), so the only inexact step is one fixed
    per-cell IEEE tail:  term = dev² / (rt·ct·N).

    Summing those double terms with a shuffle would be
    order-sensitive, so each term is QUANTIZED first —
    floor(term·scale) — and the exact bigint quanta are summed
    (associative, layout-independent), then divided once: the
    ipw_weighted_ratio pattern. The quantization under-states chi²
    by < n_cells/scale (≤ 10⁻⁶ at default scale for 1000 cells) —
    documented, deterministic, and mirrored exactly by the oracle.

    Bound: a quantum must fit a bigint, i.e. per-cell term·scale
    < 2⁶³ (term < ~9.2e9 at default scale — a single cell carrying
    chi² past ~10¹⁰ of association). Past it the cell RAISES instead
    of silently clamping (non-ANSI double→bigint casts saturate);
    callers with stronger association at that magnitude should lower
    ``scale``.

    Row/column marginals ride in as broadcast dims (cell grid is
    |A|·|B|, never data-sized). Output is ONE row:
    (n, n_cells, dof, chi2, cramers_v)."""
    d = "decimal(38,0)"
    a, b = F.col(a_col), F.col(b_col)
    cells = df.groupBy(a.alias("_a"), b.alias("_b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_o")
    )
    rt = cells.groupBy("_a").agg(F.sum("_o").alias("_rt"))
    ct = cells.groupBy("_b").agg(F.sum("_o").alias("_ct"))
    tot = cells.agg(
        F.sum("_o").cast("bigint").alias("_nn"),
        F.countDistinct("_a").cast("bigint").alias("_ra"),
        F.countDistinct("_b").cast("bigint").alias("_cb"),
    )
    dev = (
        F.col("_o").cast(d) * F.col("_nn").cast(d)
        - F.col("_rt").cast(d) * F.col("_ct").cast(d)
    ).cast(d)
    den = (
        F.col("_rt").cast(d) * F.col("_ct").cast(d) * F.col("_nn").cast(d)
    ).cast(d)
    term = (
        dev.cast("double") * dev.cast("double") / den.cast("double")
    )
    quanta = (
        cells.join(F.broadcast(rt), "_a")
        .join(F.broadcast(ct), "_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "_nn",
            "_ra",
            "_cb",
            F.when(
                term * F.lit(float(scale)) < F.lit(9.0e18),
                F.floor(term * F.lit(float(scale))).cast("bigint"),
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        "chi2_independence: per-cell term * scale exceeds "
                        "the bigint quantum range; lower `scale`"
                    )
                ).cast("bigint")
            )
            .alias("_q"),
        )
    )
    chi2 = F.col("_chi2_q").cast("double") / F.lit(float(scale))
    dof = (F.col("_ra") - 1) * (F.col("_cb") - 1)
    return (
        quanta.groupBy("_nn", "_ra", "_cb")
        .agg(
            F.sum("_q").cast("bigint").alias("_chi2_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        )
        .select(
            F.col("_nn").alias("n"),
            "n_cells",
            dof.cast("bigint").alias("dof"),
            chi2.alias("chi2"),
            F.when(
                (F.col("_nn") > 0) & (dof > 0),
                F.sqrt(
                    chi2
                    / (
                        F.col("_nn").cast("double")
                        * F.least(F.col("_ra") - 1, F.col("_cb") - 1).cast(
                            "double"
                        )
                    )
                ),
            ).alias("cramers_v"),
        )
    )


def psi_drift(
    df: DataFrame,
    bin_col: str,
    in_a: Column,
    in_b: Column,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Population Stability Index between the distributions of a
    PRE-BINNED column in subpopulations A and B — the industry drift
    score that complements the KS sup (worst CDF gap) and TV (total
    mass moved) over the same populations:

        PSI = Σ_bins (p_A − p_B) · ln(p_A / p_B)

    Bins with mass on only one side make the log blow up; instead of
    an arbitrary smoothing epsilon (which would bury a determinism
    landmine in a tunable), the shared-support bins carry the PSI sum
    and the one-sided mass comes back as EXACT integer numerators
    (only_a_num/n_a, only_b_num/n_b) for the caller to judge — no
    information is lost and nothing is fudged.

    Determinism: per-bin counts are exact bigints; the cross-product
    difference a·n_b − b·n_a is formed exactly in decimal(38,0)
    (counts can exceed 2^31 at warehouse scale, so the product needs
    38 digits); each bin's double term rides a FIXED IEEE tree
    ((diff/ (n_a·n_b)) · ln((a·n_b)/(b·n_a))) and is QUANTIZED —
    floor(term·scale) — so the shuffle sums exact bigint quanta
    (associative, layout-independent): the chi2_independence pattern.
    Every term is ≥ 0 ((p_A−p_B) and ln(p_A/p_B) share sign), so the
    quantization understates PSI by < n_bins/scale. One aggregate
    over the (bin, a, b) grid; the grid is map-side combinable and
    bounded by the bin domain, never data-sized.

    Output ONE row: (n_a, n_b, n_bins_shared, psi, only_a_num,
    only_b_num)."""
    cells = df.groupBy(F.col(bin_col).alias("_bin")).agg(
        F.sum(in_a.cast("long")).alias("_a"),
        F.sum(in_b.cast("long")).alias("_b"),
    )
    return _psi_from_cells(cells, scale)


def _psi_from_cells(
    cells: DataFrame, scale: int = 1_000_000_000
) -> DataFrame:
    """PSI core over an aggregated (_bin, _a, _b) grid — psi_drift's
    tail, split out alongside js_divergence_from_cells so a mergeable
    grid store can serve either statistic."""
    d = "decimal(38,0)"
    tot = cells.agg(
        F.sum("_a").cast("bigint").alias("n_a"),
        F.sum("_b").cast("bigint").alias("n_b"),
    )
    g = cells.crossJoin(F.broadcast(tot))
    diff = (
        F.col("_a").cast(d) * F.col("n_b").cast(d)
        - F.col("_b").cast(d) * F.col("n_a").cast(d)
    ).cast(d)
    lr = F.log(
        (F.col("_a").cast("double") * F.col("n_b").cast("double"))
        / (F.col("_b").cast("double") * F.col("n_a").cast("double"))
    )
    term = (
        diff.cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    ) * lr
    shared = (F.col("_a") > 0) & (F.col("_b") > 0)
    q = F.when(
        shared, F.floor(term * F.lit(float(scale))).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        g.select(
            "n_a",
            "n_b",
            q.alias("_q"),
            shared.cast("long").alias("_sh"),
            F.when(F.col("_b") == 0, F.col("_a")).otherwise(0).alias("_oa"),
            F.when(F.col("_a") == 0, F.col("_b")).otherwise(0).alias("_ob"),
        )
        .groupBy("n_a", "n_b")
        .agg(
            F.sum("_q").cast("bigint").alias("_psi_q"),
            F.sum("_sh").cast("bigint").alias("n_bins_shared"),
            F.sum("_oa").cast("bigint").alias("only_a_num"),
            F.sum("_ob").cast("bigint").alias("only_b_num"),
        )
        .select(
            "n_a",
            "n_b",
            "n_bins_shared",
            (F.col("_psi_q").cast("double") / F.lit(float(scale))).alias(
                "psi"
            ),
            "only_a_num",
            "only_b_num",
        )
    )


def stratified_kfold(
    df: DataFrame,
    key_col: str,
    k: int,
    fold_col: str = "fold",
) -> DataFrame:
    """Leakage-safe k-fold assignment: every row with the same key
    lands in the same fold (grouped split — the property that keeps a
    user/customer/document from straddling train and validation), via
    a PORTABLE deterministic hash written in plain bigint arithmetic:

        fold = ((key mod M) * 48271 mod M) mod k,  M = 2^31 - 1

    (the MINSTD Lehmer step — multiplier and modulus chosen so the
    product stays < 2^47, exactly representable in bigint on any
    engine, which is what lets the DuckDB oracle run the SAME
    expression rather than trusting an engine-specific hash). Keys
    must be non-negative integers; row-local codegen, zero shuffles.
    """
    if k <= 1:
        raise ValueError(f"k must be >= 2; got {k}")
    key = F.col(key_col).cast("bigint")
    m = F.lit(2_147_483_647).cast("bigint")
    fold = ((key % m) * F.lit(48271).cast("bigint") % m) % F.lit(k).cast(
        "bigint"
    )
    return df.withColumn(fold_col, fold.cast("int"))


def kfold_report(
    df: DataFrame,
    strata_cols: Sequence[str],
    key_col: str,
    k: int,
) -> DataFrame:
    """Fold-balance audit for a stratified grouped split: per
    (stratum, fold) the row count and distinct-key count — the table
    a training pipeline checks before trusting its CV folds. One
    map-side-combinable aggregate over the folded frame."""
    folded = stratified_kfold(df, key_col, k)
    return folded.groupBy(*strata_cols, "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct(key_col).cast("bigint").alias("n_keys"),
    )


def mannwhitney_u(
    df: DataFrame,
    group_col: str,
    a_label: str,
    b_label: str,
    value_col: str,
    max_grid_rows: int = 1_000_000,
) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) test between
    groups ``a_label`` and ``b_label`` of an integer-valued metric —
    the nonparametric A/B answer to "did the distribution shift?"
    that complements the mean-based test in q:ab_test_purchase and
    the per-segment AUC (evaluation.py grouped_auc, which uses the
    same rank-sum identity for scoring rather than testing).

    Exact arithmetic end-to-end, then one fixed IEEE tail:

    * per distinct value: group counts ca/cb and total c are exact
      bigints; the midrank is carried DOUBLED so ties stay integral
      (two_r = 2*r_lo + c + 1 where r_lo = #values strictly below);
    * 2*R_A = sum(ca * two_r) and the tie term T = sum(c^3 - c) are
      accumulated in decimal(38,0) — layout-independent exact sums
      (c^3 overflows bigint at warehouse cardinalities, the
      chi2_independence rule) — but EMITTED as bigint: a DECIMAL in
      a final SELECT converts differently across DuckDB/pandas
      versions (float64 vs Decimal object — the r6 oracle-parity
      incident), while bigint -> double is one correctly-rounded
      IEEE conversion every engine agrees on. The emitted values
      (2*U_A <= n(2n+1), T <= n^3 over the tie multiset) fit bigint
      up to n ~ 2*10^9 rows in the two groups combined; beyond that
      the decimal(38,0)->bigint cast FAILS LOUDLY under the ANSI
      mode this repo runs (CAST_OVERFLOW — never a silent NULL or
      wrap; ADVICE r7 corrected the earlier claim here), and callers
      should re-emit decimal via a VARCHAR bridge;
    * 2*U_A = 2*R_A - nA*(nA+1); the z-score and rank-biserial
      effect size are fixed per-row IEEE trees over bigint->double
      casts of those exact values (the wilson_bounds rule), mirrored
      verbatim by the oracle:

          var12 = nA*nB * ((n+1) - T/(n*(n-1))) / 12
          z     = (2*U_A - nA*nB) / (2*sqrt(var12))
          r_rb  = (2*U_A - nA*nB) / (nA*nB)

    Scale shape: one map-side-combinable groupBy collapses the data
    to the DISTINCT-VALUE grid (a priced/ counted metric domain —
    bounded, and enforced by ``max_grid_rows``); the cumulative rank
    rides one grid window partitioned on the guard column; totals
    broadcast back as a 1-row frame. Returns ONE row:
    (n_a, n_b, two_u_a, tie_cubes, z, r_rb)."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    d38 = "decimal(38,0)"
    vals = df.where(F.col(group_col).isin(a_label, b_label)).select(
        F.col(value_col).cast("bigint").alias("v"),
        F.when(F.col(group_col) == a_label, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("_ga"),
    )
    cells = vals.groupBy("v").agg(
        F.sum("_ga").cast("bigint").alias("ca"),
        (F.count(F.lit(1)) - F.sum("_ga")).cast("bigint").alias("cb"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    grid = enforce_bounded_grid(
        cells, max_grid_rows, "mannwhitney_u", keep_count_col=True
    )
    w_lo = (
        Window.partitionBy("_grid_n")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = grid.select(
        "ca",
        "c",
        (
            2 * F.coalesce(F.sum("c").over(w_lo), F.lit(0)) + F.col("c") + 1
        )
        .cast("bigint")
        .alias("two_r"),
    )
    agg = ranked.agg(
        F.sum(F.col("ca")).cast("bigint").alias("n_a"),
        F.sum(F.col("c") - F.col("ca")).cast("bigint").alias("n_b"),
        F.sum(F.col("ca").cast(d38) * F.col("two_r").cast(d38))
        .cast(d38)
        .alias("_2ra"),
        F.sum(
            F.col("c").cast(d38) * F.col("c").cast(d38) * F.col("c").cast(d38)
            - F.col("c").cast(d38)
        )
        .cast(d38)
        .alias("tie_cubes"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    # exact columns land as BIGINT (decimal is internal-only: a final
    # DECIMAL converts engine-dependently; see docstring)
    exact = agg.select(
        "n_a",
        "n_b",
        (F.col("_2ra") - (na.cast(d38) * (na + 1).cast(d38)).cast(d38))
        .cast(d38)
        .cast("bigint")
        .alias("two_u_a"),
        F.col("tie_cubes").cast("bigint").alias("tie_cubes"),
    )
    n = (na + nb).cast("bigint")
    dd = lambda c: c.cast("double")  # noqa: E731 — fixed IEEE tree below
    num = dd(
        (F.col("two_u_a").cast(d38) - na.cast(d38) * nb.cast(d38))
        .cast(d38)
        .cast("bigint")
    )
    var12 = (
        dd(na)
        * dd(nb)
        * (
            dd(n + 1)
            - dd(F.col("tie_cubes"))
            / dd((n.cast(d38) * (n - 1).cast(d38)).cast(d38).cast("bigint"))
        )
        / F.lit(12.0)
    )
    return exact.select(
        "n_a",
        "n_b",
        "two_u_a",
        "tie_cubes",
        # var12 == 0 when every pooled value ties (the tie term absorbs
        # the whole (n+1) factor): z is undefined, NOT 0/0 — found by
        # the hypothesis reference test, guarded identically in the
        # oracle
        F.when(
            (na > 0) & (nb > 0) & (n > 1) & (var12 > 0),
            num / (2.0 * F.sqrt(var12)),
        ).alias("z"),
        F.when((na > 0) & (nb > 0), num / (dd(na) * dd(nb))).alias("r_rb"),
    )


def js_divergence(
    df: DataFrame,
    bin_col: str,
    in_a: Column,
    in_b: Column,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Jensen-Shannon divergence between the distributions of a
    PRE-BINNED column in subpopulations A and B — the SYMMETRIC,
    always-finite member of the drift family (PSI blows up on
    one-sided bins and reports them out-of-band; KS only sees the
    worst CDF gap; JSD is bounded by ln 2 and charges one-sided
    mass smoothly):

        JSD = ½ Σ p_A ln(2·p_A / (p_A+p_B))
            + ½ Σ p_B ln(2·p_B / (p_A+p_B))

    with the 0·ln0 = 0 convention, so NO smoothing epsilon is needed
    even on one-sided bins.

    Determinism: bin counts and totals are exact bigints; every log
    argument is a ratio of exact decimal(38,0) cross-products cast to
    double once (2·a·n_b vs a·n_b + b·n_a — no probability is ever
    materialized); each signed per-bin term is one fixed IEEE tree
    QUANTIZED to floor(term·scale) so the shuffle sums exact bigint
    quanta (the chi2/psi pattern; |error| < n_bins/scale, here 10⁻⁶
    for 1000 bins). One aggregate over the map-side-combinable bin
    grid; totals ride back as a 1-row broadcast.

    Output ONE row: (n_a, n_b, n_bins, jsd)."""
    cells = df.groupBy(F.col(bin_col).alias("_bin")).agg(
        F.sum(in_a.cast("long")).alias("_a"),
        F.sum(in_b.cast("long")).alias("_b"),
    )
    return js_divergence_from_cells(cells, "_bin", "_a", "_b", scale)


def js_divergence_from_cells(
    cells: DataFrame,
    bin_col: str,
    a_col: str,
    b_col: str,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """JSD from an already-aggregated (bin, count_a, count_b) grid —
    the entry point a MERGEABLE store uses (streaming/drift_monitor's
    versioned grid feeds this directly; grids merge by sum, so the
    streaming answer equals the batch answer by construction). Same
    exact-quanta contract as ``js_divergence``."""
    cells = cells.select(
        F.col(bin_col).alias("_bin"),
        F.col(a_col).cast("bigint").alias("_a"),
        F.col(b_col).cast("bigint").alias("_b"),
    )
    d = "decimal(38,0)"
    tot = cells.agg(
        F.sum("_a").cast("bigint").alias("n_a"),
        F.sum("_b").cast("bigint").alias("n_b"),
    )
    g = cells.crossJoin(F.broadcast(tot))
    anb = (F.col("_a").cast(d) * F.col("n_b").cast(d)).cast(d)
    bna = (F.col("_b").cast(d) * F.col("n_a").cast(d)).cast(d)
    mix = (anb + bna).cast(d)
    term_a = (
        F.col("_a").cast("double") / F.col("n_a").cast("double")
    ) * F.log(
        (F.lit(2).cast(d) * anb).cast(d).cast("double")
        / mix.cast("double")
    )
    term_b = (
        F.col("_b").cast("double") / F.col("n_b").cast("double")
    ) * F.log(
        (F.lit(2).cast(d) * bna).cast(d).cast("double")
        / mix.cast("double")
    )
    # the n_b / n_a guards keep the mix denominator positive inside the
    # evaluated branch: against an EMPTY other population every
    # cross-product is 0 and the log argument would be an ANSI 0/0
    # (Spark 4 ANSI raises even on double division); JSD vs an empty
    # distribution is undefined — the final select emits NULL
    qa = F.when(
        (F.col("_a") > 0) & (F.col("n_b") > 0),
        F.floor(term_a * F.lit(float(scale))).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    qb = F.when(
        (F.col("_b") > 0) & (F.col("n_a") > 0),
        F.floor(term_b * F.lit(float(scale))).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        g.select("n_a", "n_b", qa.alias("_qa"), qb.alias("_qb"))
        .groupBy("n_a", "n_b")
        .agg(
            F.sum(F.col("_qa") + F.col("_qb")).cast("bigint").alias("_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        )
        .select(
            "n_a",
            "n_b",
            "n_bins",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.col("_q").cast("double") / F.lit(float(2 * scale)),
            ).alias("jsd"),
        )
    )


def oof_target_encoding(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    key_col: str,
    k: int = 5,
    out_col: str = "te_oof",
) -> DataFrame:
    """Out-of-fold target encoding: each row's categorical value is
    encoded as the mean target over the OTHER k−1 folds of a grouped
    stratified split — the industrial-strength leakage guard
    (leave-one-out, target_encoding_loo, still leaks through repeated
    keys; fold-level exclusion is what gradient-boosting pipelines
    ship). Folds come from ``stratified_kfold``'s portable Lehmer-step
    hash on ``key_col``, so the whole construction — hash, exclusion,
    and encoding — replays verbatim in the oracle.

    Exactness: per (category, fold) sums and counts are exact bigints
    in ONE map-side-combinable aggregate; per-category totals derive
    from the same tiny grid; the out-of-fold mean is one
    bigint/bigint → double division (engine-deterministic). A
    category seen ONLY in this row's fold has no out-of-fold evidence
    → NULL (the caller imputes a prior; silently substituting the
    global mean would hide the cold-start).

    Scale shape: the (category, fold) grid is |cats|·k rows — it
    broadcasts back onto the data; the data shuffles ZERO times
    (fold is row-local arithmetic, the join is broadcast). Output =
    input + fold + ``out_col``."""
    folded = stratified_kfold(df, key_col, k)
    grid = folded.groupBy(
        F.col(cat_col).alias("_c"), F.col("fold").alias("_f")
    ).agg(
        F.sum(F.col(target_col).cast("bigint")).cast("bigint").alias("_s"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    )
    tots = grid.groupBy("_c").agg(
        F.sum("_s").cast("bigint").alias("_ts"),
        F.sum("_n").cast("bigint").alias("_tn"),
    )
    oof = grid.join(tots, "_c").select(
        "_c",
        "_f",
        (F.col("_ts") - F.col("_s")).alias("_os"),
        (F.col("_tn") - F.col("_n")).alias("_on"),
    )
    return folded.join(
        F.broadcast(oof),
        (folded[cat_col] == oof["_c"]) & (folded["fold"] == oof["_f"]),
        "left",
    ).select(
        *df.columns,
        "fold",
        F.when(
            F.col("_on") > 0,
            F.col("_os").cast("double") / F.col("_on").cast("double"),
        ).alias(out_col),
    )


def woe_iv(
    df: DataFrame,
    bin_col: str,
    label_col: str,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Weight-of-evidence encoding table + information value for a
    PRE-BINNED feature against a binary label — the credit-scoring /
    feature-audit standard: WoE_b = ln((pos_b/Pos)/(neg_b/Neg)) is
    the encoding a scorecard substitutes for the raw category, and
    IV = Σ_b (pos_b/Pos − neg_b/Neg)·WoE_b grades the feature's
    predictive power (the PSI formula pointed at a label instead of
    a second population — same algebra, same exactness treatment).

    Shared-support bins only carry WoE and the IV sum; one-sided
    bins (classic WoE blows up) come back flagged with NULL woe and
    contribute nothing — no smoothing epsilon (the psi_drift rule).
    Counts are exact bigints; each WoE log argument is a ratio of
    exact decimal(38,0) cross-products cast to double once; IV terms
    are individually quantized to bigints so the total is
    layout-independent (the chi2 pattern; terms are ≥ 0 because the
    difference and the log share sign).

    Scale shape: one map-side-combinable groupBy to the bin grid;
    totals and the IV sum ride back as 1-row broadcasts. Output per
    bin: (bin, n_pos, n_neg, woe, iv) — iv constant across rows, the
    feature-level verdict alongside the per-bin encoding."""
    d = "decimal(38,0)"
    y = F.col(label_col).cast("long")
    cells = df.groupBy(F.col(bin_col).alias("bin")).agg(
        F.sum(y).cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum(y)).cast("bigint").alias("n_neg"),
    )
    tot = cells.agg(
        F.sum("n_pos").cast("bigint").alias("_tp"),
        F.sum("n_neg").cast("bigint").alias("_tn"),
    )
    g = cells.crossJoin(F.broadcast(tot))
    pn = (F.col("n_pos").cast(d) * F.col("_tn").cast(d)).cast(d)
    np_ = (F.col("n_neg").cast(d) * F.col("_tp").cast(d)).cast(d)
    shared = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    woe = F.log(pn.cast("double") / np_.cast("double"))
    diff = (pn - np_).cast(d)
    term = (
        diff.cast("double")
        / (F.col("_tp").cast("double") * F.col("_tn").cast("double"))
    ) * woe
    q = F.when(
        shared, F.floor(term * F.lit(float(scale))).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    iv_tot = g.select(q.alias("_q")).agg(
        F.sum("_q").cast("bigint").alias("_iv_q")
    )
    return (
        g.crossJoin(F.broadcast(iv_tot)).select(
            "bin",
            "n_pos",
            "n_neg",
            F.when(shared, woe).alias("woe"),
            (F.col("_iv_q").cast("double") / F.lit(float(scale))).alias("iv"),
        )
    )


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    n_replicates: int = 32,
    seed: str = "b",
    lo_rank: int = 2,
    hi_rank: int = 31,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the MEAN of an
    integer metric — the scale-standard resampling scheme (per
    replicate, each row gets an independent Poisson(1) weight, so no
    global resample coordination is needed and the whole bootstrap is
    one aggregate over a row×replicate fan-out).

    "Random" is the md5 HASH of (seed, replicate, a per-row key
    derived from the row's value and a salt column baked by the
    caller — here the value itself plus monotonically_increasing_id
    would break determinism across layouts, so the caller must
    provide rows whose multiset, not order, defines the result):
    weights come from inverting the Poisson(1) CDF directly on the
    hash's first 13 HEX DIGITS by lexicographic comparison against
    fixed hex-literal thresholds (floor(cdf·2⁵²) in hex) — no
    hex-to-integer conversion anywhere, so the exact same comparison
    runs on any engine, any partitioning (the graph_random_walks
    rule). Each replicate's mean is Σw·x / Σw — exact bigint sums,
    one division; the CI is the exact (lo_rank, hi_rank) order
    statistics of the replicate means, selected by sort-free
    struct-min/max over the B-row replicate table.

    Caveat (documented): hashing on the VALUE means equal-valued rows
    share a weight per replicate — a deliberate determinism/
    independence trade the caller accepts by choosing this operator;
    supply a unique id column via ``value_col``-adjacent salting if
    row-level independence matters.

    Output ONE row: (n_rows, n_replicates, mean, ci_lo, ci_hi)."""
    if not 1 <= lo_rank < hi_rank <= n_replicates:
        raise ValueError("need 1 <= lo_rank < hi_rank <= n_replicates")
    rows = df.select(F.col(value_col).cast("bigint").alias("x"))
    reps = rows.select(
        "x",
        F.explode(
            F.array(*[F.lit(r) for r in range(n_replicates)])
        ).alias("r"),
    )
    # 52 uniform bits as 13 lowercase hex chars; Poisson(1) inverse
    # CDF by lexicographic compare against floor(cdf * 2^52) in hex
    hx = F.substring(
        F.md5(
            F.concat(
                F.lit(f"{seed}|"),
                F.col("r").cast("string"),
                F.lit("|"),
                F.col("x").cast("string"),
            )
        ),
        1,
        13,
    )
    w = (
        F.when(hx < F.lit("5e2d58d8b3bce"), 0)
        .when(hx < F.lit("bc5ab1b16779c"), 1)
        .when(hx < F.lit("eb715e1dc1583"), 2)
        .when(hx < F.lit("fb23979734a25"), 3)
        .otherwise(4)
        .cast("bigint")
    )
    means = (
        reps.select("r", "x", w.alias("w"))
        .groupBy("r")
        .agg(
            F.sum(F.col("w") * F.col("x")).cast("bigint").alias("_swx"),
            F.sum("w").cast("bigint").alias("_sw"),
        )
        .select(
            F.when(
                F.col("_sw") > 0,
                F.col("_swx").cast("double") / F.col("_sw").cast("double"),
            ).alias("m")
        )
    )
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    # the replicate table is a B-row constant grid; the guard makes
    # that executable and keys the ordered window off WindowExec's
    # global-sort warning (the repo's sanctioned-grid pattern)
    means_g = enforce_bounded_grid(
        means, 100_000, "bootstrap_ci replicates", keep_count_col=True
    )
    w_rank = (
        Window.partitionBy("_grid_n")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    idx = means_g.select(
        "m", F.count(F.lit(1)).over(w_rank).alias("_rk")
    )
    lo = idx.where(F.col("_rk") == lo_rank).agg(F.min("m").alias("ci_lo"))
    hi = idx.where(F.col("_rk") == hi_rank).agg(F.min("m").alias("ci_hi"))
    base = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("x").cast("bigint").alias("_sx"),
    )
    return (
        base.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_rows",
            F.lit(n_replicates).cast("bigint").alias("n_replicates"),
            (F.col("_sx").cast("double") / F.col("n_rows").cast("double"))
            .alias("mean"),
            "ci_lo",
            "ci_hi",
        )
    )


def eb_shrunk_rates(
    df: DataFrame,
    key_col: str,
    label_col: str,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial, method of moments) shrinkage
    of per-key conversion rates — the fix for "this item has 1/1 =
    100% CTR": fit a Beta(α, β) prior to the observed per-key rates
    and report each key's posterior mean (pos + α)/(n + α + β), which
    pulls small-sample keys toward the global prior and leaves
    high-volume keys alone.

    Method of moments over per-key rates: with m1 = E[p̂] and
    var = E[p̂²] − m1²,

        α+β = (m1·(1−m1) − var)/var,   α = m1·(α+β)

    Determinism: each key's rate is QUANTIZED once by exact integer
    division (pq = (pos·scale) div n — bigint, no doubles), and m1/m2
    derive from the exact sums Σpq and Σpq² (decimal(38,0)); α and β
    are one fixed IEEE tree over those sums, broadcast back, and each
    key's shrunk rate is one more fixed tree — nothing order-
    sensitive anywhere (the chi2/psi quantization family).
    Degenerate fits (var ≤ 0 or non-positive α/β — near-constant
    rates) return the raw rate and NULL α/β rather than a garbage
    prior.

    Scale shape: one map-side-combinable groupBy to the key grid, a
    1-row moment broadcast, and a per-key projection. Output per key:
    (key, n, pos, rate, alpha, beta, shrunk)."""
    d38 = "decimal(38,0)"
    keys = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(label_col).cast("long")).cast("bigint").alias("pos"),
    )
    pq = F.expr(f"(pos * {scale}) div n").cast("bigint")
    with_q = keys.withColumn("_pq", pq)
    mom = with_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("_k"),
        F.sum("_pq").cast("bigint").alias("_s1"),
        F.sum((F.col("_pq").cast(d38) * F.col("_pq").cast(d38)).cast(d38))
        .cast(d38)
        .alias("_s2"),
    )
    dd = lambda c: c.cast("double")  # noqa: E731 — fixed IEEE tree below
    sc = F.lit(float(scale))
    m1 = dd(F.col("_s1")) / (dd(F.col("_k")) * sc)
    m2 = dd(F.col("_s2")) / (dd(F.col("_k")) * sc * sc)
    var = m2 - m1 * m1
    # try_divide: the ok-predicate below evaluates alpha, so an ANSI
    # divide-by-zero on a zero-variance fit would throw before the
    # guard can suppress it
    ab = F.try_divide(m1 * (F.lit(1.0) - m1) - var, var)
    alpha = m1 * ab
    beta = (F.lit(1.0) - m1) * ab
    ok = (var > 0.0) & (alpha > 0.0) & (beta > 0.0)
    pri = mom.select(
        F.when(ok, alpha).alias("alpha"),
        F.when(ok, beta).alias("beta"),
    )
    g = keys.crossJoin(F.broadcast(pri))
    rate = dd(F.col("pos")) / dd(F.col("n"))
    shrunk = F.when(
        F.col("alpha").isNotNull(),
        (dd(F.col("pos")) + F.col("alpha"))
        / (dd(F.col("n")) + F.col("alpha") + F.col("beta")),
    ).otherwise(rate)
    return g.select(
        "key", "n", "pos", rate.alias("rate"), "alpha", "beta",
        shrunk.alias("shrunk"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """One-way ANOVA F statistic across the groups of a categorical
    column — "does mean order value actually differ by segment?" as a
    single deterministic number, at any partitioning.

    The float hazard in ANOVA is Σ_g S_g²/n_g: summing per-group
    double terms shuffles, and shuffle order changes the sum. Here
    each group's term is quantized EXACTLY first —
    ``floor(S_g²·scale / n_g)`` in decimal(38,0) integer division —
    and the exact quanta are summed (associative), the
    ``chi2_independence`` pattern. The between/within sums of squares
    then ride one FIXED IEEE tail over exact integers:

        ssb = (A_q − floor(S²·scale/N)) / scale
        ssw = ΣvV² − A_q/scale
        F   = (ssb/(k−1)) / (ssw/(N−k))

    so the doubles are bit-stable and oracle-mirrorable. Quantization
    understates each term by < 1/scale — documented, deterministic.
    Bound: S_g²·scale must fit decimal(38,0) (|S_g| < ~10¹⁶ at the
    default scale — pre-scale the units down past that).

    Scale shape: two map-side-combinable aggregates (one per-group,
    one global) and a 1-row broadcast join; nothing else. Output one
    row: (k, n, ssb, ssw, f_stat)."""
    d38 = "decimal(38,0)"
    v = F.col(value_col).cast(d38)
    per_group = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast(d38).alias("_ng"),
        F.sum(v).cast(d38).alias("_sg"),
    )
    # NOT `div`: Spark's integral divide returns LONG, and these
    # quotients pass 2^63. pmod-subtract makes the numerator exactly
    # divisible, so the decimal(38,6) division result is EXACT for
    # quotients < 10^32 (documented bound above).
    aq_term = (
        f"((_sg * _sg * CAST({scale} AS decimal(38,0)))"
        f" - pmod(_sg * _sg * CAST({scale} AS decimal(38,0)), _ng)) / _ng"
    )
    collapsed = per_group.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.expr(aq_term).cast(d38)).cast(d38).alias("_aq"),
    )
    total = df.agg(
        F.count(F.lit(1)).cast(d38).alias("_n"),
        F.sum(v).cast(d38).alias("_s"),
        F.sum((v * v).cast(d38)).cast(d38).alias("_t2"),
    )
    joined = total.crossJoin(F.broadcast(collapsed)).select(
        "k",
        F.col("_n").cast("bigint").alias("n"),
        "_aq",
        F.expr(
            f"((_s * _s * CAST({scale} AS decimal(38,0)))"
            f" - pmod(_s * _s * CAST({scale} AS decimal(38,0)), _n)) / _n"
        )
        .cast(d38)
        .alias("_s2q"),
        "_t2",
        "_n",
    )
    ssb = (
        F.col("_aq").cast("double") - F.col("_s2q").cast("double")
    ) / F.lit(float(scale))
    ssw = F.col("_t2").cast("double") - F.col("_aq").cast("double") / F.lit(
        float(scale)
    )
    f_stat = F.when(
        (F.col("k") > 1) & (F.col("n") > F.col("k")),
        (ssb / (F.col("k") - 1).cast("double"))
        / (ssw / (F.col("n") - F.col("k")).cast("double")),
    )
    return joined.select(
        "k", "n", ssb.alias("ssb"), ssw.alias("ssw"), f_stat.alias("f_stat")
    )


def trimmed_mean(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    trim_pct: int = 10,
    scale: int = 10**6,
) -> DataFrame:
    """Robust per-group location: the mean after dropping the lowest
    and highest ``trim_pct`` percent of values (by count,
    ``t = floor(n·pct/100)`` from each side) — the outlier-resistant
    alternative to the mean that, unlike the median, still uses most
    of the data. Winsorizing clamps instead; trimming excludes.

    Exact arithmetic end to end: which values drop is a pure rank
    count (ties share a value, so the kept MULTISET is well-defined
    no matter how ranks break ties), the kept sum accumulates in
    decimal(38,0), and the mean is the exact integer quotient
    ``(sum·scale) div cnt`` (pmod-subtract form, exact at any
    magnitude). Returns (*group_cols, n, n_kept, tmean_q).

    Scale shape: ONE window pass partitioned by the group (rank +
    group count in the same window frame — one sort) and one grouped
    aggregate. No joins."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    w_all = Window.partitionBy(*group_cols)
    d38 = "decimal(38,0)"
    ranked = df.select(
        *group_cols,
        F.col(value_col).cast("bigint").alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    ).withColumn("_t", F.expr(f"(_n * {trim_pct}) div 100"))
    kept = ranked.where(
        (F.col("_rn") > F.col("_t")) & (F.col("_rn") <= F.col("_n") - F.col("_t"))
    )
    agg = kept.groupBy(*group_cols).agg(
        F.max("_n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum(F.col("_v").cast(d38)).cast(d38).alias("_sum"),
    )
    return agg.select(
        *group_cols,
        "n",
        "n_kept",
        F.expr(
            f"((_sum * CAST({scale} AS decimal(38,0)))"
            f" - pmod(_sum * CAST({scale} AS decimal(38,0)), n_kept))"
            " / n_kept"
        )
        .cast("bigint")
        .alias("tmean_q"),
    )


def corr_matrix(df: DataFrame, measure_cols: Sequence[str]) -> DataFrame:
    """Full pairwise Pearson correlation matrix over a measure list —
    the feature-audit pass that finds redundant/collinear measures
    before they poison a model — in ONE aggregate scan: every
    Σm_i, Σm_i², Σm_i·m_j moment accumulates exactly in
    decimal(38,0) in a single map-side-combinable pass (k measures →
    k(k+3)/2 + 1 sums), then each of the k(k-1)/2 pairs rides the
    same fixed IEEE tail as ``grouped_pearson`` (exact decimals →
    correctly-rounded doubles → IEEE sqrt — bit-stable on any
    engine/partitioning).

    The pair fan-out is an ``inline`` of a literal-bounded struct
    array on a 1-ROW frame — never a self-join of the data. Output:
    one row per unordered pair (m_a, m_b, n, r), r NULL when either
    variance is 0."""
    d = "decimal(38,0)"
    ms = list(measure_cols)
    aggs = [F.count(F.lit(1)).cast(d).alias("_n")]
    for i, a in enumerate(ms):
        aggs.append(F.sum(F.col(a).cast(d)).cast(d).alias(f"_s{i}"))
        for j in range(i, len(ms)):
            aggs.append(
                F.sum((F.col(a).cast(d) * F.col(ms[j]).cast(d)).cast(d))
                .cast(d)
                .alias(f"_p{i}_{j}")
            )
    agg = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(ms):
        for j in range(i + 1, len(ms)):
            num = (
                F.col("_n") * F.col(f"_p{i}_{j}")
                - F.col(f"_s{i}") * F.col(f"_s{j}")
            ).cast(d)
            dx = (
                F.col("_n") * F.col(f"_p{i}_{i}")
                - F.col(f"_s{i}") * F.col(f"_s{i}")
            ).cast(d)
            dy = (
                F.col("_n") * F.col(f"_p{j}_{j}")
                - F.col(f"_s{j}") * F.col(f"_s{j}")
            ).cast(d)
            pairs.append(
                F.struct(
                    F.lit(a).alias("m_a"),
                    F.lit(ms[j]).alias("m_b"),
                    F.col("_n").cast("bigint").alias("n"),
                    F.when(
                        (dx > 0) & (dy > 0),
                        num.cast("double")
                        / F.sqrt(dx.cast("double") * dy.cast("double")),
                    ).alias("r"),
                )
            )
    return agg.select(F.inline(F.array(*pairs)))


def weighted_quantile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    q_num: int = 1,
    q_den: int = 2,
) -> DataFrame:
    """Exact weighted quantile per group — "the price point below
    which half the UNITS (not half the rows) sell": the smallest
    value v with cumulative weight ≥ W·q_num/q_den. The quantile is
    a rational (q_num/q_den), and the crossing test cross-multiplies
    (cumw·q_den ≥ W·q_num), so there is no float anywhere and ties
    need no ordering contract: weights collapse to one row PER
    DISTINCT VALUE before the scan, making the cumulative sum
    well-defined by construction.

    Scale shape: one map-side-combinable groupBy to the (group,
    value) grain, one window cumsum per group over distinct values
    (partition = group), one filter + min aggregate. Weights
    accumulate in decimal(38,0).

    Returns (*group_cols, wq_value, total_w)."""
    d38 = "decimal(38,0)"
    per_value = df.groupBy(
        *group_cols, F.col(value_col).cast("bigint").alias("_v")
    ).agg(F.sum(F.col(weight_col).cast(d38)).cast(d38).alias("_w"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = per_value.select(
        *group_cols,
        "_v",
        F.sum("_w").over(w_cum).cast(d38).alias("_cumw"),
        F.sum("_w").over(w_all).cast(d38).alias("_tot"),
    )
    crossed = cum.where(
        F.col("_cumw") * F.lit(q_den).cast(d38)
        >= F.col("_tot") * F.lit(q_num).cast(d38)
    )
    return crossed.groupBy(*group_cols).agg(
        F.min("_v").cast("bigint").alias("wq_value"),
        F.max("_tot").cast("bigint").alias("total_w"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Mutual information between two categorical columns, plus both
    marginal entropies and the min-entropy-normalized MI — the
    feature-audit number that, unlike chi² (``chi2_independence``),
    is directly comparable across tables of different size, and,
    unlike WoE/IV (``woe_iv``), needs no binary target:

        MI   = Σ_xy (n_xy/N) · ln(n_xy·N / (n_x·n_y))
        H(X) = Σ_x  (n_x/N) · ln(N/n_x)
        NMI  = MI / min(H(X), H(Y))            (∈ [0, 1])

    Exactness contract (the chi2/psi/jsd quantization pattern): all
    counts are exact bigints; every log ARGUMENT is a ratio of exact
    decimal(38,0) cross-products cast to double once (n_xy·N vs
    n_x·n_y — no probability is ever materialized); each per-cell
    term is quantized to ``floor(term·scale)`` so the shuffle sums
    exact bigint quanta and NMI is a ratio of two bigints
    (|error| < cells/scale). Empty-cell convention 0·ln0 = 0 holds
    by construction — absent (x, y) cells simply never appear.
    Per-cell MI terms CAN be negative (independent-ish cells), and
    floor() biases each term downward, so the quantized MI sum of a
    near-independent pair can land a few quanta below zero — the
    emitted ``mi``/``nmi`` are clamped at 0 after summation so the
    [0, 1] NMI contract survives quantization (true MI is >= 0; the
    clamp absorbs only the < cells/scale quantization bias).

    Scale shape: ONE map-side-combinable groupBy to the (x, y) cell
    grid (rows = |X|·|Y| domain, not facts); marginals are window
    sums OVER THE GRID (partitioned by x / by y — domain-sized, never
    a second fact pass); the grand total rides back as a 1-row
    broadcast. Entropies aggregate the distinct marginal rows of the
    same grid.

    Output ONE row: (n, classes_x, classes_y, mi, h_x, h_y, nmi);
    nmi is null when either marginal entropy is 0 (a constant
    column carries no information to normalize by)."""
    d = "decimal(38,0)"
    cells = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_nxy"))
    wx = Window.partitionBy("_x")
    wy = Window.partitionBy("_y")
    g = (
        cells.withColumn("_nx", F.sum("_nxy").over(wx).cast("bigint"))
        .withColumn("_ny", F.sum("_nxy").over(wy).cast("bigint"))
        .crossJoin(
            F.broadcast(
                cells.agg(F.sum("_nxy").cast("bigint").alias("_n"))
            )
        )
    )
    num = (F.col("_nxy").cast(d) * F.col("_n").cast(d)).cast(d)
    den = (F.col("_nx").cast(d) * F.col("_ny").cast(d)).cast(d)
    term_mi = (
        F.col("_nxy").cast("double") / F.col("_n").cast("double")
    ) * F.log(num.cast("double") / den.cast("double"))
    mi_row = g.select(
        F.floor(term_mi * F.lit(float(scale))).cast("bigint").alias("_q"),
        "_n",
    ).groupBy("_n").agg(
        F.sum("_q").cast("bigint").alias("_q_mi"),
    )

    def _entropy(col_key: str, col_marg: str, out: str) -> DataFrame:
        marg = g.select(col_key, col_marg, "_n").distinct()
        term = (
            F.col(col_marg).cast("double") / F.col("_n").cast("double")
        ) * F.log(
            F.col("_n").cast("double") / F.col(col_marg).cast("double")
        )
        return marg.select(
            F.floor(term * F.lit(float(scale))).cast("bigint").alias("_q")
        ).agg(
            F.sum("_q").cast("bigint").alias(f"_q_{out}"),
            F.count(F.lit(1)).cast("bigint").alias(f"classes_{out}"),
        )

    hx = _entropy("_x", "_nx", "x")
    hy = _entropy("_y", "_ny", "y")
    s = float(scale)
    # clamp (docstring): floor() bias can leave the exact quantized MI
    # sum a few quanta negative for near-independent columns
    q_mi = F.greatest(F.col("_q_mi"), F.lit(0).cast("bigint"))
    return (
        mi_row.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("_n").cast("bigint").alias("n"),
            "classes_x",
            "classes_y",
            (q_mi.cast("double") / F.lit(s)).alias("mi"),
            (F.col("_q_x").cast("double") / F.lit(s)).alias("h_x"),
            (F.col("_q_y").cast("double") / F.lit(s)).alias("h_y"),
            F.when(
                F.least("_q_x", "_q_y") > 0,
                q_mi.cast("double")
                / F.least("_q_x", "_q_y").cast("double"),
            ).alias("nmi"),
        )
    )
