"""Offline model-evaluation statistics — the scoring-side twin of the
recsys eval ops (hit-rate / NDCG / coverage, operators/recsys.py): once
a team runs the reference's batch-inference connectors
(README.md:169-194) they need to grade the SCORES the model emits, not
just the ranked lists. This module computes the three standard
score-quality reports — ROC-AUC, calibration / gains bins, and
binomial-rate confidence bounds — exactly, at corpus scale.

Determinism contract (the ``user_profile_vectors`` lesson): every
statistic is integer/decimal-exact up to a SINGLE correctly-rounded
IEEE operation chain evaluated per OUTPUT row — never a double
aggregation whose value depends on accumulation order. AUC is a pure
bigint rank-sum divided once; calibration fractions are one
bigint/bigint division each; Wilson bounds are a fixed scalar
expression tree (+,-,*,/,sqrt are all correctly rounded by IEEE 754,
so any engine evaluating the same tree on the same exact integers
produces the same double bit-for-bit — no transcendental functions).

Scale shapes:

* ``roc_auc`` collapses the scored rows to the (group, score) GRID
  first — one map-side-combinable aggregate, grid size bounded by
  distinct score values (cents of a bounded range), not row count —
  then ranks with ONE window over the grid. The raw scan is never
  windowed (the winsorize/MAD rule, features.py).
* ``score_bin_report`` is a single groupBy over fixed-width integer
  bins plus a window over the BIN table (rows = #bins, a constant).
* ``wilson_bounds`` is one aggregate; the bound math is per-group
  scalar arithmetic on the two exact counts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    scored: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann–Whitney rank-sum with the
    standard tie correction: AUC = P(score⁺ > score⁻) + ½P(tie).

    ``score_col`` must be integral (the engine's cents convention) and
    ``label_col`` in {0,1}. Collapse to the (group, score) grid with
    positive/negative counts; for each grid point, its positives beat
    every negative strictly below (``2·cum_neg_below``) and half-win
    against ties at the same score (``+ neg_here``), all in bigint:

        auc_num2 = Σ_s pos(s) · (2·cum_neg_below(s) + neg(s))
        auc      = auc_num2 / (2 · n_pos · n_neg)   — the ONE division

    The window runs over the aggregated grid (distinct scores per
    group), never the raw rows. Groups with no positives or no
    negatives return NULL auc (undefined). Output: (*group_cols,
    n_pos, n_neg, auc_num2, auc)."""
    grid = scored.groupBy(
        *group_cols, F.col(score_col).alias("_s")
    ).agg(
        F.sum(F.col(label_col).cast("long")).alias("_pos"),
        F.sum(F.lit(1) - F.col(label_col).cast("long")).alias("_neg"),
    )
    return auc_from_grid(grid, group_cols)


def auc_from_grid(grid: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Rank-sum AUC from an already-aggregated (group, _s, _pos, _neg)
    count grid — the shared core of ``roc_auc`` and the streaming
    score monitor (streaming/score_monitor.py). Grids merge by SUM, so
    a stream-maintained grid served through THIS function must equal
    the batch statistic over everything drained (the mergeable-grid
    law, same argument as the KS drift monitor)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = grid.withColumn(
        "_cnb", F.coalesce(F.sum("_neg").over(w), F.lit(0))
    ).withColumn(
        "_u2", F.col("_pos") * (2 * F.col("_cnb") + F.col("_neg"))
    )
    out = contrib.groupBy(*group_cols).agg(
        F.sum("_pos").cast("bigint").alias("n_pos"),
        F.sum("_neg").cast("bigint").alias("n_neg"),
        F.sum("_u2").cast("bigint").alias("auc_num2"),
    )
    return out.withColumn(
        "auc",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("auc_num2").cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ),
    )


def score_bin_report(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    bin_width: int,
) -> DataFrame:
    """Calibration + cumulative-gains table over fixed-width integer
    score bins: is a score of 900–999 cents actually converting more
    often than 100–199, and how much of the total positive mass does
    the top of the score range capture?

    Equal-WIDTH bins (``bin = score div bin_width``), not ntile
    quantile bins — a global ntile is a single-task sort, while the
    div is embarrassingly parallel and the bin table is a constant
    number of rows. Cumulative columns run highest-score-first over
    the BIN table only. Every fraction is one bigint/bigint division.

    Output per bin (descending-score cumulative): (bin, bin_lo, n,
    n_pos, frac_pos, cum_n, cum_pos, capture = cum_pos/total_pos,
    cum_precision = cum_pos/cum_n)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    bins = (
        scored.select(
            # integer DIV, not floor(double /): double division loses
            # exactness past 2^53; scores are non-negative so
            # truncation == floor in both engines
            F.expr(f"CAST({score_col} AS BIGINT) DIV {bin_width}").alias(
                "bin"
            ),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").cast("bigint").alias("n_pos"),
        )
    )
    return _bin_cumulatives(bins, bin_width)


def bins_from_grid(grid: DataFrame, bin_width: int) -> DataFrame:
    """Calibration/gains table served from an already-aggregated
    (_s, _pos, _neg) count grid — the second statistic the streaming
    score monitor's ONE maintained grid answers (the first is AUC):
    bin the grid rows (not raw data) with the same integer DIV,
    n = pos+neg per grid point, then the shared cumulative fold.
    Same output contract as ``score_bin_report``."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    bins = (
        grid.select(
            F.expr(f"CAST(_s AS BIGINT) DIV {bin_width}").alias("bin"),
            (F.col("_pos") + F.col("_neg")).alias("_n"),
            F.col("_pos").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_y").cast("bigint").alias("n_pos"),
        )
    )
    return _bin_cumulatives(bins, bin_width)


def _bin_cumulatives(
    bins: DataFrame, bin_width: int, max_grid_rows: int = 1_000_000
) -> DataFrame:
    """Shared cumulative fold over a (bin, n, n_pos) table. The bin
    count is (score range / bin_width) by construction; the guard
    makes that executable — a caller binning an unbounded score
    domain at width 1 fails loudly before the single-task window."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    bins = enforce_bounded_grid(
        bins, max_grid_rows, "score bins", keep_count_col=True
    )
    # partition on the guard's constant (non-foldable) count column:
    # identical single-partition execution, but WindowExec stops
    # warning about an undeclared global window — the guard is what
    # actually enforces boundedness (a lit() key would be optimized
    # away)
    w = (
        Window.partitionBy("_grid_n")
        .orderBy(F.col("bin").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # single-task window is fine HERE: it runs over the bin table,
    # whose row count is (score range / bin_width) — a constant
    # independent of input rows
    total = bins.agg(F.sum("n_pos").cast("bigint").alias("total_pos"))
    cum = (
        bins.withColumn("cum_n", F.sum("n").over(w).cast("bigint"))
        .withColumn("cum_pos", F.sum("n_pos").over(w).cast("bigint"))
        # sanctioned 1-row scalar broadcast (the PLANS.md pattern)
        .crossJoin(F.broadcast(total))
    )
    return cum.select(
        "bin",
        (F.col("bin") * bin_width).cast("bigint").alias("bin_lo"),
        F.col("n").cast("bigint").alias("n"),
        "n_pos",
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
            "frac_pos"
        ),
        "cum_n",
        "cum_pos",
        F.when(
            F.col("total_pos") > 0,
            F.col("cum_pos").cast("double") / F.col("total_pos").cast("double"),
        ).alias("capture"),
        (F.col("cum_pos").cast("double") / F.col("cum_n").cast("double")).alias(
            "cum_precision"
        ),
    )


def wilson_bounds(
    counts_or_rows: DataFrame,
    group_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Per-group binomial rate with its two-sigma Wilson score lower /
    upper bounds — the interval a CTR dashboard should show instead of
    the raw rate (a 2/3 segment is not 'better' than 6000/10000).

    Uses z = 2 exactly (z² = 4), so every constant in the Wilson
    expression is a small exact double and the whole bound is a fixed
    tree of correctly-rounded IEEE ops (+,-,*,/,sqrt) on the exact
    (n_pos, n) integers — engine-portable bit-for-bit as long as the
    oracle spells the SAME tree:

        p      = pos / n
        denom  = 1 + 4/n
        center = p + 2/n
        margin = 2 · sqrt((p·(1−p) + 1/n) / n)
        lo, hi = (center ∓ margin) / denom      (clamped to [0, 1])

    Output: (*group_cols, n, n_pos, rate, wilson_lo, wilson_hi)."""
    agg = counts_or_rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(label_col).cast("long")).cast("bigint").alias("n_pos"),
    )
    nd = F.col("n").cast("double")
    p = F.col("n_pos").cast("double") / nd
    denom = F.lit(1.0) + F.lit(4.0) / nd
    center = p + F.lit(2.0) / nd
    margin = F.lit(2.0) * F.sqrt((p * (F.lit(1.0) - p) + F.lit(1.0) / nd) / nd)
    return agg.select(
        *group_cols,
        "n",
        "n_pos",
        p.alias("rate"),
        F.greatest(F.lit(0.0), (center - margin) / denom).alias("wilson_lo"),
        F.least(F.lit(1.0), (center + margin) / denom).alias("wilson_hi"),
    )


def two_proportion_ztest(
    rows: DataFrame,
    in_a: Column,
    in_b: Column,
    label_col: str,
) -> DataFrame:
    """Pooled two-proportion z-test — the A/B experiment readout
    ("is variant B's conversion actually higher?"). ``in_a`` /
    ``in_b`` are Column predicates naming the two arms.

    One map-side-combinable aggregate produces the four exact counts
    (n_a, pos_a, n_b, pos_b); the statistic is then a fixed tree of
    correctly-rounded IEEE ops on them (+,-,*,/,sqrt only):

        p_a, p_b = pos/n per arm;  p_pool = (pos_a+pos_b)/(n_a+n_b)
        z = (p_a - p_b) / sqrt(p_pool·(1-p_pool)·(1/n_a + 1/n_b))

    z is NULL when either arm is empty or the pooled rate is 0 or 1
    (zero variance). Output: ONE row (n_a, pos_a, n_b, pos_b, rate_a,
    rate_b, diff, z)."""
    y = F.col(label_col).cast("long")
    agg = rows.agg(
        F.sum(in_a.cast("long")).cast("bigint").alias("n_a"),
        F.sum(y * in_a.cast("long")).cast("bigint").alias("pos_a"),
        F.sum(in_b.cast("long")).cast("bigint").alias("n_b"),
        F.sum(y * in_b.cast("long")).cast("bigint").alias("pos_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    pa = F.col("pos_a").cast("double") / na
    pb = F.col("pos_b").cast("double") / nb
    pp = (F.col("pos_a") + F.col("pos_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    return agg.select(
        "n_a",
        "pos_a",
        "n_b",
        "pos_b",
        # an empty arm has no rate — NULL, never an ANSI 0/0
        # (degenerate-input guard; z below was already gated)
        F.when(F.col("n_a") > 0, pa).alias("rate_a"),
        F.when(F.col("n_b") > 0, pb).alias("rate_b"),
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), pa - pb).alias(
            "diff"
        ),
        F.when(
            (F.col("n_a") > 0)
            & (F.col("n_b") > 0)
            & (F.col("pos_a") + F.col("pos_b") > 0)
            & (F.col("pos_a") + F.col("pos_b") < F.col("n_a") + F.col("n_b")),
            (pa - pb) / se,
        ).alias("z"),
    )


def top1_transition_accuracy(
    pairs: DataFrame,
    from_col: str,
    to_col: str,
    is_train: Column,
) -> DataFrame:
    """Backtest of a first-order Markov next-state model: fit the
    argmax transition per source state on the TRAIN pairs (tie broken
    by target lexicographic), then score top-1 accuracy on the TEST
    pairs — the honesty check behind "what does the user do next"
    models.

    Scale shape: the model fit windows the aggregated transition GRID
    (states x states — a constant), never raw pairs; the model is a
    per-state 1-row table broadcast into the test scan; accuracy is
    one bigint division per state. Source states seen only in test
    get NULL prediction and 0 hits. Output per source state:
    (from_col, predicted, n_test, n_hits, accuracy)."""
    train_grid = (
        pairs.where(is_train)
        .groupBy(from_col, to_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w = Window.partitionBy(from_col).orderBy(
        F.col("_n").desc(), F.col(to_col)
    )
    model = (
        train_grid.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(F.col(from_col), F.col(to_col).alias("predicted"))
    )
    test = pairs.where(~is_train)
    scored = test.join(F.broadcast(model), from_col, "left")
    return scored.groupBy(from_col, "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum((F.col(to_col) == F.col("predicted")).cast("long"))
        .cast("bigint")
        .alias("n_hits"),
    ).select(
        from_col,
        "predicted",
        "n_test",
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)).cast("double") / F.col("n_test").cast("double")).alias(
            "accuracy"
        ),
    )


def ipw_weighted_ratio(
    rows: DataFrame,
    propensity_col: str,
    num_col: str,
    den_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Quantized inverse-propensity-weighted ratio — the
    popularity-debiasing fold behind "is the recommender only hitting
    because it recommends popular items?": each row's (num, den)
    contribution is weighted by 1/propensity, so an item 1000 users
    touch counts 1000x less than a one-user item.

    EXACT by quantization, not by luck: the weight is the INTEGER
    ``scale DIV max(propensity, 1)`` — a true 1/p double would make
    the weighted sums order-sensitive, while integer weights keep the
    whole fold bigint until the one final division. Rows with
    propensity > scale quantize to weight 0 (the standard IPW clip of
    ultra-popular items, stated rather than hidden). Overflow bound:
    with the default scale, sum_w_num stays in bigint up to ~10^12
    weighted rows.

    Output: ONE row (n_rows, sum_w_num, sum_w_den, weighted_ratio,
    raw_ratio) — both ratios one bigint/bigint division."""
    w = F.expr(f"CAST({scale} AS BIGINT) DIV greatest({propensity_col}, 1)")
    agg = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(w * F.col(num_col)).cast("bigint").alias("sum_w_num"),
        F.sum(w * F.col(den_col)).cast("bigint").alias("sum_w_den"),
        F.sum(num_col).cast("bigint").alias("_sn"),
        F.sum(den_col).cast("bigint").alias("_sd"),
    )
    return agg.select(
        "n_rows",
        "sum_w_num",
        "sum_w_den",
        F.when(
            F.col("sum_w_den") > 0,
            F.col("sum_w_num").cast("double") / F.col("sum_w_den").cast("double"),
        ).alias("weighted_ratio"),
        F.when(
            F.col("_sd") > 0,
            F.col("_sn").cast("double") / F.col("_sd").cast("double"),
        ).alias("raw_ratio"),
    )


def cohens_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Inter-annotator agreement (Cohen's kappa) between two label
    columns — the QA gate a labeling pipeline runs before trusting
    human (or model-as-judge) annotations for training data.

    Exact to the last integer: with n rows, observed agreement
    o = Σ_c n_cc and expected chance agreement from the marginal
    products, kappa reduces to ONE division of two exact bigints:

        kappa = (n·o − Σ_c na_c·nb_c) / (n² − Σ_c na_c·nb_c)

    Scale shape: one map-side-combinable aggregate to the label-pair
    confusion grid (|A|·|B| cells, never data-sized), marginals as
    grid-side re-aggregates, one 1-row output. NULL labels count as
    their own category (two NULLs agree) via null-safe equality.
    Returns (n, n_agree, kappa_num, kappa_den, kappa) — kappa NULL
    when the denominator is zero (both raters constant)."""
    cells = df.groupBy(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    na = cells.groupBy("_a").agg(F.sum("_c").alias("_na"))
    nb = cells.groupBy("_b").agg(F.sum("_c").alias("_nb"))
    chance = (
        na.join(nb, F.col("_a").eqNullSafe(F.col("_b")))
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_pe_num"))
        .select(F.coalesce(F.col("_pe_num"), F.lit(0)).cast("bigint").alias("_pe_num"))
    )
    totals = cells.agg(
        F.sum("_c").cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("_a").eqNullSafe(F.col("_b")), F.col("_c")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_agree"),
    )
    out = totals.crossJoin(F.broadcast(chance)).select(
        "n",
        "n_agree",
        (F.col("n") * F.col("n_agree") - F.col("_pe_num"))
        .cast("bigint")
        .alias("kappa_num"),
        (F.col("n") * F.col("n") - F.col("_pe_num"))
        .cast("bigint")
        .alias("kappa_den"),
    )
    return out.withColumn(
        "kappa",
        F.when(
            F.col("kappa_den") != 0,
            F.col("kappa_num").cast("double") / F.col("kappa_den").cast("double"),
        ),
    )


def expected_calibration_error(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    bin_width: int,
    score_scale: int,
) -> DataFrame:
    """Expected Calibration Error over fixed-width integer score bins:
    the bin-weighted gap between predicted confidence (bin midpoint on
    the ``score_scale`` denominator — e.g. cents over 10000 for a
    0-100.00 score) and observed positive rate — the single-number
    "can I trust the score as a probability" summary next to the full
    calibration table (score_bin_report).

    Exact until one division: per bin the weighted gap
    ``n_b·|pos_b/n_b − mid_b/scale|`` cross-multiplies to
    ``|2·scale·pos_b − n_b·(2·bin_lo + width)|`` — a bigint — so

        ECE = Σ_b |...| / (2·scale·n)

    is layout-independent with a single IEEE division at the end.
    Same scale shape as the bin report: one integer-DIV aggregate,
    grid-side arithmetic, 1-row output (n, ece_num, ece_den, ece)."""
    if bin_width <= 0 or score_scale <= 0:
        raise ValueError("bin_width and score_scale must be positive")
    bins = (
        scored.select(
            F.expr(f"CAST({score_col} AS BIGINT) DIV {bin_width}").alias(
                "bin"
            ),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("_y").cast("bigint").alias("_pos"),
        )
    )
    term = F.abs(
        F.lit(2 * score_scale).cast("bigint") * F.col("_pos")
        - F.col("_n")
        * (F.lit(2 * bin_width).cast("bigint") * F.col("bin") + F.lit(bin_width))
    )
    agg = bins.agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.sum(term).cast("bigint").alias("ece_num"),
    )
    return agg.select(
        "n",
        "ece_num",
        (F.lit(2 * score_scale).cast("bigint") * F.col("n")).alias("ece_den"),
        F.when(
            F.col("n") > 0,
            F.col("ece_num").cast("double")
            / (F.lit(2 * score_scale).cast("bigint") * F.col("n")).cast(
                "double"
            ),
        ).alias("ece"),
    )


def diff_in_diff(
    rows: DataFrame,
    treated: Column,
    post: Column,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences estimator — the quasi-experimental
    A/B readout when assignment wasn't randomized: the treatment
    effect is the treated group's pre→post change MINUS the control
    group's (which absorbs the common time trend):

        DiD = (ȳ_treated,post − ȳ_treated,pre)
            − (ȳ_control,post − ȳ_control,pre)

    ``treated`` / ``post`` are Column predicates; ``value_col`` must
    be an integer metric (cents, counts — the repo's exactness rule).

    One map-side-combinable aggregate produces the four cells' exact
    bigint sums and counts; the estimate and each cell mean are fixed
    per-row IEEE trees over casts of those exact values (the
    wilson_bounds rule), so any engine reproduces them bit-for-bit.
    Output is ONE row: the 8 exact cell stats + 4 cell means + did."""
    t = treated.cast("boolean")
    p = post.cast("boolean")
    v = F.col(value_col).cast("bigint")

    def cell(tt: bool, pp: bool, tag: str):
        m = (t == tt) & (p == pp)
        return [
            F.sum(F.when(m, v).otherwise(0)).cast("bigint").alias(f"s_{tag}"),
            F.count_if(m).cast("bigint").alias(f"n_{tag}"),
        ]

    agg = rows.agg(
        *cell(True, False, "t_pre"),
        *cell(True, True, "t_post"),
        *cell(False, False, "c_pre"),
        *cell(False, True, "c_post"),
    )
    d = lambda c: c.cast("double")  # noqa: E731 — fixed IEEE tree below
    means = {
        tag: d(F.col(f"s_{tag}")) / d(F.col(f"n_{tag}"))
        for tag in ("t_pre", "t_post", "c_pre", "c_post")
    }
    ok = (
        (F.col("n_t_pre") > 0)
        & (F.col("n_t_post") > 0)
        & (F.col("n_c_pre") > 0)
        & (F.col("n_c_post") > 0)
    )
    return agg.select(
        "s_t_pre", "n_t_pre", "s_t_post", "n_t_post",
        "s_c_pre", "n_c_pre", "s_c_post", "n_c_post",
        *[
            F.when(F.col(f"n_{tag}") > 0, means[tag]).alias(f"mean_{tag}")
            for tag in ("t_pre", "t_post", "c_pre", "c_post")
        ],
        F.when(
            ok,
            (means["t_post"] - means["t_pre"])
            - (means["c_post"] - means["c_pre"]),
        ).alias("did"),
    )


def isotonic_calibration(
    binned: DataFrame,
    bin_col: str,
    n_col: str,
    pos_col: str,
    max_grid_rows: int = 2_000,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration over PRE-BINNED
    scores — the PAV-regression step behind isotonic probability
    calibration, computed NOT by the sequential pool-adjacent-
    violators scan (driver-sequential, data-order-dependent) but by
    its closed form over the bin grid:

        fitted_i = max_{j<=i} min_{k>=j} mean(pos / n over bins j..k)

    which is embarrassingly parallel: O(B²) (j,k) interval averages
    over prefix sums, a min per j, and one running max. Equal to PAVA
    output exactly (the max-min characterization of isotonic L2
    regression).

    Determinism: prefix sums are exact bigints; each interval average
    is ONE bigint/bigint double division (a fixed IEEE tree); min and
    max over doubles are order-independent aggregates, so the fitted
    curve is bit-identical on any engine or layout — no quantization
    needed anywhere.

    Scale shape: callers bin scores first (integer DIV buckets, the
    score_bin_report rule), so the grid is domain-bounded — enforced
    by ``max_grid_rows`` BEFORE the O(B²) interval fan-out; prefix
    sums and the running max ride grid windows partitioned on the
    guard column. Output per bin: (bin, n, pos, rate, fitted),
    fitted non-decreasing in bin order."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    grid = enforce_bounded_grid(
        binned.select(
            F.col(bin_col).alias("bin"),
            F.col(n_col).cast("bigint").alias("n"),
            F.col(pos_col).cast("bigint").alias("pos"),
        ),
        max_grid_rows,
        "isotonic_calibration",
        keep_count_col=True,
    )
    wn = Window.partitionBy("_grid_n").orderBy("bin")
    w_cum = wn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = grid.select(
        "_grid_n",
        "bin",
        "n",
        "pos",
        F.row_number().over(wn).alias("i"),
        F.sum("n").over(w_cum).cast("bigint").alias("cn"),
        F.sum("pos").over(w_cum).cast("bigint").alias("cp"),
    )
    j = pre.select(
        F.col("_grid_n").alias("_g"),
        F.col("i").alias("j"),
        (F.col("cn") - F.col("n")).alias("cn0"),
        (F.col("cp") - F.col("pos")).alias("cp0"),
    )
    k = pre.select(
        F.col("_grid_n").alias("_g2"),
        F.col("i").alias("k"),
        F.col("cn").alias("cnk"),
        F.col("cp").alias("cpk"),
    )
    avg = (
        (F.col("cpk") - F.col("cp0")).cast("double")
        / (F.col("cnk") - F.col("cn0")).cast("double")
    )
    mins = (
        j.join(k, (j["_g"] == k["_g2"]) & (F.col("k") >= F.col("j")))
        .select("_g", "j", avg.alias("a"))
        .groupBy("_g", "j")
        .agg(F.min("a").alias("mj"))
    )
    w_max = (
        Window.partitionBy("_grid_n")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fitted = (
        pre.join(
            mins,
            (pre["_grid_n"] == mins["_g"]) & (pre["i"] == mins["j"]),
        )
        .select(
            "_grid_n", "bin", "n", "pos", "i", "mj",
        )
        .select(
            "bin",
            "n",
            "pos",
            (F.col("pos").cast("double") / F.col("n").cast("double")).alias(
                "rate"
            ),
            F.max("mj").over(w_max).alias("fitted"),
        )
    )
    return fitted


def conformal_threshold(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Split-conformal calibration threshold per group: the
    ⌈(1−α)(n+1)⌉-th smallest nonconformity score — the quantile that
    makes "predict an interval that covers with probability ≥ 1−α"
    distribution-free. α arrives as the rational alpha_num/alpha_den
    so the rank k = ⌈(alpha_den−alpha_num)·(n+1)/alpha_den⌉ is pure
    integer arithmetic (no float quantile semantics to mismatch
    across engines); scores must be integers (cents/quanta — the
    repo's exactness rule). If k > n (tiny calibration sets cannot
    guarantee 1−α coverage) the threshold is NULL rather than a
    silently-weaker max.

    Scale shape: scores collapse to per-group distinct-value cells
    first (map-side combinable), the cumulative count rides a window
    partitioned BY GROUP (parallel across groups, sorted within), and
    the selection is a struct-min aggregate — the theilsen median
    pattern, grouped. Output (*group_cols, n, k, threshold)."""
    if not 0 < alpha_num < alpha_den:
        raise ValueError("need 0 < alpha_num < alpha_den")
    g = [F.col(c) for c in group_cols]
    cells = df.groupBy(*g, F.col(score_col).cast("bigint").alias("_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    ranked = cells.select(
        *group_cols,
        "_s",
        F.sum("_c").over(w_cum).cast("bigint").alias("_cum"),
        F.sum("_c").over(w_all).cast("bigint").alias("_n"),
    ).withColumn(
        "_k",
        # exact integer ceil-div (double division would round past 2^53)
        F.expr(
            f"({alpha_den - alpha_num} * (_n + 1) + {alpha_den - 1}) "
            f"div {alpha_den}"
        ).cast("bigint"),
    )
    picked = (
        ranked.where(F.col("_cum") >= F.col("_k"))
        .groupBy(*group_cols, "_n", "_k")
        .agg(F.min("_s").cast("bigint").alias("threshold"))
    )
    base = ranked.select(*group_cols, "_n", "_k").distinct()
    return base.join(picked, [*group_cols, "_n", "_k"], "left").select(
        *group_cols,
        F.col("_n").alias("n"),
        F.col("_k").alias("k"),
        "threshold",
    )


def cuped_estimate(
    rows: DataFrame,
    in_a: Column,
    in_b: Column,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance-reduced A/B estimate: adjust each unit's
    experiment-period metric by its PRE-period metric,

        θ = cov(x, y) / var(x)   (pooled, both arms)
        diff_cuped = (ȳ_A − ȳ_B) − θ·(x̄_A − x̄_B)

    — the industry workhorse that removes pre-existing user variance
    from an experiment readout (unbiased because assignment is
    independent of x). ``pre_col`` / ``post_col`` must be integer
    metrics (cents, counts).

    Determinism: ONE map-side-combinable aggregate yields nine exact
    bigint sums (pooled n, Σx, Σy, Σxy, Σx² + per-arm n, Σx, Σy);
    θ and the two diffs are fixed IEEE trees over DOUBLE casts of
    those sums — each sum converts exactly while it stays below 2⁵³
    (the als_half_step oracle-parity envelope; the cross-products are
    formed in double on purpose so no >2⁵³ integer is ever converted
    on an engine whose int→double path double-rounds). Output ONE
    row: (n_a, n_b, theta, diff_raw, diff_cuped)."""
    a = in_a.cast("boolean")
    b = in_b.cast("boolean")
    x = F.col(pre_col).cast("bigint")
    y = F.col(post_col).cast("bigint")
    both = a | b
    agg = rows.where(both).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("bigint").alias("sx"),
        F.sum(y).cast("bigint").alias("sy"),
        F.sum(x * y).cast("bigint").alias("sxy"),
        F.sum(x * x).cast("bigint").alias("sxx"),
        F.count_if(a).cast("bigint").alias("n_a"),
        F.sum(F.when(a, x).otherwise(0)).cast("bigint").alias("sx_a"),
        F.sum(F.when(a, y).otherwise(0)).cast("bigint").alias("sy_a"),
        F.count_if(b).cast("bigint").alias("n_b"),
        F.sum(F.when(b, x).otherwise(0)).cast("bigint").alias("sx_b"),
        F.sum(F.when(b, y).otherwise(0)).cast("bigint").alias("sy_b"),
    )
    d = lambda c: c.cast("double")  # noqa: E731 — fixed IEEE tree below
    theta_num = d(F.col("n")) * d(F.col("sxy")) - d(F.col("sx")) * d(
        F.col("sy")
    )
    theta_den = d(F.col("n")) * d(F.col("sxx")) - d(F.col("sx")) * d(
        F.col("sx")
    )
    theta = theta_num / theta_den
    diff_raw = d(F.col("sy_a")) / d(F.col("n_a")) - d(F.col("sy_b")) / d(
        F.col("n_b")
    )
    diff_x = d(F.col("sx_a")) / d(F.col("n_a")) - d(F.col("sx_b")) / d(
        F.col("n_b")
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (theta_den != 0.0)
    return agg.select(
        "n_a",
        "n_b",
        F.when(ok, theta).alias("theta"),
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), diff_raw).alias(
            "diff_raw"
        ),
        F.when(ok, diff_raw - theta * diff_x).alias("diff_cuped"),
    )


def caliper_matched_att(
    units: DataFrame,
    key_col: str,
    treat_col: str,
    score_col: str,
    outcome_col: str,
    caliper: int,
) -> DataFrame:
    """Nearest-neighbor caliper matching (with replacement) and the
    matched average-treatment-effect-on-the-treated — the
    observational-causal workhorse when experiments aren't available:
    every treated unit is paired to the control whose score
    (propensity proxy) is closest, discarded if none sits within
    ``caliper``, ties broken by the smaller control key. Matching
    with replacement keeps the estimator deterministic and
    embarrassingly parallel (greedy without-replacement matching is
    inherently sequential — a different algorithm, not a different
    plan).

    Scale shape: a BAND join on caliper-width score buckets — each
    treated unit probes its own bucket ±1 (any control within
    caliper lies in those three), so candidate pairs are bounded by
    per-bucket density × 3, never treated × controls. Bucketing is
    exact integer floor division ((s − pmod(s, c)) div c, exact for
    negative scores too); the per-treated argmin is one window rank
    on (|Δscore|, control key). ATT's only float op is the final
    fixed-order division of an exact bigint sum.

    Output 1 row: (n_treated, n_matched, att) — att NULL when
    nothing matched."""
    c_lit = F.lit(caliper).cast("bigint")
    bucket = lambda col: F.expr(  # noqa: E731 — local shorthand
        f"({col} - pmod({col}, {caliper})) div {caliper}"
    ).cast("bigint")
    treated = units.filter(F.col(treat_col).cast("int") == 1).select(
        F.col(key_col).alias("_tk"),
        F.col(score_col).cast("bigint").alias("_ts"),
        F.col(outcome_col).cast("bigint").alias("_ty"),
    )
    controls = units.filter(F.col(treat_col).cast("int") == 0).select(
        F.col(key_col).alias("_ck"),
        F.col(score_col).cast("bigint").alias("_cs"),
        F.col(outcome_col).cast("bigint").alias("_cy"),
    )
    probes = treated.select(
        "_tk",
        "_ts",
        "_ty",
        F.explode(
            F.array(
                bucket("_ts") - 1, bucket("_ts"), bucket("_ts") + 1
            )
        ).alias("_b"),
    )
    cands = probes.join(
        controls.withColumn("_b", bucket("_cs")), "_b"
    ).where(F.abs(F.col("_ts") - F.col("_cs")) <= c_lit)
    w = Window.partitionBy("_tk").orderBy(
        F.abs(F.col("_ts") - F.col("_cs")).asc(), F.col("_ck").asc()
    )
    matched = (
        cands.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.sum(
                (F.col("_ty") - F.col("_cy")).cast("decimal(38,0)")
            ).alias("_diff_sum"),
        )
    )
    n_treated = treated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_treated")
    )
    return n_treated.crossJoin(F.broadcast(matched)).select(
        "n_treated",
        F.coalesce(F.col("n_matched"), F.lit(0).cast("bigint")).alias(
            "n_matched"
        ),
        F.when(
            F.col("n_matched") > 0,
            F.col("_diff_sum").cast("double")
            / F.col("n_matched").cast("double"),
        ).alias("att"),
    )
