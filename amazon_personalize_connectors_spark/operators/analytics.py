"""Classic warehouse analytics operators the reference's users run
downstream of its ETL output but that no reference file implements
(SURVEY.md §2 stops at the connector pipeline): time-range rolling
windows, calendar densification, cohort retention, gaps-and-islands
run collapsing, market-basket co-occurrence, weighted priority
sampling, and one-pass column profiling.

Each follows the repo's scale rules: aggregate BEFORE windowing so
window partitions are small; derive calendars/bounds from one tiny
aggregate broadcast back (never a driver-side collect in the data
path); keep every expression in Catalyst (no Python UDFs); make all
arithmetic that crosses an engine boundary exact-integer or decimal
so results are partition-layout-independent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_range_sum(
    df: DataFrame,
    part_cols: Sequence[str],
    day_col: str,
    value_col: str,
    window_days: int,
    out_col: str = "rolling_sum",
) -> DataFrame:
    """Per-key rolling sum over a trailing ``window_days``-day RANGE
    frame (missing days contribute nothing — a ROWS frame would be
    wrong on sparse dailies). ``day_col`` must be an integer day
    number; range frames over integers are engine-portable where
    interval frames are not.

    Scale shape: callers pre-aggregate to one row per (key, day), so
    the window partition is bounded by the key's active-day count,
    not its raw row count; the sort is within each hash partition
    only. Sum as decimal for layout-independent totals.
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(day_col)
        .rangeBetween(-(window_days - 1), 0)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def gap_fill_days(
    df: DataFrame,
    group_cols: Sequence[str],
    day_col: str,
    value_col: str,
    fill_value=0,
) -> DataFrame:
    """Calendar densification: emit one row per (group, day) for
    EVERY day in the global [min, max] span, filling absent days with
    ``fill_value``. ``day_col`` must be a date column.

    Scale shape: the span comes from one global min/max aggregate
    (1 row) and the group list from one distinct over the grouping
    columns — both tiny, both broadcast into a cross join, so the
    calendar is built without any driver collect. The only shuffle
    against the data is the left join back, keyed on (group, day).
    """
    bounds = df.agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    groups = df.select(*group_cols).distinct()
    calendar = groups.crossJoin(F.broadcast(bounds)).select(
        *group_cols,
        F.explode(
            F.sequence("__d0", "__d1", F.expr("interval 1 day"))
        ).alias(day_col),
    )
    return calendar.join(df, [*group_cols, day_col], "left").withColumn(
        value_col, F.coalesce(F.col(value_col), F.lit(fill_value))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-active period
    (cohort), counted once per (cohort, periods-since-cohort) cell.
    Periods are ``floor(epoch_day / period_days)`` — pure integer
    arithmetic, no engine-specific week-truncation semantics.

    Scale shape: raw events collapse to distinct (user, period) first
    (map-side combinable), cohorts derive from a min-aggregate over
    that same frame, and the join back is co-partitioned on the user
    key — the full event table is touched exactly once.
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400))
    period = F.floor(day / F.lit(period_days)).cast("bigint")
    user_period = (
        events.select(F.col(user_col).alias("u"), period.alias("p")).distinct()
    )
    cohorts = user_period.groupBy("u").agg(F.min("p").alias("cohort"))
    return (
        user_period.join(cohorts, "u")
        .groupBy("cohort", (F.col("p") - F.col("cohort")).alias("offset"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def gaps_islands(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """Gaps-and-islands: collapse consecutive runs of an identical
    ``state_col`` value (per partition key, in ``order_cols`` order)
    into one row per run — the SCD-type-2 history builder (validity
    ranges of a changing attribute) expressed as lag + change-flag +
    running island id.

    Returns partition keys + (island_id, state, n_rows, first/last
    order-key bounds). Two window passes over the same partitioning
    and ordering — Catalyst plans ONE sort/exchange and reuses it.

    NULL is a state like any other: the change flag is a NULL-SAFE
    comparison (plain ``lag(state) != state`` yields NULL — not true —
    when either side is null, which would silently merge null-state
    rows into the previous island), so a null run forms its own
    island and is reported with state NULL. eqNullSafe also covers
    the first-row lag-null case without a separate isNull branch.
    """
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    changed = (
        ~F.lag(state_col).over(w).eqNullSafe(F.col(state_col))
    ).cast("int")
    first_order = order_cols[0]
    with_island = df.withColumn(
        "island_id", F.sum(changed).over(w).cast("bigint")
    )
    return with_island.groupBy(*part_cols, "island_id").agg(
        # every row in an island shares one null-safe-identical state,
        # so first() is deterministic here — and unlike min() it does
        # not mask a null state with a non-null one
        F.first(state_col).alias(state_col),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min(first_order).alias("island_start"),
        F.max(first_order).alias("island_end"),
    )


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Market-basket association: for unordered item pairs appearing
    together in >= ``min_pair_count`` baskets, emit support counts and
    lift = P(a,b) / (P(a) P(b)). One division of exact integers at
    the very end, so the double is bit-identical across layouts.

    Scale shape: ONE shuffle groups each basket's distinct items into
    a sorted array; pairs, item frequencies, and the basket total all
    derive from that same grouped subtree, so Catalyst plans it once
    and wires the other consumers through ReusedExchange — the input
    is scanned once and grouped once (the naive self-join form
    recomputes the distinct four times). Pair fan-out is bounded by
    items-per-basket squared within each basket, never cross-basket;
    pair generation is two generators over the array (posexplode +
    explode of the tail slice — codegen, no lambda); the basket total
    joins in as a broadcast 1-row frame — no driver collect. The pair
    filter runs before the frequency joins so only surviving pairs
    shuffle again.
    """
    grouped = (
        df.groupBy(F.col(basket_col).alias("b"))
        .agg(F.sort_array(F.collect_set(item_col)).alias("items"))
    )
    pairs = (
        grouped.select(F.posexplode("items").alias("pos", "item_a"), "items")
        .select(
            "item_a",
            F.explode(
                F.slice("items", F.col("pos") + 2, F.size("items"))
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )
    freq = (
        grouped.select(F.explode("items").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # count via size(items) so the aggregate still references the array:
    # a plain count(1) lets column pruning rewrite this branch into a
    # second scan+distinct of the raw input, while referencing `items`
    # keeps the subtree canonical-equal to `grouped` and AQE wires it
    # through ReusedExchange — one scan, one grouping shuffle, total.
    total = grouped.agg(
        F.sum((F.size("items") >= 0).cast("bigint")).alias("n_baskets")
    )
    return (
        pairs.join(
            F.broadcast(freq.select(F.col("i").alias("item_a"), F.col("n").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(freq.select(F.col("i").alias("item_b"), F.col("n").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            (
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


def priority_sample_k(
    df: DataFrame,
    group_cols: Sequence[str],
    weight_cents_col: str,
    seed_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows per group:
    priority = hash-uniform * 1e6 // weight (all-integer, so the
    ranking is reproducible across engines and partition layouts —
    rand()/randomSplit are neither), keep the k smallest priorities.
    Heavier rows draw smaller priorities more often, approximating
    weighted sampling without replacement (Ohlsson's sequential
    Poisson / priority sampling), stable under data growth because a
    row's priority never changes.

    ``weight_cents_col`` must be a positive integer column (scale
    prices to cents first).
    """
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in seed_cols])),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    pr = (u * F.lit(1_000_000)).cast("bigint") / F.col(weight_cents_col)
    keyed = df.withColumn("__pr", F.floor(pr).cast("bigint"))
    w = Window.partitionBy(*group_cols).orderBy("__pr", *seed_cols)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-pass column profiler (the Deequ/expectations-suite shape):
    per column, null count, exact distinct count, and min/max
    rendered as strings, returned long-form as one row per column.

    All stats compute in a SINGLE aggregate — one scan of the input —
    then unpivot via an inline array of structs (rows = number of
    profiled columns, so the explode is trivial). Exact distinct
    counts make Catalyst expand the input once per distinct aggregate;
    at warehouse scale swap ``count_distinct`` for
    ``approx_count_distinct`` — the plan shape is otherwise identical.
    Avoid double-typed columns (min/max string rendering is not
    engine-portable); cast to decimal first.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str, str],
    right_cols: tuple[str, str, str],
    bucket_width: int,
) -> DataFrame:
    """Interval-overlap equi-join: all (left, right) pairs whose
    half-open integer intervals [start, end) intersect, plus the exact
    overlap length.

    The naive form is a range-predicate join — a cartesian product
    with a filter, dead at scale. Here each interval explodes to the
    fixed-width buckets it covers, candidates meet on a bucket
    equi-join (8-byte key), duplicates from multi-bucket overlaps are
    dropped with a distinct on the id pair, and the exact overlap
    predicate runs on candidates only. Choose ``bucket_width`` near
    the median interval length: fan-out per row is
    ceil(len/width)+1 ≤ 2 at that choice, and long outlier intervals
    degrade their own fan-out only, not the join's.

    ``left_cols``/``right_cols`` = (id, start, end) column names.
    """
    lid, ls, le = left_cols
    rid, rs, re_ = right_cols

    def bucketed(df: DataFrame, id_c: str, s_c: str, e_c: str, side: str) -> DataFrame:
        # floor division (cast truncates toward zero — wrong bucket for
        # negative coordinates)
        first = F.floor(F.col(s_c) / bucket_width).cast("bigint")
        last = F.floor((F.col(e_c) - 1) / bucket_width).cast("bigint")
        return df.select(
            F.col(id_c).alias(f"{side}_id"),
            F.col(s_c).alias(f"{side}_start"),
            F.col(e_c).alias(f"{side}_end"),
            F.explode(F.sequence(first, last)).alias("bucket"),
        )

    cand = (
        bucketed(left, lid, ls, le, "l")
        .join(bucketed(right, rid, rs, re_, "r"), "bucket")
        .drop("bucket")
        .distinct()
    )
    overlap = F.least("l_end", "r_end") - F.greatest("l_start", "r_start")
    return cand.where(overlap > 0).withColumn("overlap_len", overlap)


def funnel_with_windows(
    events: DataFrame,
    steps: Sequence[tuple[str, int | None]],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Sequential funnel with per-step conversion windows: step i
    matches the EARLIEST event of its type that is strictly after the
    previous step's match and (when a window is given) within
    ``window`` microseconds of it — the product-analytics semantics
    (a purchase before the click does not count; a purchase a month
    later does not convert a 1-hour funnel).

    ``steps`` = [(event_type, window_us|None), ...]; the first step's
    window is ignored. Output: one row per user who completed step 1,
    with ``steps_completed`` and each step's matched timestamp
    (``t1..tN``, null past the drop-off point).

    Scale shape: ONE shuffle. Per user, each step type's timestamps
    collect into a sorted array (state bounded by that user's events
    of that type — same class as the re-nest aggregate), then the
    step chain folds as array_min(filter(...)) — pure Catalyst, no
    join-per-step, no window functions. The naive form is one
    join + aggregate round-trip over the events table PER STEP.
    """
    aggs = [
        F.sort_array(
            F.collect_list(
                F.when(F.col(type_col) == step_type, F.col(ts_col))
            )
        ).alias(f"_ts_{i}")
        for i, (step_type, _) in enumerate(steps)
    ]
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(*aggs)

    t_cols = []
    prev = None
    for i, (_, window_us) in enumerate(steps):
        arr = F.col(f"_ts_{i}")
        if prev is None:
            t = F.try_element_at(arr, F.lit(1))
        else:
            def _make_cond(p, w):
                # factory keeps the pyspark lambda single-arg (default
                # args would trip its arity inspection)
                if w is None:
                    return lambda x: x > p
                return lambda x: (x > p) & (x <= p + F.lit(w))

            t = F.array_min(F.filter(arr, _make_cond(prev, window_us)))
        per_user = per_user.withColumn(f"t{i + 1}", t)
        t_cols.append(f"t{i + 1}")
        prev = F.col(f"t{i + 1}")
    steps_completed = sum(
        (F.col(c).isNotNull().cast("int") for c in t_cols), F.lit(0)
    )
    return (
        per_user.where(F.col("t1").isNotNull())
        .select(
            "user_id",
            steps_completed.cast("int").alias("steps_completed"),
            *t_cols,
        )
    )


def locf_fill(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Last-observation-carried-forward: nulls in ``value_cols`` take
    the most recent non-null value within the group, in ``order_col``
    order (leading nulls stay null — there is nothing to carry).

    One window pass per group, unbounded-preceding ``last(ignorenulls)``
    — compose AFTER ``gap_fill_days(..., fill_value=None)`` to turn a
    sparse daily series into a dense carried-forward one (the classic
    "price on days with no trades" shape).
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def grouped_linear_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS trend line (slope + intercept) in ONE aggregate:
    slope = (n Σxy − Σx Σy) / (n Σx² − (Σx)²), intercept from the
    means. ``x_col`` must be integer (day numbers, period indexes),
    ``y_col`` integer or decimal — all five sufficient statistics then
    accumulate EXACTLY (map-side combinable, layout-independent), and
    the only floating-point ops are two final divisions in fixed
    order. Groups with a degenerate x-variance return null slope.

    This is the distributed shape for "fit a tiny model per key":
    sufficient statistics in one combinable aggregate — never a
    per-group collect or a Python loop.
    """
    x = F.col(x_col).cast("decimal(38,6)")
    y = F.col(y_col).cast("decimal(38,6)")
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,6)").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    den = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    slope = F.when(den != 0, num / den)
    intercept = (
        F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")
    ) / F.col("_n").cast("double")
    return stats.select(
        *group_cols,
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.col("_n").cast("bigint").alias("n_points"),
    )


def key_skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 10,
) -> DataFrame:
    """Join-key skew diagnosis — the pre-flight a 100 TB join runs
    before choosing salting/AQE strategies. Per key-tuple counts
    reduce to: total rows, distinct keys, the max/avg skew factor
    (exact integer counts, one final double division), and the top-k
    heaviest keys with their row share.

    Shapes: one combinable aggregate to per-key counts; the scalar
    stats are a second tiny aggregate; top-k heavy keys via
    orderBy+limit (TakeOrdered), joined to the scalars as a broadcast
    1-row frame. The per-key table shuffles once.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    per_key = df.groupBy(key.alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    scalars = per_key.agg(
        F.sum("n").cast("bigint").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("__n_keys"),
        F.max("n").cast("bigint").alias("__max_n"),
    )
    top = per_key.orderBy(F.col("n").desc(), F.col("key")).limit(top_k)
    return top.crossJoin(F.broadcast(scalars)).select(
        "key",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("n") / (F.col("__total") / F.col("__n_keys")), 6).alias(
            "skew_factor"
        ),
        F.round(F.col("n") / F.col("__total"), 6).alias("row_share"),
        F.col("__total").alias("total_rows"),
        F.col("__n_keys").alias("n_keys"),
    )


def last_touch_attribution(
    events: DataFrame,
    touch_types: Sequence[str] = ("view", "click"),
    conversion_type: str = "purchase",
    window_us: int = 86_400_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_us_col: str = "ts_us",
) -> DataFrame:
    """Last-touch marketing attribution: each conversion is credited
    to the user's most recent touch event STRICTLY before it and
    within ``window_us`` microseconds — the product-analytics sibling
    of the reference's id-level attribution join (attribution.py:25),
    done time-aware and join-free. ``ts_us_col`` is an exact epoch-
    microsecond bigint (the load_events contract).

    Row-local and integer-exact: ONE window shuffle on the user
    partition. The latest-touch arg-max rides a single ``max`` over a
    RANGE frame ending at 1 PRECEDING (strictly-before by TIMESTAMP,
    not row position — simultaneous events are excluded on value) of
    an ENCODED bigint ``ts_us * 8 + type_code``: max picks the latest
    timestamp, ties break on the code, and decode is exact integer
    div/mod — no struct comparisons, portable across engines.

    Returns one row per conversion: (user, conv_ts_us, touch_ts_us,
    touch_type_code, attributed) with NULL touch columns when no
    touch precedes the conversion, and ``attributed`` false when the
    last touch is outside the window.

    The ``* 8`` encoding holds at most 7 touch codes (1..7); more
    would overflow into the timestamp field and decode silently
    wrong, so the bound is enforced."""
    if len(touch_types) > 7:
        raise ValueError(
            f"last_touch_attribution encodes the touch code in 3 bits "
            f"(ts_us * 8 + code, codes 1..7); got {len(touch_types)} "
            f"touch_types. Split the analysis or widen the encoding."
        )
    codes = {t: i + 1 for i, t in enumerate(touch_types)}
    ts_us = F.col(ts_us_col).cast("bigint")
    code = F.lit(None).cast("bigint")
    for t, c in codes.items():
        code = F.when(F.col(type_col) == t, F.lit(c)).otherwise(code)
    enc = F.when(code.isNotNull(), ts_us * 8 + code)
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_us.asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    flagged = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("_t"),
        ts_us.alias("conv_ts_us"),
        F.max(enc).over(w).alias("_last_enc"),
    ).where(F.col("_t") == conversion_type)
    touch_ts = F.expr("_last_enc div 8")
    return flagged.select(
        "user",
        "conv_ts_us",
        touch_ts.alias("touch_ts_us"),
        F.expr("_last_enc % 8").cast("int").alias("touch_type_code"),
        F.when(
            F.col("_last_enc").isNotNull(),
            touch_ts >= F.col("conv_ts_us") - F.lit(window_us),
        ).otherwise(F.lit(False)).alias("attributed"),
    )


def segment_overlap(
    events: DataFrame,
    segment_types: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Audience Venn: distinct-user counts for every combination of
    behavior segments (all 2^n - 1 regions for n segment-defining
    event types) — the overlap report behind "how many purchasers
    also clicked?".

    Two map-side-combinable aggregates: per-user segment BITMASK
    (bit_or of per-event bits — one shuffle keyed on user), then a
    count per mask value (at most 2^n rows). No self-joins, no
    grouping-sets explosion of the fact table; integer-exact."""
    bit = F.lit(0).cast("bigint")
    for i, t in enumerate(segment_types):
        bit = F.when(F.col(type_col) == t, F.lit(1 << i).cast("bigint")).otherwise(bit)
    masks = (
        events.select(F.col(user_col).alias("user"), bit.alias("_b"))
        .where(F.col("_b") > 0)
        .groupBy("user")
        .agg(F.bit_or("_b").alias("mask"))
    )
    return (
        masks.groupBy("mask")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(F.col("mask").cast("int").alias("mask"), "n_users")
    )


def residual_anomaly_days(
    df: DataFrame,
    day_col: str,
    value_col: str,
    trail_days: int = 7,
    k: int = 5,
    max_grid_rows: int = 200_000,
) -> DataFrame:
    """Robust time-series anomaly screen over a DAILY series: each
    day's residual is ``trail_days * v - sum(trailing trail_days
    values)`` (integer-exact — comparing v against the trailing mean
    without dividing), and a day is anomalous when its |residual|
    exceeds ``k * MAD`` of all full-window residuals (discrete-median
    MAD, same portability rule as robust_outlier_stats).

    Shape: the input is already a daily rollup (one row per day —
    bounded by the calendar, thousands of rows at any data scale), so
    the trailing sum is a RANGE window over day index and the
    median/MAD read off the residual value grid. All integer until
    nothing — there is no division anywhere.

    Returns full-window days: (day, value, residual, is_anomaly) plus
    the broadcast mad/threshold columns.

    ``max_grid_rows`` (guards.enforce_bounded_grid) makes the
    daily-rollup contract executable: a caller passing raw events
    instead of a day rollup fails loudly before the global window
    sorts a data-sized input (200k rows ≈ 547 years of days)."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    df = enforce_bounded_grid(
        df, max_grid_rows, "residual_anomaly_days", keep_count_col=True
    )
    day_idx = F.datediff(F.col(day_col), F.lit("1970-01-01").cast("date"))
    # partition on the guard's constant non-foldable count column:
    # same single-partition execution, no WindowExec warning (a lit()
    # key would be optimizer-stripped); the guard enforces the bound
    w = Window.partitionBy("_grid_n").orderBy(day_idx).rangeBetween(
        -(trail_days - 1), 0
    )
    based = df.select(
        "_grid_n",
        F.col(day_col).alias("day"),
        F.col(value_col).cast("bigint").alias("v"),
        F.sum(F.col(value_col).cast("bigint")).over(w).alias("_s"),
        F.count(F.lit(1)).over(w).alias("_n"),
    ).where(F.col("_n") == trail_days)
    resid = based.select(
        "_grid_n", "day", "v",
        (F.lit(trail_days) * F.col("v") - F.col("_s")).alias("residual"),
    )
    grid = resid.groupBy(
        "_grid_n", F.abs(F.col("residual")).alias("_a")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    wg = Window.partitionBy("_grid_n").orderBy("_a").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gcum = grid.select("_a", F.sum("_c").over(wg).alias("_cum"))
    tot = grid.agg(F.sum("_c").alias("_n"))
    mad = (
        gcum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(F.col("_cum") >= F.expr("(_n + 1) div 2"), F.col("_a"))
            ).alias("mad")
        )
    )
    return resid.crossJoin(F.broadcast(mad)).select(
        "day",
        "v",
        "residual",
        "mad",
        (F.abs(F.col("residual")) > F.lit(k) * F.col("mad")).alias("is_anomaly"),
    )


def seasonal_naive_mase(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    season_days: int = 7,
) -> DataFrame:
    """Forecast-quality floor for a daily series: the MASE of the
    seasonal-naive forecast (predict the value from ``season_days``
    CALENDAR days ago) scaled by the one-day-naive error — the
    standard "is your model better than last week's number" gate
    before any trained forecaster ships.

    Integer-exact: both error sums are bigint |v_t - v_lag| over
    CALENDAR lags (equi-joins on day-index arithmetic, so calendar
    gaps produce no pair rather than a wrong row-offset pair), and
    the final statistic is ONE double division of two exact integer
    products: mase = (sum_err_s * n_naive) / (n_seasonal *
    sum_err_naive). The daily rollup is calendar-bounded, so the two
    self-equi-joins are trivially small at any data scale.

    Returns one row: (n_seasonal, sum_abs_err_seasonal, n_naive,
    sum_abs_err_naive, mase); mase is NULL when the naive error sum
    is zero (constant series)."""
    idx = F.datediff(F.col(day_col), F.lit("1970-01-01").cast("date"))
    base = daily.select(
        idx.alias("_d"), F.col(value_col).cast("bigint").alias("_v")
    )
    lag_s = base.select(
        (F.col("_d") + season_days).alias("_d"), F.col("_v").alias("_vs")
    )
    lag_1 = base.select(
        (F.col("_d") + 1).alias("_d"), F.col("_v").alias("_v1")
    )
    seasonal = base.join(lag_s, "_d").select(
        F.abs(F.col("_v") - F.col("_vs")).alias("_e")
    )
    naive = base.join(lag_1, "_d").select(
        F.abs(F.col("_v") - F.col("_v1")).alias("_e")
    )
    s = seasonal.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seasonal"),
        F.coalesce(F.sum("_e"), F.lit(0)).cast("bigint").alias(
            "sum_abs_err_seasonal"
        ),
    )
    n = naive.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_naive"),
        F.coalesce(F.sum("_e"), F.lit(0)).cast("bigint").alias(
            "sum_abs_err_naive"
        ),
    )
    return s.crossJoin(n).select(
        "n_seasonal",
        "sum_abs_err_seasonal",
        "n_naive",
        "sum_abs_err_naive",
        F.when(
            (F.col("sum_abs_err_naive") > 0) & (F.col("n_seasonal") > 0),
            (
                F.col("sum_abs_err_seasonal") * F.col("n_naive")
            ).cast("double")
            / (F.col("n_seasonal") * F.col("sum_abs_err_naive")).cast(
                "double"
            ),
        ).alias("mase"),
    )


def survival_table(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    max_grid_rows: int = 1_000_000,
) -> DataFrame:
    """Kaplan–Meier risk table from (duration, event) observations —
    the time-to-second-purchase / churn analysis a subscription or
    repeat-purchase team runs: one row per distinct duration with the
    number at risk, the events, and the censorings at that time.
    DELIBERATELY returns the integer table, not the survival
    PROBABILITY curve: the KM estimator is a running float product
    (order-sensitive, engine-divergent), while (n_at_risk, n_events)
    is exact and any consumer can fold the product locally.

    Scale shape: the observations collapse to the duration GRID in
    one map-side-combinable aggregate; ``n_at_risk(d) = total -
    cum(d) + count(d)`` rides ONE inclusive running total over the
    grid (a window over grid rows, bounded by distinct durations —
    the winsorize/KS grid rule) with the total as a broadcast 1-row
    aggregate."""
    grid = df.groupBy(F.col(duration_col).alias("duration")).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum((~F.col(event_col).cast("boolean")).cast("long")).alias(
            "n_censored"
        ),
        F.count(F.lit(1)).cast("bigint").alias("_cnt"),
    )
    # executable grid contract: distinct durations must stay
    # domain-bounded (days/weeks), or the global window would sort a
    # data-sized table — fail loudly instead (guards module)
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    grid = enforce_bounded_grid(
        grid, max_grid_rows, "survival_table", keep_count_col=True
    )
    # guard-column partition key: see residual_anomaly_days note
    w = Window.partitionBy("_grid_n").orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grid.withColumn("_cum", F.sum("_cnt").over(w))
    tot = grid.agg(F.sum("_cnt").alias("_n"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "duration",
            (F.col("_n") - F.col("_cum") + F.col("_cnt"))
            .cast("bigint")
            .alias("n_at_risk"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_censored").cast("bigint").alias("n_censored"),
        )
    )


def concentration_gini(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Exact Gini coefficient of ``value_col`` per group — the
    revenue/token concentration report ("do 1% of the customers carry
    40% of the revenue? is one source dominating the training mix?").

    Uses the rank-sum identity on non-negative INTEGER values
    (cents/token counts), computed entirely in bigint on the value
    GRID with a closed-form tie run:

        G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx),  i = ascending rank

    A run of c equal values v occupying ranks k+1..k+c contributes
    2·Σ i·x = v·(2·c·k + c·(c+1)) — so ties need no per-row ranks and
    the raw rows are NEVER windowed (the winsorize/KS grid rule): one
    map-side-combinable aggregate to the (group, value) grid, one
    window over grid rows (bounded by distinct values, not row
    count), one final bigint/bigint division. G = 0 for perfectly
    equal groups; NULL when the group total is 0 (undefined).

    Output: (*group_cols, n, total, gini_num, gini)."""
    grid = df.groupBy(
        *group_cols, F.col(value_col).cast("bigint").alias("_v")
    ).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = grid.withColumn(
        "_k", F.coalesce(F.sum("_c").over(w), F.lit(0))
    ).withColumn(
        "_two_ix",
        F.col("_v")
        * (2 * F.col("_c") * F.col("_k") + F.col("_c") * (F.col("_c") + 1)),
    )
    out = contrib.groupBy(*group_cols).agg(
        F.sum("_c").cast("bigint").alias("n"),
        F.sum(F.col("_v") * F.col("_c")).cast("bigint").alias("total"),
        F.sum("_two_ix").cast("bigint").alias("_s2"),
    )
    return out.select(
        *group_cols,
        "n",
        "total",
        (F.col("_s2") - (F.col("n") + 1) * F.col("total"))
        .cast("bigint")
        .alias("gini_num"),
        F.when(
            F.col("total") > 0,
            (F.col("_s2") - (F.col("n") + 1) * F.col("total")).cast("double")
            / (F.col("n") * F.col("total")).cast("double"),
        ).alias("gini"),
    )


def linear_attribution(
    events: DataFrame,
    touch_types: Sequence[str] = ("view", "click"),
    conversion_type: str = "purchase",
    window_us: int = 86_400_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_us_col: str = "ts_us",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution — the
    every-touch-counts sibling of ``last_touch_attribution``: each
    conversion's value splits EVENLY across all its touches within
    the lookback window, rolled up per touch channel.

    Exactness: the conversion value becomes integer MICRO-UNITS of
    the value column (1e6 per unit — micro-dollars for a dollar
    value), the
    per-touch share is one integer division (``div k``), and the
    division remainder goes to the LATEST touch (largest-remainder
    completion, latest-touch tie-break on (ts, event_id) — both
    deterministic), so per-conversion credit sums to the conversion
    value EXACTLY, no float leakage, and the channel rollup is an
    associative bigint sum. Law (pytest-pinned): total credited
    micro-cents == total value of attributed conversions.

    Scale shape: the touch-conversion pair join keys on the USER with
    the time-band predicate inside the join condition — fan-out is
    touches-per-window, not touches x conversions; per-conversion k
    and the latest-touch rank ride windows partitioned by the
    conversion id (group size = touches per conversion, never a
    global sort). At warehouse scale feed the pair join through the
    banded interval machinery (operators/band.py) to bucket the time
    axis; semantics are unchanged.

    Returns one row per touch channel: (touch_type, n_touches,
    n_conversions, credit_micro, credit_value)."""
    ts = F.col(ts_us_col).cast("bigint")
    convs = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        ts.alias("_cts"),
        F.col(id_col).cast("bigint").alias("_cid"),
        (F.col(value_col).cast("decimal(18,2)") * 1_000_000)
        .cast("bigint")
        .alias("_vmicro"),
    )
    touches = events.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("_tu"),
        ts.alias("_tts"),
        F.col(id_col).cast("bigint").alias("_tid"),
        F.col(type_col).alias("touch_type"),
    )
    pairs = convs.join(
        touches,
        (F.col("_u") == F.col("_tu"))
        & (F.col("_tts") < F.col("_cts"))
        & (F.col("_tts") >= F.col("_cts") - F.lit(window_us)),
    )
    wk = Window.partitionBy("_cid")
    wr = Window.partitionBy("_cid").orderBy(
        F.col("_tts").desc(), F.col("_tid").desc()
    )
    credited = pairs.select(
        "touch_type",
        "_cid",
        "_vmicro",
        F.count(F.lit(1)).over(wk).alias("_k"),
        F.row_number().over(wr).alias("_rn"),
    ).select(
        "touch_type",
        "_cid",
        (
            F.expr("_vmicro div _k")
            + F.when(
                F.col("_rn") == 1, F.expr("_vmicro % _k")
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("_credit"),
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.countDistinct("_cid").cast("bigint").alias("n_conversions"),
        F.sum("_credit").cast("bigint").alias("credit_micro"),
        (
            F.sum("_credit").cast("double") / F.lit(1_000_000.0)
        ).alias("credit_value"),
    )


def skyline_2d(
    df: DataFrame,
    max_col: str,
    min_col: str,
    max_grid_rows: int = 1_000_000,
) -> DataFrame:
    """2-D Pareto frontier (skyline): the points where ``max_col``
    cannot be raised without raising ``min_col`` — "biggest size at
    the lowest price". A point (x, y) is dominated when some other
    point has x' ≥ x and y' ≤ y with at least one strict; the
    frontier is what survives.

    Scale shape: the raw rows collapse FIRST to the per-x grid
    (groupBy x → min y + count + tiebreak count), which is map-side
    combinable and bounded by |distinct x| — the domain of the
    maximize axis, never the data. Only the grid rides the one
    ordered window (running strict-min of y over larger x), so the
    single-task sort touches |domain| rows; for dimension-like axes
    (size, rating, tier) that is O(100). A data-sized x would make
    the grid data-sized — the caller buckets first (same contract as
    histogram_quantiles).

    Frontier membership off the grid: keep (x, min_y) iff
    min_y < min over all strictly-larger x — equality loses because
    the larger-x point dominates with x strict. Counts: n_at_point =
    rows achieving (x, min_y); n_at_x = all rows at x.

    Returns (x, y, n_at_point, n_at_x) sorted ascending by x."""
    x, y = F.col(max_col), F.col(min_col)
    # ONE scan: raw rows collapse to the (x, y) cell grid; both the
    # per-x minimum and the row totals derive from grid-sized work
    cells = df.groupBy(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at_point")
    )
    grid = cells.groupBy("x").agg(
        F.min("y").alias("y"),
        F.sum("n_at_point").cast("bigint").alias("n_at_x"),
    ).join(cells, ["x", "y"])
    # executable form of the "caller buckets first" contract above: a
    # data-sized x domain fails loudly before the single-task sort
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    grid = enforce_bounded_grid(
        grid, max_grid_rows, "skyline_2d", keep_count_col=True
    )
    # guard-column partition key: see residual_anomaly_days note
    w = (
        Window.partitionBy("_grid_n")
        .orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        grid.withColumn("_best_larger", F.min("y").over(w))
        .where(
            F.col("_best_larger").isNull()
            | (F.col("y") < F.col("_best_larger"))
        )
        .select("x", "y", "n_at_point", "n_at_x")
        .orderBy("x")
    )


def changepoint_single(
    df: DataFrame,
    day_col: str,
    value_col: str,
    max_grid_rows: int = 200_000,
) -> DataFrame:
    """Single-changepoint detection on a DAILY series: the split that
    minimizes total within-segment sum of squared error — "did the
    level shift, and when" for a revenue/traffic line, the one-step
    core of binary-segmentation changepoint methods.

    Determinism: prefix sums S_i (bigint) and squared sums Q_i
    (decimal(38,0) — a daily cents total squared exceeds bigint) are
    EXACT; each candidate split's cost is a fixed IEEE expression
    tree over casts of those exact values

        cost_i = (Q_i − S_i²/i) + ((Q_n−Q_i) − (S_n−S_i)²/(n−i))

    evaluated per candidate row — identical trees produce identical
    doubles on any engine (the wilson_bounds rule), so the argmin
    (tie-broken by day) is engine-portable. The no-split cost uses
    the same tree shape for a comparable ``gain``.

    Scale shape: the input is a calendar-bounded daily rollup
    (guarded by ``max_grid_rows``); prefix sums ride one grid window
    partitioned on the guard column, totals broadcast back as a 1-row
    frame, and the argmin is a struct-min aggregate. Returns ONE row:
    (split_day, n_left, n_right, sum_left, sum_right, cost, gain)."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    base = enforce_bounded_grid(
        df.select(
            F.col(day_col).alias("day"),
            F.col(value_col).cast("bigint").alias("v"),
        ),
        max_grid_rows,
        "changepoint_single",
        keep_count_col=True,
    )
    w = (
        Window.partitionBy("_grid_n")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("_grid_n").orderBy("day")
    vsq = F.col("v").cast("decimal(19,0)") * F.col("v").cast("decimal(19,0)")
    pre = base.select(
        "day",
        "v",
        F.row_number().over(wn).alias("i"),
        F.sum("v").over(w).cast("bigint").alias("s"),
        F.sum(vsq.cast("decimal(38,0)")).over(w)
        .cast("decimal(38,0)")
        .alias("q"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sn"),
        F.sum(vsq.cast("decimal(38,0)")).cast("decimal(38,0)").alias("qn"),
    )
    cand = pre.crossJoin(F.broadcast(tot)).where(F.col("i") < F.col("n"))
    d = lambda c: c.cast("double")  # noqa: E731 — fixed IEEE tree below
    cost = (
        d(F.col("q")) - d(F.col("s")) * d(F.col("s")) / d(F.col("i"))
    ) + (
        d(F.col("qn") - F.col("q"))
        - d(F.col("sn") - F.col("s"))
        * d(F.col("sn") - F.col("s"))
        / d(F.col("n") - F.col("i"))
    )
    no_split = d(F.col("qn")) - d(F.col("sn")) * d(F.col("sn")) / d(F.col("n"))
    scored = cand.select(
        F.struct(
            cost.alias("cost"),
            F.col("day").alias("split_day"),
            F.col("i").alias("n_left"),
            (F.col("n") - F.col("i")).cast("bigint").alias("n_right"),
            F.col("s").alias("sum_left"),
            (F.col("sn") - F.col("s")).cast("bigint").alias("sum_right"),
            no_split.alias("_c0"),
        ).alias("_best")
    )
    best = scored.agg(F.min("_best").alias("_best"))
    return best.select(
        F.col("_best.split_day").alias("split_day"),
        F.col("_best.n_left").alias("n_left"),
        F.col("_best.n_right").alias("n_right"),
        F.col("_best.sum_left").alias("sum_left"),
        F.col("_best.sum_right").alias("sum_right"),
        F.col("_best.cost").alias("cost"),
        (F.col("_best._c0") - F.col("_best.cost")).alias("gain"),
    )


def seasonal_decompose_exact(
    df: DataFrame,
    day_col: str,
    value_col: str,
    period: int = 7,
    max_grid_rows: int = 200_000,
) -> DataFrame:
    """Classical additive seasonal decomposition of a DAILY integer
    series (trend + seasonal + residual — the STL-shaped read on "is
    revenue really up, or is it just Friday"), kept EXACT end-to-end
    by carrying every component as an integer numerator over a known
    denominator instead of dividing:

    * trend_t   = sum of the centered ``period``-day window / period
                  → emitted as ``trend_num`` (bigint) over period;
    * detrended D_t = period·v_t − trend_num  (bigint, the
                  revenue_anomalies residual trick scaled to any
                  period) — only days with a FULL window survive;
    * seasonal  s_k for day-of-period k = mean(D_t)/period over the
                  k-slot → ``seasonal_num`` = Σ D_t (bigint) over
                  denominator period·cnt_k;
    * residual  r_t = v_t − trend − seasonal
                  → ``residual_num`` = D_t·cnt_k − seasonal_num over
                  the same period·cnt_k. The product is carried in
                  decimal(38,0) internally (overflow safety) but
                  EMITTED as bigint: a DECIMAL in a final SELECT
                  converts engine-dependently across DuckDB/pandas
                  versions (the r6 oracle-parity incident), and
                  |D·cnt| <= period·max|v|·(grid/period) fits bigint
                  far beyond the enforced ``max_grid_rows`` calendar
                  (~2·10^14 at sf0.1 vs the 9.2·10^18 bigint bound).

    The day-of-period slot is epoch-anchored (days since 1970-01-01
    mod period) so any engine derives the same k without weekday
    locale rules. ``period`` must be odd so the moving window
    centers. Scale shape: the input is a calendar-bounded daily
    rollup (enforced by ``max_grid_rows``); the centered sum rides
    one grid window partitioned on the guard column; the per-slot
    means are a ``period``-row broadcast dim joined back. Output per
    surviving day: (day, v, trend_num, dow, seasonal_num, slot_cnt,
    residual_num)."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    if period % 2 != 1 or period < 3:
        raise ValueError(f"period must be odd and >= 3; got {period}")
    half = period // 2
    base = enforce_bounded_grid(
        df.select(
            F.col(day_col).cast("date").alias("day"),
            F.col(value_col).cast("bigint").alias("v"),
        ),
        max_grid_rows,
        "seasonal_decompose_exact",
        keep_count_col=True,
    )
    w_c = (
        Window.partitionBy("_grid_n")
        .orderBy("day")
        .rowsBetween(-half, half)
    )
    full = base.select(
        "day",
        "v",
        F.sum("v").over(w_c).cast("bigint").alias("trend_num"),
        F.count(F.lit(1)).over(w_c).alias("_wn"),
        (F.datediff(F.col("day"), F.lit("1970-01-01")) % period)
        .cast("bigint")
        .alias("dow"),
    ).where(F.col("_wn") == period)
    detr = full.select(
        "day",
        "v",
        "trend_num",
        "dow",
        (F.lit(period).cast("bigint") * F.col("v") - F.col("trend_num"))
        .cast("bigint")
        .alias("_d"),
    )
    slots = detr.groupBy("dow").agg(
        F.sum("_d").cast("bigint").alias("seasonal_num"),
        F.count(F.lit(1)).cast("bigint").alias("slot_cnt"),
    )
    d38 = "decimal(38,0)"
    return detr.join(F.broadcast(slots), "dow").select(
        "day",
        "v",
        "trend_num",
        "dow",
        "seasonal_num",
        "slot_cnt",
        (
            F.col("_d").cast(d38) * F.col("slot_cnt").cast(d38)
            - F.col("seasonal_num").cast(d38)
        )
        .cast(d38)
        .cast("bigint")
        .alias("residual_num"),
    )


def theilsen_slope(
    df: DataFrame,
    day_col: str,
    value_col: str,
    scale: int = 1_000_000,
    max_grid_rows: int = 5_000,
) -> DataFrame:
    """Theil–Sen robust slope of a DAILY integer series — the median
    of all pairwise slopes, the trend estimate that shrugs off the
    outlier days that wreck the OLS line (grouped_linear_trend /
    price_qty_ols are its parametric siblings).

    Determinism without float medians: each pairwise slope is
    QUANTIZED to an exact bigint — floor((v_j−v_i)·scale / (t_j−t_i))
    computed with pure integer remainder algebra (pm = ((num % dt) +
    dt) % dt; q = (num − pm) div dt — both engines' % is
    dividend-signed remainder, so the tree ports verbatim) — and the
    LOWER MEDIAN of bigints is selected by cumulative count over the
    distinct-slope grid: the smallest q with 2·cum ≥ n_pairs.
    No float enters at all; the caller divides by ``scale``.

    Scale shape: the input must already be a calendar-bounded daily
    rollup — ``max_grid_rows`` (default 5,000 days ≈ 13 years)
    enforces it BEFORE the O(days²) pair self-join (≤ 12.5 M pairs at
    the default, grid-sized, never data-sized); slopes collapse by
    map-side combine onto the distinct-quantum grid and the median
    selection is a struct-min aggregate. Returns ONE row:
    (n_days, n_pairs, slope_q, scale)."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    base = enforce_bounded_grid(
        df.select(
            F.col(day_col).cast("date").alias("day"),
            F.col(value_col).cast("bigint").alias("v"),
        ),
        max_grid_rows,
        "theilsen_slope",
        keep_count_col=True,
    ).select(
        "_grid_n",
        F.datediff(F.col("day"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("t"),
        "v",
    )
    # r12: the pair self-join read ``base`` on both sides, re-running
    # the daily rollup AND its guard count per side (4 source scans at
    # sf0.1); materialize the grid-bounded series once — it is at most
    # ``max_grid_rows`` rows by the guard just applied.
    base = base.localCheckpoint(eager=True)
    # r12: the rollup collapses to ~1 AQE-coalesced partition, so the
    # O(days²) pair expansion (≤ 12.5M rows at the guard default) ran
    # in ONE task; spread the probe side across the cluster first —
    # a shuffle of ≤ max_grid_rows rows buys days²/P per task.
    n_par = df.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(n_par).select(
        "_grid_n", F.col("t").alias("t1"), F.col("v").alias("v1")
    )
    b = base.select(
        F.col("_grid_n").alias("_g2"),
        F.col("t").alias("t2"),
        F.col("v").alias("v2"),
    )
    pairs = a.join(b, a["_grid_n"] == b["_g2"]).where(
        F.col("t2") > F.col("t1")
    ).select(
        "_grid_n",
        ((F.col("v2") - F.col("v1")) * F.lit(scale).cast("bigint")).alias(
            "_num"
        ),
        (F.col("t2") - F.col("t1")).cast("bigint").alias("_dt"),
    )
    q = pairs.select(
        "_grid_n",
        F.expr(
            "(_num - ((_num % _dt) + _dt) % _dt) div _dt"
        ).cast("bigint").alias("slope_q"),
    )
    cells = q.groupBy("_grid_n", "slope_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    # r12: the lower-median selection was a single global window
    # partitioned on the constant guard column — a ONE-TASK sort +
    # cumsum over the distinct-slope grid, which is ~n_pairs cells
    # when slopes rarely collide (measured: 2.89M cells, ~10 s in one
    # task at sf0.1; the grid bound still allows 12.5M). The
    # cumulative count over the slope grid is exactly the
    # running-total shape operators/ids.py solves with a range
    # repartition + bounded per-partition offsets collect — the same
    # exact bigint cumulative, computed in parallel. The cell grid is
    # materialized once so the quadratic pair expansion is not
    # replayed for the total-count pass.
    from amazon_personalize_connectors_spark.operators.ids import (
        add_running_totals,
    )

    cum = add_running_totals(
        cells, ["slope_q"], {"_c": "_cum"}, total_names={"_c": "_np"}
    )
    best = (
        cum.where(
            2 * F.col("_cum").cast("bigint")
            >= F.col("_np").cast("bigint")
        )
        .groupBy("_grid_n", "_np")
        .agg(F.min("slope_q").cast("bigint").alias("slope_q"))
    )
    best = best.select(
        "_grid_n", F.col("_np").cast("bigint").alias("_np"), "slope_q"
    )
    return best.select(
        F.col("_grid_n").cast("bigint").alias("n_days"),
        F.col("_np").alias("n_pairs"),
        "slope_q",
        F.lit(scale).cast("bigint").alias("scale"),
    )


def largest_remainder_allocation(
    df: DataFrame,
    key_cols: Sequence[str],
    weight_col: str,
    total_slots: int,
    max_grid_rows: int = 100_000,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer slot
    budget across groups proportional to an integer weight — the
    exact answer to "sample N training documents across sources in
    proportion to quality-weighted mass" that a naive
    round(N·w/W) gets wrong (rounded shares don't sum to N).

    Pure integer arithmetic: per group, num = N·w (decimal(38,0) —
    N·w overflows bigint at warehouse magnitudes), floor share
    = num div W, remainder = num mod W; the leftover slots
    (N − Σ floors, < #groups by construction) go to the groups with
    the largest remainders, ties broken by key order — fully
    deterministic, Σ slots == N by construction.

    Scale shape: one map-side-combinable groupBy collapses the data
    to the GROUP grid (a dimension domain, enforced by
    ``max_grid_rows``); the total and the floor-sum ride back as
    1-row broadcasts; the remainder rank is one grid window
    partitioned on the guard column. Output per group:
    (*key_cols, weight, slots)."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    d38 = "decimal(38,0)"
    groups = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.sum(F.col(weight_col).cast("bigint")).cast("bigint").alias("weight")
    )
    grid = enforce_bounded_grid(
        groups, max_grid_rows, "largest_remainder_allocation",
        keep_count_col=True,
    )
    tot = grid.agg(F.sum("weight").cast(d38).alias("_w_tot"))
    with_tot = grid.crossJoin(F.broadcast(tot)).select(
        "_grid_n",
        *key_cols,
        "weight",
        (F.lit(total_slots).cast(d38) * F.col("weight").cast(d38))
        .cast(d38)
        .alias("_num"),
        "_w_tot",
    )
    # `div` / `%` on decimal(38,0) are EXACT integer quotient and
    # remainder in Spark (and `//` / `%` on HUGEINT in the oracle) —
    # decimal true division would round at engine-specific scales.
    shared = with_tot.select(
        "_grid_n",
        *key_cols,
        "weight",
        F.expr("_num div _w_tot").cast("bigint").alias("_floor"),
        (F.col("_num") % F.col("_w_tot")).cast(d38).alias("_rem"),
    )
    floors = shared.agg(F.sum("_floor").cast("bigint").alias("_f_sum"))
    w_rank = Window.partitionBy("_grid_n").orderBy(
        F.col("_rem").desc(), *[F.col(k).asc() for k in key_cols]
    )
    return (
        shared.crossJoin(F.broadcast(floors))
        .select(
            *key_cols,
            "weight",
            (
                F.col("_floor")
                + F.when(
                    F.row_number().over(w_rank)
                    <= F.lit(total_slots).cast("bigint") - F.col("_f_sum"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("slots"),
        )
    )


def rolling_ols_slope(
    df: DataFrame,
    day_col: str,
    value_col: str,
    window_days: int = 28,
) -> DataFrame:
    """Per-day rolling OLS trend: for each day, the least-squares
    slope of the daily series over the trailing ``window_days``-day
    RANGE window — "how fast is this metric moving right now", the
    windowed sibling of grouped_linear_trend (and the local-trend
    complement of the global Theil-Sen line).

    Determinism: the five moment sums (n, Σt, Σv, Σtv, Σt²) ride ONE
    integer RANGE window over the daily rollup (missing days
    contribute nothing — a ROWS frame would be wrong on sparse
    series) with t = epoch days, all exact bigints; the slope is one
    fixed IEEE tree per output row:

        slope = (n·Σtv − Σt·Σv) / (n·Σt² − Σt·Σt)

    with the cross-products formed on DOUBLE casts of the exact sums
    (each < 2⁵³ for cents-scale dailies over calendar windows — the
    cuped envelope). n < 2 or a degenerate window (zero variance in
    t cannot happen with distinct days, but n = 1 makes the
    denominator 0) yields NULL.

    Scale shape: callers pass the daily ROLLUP (one row per day —
    the gap_fill/rolling_range_sum convention), so the window
    partition is calendar-bounded; with no partition key the frame
    is a domain grid, and groups can be added by partitioning the
    caller's rollup first. Output (day, v, n_window, slope)."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    base = enforce_bounded_grid(
        df.select(
            F.col(day_col).cast("date").alias("day"),
            F.col(value_col).cast("bigint").alias("v"),
        ),
        200_000,
        "rolling_ols_slope",
        keep_count_col=True,
    ).withColumn(
        "t", F.datediff(F.col("day"), F.lit("1970-01-01")).cast("bigint")
    )
    w = (
        Window.partitionBy("_grid_n")
        .orderBy("t")
        .rangeBetween(-(window_days - 1), 0)
    )
    m = base.select(
        "day",
        "v",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_window"),
        F.sum("t").over(w).cast("bigint").alias("_st"),
        F.sum("v").over(w).cast("bigint").alias("_sv"),
        F.sum(F.col("t") * F.col("v")).over(w).cast("bigint").alias("_stv"),
        F.sum(F.col("t") * F.col("t")).over(w).cast("bigint").alias("_stt"),
    )
    d = lambda c: c.cast("double")  # noqa: E731 — fixed IEEE tree below
    den = d(F.col("n_window")) * d(F.col("_stt")) - d(F.col("_st")) * d(
        F.col("_st")
    )
    num = d(F.col("n_window")) * d(F.col("_stv")) - d(F.col("_st")) * d(
        F.col("_sv")
    )
    return m.select(
        "day",
        "v",
        "n_window",
        F.when((F.col("n_window") >= 2) & (den != 0.0), num / den).alias(
            "slope"
        ),
    )


def growth_accounting(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Growth accounting: per period, how many active users are NEW
    (first period ever), RETAINED (also active the previous period),
    or RESURRECTED (active before, but not last period) — plus the
    CHURNED count (active last period, absent now) — the standard
    product-growth decomposition that cohort_retention's matrix
    doesn't directly answer.

    Periods are floor(epoch_day / period_days) — pure integer
    arithmetic (the cohort_retention rule). Raw events collapse to
    distinct (user, period) FIRST (map-side combinable); per-user
    lag and first-period come from one window over that frame
    (partitioned by user — parallel across users, rows = active
    periods per user, never raw events); churn is the same frame
    shifted one period. Output per period: (period, n_active, n_new,
    n_retained, n_resurrected, n_churned)."""
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400))
    period = F.floor(day / F.lit(period_days)).cast("bigint")
    up = (
        events.select(F.col(user_col).alias("u"), period.alias("p"))
        .distinct()
    )
    w = Window.partitionBy("u").orderBy("p")
    lab = up.select(
        "u",
        "p",
        F.lag("p").over(w).alias("_prev"),
    ).select(
        "p",
        F.when(F.col("_prev").isNull(), F.lit("new"))
        .when(F.col("_prev") == F.col("p") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("_cls"),
    )
    active = lab.groupBy("p").pivot(
        "_cls", ["new", "retained", "resurrected"]
    ).count().na.fill(0)
    # churned at p: active at p-1 but not at p — shift last period's
    # actives forward one period and anti-join the current actives
    shifted = up.select((F.col("p") + 1).alias("p"), "u")
    churned = (
        shifted.join(up, ["p", "u"], "left_anti")
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    # keep gap periods (zero active, nonzero churn) — dropping them
    # would hide churn — but clip the phantom period past the horizon
    max_p = up.agg(F.max("p").alias("_max_p"))
    return (
        active.join(churned, "p", "full")
        .na.fill(0)
        .crossJoin(F.broadcast(max_p))
        .where(F.col("p") <= F.col("_max_p"))
        .select(
            F.col("p").alias("period"),
            (F.col("new") + F.col("retained") + F.col("resurrected"))
            .cast("bigint")
            .alias("n_active"),
            F.col("new").cast("bigint").alias("n_new"),
            F.col("retained").cast("bigint").alias("n_retained"),
            F.col("resurrected").cast("bigint").alias("n_resurrected"),
            F.col("n_churned").cast("bigint").alias("n_churned"),
        )
    )


def open_interval_daily_counts(
    df: DataFrame,
    start_col: str,
    end_col: str,
    max_grid_rows: int = 100_000,
) -> DataFrame:
    """Sweep-line interval concurrency: for every day on which the
    number of OPEN intervals changes, the net change and the exact
    count of intervals open that day ([start_day, end_day] inclusive).
    This is the "how many orders were in flight / sessions concurrent
    / jobs running on day d" question — the naive day×interval
    band join is O(days·rows); the sweep is two aggregates and a
    calendar-bounded running sum.

    Scale shape: +1 events collapse via groupBy(start day), -1 events
    via groupBy(end day + 1) — both map-side combinable, output rows
    ∝ DISTINCT DAYS (a calendar domain, ``enforce_bounded_grid``),
    never ∝ intervals. The running sum is one ordered window over the
    guarded grid (partitioned on the non-foldable guard count column,
    the sanctioned bounded-grid window pattern). Pure date/bigint
    arithmetic, engine-portable.

    Returns (day date, net_delta bigint, open_cnt bigint) ordered by
    construction of the cumsum (emit order unspecified; rows cover
    exactly the change days)."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    starts = df.groupBy(
        F.to_date(F.col(start_col)).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ends = df.groupBy(
        F.date_add(F.to_date(F.col(end_col)), 1).alias("day")
    ).agg((-F.count(F.lit(1))).cast("bigint").alias("d"))
    deltas = (
        starts.unionByName(ends)
        .groupBy("day")
        .agg(F.sum("d").cast("bigint").alias("net_delta"))
    )
    grid = enforce_bounded_grid(
        deltas, max_grid_rows, "open_interval_daily_counts", keep_count_col=True
    )
    w = (
        Window.partitionBy("_grid_n")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "day",
        "net_delta",
        F.sum("net_delta").over(w).cast("bigint").alias("open_cnt"),
    )


def matrix_profile_ssd(
    series: DataFrame,
    order_col: str,
    value_col: str,
    m: int = 7,
    exclusion: int = 3,
    max_grid_rows: int = 10_000,
    max_pair_rows: int = 25_000_000,
) -> DataFrame:
    """Matrix profile over an ordered series (Yeh et al., ICDM 2016,
    simplified to the exact SSD distance): for every length-``m``
    subsequence, the minimum sum-of-squared-differences to any OTHER
    subsequence at least ``exclusion`` positions away, and where that
    nearest neighbor sits. Low profile values = motifs (repeated
    shapes, e.g. weekly seasonality); high values = discords
    (anomalous weeks). SSD instead of the z-normalized distance keeps
    every term in exact integer arithmetic (pass integer units, e.g.
    cents) — engine-portable, no sqrt/mean floats.

    Subsequences index the OBSERVED sequence (row order), not the
    calendar — gaps are the caller's contract (gap-fill first if
    missing periods should count as zeros).

    Scale shape: the series must already be aggregated to a bounded
    grid (a calendar/domain contract, ``enforce_bounded_grid``) —
    the all-pairs comparison is grid², sanctioned ONLY because the
    grid is data-size-independent. Because the JOIN is quadratic in
    the grid, the grid-row cap alone leaves an uncomfortable worst
    case (10k days ≈ 10⁸ pairs × m columns broadcast), so a second
    executable contract bounds the PAIR count: ``max_pair_rows``
    (default 25M ≈ a 13-year daily calendar) fails loudly at
    execution before the self-join materializes — raise BOTH caps
    deliberately for longer series, or requantize (weekly grid)
    first. Lags materialize via ``m`` lead()
    columns in one pass; the pair join is a broadcast of the bounded
    window table against itself; the argmin is a window rank
    partitioned per subsequence. The SSD accumulates in int64 — exact
    while |Δ| ≤ ~1.1e9 per term (cents scale; m·Δ² stays under 2⁶³),
    which is also the OUTPUT's bigint contract; past that, requantize
    first (ANSI mode fails loudly, never wraps). Keeping the grid²
    hot loop in long arithmetic instead of decimal(38,0) cuts the
    pair-join cost ~3×.

    Returns (idx, <order_col>, ssd_min, match_idx): one row per
    subsequence start, idx 1-based over the observed sequence."""
    from amazon_personalize_connectors_spark.operators.guards import (
        enforce_bounded_grid,
    )

    grid = enforce_bounded_grid(
        series.select(
            F.col(order_col).alias("_ord"),
            F.col(value_col).cast("bigint").alias("_v"),
        ),
        max_grid_rows,
        "matrix_profile_ssd",
        keep_count_col=True,
    )
    w_seq = Window.partitionBy("_grid_n").orderBy(F.col("_ord").asc())
    lagged = grid.select(
        "_ord",
        "_grid_n",
        F.row_number().over(w_seq).alias("idx"),
        *[F.lead("_v", k).over(w_seq).alias(f"_v{k}") for k in range(m)],
    )
    # second executable contract: the self-join below is grid², so the
    # row cap alone is not enough — fail before materializing pairs
    # (same assert_true-on-a-filter shape as enforce_bounded_grid,
    # reusing its broadcast _grid_n so no extra job or exchange).
    pair_check = F.assert_true(
        F.col("_grid_n").cast("bigint") * F.col("_grid_n") <= max_pair_rows,
        F.concat(
            F.lit("matrix_profile_ssd: grid of "),
            F.col("_grid_n").cast("string"),
            F.lit(
                f" rows implies up to grid^2 pairs, over "
                f"max_pair_rows={max_pair_rows}. Requantize the series "
                f"(e.g. weekly) or raise max_pair_rows deliberately."
            ),
        ),
    )
    # third executable contract (r11, found by the sf1 sweep): the SSD
    # hot loop is int64 and exact only while m·(max-min)² fits — past
    # that ANSI raised a raw ARITHMETIC_OVERFLOW deep in the pair
    # join. Make the docstring's "requantize first" an actionable
    # guard at the same observed-grid aggregate, so the refusal names
    # the fix instead of a stack trace. (The SSD RANKING is
    # scale-invariant, so dividing units before profiling is always
    # available to the caller.)
    # On the ADVICE r11 note about this guard: (a) the "second
    # scan" aggregates the GRID, which the pair-cap guard above
    # already bounds to ~max_pair_rows rows (calendar-sized, never
    # data-sized), so its cost is a rounding error next to the pair
    # join it protects; (b) the suggested per-window range bound is
    # UNSOUND for pair SSD — two internally-flat windows at
    # different levels (per-window range 0 each) still produce
    # |a_k-b_k| up to the GLOBAL range, which is therefore the
    # tightest bound computable without enumerating pairs. The
    # conservatism (refusing a series whose worst-case pair cannot
    # actually occur) stays as the documented contract.
    import math as _math

    range_bound = _math.isqrt((2**63 - 1) // m)
    vrange = grid.agg(
        (F.max("_v") - F.min("_v")).cast("bigint").alias("_v_range")
    )
    lagged = lagged.crossJoin(F.broadcast(vrange))
    range_check = F.assert_true(
        F.coalesce(F.col("_v_range"), F.lit(0)) <= range_bound,
        F.concat(
            F.lit("matrix_profile_ssd: value range "),
            F.col("_v_range").cast("string"),
            F.lit(
                f" implies SSD up to m*range^2 beyond int64 (range bound "
                f"{range_bound} at m={m}). Requantize to coarser integer "
                f"units (the SSD ranking is scale-invariant) before "
                f"profiling."
            ),
        ),
    )
    windows = lagged.where(
        F.col(f"_v{m - 1}").isNotNull()
        & pair_check.isNull()
        & range_check.isNull()
    )
    left = windows.select(
        F.col("idx").alias("ia"),
        F.col("_ord").alias("_ord_a"),
        *[F.col(f"_v{k}").alias(f"_a{k}") for k in range(m)],
    )
    right = windows.select(
        F.col("idx").alias("ib"),
        *[F.col(f"_v{k}").alias(f"_b{k}") for k in range(m)],
    )
    ssd = sum(
        (F.col(f"_a{k}") - F.col(f"_b{k}"))
        * (F.col(f"_a{k}") - F.col(f"_b{k}"))
        for k in range(m)
    )
    pairs = (
        left.join(
            F.broadcast(right),
            F.abs(F.col("ia") - F.col("ib")) > exclusion,
        )
        .select("ia", "_ord_a", "ib", ssd.cast("bigint").alias("_ssd"))
    )
    w_best = Window.partitionBy("ia").orderBy(
        F.col("_ssd").asc(), F.col("ib").asc()
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w_best))
        .where(F.col("_rn") == 1)
        .select(
            F.col("ia").alias("idx"),
            F.col("_ord_a").alias(order_col),
            F.col("_ssd").cast("bigint").alias("ssd_min"),
            F.col("ib").alias("match_idx"),
        )
    )


def dyadic_ewma(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    k_lags: int = 8,
    scale: int = 10**6,
) -> DataFrame:
    """Exponentially weighted moving average with decay 1/2,
    truncated at ``k_lags`` terms — the smoothing pass of a trend
    monitor, in EXACT integer arithmetic. True EWMA is an infinite
    recursion (float state, order-dependent); with alpha = 1/2 the
    weights are powers of two, and truncating at k lags bounds the
    dropped tail mass at 2^-k (< 0.4% for k=8), so
    ``ewma_q = (Σ v_{t-j}·2^(k-1-j) · scale) div (Σ 2^(k-1-j))``
    is exact, deterministic, and engine-portable. Missing leading
    lags (series head) drop out of BOTH sums — the estimate
    renormalizes instead of zero-padding.

    Scale shape: ``k_lags`` lag() columns in ONE window pass
    partitioned by the group key (no global sort; each group's
    series is one partition of domain-bounded length), no joins, no
    state. Pass integer units (cents).

    Returns (*group_cols, <order_col>, value, ewma_q) where
    ewma_q ≈ EWMA · scale (exact integer quotient)."""
    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(
        F.col(order_col).asc()
    )
    d38 = "decimal(38,0)"
    lags = [
        F.lag(F.col(value_col).cast("bigint"), j).over(w) for j in range(k_lags)
    ]
    num = sum(
        F.coalesce(lags[j].cast(d38), F.lit(0).cast(d38))
        * F.lit(2 ** (k_lags - 1 - j)).cast(d38)
        for j in range(k_lags)
    )
    den = sum(
        F.when(lags[j].isNotNull(), F.lit(2 ** (k_lags - 1 - j)))
        .otherwise(F.lit(0))
        .cast(d38)
        for j in range(k_lags)
    )
    staged = df.select(
        *group_cols,
        order_col,
        F.col(value_col).cast("bigint").alias("value"),
        num.cast(d38).alias("_num"),
        den.cast(d38).alias("_den"),
    )
    return staged.select(
        *group_cols,
        order_col,
        "value",
        F.expr(f"(_num * CAST({scale} AS decimal(38,0))) div _den")
        .cast("bigint")
        .alias("ewma_q"),
    )


def frequent_triples(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent 3-itemsets by the Apriori candidate-pruning step: a
    triple can only be frequent if all three of its pairs are, so
    candidates come from joining the FREQUENT-PAIR list with itself
    on the shared first item and closing the third edge against the
    same list — never from a 3-way self-join of the facts. This is
    the level-3 step of market-basket mining ("what three products
    sell together"), and the pruning is what keeps it alive at scale:
    the pair list is already support-filtered and collapsed to the
    item domain, so the triangle join is domain-sized, not
    fact-sized.

    Support counting then verifies each surviving candidate against
    the baskets with one aggregate over the candidate×basket
    semi-structure: facts self-join only through the (basket, item)
    grain already grouped — fan-out bounded by basket width, the
    cooccurrence_lift shape extended one level.

    Returns (item_a < item_b < item_c, n_abc) with n_abc ≥
    ``min_support``."""
    facts = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    pairs = (
        facts.alias("x")
        .join(facts.alias("y"), F.col("x._b") == F.col("y._b"))
        .where(F.col("x._i") < F.col("y._i"))
        .groupBy(
            F.col("x._i").alias("_pa"), F.col("y._i").alias("_pb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
        .where(F.col("_n") >= min_support)
        .select("_pa", "_pb")
    )
    # Apriori closure: (a,b) ⋈ (a,c) with b<c, then require (b,c)
    cand = (
        pairs.alias("p")
        .join(
            pairs.alias("q"), F.col("p._pa") == F.col("q._pa")
        )
        .where(F.col("p._pb") < F.col("q._pb"))
        .select(
            F.col("p._pa").alias("_a"),
            F.col("p._pb").alias("_b2"),
            F.col("q._pb").alias("_c"),
        )
        .join(
            pairs.select(
                F.col("_pa").alias("_b2"), F.col("_pb").alias("_c")
            ),
            ["_b2", "_c"],
            "leftsemi",
        )
    )
    # verify support: count baskets containing all three
    t = (
        cand.join(facts.select(F.col("_b"), F.col("_i").alias("_a")), "_a")
        .join(
            facts.select(
                F.col("_b"), F.col("_i").alias("_b2")
            ),
            ["_b", "_b2"],
            "leftsemi",
        )
        .join(
            facts.select(F.col("_b"), F.col("_i").alias("_c")),
            ["_b", "_c"],
            "leftsemi",
        )
        .groupBy("_a", "_b2", "_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_abc"))
        .where(F.col("n_abc") >= min_support)
    )
    return t.select(
        F.col("_a").alias("item_a"),
        F.col("_b2").alias("item_b"),
        F.col("_c").alias("item_c"),
        "n_abc",
    )


def ratio_to_parent(
    df: DataFrame,
    parent_cols: Sequence[str],
    child_cols: Sequence[str],
    value_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Two-level hierarchy shares — each child's fraction of its
    parent and each parent's fraction of the grand total (the
    drill-down "% of parent" column every BI rollup needs), as EXACT
    integer quotients: ``share_q = (v·scale) div parent_total`` via
    the pmod-subtract-divide idiom (exact at any magnitude, no float
    division drift between engines).

    Scale shape: one map-side-combinable groupBy to the child grain,
    one window sum per parent (partition = parent key), one 1-row
    broadcast for the grand total. Returns
    (*parent_cols, *child_cols, value, share_of_parent_q,
    parent_share_q)."""
    d38 = "decimal(38,0)"
    leaf = df.groupBy(*parent_cols, *child_cols).agg(
        F.sum(F.col(value_col).cast(d38)).cast(d38).alias("_v")
    )
    w_parent = Window.partitionBy(*parent_cols)
    tot = leaf.agg(F.sum("_v").cast(d38).alias("_tot"))
    staged = (
        leaf.withColumn("_pv", F.sum("_v").over(w_parent).cast(d38))
        .crossJoin(F.broadcast(tot))
    )

    def _exact_div(num: str, den: str) -> F.Column:
        # a zero denominator (all-zero parent/grand total) has no
        # share to compute — NULL, never an ANSI pmod/div-by-zero
        return F.when(
            F.expr(f"{den} <> 0"),
            F.expr(f"(({num}) - pmod(({num}), {den})) / {den}"),
        ).cast("bigint")

    s = f"CAST({scale} AS decimal(38,0))"
    return staged.select(
        *parent_cols,
        *child_cols,
        F.col("_v").cast("bigint").alias("value"),
        _exact_div(f"_v * {s}", "_pv").alias("share_of_parent_q"),
        _exact_div(f"_pv * {s}", "_tot").alias("parent_share_q"),
    )


def floor_running_balance(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    delta_col: str,
    out_col: str = "balance",
) -> DataFrame:
    """Floor-at-zero running balance — the Lindley recursion
    ``b_t = max(0, b_{t-1} + x_t)`` (warehouse stock that cannot go
    negative, a prepaid wallet, a queue length) — WITHOUT the
    sequential scan the recursion seems to demand. The reflection
    identity solves it in closed form over prefix sums::

        b_t = S_t - min(0, min_{j<=t} S_j)      (S = running sum of x)

    so the whole thing is ONE window shuffle (partition = group, order
    = ``order_cols``): a running sum, then a running min OVER THE SAME
    window spec — Catalyst plans both in a single sort, no self-join,
    no recursion, no per-group Python. This is the canonical example
    of a "needs a recursive CTE" op that is actually
    window-expressible; the oracle deliberately replays the recursion
    row-by-row with a DuckDB ``WITH RECURSIVE`` so the two forms are
    derived independently.

    Exact bigint arithmetic throughout (pass integer deltas, e.g.
    units or cents). ``order_cols`` must be a deterministic total
    order within each group or the balance is not well defined.

    100-TB shape: one hash shuffle on the group key + one sort per
    partition; group skew is the only hazard (one giant group = one
    long sorted chain), same contract as any running aggregate.

    Returns the input plus ``out_col`` (bigint, ≥ 0)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn(
        "_lindley_s", F.sum(F.col(delta_col).cast("bigint")).over(w)
    )
    return out.withColumn(
        out_col,
        (
            F.col("_lindley_s")
            - F.least(
                F.lit(0).cast("bigint"), F.min("_lindley_s").over(w)
            )
        ).cast("bigint"),
    ).drop("_lindley_s")


def interpolate_fill(
    df: DataFrame,
    group_cols: Sequence[str],
    pos_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Linear-interpolation gap fill — the numeric sibling of
    ``locf_fill``: a null ``value_col`` at integer position ``p``
    bracketed by known points (p0, v0) and (p1, v1) becomes the exact
    integer quotient::

        fill_q = v0*scale + floor((v1-v0)*scale*(p-p0) / (p1-p0))

    (floor division via the pmod-subtract-divide idiom in
    decimal(38,0), so the filled series is bit-identical on any
    engine — no float slope drift). Leading/trailing nulls with no
    bracketing point on one side stay null: extrapolation is a lie,
    compose with ``locf_fill`` if the caller wants it.

    Scale shape: two window passes over the SAME (group, order) spec
    — backward ``last(ignorenulls)`` for (p0, v0), forward
    ``first(ignorenulls)`` for (p1, v1) — one shuffle, one sort (the
    forward frame reuses the sort reversed). ``pos_col`` must be an
    integer grid position (epoch day, week index); run a calendar
    densifier (``gap_fill_days``) first to materialize the gaps.

    Returns the input plus ``value_q`` (known value × scale, or the
    interpolation, or null) and ``is_interpolated`` (int 0/1, null
    rows that stay null get 0)."""
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy(pos_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*group_cols)
        .orderBy(pos_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_p = F.when(
        F.col(value_col).isNotNull(), F.col(pos_col).cast("bigint")
    )
    known_v = F.when(
        F.col(value_col).isNotNull(), F.col(value_col).cast("bigint")
    )
    d38 = "decimal(38,0)"
    staged = (
        df.withColumn("_p0", F.last(known_p, ignorenulls=True).over(wb))
        .withColumn("_v0", F.last(known_v, ignorenulls=True).over(wb))
        .withColumn("_p1", F.first(known_p, ignorenulls=True).over(wf))
        .withColumn("_v1", F.first(known_v, ignorenulls=True).over(wf))
    )
    num = (
        f"(CAST(_v1 AS {d38}) - CAST(_v0 AS {d38}))"
        f" * CAST({scale} AS {d38})"
        f" * (CAST({pos_col} AS {d38}) - CAST(_p0 AS {d38}))"
    )
    den = f"(CAST(_p1 AS {d38}) - CAST(_p0 AS {d38}))"
    interp = F.expr(
        f"CAST(_v0 AS {d38}) * CAST({scale} AS {d38})"
        f" + (({num}) - pmod(({num}), {den})) / {den}"
    ).cast("bigint")
    return staged.select(
        *df.columns,
        F.when(
            F.col(value_col).isNotNull(),
            F.col(value_col).cast("bigint") * F.lit(scale).cast("bigint"),
        )
        .when(F.col("_p0").isNotNull() & F.col("_p1").isNotNull(), interp)
        .alias("value_q"),
        (
            F.col(value_col).isNull()
            & F.col("_p0").isNotNull()
            & F.col("_p1").isNotNull()
        )
        .cast("int")
        .alias("is_interpolated"),
    )
