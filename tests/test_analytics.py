"""Warehouse-analytics operators: rolling range windows, calendar
gap-fill, cohort retention, gaps-and-islands, basket lift, priority
sampling, and the one-pass column profiler."""

import datetime

from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.operators.analytics import (
    cohort_retention,
    cooccurrence_lift,
    gap_fill_days,
    gaps_islands,
    priority_sample_k,
    profile_columns,
    rolling_range_sum,
)


def test_rolling_range_sum_skips_gap_days(spark):
    # days 1, 2, 10: a 3-day range frame at day 10 must NOT include
    # day 2 (a ROWS frame would).
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 10, 40)], "k string, day int, v int"
    )
    out = rolling_range_sum(df, ["k"], "day", "v", 3, "r")
    got = {r.day: r.r for r in out.collect()}
    assert got == {1: 10, 2: 30, 10: 40}


def test_gap_fill_days_densifies_global_span(spark):
    df = spark.createDataFrame(
        [
            ("a", datetime.date(2024, 1, 1), 5),
            ("a", datetime.date(2024, 1, 4), 7),
            ("b", datetime.date(2024, 1, 2), 1),
        ],
        "g string, day date, n int",
    )
    out = gap_fill_days(df, ["g"], "day", "n", 0)
    rows = {(r.g, str(r.day)): r.n for r in out.collect()}
    # 4-day global span x 2 groups = 8 rows, zeros where absent
    assert len(rows) == 8
    assert rows[("a", "2024-01-01")] == 5
    assert rows[("a", "2024-01-02")] == 0
    assert rows[("b", "2024-01-02")] == 1
    assert rows[("b", "2024-01-04")] == 0


def test_cohort_retention_counts_each_user_once_per_cell(spark):
    # u1 active in periods 0 and 1 (twice); u2 only period 1.
    base = datetime.datetime(2024, 1, 1)  # aligns within some period
    rows = [
        (1, base),
        (1, base + datetime.timedelta(days=8)),
        (1, base + datetime.timedelta(days=9)),
        (2, base + datetime.timedelta(days=8)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = cohort_retention(df, "user_id", "ts", period_days=7)
    got = {(r.cohort, r.offset): r.n_users for r in out.collect()}
    cohorts = sorted({c for c, _ in got})
    first = cohorts[0]
    assert got[(first, 0)] == 1  # u1's cohort cell
    assert got[(first, 1)] == 1  # u1 retained once despite 2 events
    assert sum(got.values()) == 3


def test_gaps_islands_collapses_runs(spark):
    df = spark.createDataFrame(
        [("c", 1, "A"), ("c", 2, "A"), ("c", 3, "B"), ("c", 4, "A")],
        "k string, o int, s string",
    )
    out = gaps_islands(df, ["k"], ["o"], "s").orderBy("island_id")
    rows = [(r.island_id, r.s, r.n_rows, r.island_start, r.island_end) for r in out.collect()]
    assert rows == [(1, "A", 2, 1, 2), (2, "B", 1, 3, 3), (3, "A", 1, 4, 4)]


def test_gaps_islands_null_state_forms_own_island(spark):
    # NULL is a state: 1, NULL, NULL, 1 must be THREE islands (a plain
    # lag != comparison yields NULL at the 1->NULL boundary and merges
    # the null run into the previous island)
    df = spark.createDataFrame(
        [("c", 1, 1), ("c", 2, None), ("c", 3, None), ("c", 4, 1)],
        "k string, o int, s int",
    )
    out = gaps_islands(df, ["k"], ["o"], "s").orderBy("island_id")
    rows = [(r.island_id, r.s, r.n_rows) for r in out.collect()]
    assert rows == [(1, 1, 1), (2, None, 2), (3, 1, 1)]
    # null state on the FIRST row also survives as its own island
    df2 = spark.createDataFrame(
        [("c", 1, None), ("c", 2, 7)], "k string, o int, s int"
    )
    rows2 = [
        (r.s, r.n_rows)
        for r in gaps_islands(df2, ["k"], ["o"], "s").orderBy("island_id").collect()
    ]
    assert rows2 == [(None, 1), (7, 1)]


def test_cooccurrence_lift_exact_small_case(spark):
    # baskets: {x,y}, {x,y}, {x,z} -> pair (x,y) n_ab=2, n_x=3, n_y=2, N=3
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")],
        "b int, i string",
    )
    out = cooccurrence_lift(df, "b", "i", min_pair_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.n_ab, r.n_a, r.n_b) == ("x", "y", 2, 3, 2)
    assert abs(r.lift - (2 * 3) / (3 * 2)) < 1e-12


def test_priority_sample_is_deterministic_and_weighted(spark):
    rows = [(i % 2, i, 100 + i) for i in range(200)]
    df = spark.createDataFrame(rows, "g int, id long, w long")
    a = priority_sample_k(df, ["g"], "w", ["id"], 5)
    b = priority_sample_k(df.repartition(7), ["g"], "w", ["id"], 5)
    ga = sorted((r.g, r.id) for r in a.collect())
    gb = sorted((r.g, r.id) for r in b.collect())
    assert ga == gb  # layout-independent
    assert len(ga) == 10  # 5 per group


def test_profile_columns_one_row_per_column(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c")], "id long, s string"
    )
    out = {r.column: r for r in profile_columns(df, ["id", "s"]).collect()}
    assert out["id"].n_nulls == 0 and out["id"].n_distinct == 2
    assert out["id"].min_value == "1" and out["id"].max_value == "2"
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2


def test_profile_columns_single_scan(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    plan = profile_columns(df, ["id", "s"])._jdf.queryExecution().optimizedPlan().toString()
    # one scan: the source relation appears exactly once in the plan
    assert plan.count("LogicalRDD") + plan.count("LocalRelation") == 1


def test_funnel_with_windows_semantics(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        funnel_with_windows,
    )
    from pyspark.sql import functions as F

    rows = [
        # u1 completes: view@10, click@20 (within 100), purchase@50 (within 100)
        (1, "view", 10), (1, "click", 20), (1, "purchase", 50),
        # u2 click BEFORE view -> not counted; no click after view
        (2, "click", 5), (2, "view", 10), (2, "purchase", 20),
        # u3 click too late (window 100)
        (3, "view", 10), (3, "click", 200), (3, "purchase", 250),
        # u4 never views -> absent from output
        (4, "click", 10), (4, "purchase", 20),
        # u5 picks EARLIEST valid click (30, not 90), purchase after it
        (5, "view", 10), (5, "click", 90), (5, "click", 30), (5, "purchase", 95),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    got = {
        r["user_id"]: (r["steps_completed"], r["t1"], r["t2"], r["t3"])
        for r in funnel_with_windows(
            ev, [("view", None), ("click", 100), ("purchase", 100)]
        ).collect()
    }
    assert got[1] == (3, 10, 20, 50)
    assert got[2] == (1, 10, None, None)
    assert got[3] == (1, 10, None, None)
    assert 4 not in got
    assert got[5] == (3, 10, 30, 95)


def test_locf_fill_carries_forward(spark):
    from amazon_personalize_connectors_spark.operators.analytics import locf_fill

    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 10.0), ("a", 3, None), ("a", 4, None),
         ("a", 5, 20.0), ("b", 1, 5.0), ("b", 2, None)],
        "g string, d int, v double",
    )
    got = {(r.g, r.d): r.v for r in locf_fill(df, ["g"], "d", ["v"]).collect()}
    assert got == {("a", 1): None, ("a", 2): 10.0, ("a", 3): 10.0,
                   ("a", 4): 10.0, ("a", 5): 20.0, ("b", 1): 5.0, ("b", 2): 5.0}


def test_grouped_linear_trend_exact_line(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        grouped_linear_trend,
    )

    # perfect line y = 3x + 7 plus a flat group and a degenerate group
    rows = (
        [("lin", x, 3 * x + 7) for x in range(10)]
        + [("flat", x, 42) for x in range(5)]
        + [("deg", 5, 1), ("deg", 5, 9)]
    )
    df = spark.createDataFrame(rows, "g string, x int, y int")
    got = {r.g: (r.slope, r.intercept, r.n_points)
           for r in grouped_linear_trend(df, ["g"], "x", "y").collect()}
    assert got["lin"] == (3.0, 7.0, 10)
    assert got["flat"] == (0.0, 42.0, 5)
    assert got["deg"][0] is None and got["deg"][2] == 2


def test_last_touch_attribution_semantics(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        last_touch_attribution,
    )

    h = 3_600_000_000  # 1h in us
    rows = [
        # u1: view@1h, click@2h, purchase@3h -> click attributed
        (1, "view", 1 * h), (1, "click", 2 * h), (1, "purchase", 3 * h),
        # u2: view 30h before purchase -> outside 24h window
        (2, "view", 0), (2, "purchase", 30 * h),
        # u3: purchase with NO preceding touch
        (3, "purchase", 5 * h),
        # u4: click SIMULTANEOUS with purchase -> excluded (strictly
        # before by value), earlier view wins
        (4, "view", 1 * h), (4, "click", 6 * h), (4, "purchase", 6 * h),
    ]
    ev = spark.createDataFrame(
        [(u, t, ts) for u, t, ts in rows], "user_id long, event_type string, ts_us long"
    )
    got = {
        r["user"]: (r["touch_ts_us"], r["touch_type_code"], r["attributed"])
        for r in last_touch_attribution(ev).collect()
    }
    assert got[1] == (2 * h, 2, True)
    assert got[2] == (0, 1, False)
    assert got[3] == (None, None, False)
    assert got[4] == (1 * h, 1, True)


def test_segment_overlap_masks(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        segment_overlap,
    )

    rows = [
        (1, "view"), (1, "click"),            # mask 3
        (2, "purchase"),                        # mask 4
        (3, "view"), (3, "purchase"),          # mask 5
        (4, "error"),                           # no segment -> absent
        (5, "view"), (5, "view"),              # mask 1 (dup events once)
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        r["mask"]: r["n_users"]
        for r in segment_overlap(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {3: 1, 4: 1, 5: 1, 1: 1}


def test_residual_anomaly_days_flags_spike(spark):
    from datetime import date

    from amazon_personalize_connectors_spark.operators.analytics import (
        residual_anomaly_days,
    )

    # 20 flat days of 100 with one 10x spike on day 15
    rows = [
        (date(2024, 1, d), 1000 if d == 15 else 100) for d in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "day date, v long")
    out = residual_anomaly_days(df, "day", "v", trail_days=7, k=5)
    flagged = {r["day"].isoformat() for r in out.collect() if r["is_anomaly"]}
    assert "2024-01-15" in flagged
    # flat days before the spike are not anomalous
    assert "2024-01-10" not in flagged
    # first 6 days have no full trailing window -> absent entirely
    days = {r["day"].isoformat() for r in out.collect()}
    assert "2024-01-03" not in days


def test_last_touch_attribution_matches_bruteforce(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.analytics import (
        last_touch_attribution,
    )

    W = 10  # tiny window to exercise the boundary

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),
                st.sampled_from(["view", "click", "purchase", "error"]),
                st.integers(min_value=0, max_value=40),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(rows):
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts_us long"
        )
        got = sorted(
            (r["user"], r["conv_ts_us"], r["touch_ts_us"],
             r["touch_type_code"], r["attributed"])
            for r in last_touch_attribution(ev, window_us=W).collect()
        )
        code = {"view": 1, "click": 2}
        want = []
        for u, t, ts in rows:
            if t != "purchase":
                continue
            encs = [
                ts2 * 8 + code[t2]
                for u2, t2, ts2 in rows
                if u2 == u and t2 in code and ts2 < ts
            ]
            if encs:
                e = max(encs)
                want.append(
                    (u, ts, e // 8, e % 8, (e // 8) >= ts - W)
                )
            else:
                want.append((u, ts, None, None, False))
        assert got == sorted(want)

    check()


def test_segment_overlap_matches_bruteforce(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.analytics import (
        segment_overlap,
    )

    segs = ["view", "click", "purchase"]

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=5),
                st.sampled_from(segs + ["error", "signup"]),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def check(rows):
        ev = spark.createDataFrame(rows, "user_id long, event_type string")
        got = {
            r["mask"]: r["n_users"]
            for r in segment_overlap(ev, segs).collect()
        }
        masks = {}
        for u, t in rows:
            if t in segs:
                masks[u] = masks.get(u, 0) | (1 << segs.index(t))
        want = {}
        for m in masks.values():
            want[m] = want.get(m, 0) + 1
        assert got == want

    check()


def test_residual_anomaly_days_matches_bruteforce(spark):
    from datetime import date, timedelta

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.analytics import (
        residual_anomaly_days,
    )

    base = date(2024, 3, 1)

    @settings(max_examples=10, deadline=None)
    @given(
        st.dictionaries(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=1000),
            min_size=7,
            max_size=26,
        )
    )
    def check(series):
        rows = [(base + timedelta(days=d), v) for d, v in sorted(series.items())]
        df = spark.createDataFrame(rows, "day date, v long")
        out = {
            r["day"]: (r["residual"], r["mad"], r["is_anomaly"])
            for r in residual_anomaly_days(df, "day", "v", 7, k=5).collect()
        }
        # brute force: trailing 7 CALENDAR days inclusive, full windows only
        resid = {}
        for d, v in series.items():
            win = [series[e] for e in range(d - 6, d + 1) if e in series]
            if len(win) == 7:
                resid[d] = 7 * v - sum(win)
        if not resid:
            assert out == {}
            return
        devs = sorted(abs(r) for r in resid.values())
        mad = devs[(len(devs) + 1) // 2 - 1]
        want = {
            base + timedelta(days=d): (r, mad, abs(r) > 5 * mad)
            for d, r in resid.items()
        }
        assert out == want

    check()


def test_seasonal_naive_mase_known_values(spark):
    from datetime import date, timedelta

    from amazon_personalize_connectors_spark.operators.analytics import (
        seasonal_naive_mase,
    )

    base = date(2024, 5, 1)
    rows = [
        (base + timedelta(days=d), 200 if d == 10 else 100)
        for d in range(14)
    ]
    df = spark.createDataFrame(rows, "day date, v long")
    r = seasonal_naive_mase(df, "day", "v", season_days=7).collect()[0]
    # seasonal errors over days 7..13: one spike of 100; naive errors
    # over days 1..13: spike up and back down
    assert (r["n_seasonal"], r["sum_abs_err_seasonal"]) == (7, 100)
    assert (r["n_naive"], r["sum_abs_err_naive"]) == (13, 200)
    assert abs(r["mase"] - (100 * 13) / (7 * 200)) < 1e-12
    # constant series -> naive error 0 -> NULL mase
    const = spark.createDataFrame(
        [(base + timedelta(days=d), 5) for d in range(10)], "day date, v long"
    )
    assert seasonal_naive_mase(const, "day", "v").collect()[0]["mase"] is None


def test_survival_table_hand_computed(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        survival_table,
    )

    # durations: 2 events at t=5, 1 censor at t=5, 1 event at t=10,
    # 1 censor at t=12
    obs = spark.createDataFrame(
        [(5, 1), (5, 1), (5, 0), (10, 1), (12, 0)], "dur long, event int"
    )
    got = {r["duration"]: (r["n_at_risk"], r["n_events"], r["n_censored"])
           for r in survival_table(obs, "dur", "event").collect()}
    assert got == {5: (5, 2, 1), 10: (2, 1, 0), 12: (1, 0, 1)}


def test_pit_join_picks_version_at_event_time(spark):
    from datetime import date

    from amazon_personalize_connectors_spark.operators.history import (
        pit_join,
        scd2_from_changelog,
    )

    log = spark.createDataFrame(
        [
            (1, date(2024, 1, 1), "A"),
            (1, date(2024, 2, 1), "B"),
            (1, date(2024, 3, 1), "B"),  # unchanged -> collapsed
            (2, date(2024, 1, 15), "X"),
        ],
        "k long, d date, attr string",
    )
    scd = scd2_from_changelog(log, ["k"], "d", ["attr"]).select(
        "k", "attr", "valid_from", "valid_to"
    )
    facts = spark.createDataFrame(
        [
            (1, date(2024, 1, 20), 10),   # version A
            (1, date(2024, 2, 1), 20),    # boundary day -> version B
            (1, date(2024, 6, 1), 30),    # open current interval -> B
            (2, date(2024, 1, 1), 40),    # BEFORE first version -> no match
        ],
        "k long, t date, v long",
    )
    got = sorted(
        (r["k"], str(r["t"]), r["v"], r["attr"])
        for r in pit_join(facts, scd, ["k"], "t").collect()
    )
    assert got == [
        (1, "2024-01-20", 10, "A"),
        (1, "2024-02-01", 20, "B"),
        (1, "2024-06-01", 30, "B"),
    ]
    # every matched fact matches exactly once (disjoint intervals)
    assert len(got) == len({(k, t, v) for k, t, v, _ in got})


# ---------------------------------------------------------------------------
# concentration_gini
# ---------------------------------------------------------------------------


def _brute_gini(values):
    xs = sorted(values)
    n, t = len(xs), sum(xs)
    if t == 0:
        return None
    s2 = 2 * sum((i + 1) * x for i, x in enumerate(xs))
    return (s2 - (n + 1) * t) / (n * t)


def test_gini_matches_rank_sum_brute_force(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        concentration_gini,
    )

    groups = {
        "equal": [10, 10, 10, 10],
        "onewhale": [0, 0, 0, 100],
        "mixed": [1, 2, 2, 5, 40, 3, 2, 7],
        "zeros": [0, 0, 0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in concentration_gini(df, ["g"], "v").collect()}
    assert got["equal"]["gini"] == 0.0
    assert got["onewhale"]["gini"] == _brute_gini(groups["onewhale"]) == 0.75
    assert got["mixed"]["gini"] == _brute_gini(groups["mixed"])
    assert got["zeros"]["gini"] is None and got["zeros"]["total"] == 0
    assert got["mixed"]["n"] == 8 and got["mixed"]["total"] == 62


def test_gini_partition_layout_independent(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        concentration_gini,
    )

    rows = [("g%d" % (i % 2), (i * 37) % 19) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v long")
    outs = []
    for p in (1, 4, 13):
        got = concentration_gini(df.repartition(p), ["g"], "v").collect()
        outs.append(sorted((r["g"], r["gini_num"], r["gini"]) for r in got))
    assert outs[0] == outs[1] == outs[2]


def test_linear_attribution_conserves_value(spark):
    from pyspark.sql import functions as F

    from amazon_personalize_connectors_spark.operators.analytics import (
        linear_attribution,
    )

    US = 1_000_000
    H = 3600 * US
    rows = [
        # user 1: purchase with 3 touches in-window (value 10.01 ->
        # 10010000 micro-units, k=3: shares 3336666 x3 + rem 2
        # to the latest touch)
        (1, 1, "view", 0 * H, 0.0),
        (2, 1, "click", 1 * H, 0.0),
        (3, 1, "view", 2 * H, 0.0),
        (4, 1, "purchase", 3 * H, 10.01),
        # user 2: touch outside the 24 h window -> no credit at all
        (5, 2, "view", 0 * H, 0.0),
        (6, 2, "purchase", 30 * H, 5.00),
        # user 3: single click touch takes the whole value
        (7, 3, "click", 40 * H, 0.0),
        (8, 3, "purchase", 41 * H, 2.50),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts_us long, value double"
    )
    got = {r["touch_type"]: r for r in linear_attribution(ev).collect()}

    # conservation: total credited micro-units == attributed values
    total = sum(r["credit_micro"] for r in got.values())
    assert total == 10_010_000 + 2_500_000  # 10.01 + 2.50 in micro-units
    # user 1 split: 10010000 div 3 = 3336666 rem 2 -> latest view
    assert got["view"]["credit_micro"] == 3336666 * 2 + 2
    assert got["click"]["credit_micro"] == 3336666 + 2_500_000
    assert got["view"]["n_touches"] == 2 and got["click"]["n_touches"] == 2
    assert got["view"]["n_conversions"] == 1
    assert got["click"]["n_conversions"] == 2
    assert got["view"]["credit_value"] == (3336666.0 * 2 + 2) / 1e6


def test_bitemporal_asof_late_correction_cannot_leak(spark):
    from amazon_personalize_connectors_spark.operators.history import (
        bitemporal_asof_join,
    )

    # changelog for key k=1: assertion 'a' effective v=1 learned tx=1,
    # correction 'b' (same v=1) learned tx=5, new state 'c' v=3 tx=3
    log = spark.createDataFrame(
        [(1, 1, 1, "a"), (1, 5, 1, "b"), (1, 3, 3, "c")],
        "k long, tx long, v long, attr string",
    )
    facts = spark.createDataFrame(
        [
            (1, 100, 2, 10),  # as known at T=2: only 'a' exists yet
            (1, 101, 6, 10),  # knows everything; latest effective -> 'c'
            (1, 102, 6, 2),   # effective<=2: correction 'b' beats 'a'
            (1, 103, 0, 0),   # nothing known/effective -> dropped
        ],
        "k long, fid long, ft long, fv long",
    )
    got = {
        r["fact_id"]: (r["attr"], r["picked_valid"], r["picked_tx"])
        for r in bitemporal_asof_join(
            facts, log, ["k"], "fid", "ft", "fv", "tx", "v", ["attr"]
        ).collect()
    }
    assert got == {
        100: ("a", 1, 1),
        101: ("c", 3, 3),
        102: ("b", 1, 5),
    }


def test_psi_drift_matches_hand_computation(spark):
    import math

    from amazon_personalize_connectors_spark.operators.features import (
        psi_drift,
    )

    # A: bin1 x3, bin2 x1; B: bin1 x1, bin2 x3; bin3 only in A
    rows = (
        [(1, "a")] * 3 + [(2, "a")] + [(3, "a")] * 2
        + [(1, "b")] + [(2, "b")] * 3
    )
    df = spark.createDataFrame(rows, "bin long, side string")
    got = psi_drift(
        df, "bin", F.col("side") == "a", F.col("side") == "b"
    ).collect()[0]
    assert (got["n_a"], got["n_b"]) == (6, 4)
    assert got["n_bins_shared"] == 2
    assert (got["only_a_num"], got["only_b_num"]) == (2, 0)
    expect = sum(
        (pa - pb) * math.log(pa / pb)
        for pa, pb in [(3 / 6, 1 / 4), (1 / 6, 3 / 4)]
    )
    assert abs(got["psi"] - expect) < 1e-8


def test_skyline_2d_exact_frontier(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        skyline_2d,
    )

    # (x=1,y=5) dominated by (2,5)? equal y, larger x -> yes.
    # (2,5) dominated by (3,7)? y larger -> no. Frontier: (2,5),(3,7)?
    # (3,7) has larger x but higher y -> both survive... y is MINIMIZED:
    # (3,7) not dominated (nothing with x>=3 and y<=7 other than itself);
    # (2,5): x'=3 has y'=7 > 5 -> survives. (1,4): x'=2 min y 5 > 4 ->
    # survives. (1,5)-cell absorbed into n_at_x of x=1.
    df = spark.createDataFrame(
        [(1, 4), (1, 5), (2, 5), (2, 5), (2, 9), (3, 7)],
        "x long, y long",
    )
    got = [
        (r["x"], r["y"], r["n_at_point"], r["n_at_x"])
        for r in skyline_2d(df, "x", "y").collect()
    ]
    assert got == [(1, 4, 1, 2), (2, 5, 2, 3), (3, 7, 1, 1)]

    # equality on the minimize axis loses to the larger x
    df2 = spark.createDataFrame([(1, 5), (2, 5)], "x long, y long")
    got2 = [(r["x"], r["y"]) for r in skyline_2d(df2, "x", "y").collect()]
    assert got2 == [(2, 5)]


def test_last_touch_attribution_rejects_too_many_touch_types(spark):
    """The ts_us*8+code encoding holds codes 1..7; an 8th touch type
    would overflow into the timestamp field — enforced loudly."""
    import pytest

    from amazon_personalize_connectors_spark.operators.analytics import (
        last_touch_attribution,
    )

    ev = spark.createDataFrame(
        [(1, "a", 1)], "user_id long, event_type string, ts_us long"
    )
    with pytest.raises(ValueError, match="3 bits"):
        last_touch_attribution(ev, touch_types=tuple("abcdefgh"))
    # 7 types is the documented maximum and must still plan
    last_touch_attribution(ev, touch_types=tuple("abcdefg")).collect()


def test_bounded_grid_guard_raises_on_data_sized_domain(spark):
    """The grid contracts (skyline_2d 'caller buckets first', KM
    durations, residual days, score bins) are executable: a domain
    over max_grid_rows raises before the global window sorts it, and
    a bounded domain passes through unchanged."""
    import pytest

    from amazon_personalize_connectors_spark.operators.analytics import (
        skyline_2d,
        survival_table,
    )

    wide = spark.range(0, 500).select(
        (F.col("id")).alias("x"), (F.col("id") % 7).alias("y")
    )
    ok = skyline_2d(wide, "x", "y", max_grid_rows=1000)
    assert ok.count() >= 1  # bounded domain unaffected
    with pytest.raises(Exception, match="max_grid_rows=100"):
        skyline_2d(wide, "x", "y", max_grid_rows=100).collect()
    with pytest.raises(Exception, match="max_grid_rows=100"):
        survival_table(
            wide.select(F.col("x").alias("d"), (F.col("y") > 3).alias("e")),
            "d",
            "e",
            max_grid_rows=100,
        ).collect()


def test_changepoint_single_finds_level_shift(spark):
    """Argmin-SSE split against a Python brute force on a series with
    a known level shift."""
    import datetime

    from amazon_personalize_connectors_spark.operators.analytics import (
        changepoint_single,
    )

    vals = [100, 110, 90, 105, 95, 500, 510, 490, 505, 495]
    d0 = datetime.date(2024, 1, 1)
    rows = [(d0 + datetime.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "day date, v long")
    r = changepoint_single(df, "day", "v").collect()[0]

    def sse(xs):
        n = len(xs)
        s, q = sum(xs), sum(x * x for x in xs)
        return q - s * s / n

    costs = {
        i: sse(vals[:i]) + sse(vals[i:]) for i in range(1, len(vals))
    }
    best_i = min(costs, key=costs.get)
    assert r["split_day"] == d0 + datetime.timedelta(days=best_i - 1)
    assert r["n_left"] == best_i and r["n_right"] == len(vals) - best_i
    assert r["sum_left"] == sum(vals[:best_i])
    assert abs(r["cost"] - costs[best_i]) < 1e-6
    assert r["gain"] > 0


def test_seasonal_decompose_exact_identities(spark):
    import itertools

    # 21 days: v = 100*dow + noise-free ramp; full windows only
    days = [datetime.date(2024, 1, 1) + datetime.timedelta(days=i) for i in range(21)]
    rows = [(d, 1000 + 100 * (d.toordinal() % 7)) for d in days]
    df = spark.createDataFrame(rows, "day date, v long")
    from amazon_personalize_connectors_spark.operators.analytics import (
        seasonal_decompose_exact,
    )

    out = seasonal_decompose_exact(df, "day", "v", period=7).collect()
    # edges trimmed: 21 - 6 = 15 surviving days
    assert len(out) == 15
    for r in out:
        # trend numerator is the exact 7-day centered sum
        lo = r.day - datetime.timedelta(days=3)
        win = [v for d, v in rows if lo <= d <= r.day + datetime.timedelta(days=3)]
        assert r.trend_num == sum(win)
        # decomposition identity: v = trend + seasonal + residual,
        # scaled by the common denominator 7*slot_cnt
        den = 7 * r.slot_cnt
        lhs = r.v * den
        rhs = r.trend_num * r.slot_cnt + r.seasonal_num * 7 // 7 + 0
        # v*7*cnt == trend_num*cnt + seasonal_num + residual_num
        assert lhs == r.trend_num * r.slot_cnt + r.seasonal_num + int(r.residual_num)
    # seasonal numerators sum to zero-mean detrended mass per slot;
    # residuals within a slot sum to 0 exactly
    by_slot = {}
    for r in out:
        by_slot.setdefault(r.dow, []).append(int(r.residual_num))
    for vals in by_slot.values():
        assert sum(vals) == 0


def test_theilsen_slope_matches_bruteforce_median(spark):
    pts = [(datetime.date(2024, 1, 1) + datetime.timedelta(days=t), v)
           for t, v in [(0, 10), (1, 12), (2, 11), (3, 30), (5, 18)]]
    df = spark.createDataFrame(pts, "day date, v long")
    from amazon_personalize_connectors_spark.operators.analytics import (
        theilsen_slope,
    )

    row = theilsen_slope(df, "day", "v", scale=1000).collect()[0]
    ts = [(d.toordinal() - datetime.date(1970, 1, 1).toordinal(), v) for d, v in pts]
    slopes = sorted(
        ((v2 - v1) * 1000) // (t2 - t1)
        for (t1, v1), (t2, v2) in __import__("itertools").combinations(ts, 2)
    )
    assert row.n_days == 5 and row.n_pairs == len(slopes)
    # lower median
    assert row.slope_q == slopes[(len(slopes) + 1) // 2 - 1]


def test_largest_remainder_allocation_sums_and_orders(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 3), ("d", 1)], "k string, w long"
    )
    from amazon_personalize_connectors_spark.operators.analytics import (
        largest_remainder_allocation,
    )

    got = {r.k: r.slots for r in
           largest_remainder_allocation(df, ["k"], "w", 10).collect()}
    # exact proportions: floor shares 4,2,2,0 rem 2/12,6/12,6/12,10/12
    # leftovers 2 -> d (10/12) then tie b before c (6/12, key asc)
    assert sum(got.values()) == 10
    assert got == {"a": 4, "b": 3, "c": 2, "d": 1}


def test_largest_remainder_allocation_guards_grid(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(str(i), 1) for i in range(50)], "k string, w long"
    )
    from amazon_personalize_connectors_spark.operators.analytics import (
        largest_remainder_allocation,
    )

    out = largest_remainder_allocation(df, ["k"], "w", 7, max_grid_rows=10)
    with _pytest.raises(Exception, match="domain grid"):
        out.collect()


def test_rolling_ols_slope_exact_line(spark):
    # a perfect line v = 5*t + 3 has slope exactly 5 in every window
    days = [datetime.date(2024, 3, 1) + datetime.timedelta(days=i)
            for i in range(10)]
    rows = [(d, 5 * (d.toordinal() - datetime.date(1970, 1, 1).toordinal()) + 3)
            for d in days]
    df = spark.createDataFrame(rows, "day date, v long")
    from amazon_personalize_connectors_spark.operators.analytics import (
        rolling_ols_slope,
    )

    out = rolling_ols_slope(df, "day", "v", window_days=4).collect()
    for r in out:
        if r.n_window >= 2:
            assert r.slope == 5.0
    # first day has a single-row window -> NULL
    first = min(out, key=lambda r: r.day)
    assert first.n_window == 1 and first.slope is None


def test_rolling_ols_slope_range_frame_skips_gaps(spark):
    # days 1,2,10: at day 10 the 3-day window holds only day 10
    days = [datetime.date(2024, 3, d) for d in (1, 2, 10)]
    df = spark.createDataFrame(
        [(d, 7) for d in days], "day date, v long"
    )
    from amazon_personalize_connectors_spark.operators.analytics import (
        rolling_ols_slope,
    )

    out = {r.day: r for r in
           rolling_ols_slope(df, "day", "v", window_days=3).collect()}
    assert out[days[2]].n_window == 1
    assert out[days[1]].n_window == 2 and out[days[1]].slope == 0.0


def test_growth_accounting_classes(spark):
    import datetime as dt

    def t(day):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    # periods of 7d: u1 active p0,p1,p3 (new/retained/resurrected);
    # u2 active p0 only (new, churns at p1); u3 active p1 (new)
    rows = [(1, t(0)), (1, t(8)), (1, t(22)),
            (2, t(1)), (3, t(9))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from amazon_personalize_connectors_spark.operators.analytics import (
        growth_accounting,
    )

    out = {r.period: r for r in
           growth_accounting(df, period_days=7).collect()}
    p0 = min(out)
    assert out[p0].n_new == 2 and out[p0].n_churned == 0
    assert out[p0 + 1].n_new == 1 and out[p0 + 1].n_retained == 1
    assert out[p0 + 1].n_churned == 1          # u2 left
    assert out[p0 + 3].n_resurrected == 1      # u1 came back
    # gap period p2: nobody active, u1 and u3 churned there
    assert out[p0 + 2].n_active == 0 and out[p0 + 2].n_churned == 2
    assert out[p0 + 3].n_churned == 0
    # n_active always equals the class sum
    for r in out.values():
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


def test_shapley_attribution_efficiency_and_symmetry(spark):
    from amazon_personalize_connectors_spark.operators.attribution import (
        shapley_attribution,
    )

    # users: exposure sets and conversions
    # u1 {A} converts, u2 {B} converts, u3 {A,B} converts,
    # u4 {A} no, u5 {} converts (baseline), u6 {B} no
    rows = []
    rows += [(1, "A"), (1, "buy")]
    rows += [(2, "B"), (2, "buy")]
    rows += [(3, "A"), (3, "B"), (3, "buy")]
    rows += [(4, "A")]
    rows += [(5, "buy")]
    rows += [(6, "B")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r.channel: r for r in shapley_attribution(
        df, ["A", "B"], conversion="buy").collect()}
    # v({}) = 1 (u5), v({A}) = 2, v({B}) = 2, v({A,B}) = 4
    # phi_A = 1/2[(v(A)-v({})) + (v(AB)-v(B))] = 1/2[1 + 2] = 3/2
    # phi_B symmetric = 3/2
    assert out["A"].phi_num == 3 and out["A"].phi_den == 2
    assert out["B"].phi_num == 3
    # efficiency: sum phi = v(all) - v(empty) = 3
    assert out["A"].phi + out["B"].phi == 3.0


def test_shapley_attribution_null_channel_gets_zero(spark):
    from amazon_personalize_connectors_spark.operators.attribution import (
        shapley_attribution,
    )

    # channel C never appears -> zero marginal everywhere
    rows = [(1, "A"), (1, "buy"), (2, "A")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r.channel: r.phi for r in shapley_attribution(
        df, ["A", "C"], conversion="buy").collect()}
    assert out["C"] == 0.0 and out["A"] > 0


def test_open_interval_daily_counts_hand_example(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        open_interval_daily_counts,
    )

    rows = [
        ("2024-01-01", "2024-01-03"),
        ("2024-01-02", "2024-01-02"),
        ("2024-01-02", "2024-01-05"),
    ]
    df = spark.createDataFrame(rows, "s string, e string").select(
        F.to_date("s").alias("s"), F.to_date("e").alias("e")
    )
    got = {str(r["day"]): (r["net_delta"], r["open_cnt"])
           for r in open_interval_daily_counts(df, "s", "e").collect()}
    # day1: +1 open=1; day2: +2 open=3; day3: -1 (iv2 closed) open=2;
    # day4: -1 (iv1 closed) open=1; day6: -1 open=0
    assert got == {
        "2024-01-01": (1, 1),
        "2024-01-02": (2, 3),
        "2024-01-03": (-1, 2),
        "2024-01-04": (-1, 1),
        "2024-01-06": (-1, 0),
    }


def test_open_interval_counts_end_at_zero(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        open_interval_daily_counts,
    )

    df = spark.range(40).select(
        F.to_date(F.lit("2024-03-01")).alias("s"),
        F.date_add(F.to_date(F.lit("2024-03-01")), (F.col("id") % 7).cast("int")).alias("e"),
    )
    rows = open_interval_daily_counts(df, "s", "e").orderBy("day").collect()
    assert rows[-1]["open_cnt"] == 0
    assert rows[0]["open_cnt"] == 40  # all 40 open on the start day


def test_matrix_profile_finds_exact_motif(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        matrix_profile_ssd,
    )

    # series: pattern [1,2,3] repeats at idx 1 and idx 7; noise between
    vals = [1, 2, 3, 90, 50, 70, 1, 2, 3]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v long"
    )
    out = {r["idx"]: (r["ssd_min"], r["match_idx"])
           for r in matrix_profile_ssd(df, "t", "v", m=3, exclusion=2).collect()}
    # window@1 == window@7 exactly -> ssd 0, and vice versa
    assert out[1] == (0, 7) and out[7] == (0, 1)
    # every pair respects the exclusion zone
    assert all(abs(i - j) > 2 for i, (_, j) in out.items())


def test_matrix_profile_ssd_is_symmetric_minimum(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        matrix_profile_ssd,
    )

    vals = [5, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v long"
    )
    rows = matrix_profile_ssd(df, "t", "v", m=2, exclusion=1).collect()
    # brute-force check in python
    wins = {i + 1: (vals[i], vals[i + 1]) for i in range(len(vals) - 1)}
    for r in rows:
        best = min(
            (sum((a - b) ** 2 for a, b in zip(wins[r["idx"]], wins[j])), j)
            for j in wins if abs(j - r["idx"]) > 1
        )
        assert (r["ssd_min"], r["match_idx"]) == best


def test_matrix_profile_pair_count_guard_fires(spark):
    # VERDICT r6 item 5: the grid-row cap alone allows ~10^8 pairs at
    # its 10k default; the pair-count contract must fail loudly BEFORE
    # the quadratic self-join materializes.
    import pytest

    from amazon_personalize_connectors_spark.operators.analytics import (
        matrix_profile_ssd,
    )

    df = spark.createDataFrame(
        [(i, i % 17) for i in range(60)], "t int, v long"
    )
    out = matrix_profile_ssd(df, "t", "v", m=3, exclusion=2, max_pair_rows=1000)
    with pytest.raises(Exception, match="max_pair_rows=1000"):
        out.collect()
    # same series under a sufficient cap still computes (60^2 <= 4000)
    ok = matrix_profile_ssd(df, "t", "v", m=3, exclusion=2, max_pair_rows=4000)
    assert ok.count() == 58


def test_dyadic_ewma_exact_quotients(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        dyadic_ewma,
    )

    df = spark.createDataFrame(
        [("g", i, 100 * (i + 1)) for i in range(4)], "g string, t int, v long"
    )
    got = {r["t"]: r["ewma_q"] for r in
           dyadic_ewma(df, ["g"], "t", "v", k_lags=3, scale=1000).collect()}
    # t0: 100; t1: (200*4+100*2)/6; t2: (300*4+200*2+100)/7; t3: same shape
    assert got == {0: 100_000, 1: 166_666, 2: 242_857, 3: 342_857}


def test_dyadic_ewma_groups_independent(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        dyadic_ewma,
    )

    rows = [("a", 0, 10), ("a", 1, 20), ("b", 0, 10), ("b", 1, 20)]
    df = spark.createDataFrame(rows, "g string, t int, v long")
    out = dyadic_ewma(df, ["g"], "t", "v", k_lags=4).collect()
    per = {(r["g"], r["t"]): r["ewma_q"] for r in out}
    assert per[("a", 0)] == per[("b", 0)] and per[("a", 1)] == per[("b", 1)]


def test_frequent_triples_matches_bruteforce(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        frequent_triples,
    )

    baskets = {
        1: [1, 2, 3, 4],
        2: [1, 2, 3],
        3: [2, 3, 4],
        4: [1, 2, 3],
        5: [5, 6],
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {(r["item_a"], r["item_b"], r["item_c"]): r["n_abc"]
           for r in frequent_triples(df, "basket", "item", 2).collect()}
    from itertools import combinations
    want = {}
    for items in baskets.values():
        for t in combinations(sorted(items), 3):
            want[t] = want.get(t, 0) + 1
    want = {t: n for t, n in want.items() if n >= 2}
    assert got == want and (1, 2, 3) in got and got[(1, 2, 3)] == 3


def test_frequent_triples_dedupes_basket_items(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        frequent_triples,
    )

    # duplicate (basket,item) rows must count once
    rows = [(1, 1), (1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3)]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = frequent_triples(df, "basket", "item", 2).collect()
    assert len(got) == 1 and got[0]["n_abc"] == 2


def test_ratio_to_parent_shares_sum(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        ratio_to_parent,
    )

    rows = [("r1", "a", 30), ("r1", "b", 70), ("r2", "c", 100)]
    df = spark.createDataFrame(rows, "p string, c string, v long")
    got = {(r["p"], r["c"]): (r["value"], r["share_of_parent_q"], r["parent_share_q"])
           for r in ratio_to_parent(df, ["p"], ["c"], "v", scale=100).collect()}
    assert got == {
        ("r1", "a"): (30, 30, 50),
        ("r1", "b"): (70, 70, 50),
        ("r2", "c"): (100, 100, 50),
    }


def test_floor_running_balance_matches_python_recursion(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        floor_running_balance,
    )

    # mixed-sign deltas engineered to clamp several times
    deltas = {
        "g1": [5, -10, 3, -1, -9, 20, -4],
        "g2": [-3, 2, 2, -100, 7],
        "g3": [1, 1, 1],
    }
    rows = [
        (g, i, x) for g, xs in deltas.items() for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "g string, i long, x long")
    got = {
        (r["g"], r["i"]): r["balance"]
        for r in floor_running_balance(df, ["g"], ["i"], "x").collect()
    }
    want = {}
    for g, xs in deltas.items():
        b = 0
        for i, x in enumerate(xs):
            b = max(0, b + x)
            want[(g, i)] = b
    assert got == want


def test_floor_running_balance_hypothesis_reflection_identity(spark):
    from hypothesis import given, settings, strategies as st

    from amazon_personalize_connectors_spark.operators.analytics import (
        floor_running_balance,
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.integers(-50, 50), min_size=1, max_size=30))
    def prop(xs):
        df = spark.createDataFrame(
            [(0, i, x) for i, x in enumerate(xs)], "g long, i long, x long"
        )
        got = [
            r["balance"]
            for r in floor_running_balance(df, ["g"], ["i"], "x")
            .orderBy("i")
            .collect()
        ]
        b, want = 0, []
        for x in xs:
            b = max(0, b + x)
            want.append(b)
        assert got == want

    prop()


def test_interpolate_fill_exact_segments(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        interpolate_fill,
    )

    # known at pos 0 (v=10) and pos 4 (v=2): slope -2/unit, floor-div
    rows = [
        ("a", 0, 10),
        ("a", 1, None),
        ("a", 2, None),
        ("a", 3, None),
        ("a", 4, 2),
        ("a", 5, None),  # trailing: stays null
        ("b", 0, None),  # leading: stays null
        ("b", 1, 7),
    ]
    df = spark.createDataFrame(rows, "g string, p long, v long")
    got = {
        (r["g"], r["p"]): (r["value_q"], r["is_interpolated"])
        for r in interpolate_fill(df, ["g"], "p", "v", scale=100).collect()
    }
    assert got == {
        ("a", 0): (1000, 0),
        ("a", 1): (800, 1),
        ("a", 2): (600, 1),
        ("a", 3): (400, 1),
        ("a", 4): (200, 0),
        ("a", 5): (None, 0),
        ("b", 0): (None, 0),
        ("b", 1): (700, 0),
    }


def test_interpolate_fill_floor_division_negative_slope(spark):
    from amazon_personalize_connectors_spark.operators.analytics import (
        interpolate_fill,
    )

    # v0=0, v1=-1 over 3 steps with scale=1: exact thirds floor to
    # -1 at both interior points (floor(-1/3) = -1, floor(-2/3) = -1)
    rows = [("a", 0, 0), ("a", 1, None), ("a", 2, None), ("a", 3, -1)]
    df = spark.createDataFrame(rows, "g string, p long, v long")
    got = {
        r["p"]: r["value_q"]
        for r in interpolate_fill(df, ["g"], "p", "v", scale=1).collect()
    }
    assert got == {0: 0, 1: -1, 2: -1, 3: -1}


def test_ratio_to_parent_zero_totals_yield_null_shares(spark):
    # all-zero parent/grand totals have no share to compute — NULL,
    # never an ANSI pmod/div-by-zero (degenerate-input guard)
    from amazon_personalize_connectors_spark.operators.analytics import (
        ratio_to_parent,
    )

    df = spark.createDataFrame(
        [("p", "c1", 0), ("p", "c2", 0)], "p string, c string, v long"
    )
    rows = ratio_to_parent(df, ["p"], ["c"], "v").collect()
    assert all(
        r["share_of_parent_q"] is None and r["parent_share_q"] is None
        for r in rows
    )


def test_theilsen_matches_python_reference(spark):
    """The quantized pairwise-slope lower median must match a direct
    Python computation of floor((vj-vi)*scale/(tj-ti)) medians."""
    import datetime

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.analytics import (
        theilsen_slope,
    )

    @given(
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=2,
            max_size=9,
            unique=False,
        )
    )
    @settings(max_examples=8, deadline=None)
    def check(vals):
        base = datetime.date(2024, 1, 1)
        rows = [
            (base + datetime.timedelta(days=i), v) for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "day date, v long")
        r = theilsen_slope(df, "day", "v").collect()[0]
        scale = r["scale"]
        slopes = sorted(
            ((vals[j] - vals[i]) * scale) // (j - i)
            for i in range(len(vals))
            for j in range(i + 1, len(vals))
        )
        n_pairs = len(slopes)
        lower_median = slopes[(n_pairs - 1) // 2]
        assert r["n_pairs"] == n_pairs
        assert r["slope_q"] == lower_median, (vals, r, slopes)

    check()


def test_changepoint_matches_python_reference(spark):
    """The argmin-by-struct over fixed IEEE cost trees must equal a
    direct Python scan minimizing within-segment SSE (same float tree:
    q - s*s/i per side, ties to the earliest day)."""
    import datetime

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.analytics import (
        changepoint_single,
    )

    @given(
        st.lists(
            st.integers(min_value=-100, max_value=100), min_size=2, max_size=10
        )
    )
    @settings(max_examples=8, deadline=None)
    def check(vals):
        base = datetime.date(2024, 3, 1)
        rows = [
            (base + datetime.timedelta(days=i), v) for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "day date, v long")
        r = changepoint_single(df, "day", "v").collect()[0]
        n = len(vals)
        s = [0]
        q = [0]
        for v in vals:
            s.append(s[-1] + v)
            q.append(q[-1] + v * v)
        best = None
        for i in range(1, n):
            cost = (
                float(q[i]) - float(s[i]) * float(s[i]) / float(i)
            ) + (
                float(q[n] - q[i])
                - float(s[n] - s[i]) * float(s[n] - s[i]) / float(n - i)
            )
            if best is None or cost < best[0]:
                best = (cost, i)
        cost, i = best
        assert r["n_left"] == i and r["sum_left"] == s[i]
        assert r["split_day"] == base + datetime.timedelta(days=i - 1)
        assert abs(r["cost"] - cost) < 1e-9
        no_split = float(q[n]) - float(s[n]) * float(s[n]) / float(n)
        assert abs(r["gain"] - (no_split - cost)) < 1e-9

    check()


def test_matrix_profile_range_guard_refuses_overflow_scale(spark):
    """Int64-overflow contract made executable (r11, found by the sf1
    sweep): a series whose value range implies m*range^2 beyond int64
    must refuse with the requantize message at execution — not raise a
    raw ANSI ARITHMETIC_OVERFLOW deep in the pair join — while an
    in-range series is untouched."""
    import pytest as _pytest

    from amazon_personalize_connectors_spark.operators.analytics import (
        matrix_profile_ssd,
    )

    big = 2_000_000_000  # range 2e9 > isqrt((2^63-1)/3) ≈ 1.75e9 at m=3
    rows = [(i, big if i % 2 else 0) for i in range(12)]
    df = spark.createDataFrame(rows, "t int, v long")
    with _pytest.raises(Exception, match="Requantize to coarser integer"):
        matrix_profile_ssd(df, "t", "v", m=3, exclusion=2).collect()
    # same shape, in-range values: still works and stays exact
    ok = spark.createDataFrame(
        [(i, (i % 4) * 1000) for i in range(12)], "t int, v long"
    )
    out = matrix_profile_ssd(ok, "t", "v", m=3, exclusion=2)
    assert out.count() == 10
