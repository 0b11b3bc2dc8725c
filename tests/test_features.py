"""Feature-engineering operators (operators/features.py) and the
exact heavy-hitter pass (functions/sketches.frequent_values_exact):
edge-case semantics the sf oracles can't isolate — singleton/null
handling, context truncation, candidate-superset exactness."""

import pytest

from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.functions.sketches import (
    frequent_values_exact,
)
from amazon_personalize_connectors_spark.operators.features import (
    next_item_examples,
    target_encoding_loo,
    winsorize_stats,
)


# ---------------------------------------------------------------------------
# target_encoding_loo
# ---------------------------------------------------------------------------


def test_loo_excludes_own_row(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), ("b", 5), ("b", 7)],
        "cat string, y long",
    )
    got = {
        (r["cat"], r["y"]): r["te"]
        for r in target_encoding_loo(df, "cat", "y", "te").collect()
    }
    assert got[("a", 10)] == pytest.approx(25.0)  # (20+30)/2
    assert got[("a", 20)] == pytest.approx(20.0)  # (10+30)/2
    assert got[("b", 5)] == pytest.approx(7.0)
    assert got[("b", 7)] == pytest.approx(5.0)


def test_loo_singleton_category_is_null(spark):
    df = spark.createDataFrame([("solo", 42), ("pair", 1), ("pair", 3)],
                               "cat string, y long")
    rows = {r["cat"]: r for r in
            target_encoding_loo(df, "cat", "y", "te").collect()
            if r["cat"] == "solo"}
    assert rows["solo"]["te"] is None


def test_loo_null_target_row(spark):
    # a null-target row gets the mean of the others' targets and does
    # not poison its neighbours' encodings
    df = spark.createDataFrame(
        [("a", 10), ("a", None), ("a", 30)], "cat string, y long"
    )
    got = {r["y"]: r["te"] for r in
           target_encoding_loo(df, "cat", "y", "te").collect()}
    assert got[None] == pytest.approx(20.0)  # (10+30)/2, n not decremented
    assert got[10] == pytest.approx(30.0)    # (40-10)/(2-1)
    assert got[30] == pytest.approx(10.0)


# ---------------------------------------------------------------------------
# winsorize_stats
# ---------------------------------------------------------------------------


def test_winsorize_discrete_bounds_and_counts(spark):
    # 1..20 in one group: lo rank = ceil(0.05*20)=1 -> 1,
    # hi rank = ceil(0.95*20)=19 -> 19; 20 clamps down, nothing below 1
    df = spark.createDataFrame([("g", v) for v in range(1, 21)],
                               "g string, v long")
    r = winsorize_stats(df, ["g"], "v", 5, 95).collect()[0]
    assert (r["lo_bound"], r["hi_bound"]) == (1, 19)
    assert (r["n_clamped_lo"], r["n_clamped_hi"]) == (0, 1)
    # sum = 1..19 + 19 (the clamped 20) = 190 + 19 = 209
    assert r["winsorized_mean"] == pytest.approx(209 / 20)


def test_winsorize_ties_are_stable(spark):
    # duplicated values around the rank boundary: the bound is the
    # multiset's rank-k value regardless of tie ordering
    vals = [1, 1, 1, 5, 5, 5, 5, 9, 9, 9]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = winsorize_stats(df, ["g"], "v", 10, 90).collect()[0]
    # n=10: lo rank 1 -> 1, hi rank 9 -> 9
    assert (r["lo_bound"], r["hi_bound"]) == (1, 9)


# ---------------------------------------------------------------------------
# next_item_examples
# ---------------------------------------------------------------------------


def test_next_item_context_truncates(spark):
    df = spark.createDataFrame(
        [("u", i, f"i{i}") for i in range(1, 6)], "u string, t long, item string"
    )
    rows = {r["pos"]: r for r in
            next_item_examples(df, "u", "item", ["t"], context_len=2).collect()}
    assert set(rows) == {2, 3, 4, 5}  # first interaction emits nothing
    assert rows[2]["context"] == ["i1"]
    assert rows[3]["context"] == ["i1", "i2"]
    assert rows[5]["context"] == ["i3", "i4"]  # truncated to last 2
    assert rows[5]["label"] == "i5"


def test_next_item_examples_per_user_isolated(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "p"), ("b", 2, "q")],
        "u string, t long, item string",
    )
    out = next_item_examples(df, "u", "item", ["t"], 3).collect()
    assert len(out) == 2
    ctx = {r["user"]: r["context"] for r in out}
    assert ctx == {"a": ["x"], "b": ["p"]}  # no cross-user bleed


# ---------------------------------------------------------------------------
# frequent_values_exact
# ---------------------------------------------------------------------------


def test_frequent_values_matches_naive_exact(spark):
    # skewed stream: exact two-pass result == naive groupBy/HAVING
    rows = (["hot"] * 500 + ["warm"] * 120 + ["cool"] * 30
            + [f"tail{i}" for i in range(350)])
    df = spark.createDataFrame([(v,) for v in rows], "v string")
    got = {r["v"]: r["n"] for r in
           frequent_values_exact(df, "v", 0.05).collect()}
    # n=1000: threshold 50 strictly -> hot (500), warm (120); cool=30 out
    assert got == {"hot": 500, "warm": 120}


def test_frequent_values_threshold_is_strict(spark):
    df = spark.createDataFrame(
        [("x",)] * 10 + [("y",)] * 90, "v string"
    )
    got = {r["v"] for r in frequent_values_exact(df, "v", 0.10).collect()}
    # x has share exactly 0.10 -> strict > excludes it
    assert got == {"y"}


def test_frequent_values_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [(None,)] * 14, "v string"
    )
    rows = frequent_values_exact(df, "v", 0.5).collect()
    # totals exclude nulls: a has 6 of 6 non-null rows
    assert [(r["v"], r["n"]) for r in rows] == [("a", 6)]
    assert rows[0]["share"] == pytest.approx(1.0)


def test_frequent_values_cross_partition_hitters_survive(spark):
    # a value that is locally light in every partition but globally
    # heavy must still be found once batches are small: repartition
    # spreads 'spread' thin, yet it is 25% of the stream
    rows = ["spread"] * 250 + [f"t{i}" for i in range(750)]
    df = spark.createDataFrame([(v,) for v in rows], "v string").repartition(8)
    got = {r["v"] for r in frequent_values_exact(df, "v", 0.2).collect()}
    assert got == {"spread"}


# ---------------------------------------------------------------------------
# ks_two_sample / add_running_totals
# ---------------------------------------------------------------------------


def test_ks_identical_distributions_is_zero(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 4]] + [("b", v) for v in [1, 2, 3, 4]],
        "g string, v long",
    )
    from amazon_personalize_connectors_spark.operators.features import (
        ks_two_sample,
    )

    r = ks_two_sample(df, "v", F.col("g") == "a", F.col("g") == "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["ks_num"]) == (4, 4, 0)
    assert r["ks_stat"] == 0.0


def test_ks_disjoint_distributions_is_one(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3]] + [("b", v) for v in [10, 11]],
        "g string, v long",
    )
    from amazon_personalize_connectors_spark.operators.features import (
        ks_two_sample,
    )

    r = ks_two_sample(df, "v", F.col("g") == "a", F.col("g") == "b").collect()[0]
    assert r["ks_stat"] == 1.0


def test_ks_matches_scipy_definition(spark):
    # hand-computed: A = {1,1,2,5}, B = {2,3,3}
    # F_A: 1->.5, 2->.75, 3->.75, 5->1 ; F_B: 1->0, 2->1/3, 3->1, 5->1
    # sup |diff| = at x=3: |0.75-1| = .25? at x=1: .5; x=2: .75-1/3=5/12
    from amazon_personalize_connectors_spark.operators.features import (
        ks_two_sample,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("a", 5),
         ("b", 2), ("b", 3), ("b", 3)],
        "g string, v long",
    )
    r = ks_two_sample(df, "v", F.col("g") == "a", F.col("g") == "b").collect()[0]
    assert r["ks_stat"] == pytest.approx(0.5)  # at x=1
    assert r["ks_num"] == 6  # |2*3 - 0*4|


def test_running_totals_multi_column_matches_single(spark):
    from amazon_personalize_connectors_spark.operators.ids import (
        add_running_total,
        add_running_totals,
    )

    df = spark.createDataFrame(
        [(i, i % 3, (i * 7) % 5) for i in range(100)], "k long, x long, y long"
    )
    multi = add_running_totals(df, ["k"], {"x": "cx", "y": "cy"}, 7)
    single_x = {r["k"]: r["cx"] for r in
                add_running_total(df, ["k"], "x", "cx", 3).collect()}
    got = {r["k"]: (r["cx"], r["cy"]) for r in multi.collect()}
    run_x = run_y = 0
    for i in range(100):
        run_x += i % 3
        run_y += (i * 7) % 5
        assert got[i] == (run_x, run_y)
        assert single_x[i] == run_x


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------


def test_containment_short_inside_long(spark):
    from amazon_personalize_connectors_spark.functions.dedup import (
        containment_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long_ = short + " zeta eta theta iota kappa " + \
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    df = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    rows = containment_pairs(df, "text", "doc_id", n=3, min_common=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # every shingle of the short doc appears in the long one
    assert r["c_a_in_b"] == pytest.approx(1.0)
    assert r["c_b_in_a"] < 0.5  # asymmetric: Jaccard-style would miss this


def test_ks_matches_bruteforce_random(spark):
    # randomized (fixed-seed) cross-check against an independent
    # pure-Python KS implementation over the pooled value grid
    import random

    rng = random.Random(20260814)
    a = [rng.randint(0, 30) for _ in range(200)]
    b = [rng.randint(5, 40) for _ in range(150)]

    def brute_ks(xs, ys):
        grid = sorted(set(xs) | set(ys))
        na, nb = len(xs), len(ys)
        best = 0
        for g in grid:
            ca = sum(1 for v in xs if v <= g)
            cb = sum(1 for v in ys if v <= g)
            best = max(best, abs(ca * nb - cb * na))
        return best, na, nb

    from amazon_personalize_connectors_spark.operators.features import (
        ks_two_sample,
    )

    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, v long"
    )
    r = ks_two_sample(df, "v", F.col("g") == "a", F.col("g") == "b").collect()[0]
    num, na, nb = brute_ks(a, b)
    assert (r["n_a"], r["n_b"], r["ks_num"]) == (na, nb, num)
    assert r["ks_stat"] == num / (na * nb)


def test_winsorize_matches_bruteforce_random(spark):
    import math
    import random

    rng = random.Random(99)
    groups = {g: [rng.randint(-50, 1000) for _ in range(rng.randint(3, 60))]
              for g in ["g1", "g2", "g3"]}

    def brute(vals, lo_pct, hi_pct):
        s = sorted(vals)
        n = len(s)
        lo = s[(n * lo_pct + 99) // 100 - 1]
        hi = s[(n * hi_pct + 99) // 100 - 1]
        w = [min(max(v, lo), hi) for v in vals]
        return (lo, hi, sum(w) / n,
                sum(1 for v in vals if v < lo),
                sum(1 for v in vals if v > hi))

    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in winsorize_stats(df, ["g"], "v", 5, 95).collect()}
    for g, vs in groups.items():
        lo, hi, mean, clo, chi = brute(vs, 5, 95)
        r = got[g]
        assert (r["lo_bound"], r["hi_bound"]) == (lo, hi), g
        assert r["winsorized_mean"] == pytest.approx(mean)
        assert (r["n_clamped_lo"], r["n_clamped_hi"]) == (clo, chi), g


def test_frequent_values_integer_column(spark):
    # non-string value columns keep their type through the Arrow
    # candidate pass (schema is built from the input column's type)
    rows = [(7,)] * 40 + [(int(1000 + i),) for i in range(60)]
    df = spark.createDataFrame(rows, "v long")
    out = frequent_values_exact(df, "v", 0.2).collect()
    assert [(r["v"], r["n"]) for r in out] == [(7, 40)]
    assert out[0]["v"] == 7 and isinstance(out[0]["v"], int)


def test_loo_matches_bruteforce_hypothesis(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c"]),
                      st.integers(min_value=-100, max_value=100)),
            min_size=1, max_size=30,
        )
    )
    def check(rows):
        from collections import defaultdict

        df = spark.createDataFrame(rows, "cat string, y long")
        sums, counts = defaultdict(int), defaultdict(int)
        for c, y in rows:
            sums[c] += y
            counts[c] += 1
        # multiset comparison of (cat, y, encoding) triples
        want = sorted(
            (c, y, (sums[c] - y) / (counts[c] - 1) if counts[c] > 1 else None)
            for c, y in rows
        )
        have = sorted(
            (r["cat"], r["y"], r["te"])
            for r in target_encoding_loo(df, "cat", "y", "te").collect()
        )
        assert len(want) == len(have)
        for (c1, y1, t1), (c2, y2, t2) in zip(want, have):
            assert (c1, y1) == (c2, y2)
            if t1 is None:
                assert t2 is None
            else:
                assert t2 == pytest.approx(t1)

    check()


def test_mad_outliers_bruteforce(spark):
    import random

    from amazon_personalize_connectors_spark.operators.features import (
        robust_outlier_stats,
    )

    rng = random.Random(7)
    vals = [rng.randint(90, 110) for _ in range(41)] + [500, -300]

    def brute(vs, k):
        s = sorted(vs)
        n = len(s)
        med = s[(n + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v in vs)
        mad = devs[(n + 1) // 2 - 1]
        return (med, mad,
                sum(1 for v in vs if abs(v - med) > k * mad),
                max(abs(v - med) for v in vs))

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = robust_outlier_stats(df, ["g"], "v", k=5).collect()[0]
    med, mad, n_out, mx = brute(vals, 5)
    assert (r["median"], r["mad"], r["n_outliers"], r["max_abs_dev"]) == (
        med, mad, n_out, mx
    )
    assert r["n_outliers"] >= 2  # the two planted spikes


def test_winsorize_stats_matches_bruteforce(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.features import (
        winsorize_stats,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["a", "b"]),
                      st.integers(min_value=-100, max_value=100)),
            min_size=1, max_size=40,
        )
    )
    def check(rows):
        df = spark.createDataFrame(rows, "g string, v long")
        got = {
            r["g"]: (r["n_rows"], r["lo_bound"], r["hi_bound"],
                     r["winsorized_mean"], r["n_clamped_lo"], r["n_clamped_hi"])
            for r in winsorize_stats(df, ["g"], "v", 5, 95).collect()
        }
        groups = {}
        for g, v in rows:
            groups.setdefault(g, []).append(v)
        want = {}
        for g, vs in groups.items():
            vs = sorted(vs)
            n = len(vs)
            lo = vs[max(0, (n * 5 + 99) // 100 - 1)]
            hi = vs[max(0, (n * 95 + 99) // 100 - 1)]
            clamped = [min(hi, max(lo, v)) for v in vs]
            want[g] = (
                n, lo, hi, sum(clamped) / n,
                sum(1 for v in vs if v < lo),
                sum(1 for v in vs if v > hi),
            )
        assert set(got) == set(want)
        for g in want:
            assert got[g][:3] == want[g][:3], (g, got[g], want[g])
            assert abs(got[g][3] - want[g][3]) < 1e-9
            assert got[g][4:] == want[g][4:]

    check()


def test_robust_outlier_stats_matches_bruteforce(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.features import (
        robust_outlier_stats,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["a", "b"]),
                      st.integers(min_value=-100, max_value=100)),
            min_size=1, max_size=40,
        )
    )
    def check(rows):
        df = spark.createDataFrame(rows, "g string, v long")
        got = {
            r["g"]: (r["n_rows"], r["median"], r["mad"],
                     r["n_outliers"], r["max_abs_dev"])
            for r in robust_outlier_stats(df, ["g"], "v", k=3).collect()
        }
        groups = {}
        for g, v in rows:
            groups.setdefault(g, []).append(v)
        want = {}
        for g, vs in groups.items():
            vs_sorted = sorted(vs)
            n = len(vs_sorted)
            med = vs_sorted[(n + 1) // 2 - 1]
            devs = sorted(abs(v - med) for v in vs)
            mad = devs[(n + 1) // 2 - 1]
            want[g] = (
                n, med, mad,
                sum(1 for v in vs if abs(v - med) > 3 * mad),
                max(devs),
            )
        assert got == want

    check()


def test_profile_vector_sums_layout_independent(spark):
    """The round-5 headline fix: the aggregate must be bit-identical
    under ANY partitioning (the r4 red row was a double avg whose
    rounding flipped with accumulation order)."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        profile_vector_sums,
    )

    import random

    rng = random.Random(42)
    rows = [
        (i % 7, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k long, v array<double>")
    base = {
        (r["k"], r["dim"]): (r["vsum_micro"], r["n_vecs"])
        for r in profile_vector_sums(df, "k", "v").collect()
    }
    for parts in (1, 3, 17):
        alt = {
            (r["k"], r["dim"]): (r["vsum_micro"], r["n_vecs"])
            for r in profile_vector_sums(
                df.repartition(parts), "k", "v"
            ).collect()
        }
        assert alt == base, f"layout-dependent at {parts} partitions"


# ---------------------------------------------------------------------------
# grouped_pearson
# ---------------------------------------------------------------------------


def test_pearson_matches_python_exact(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_pearson,
    )

    xs = [1, 2, 3, 4, 10, 7, 2, 9]
    ys = [2, 4, 7, 8, 19, 15, 5, 17]
    rows = [("g", x, y) for x, y in zip(xs, ys)]
    # a constant-y group: zero variance -> NULL r
    rows += [("const", x, 5) for x in range(4)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in grouped_pearson(df, ["g"], "x", "y").collect()}
    import math

    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    r = float(num) / math.sqrt(float(dx) * float(dy))
    assert got["g"]["n"] == n
    assert got["g"]["r_num"] == float(num)
    assert got["g"]["r_dx"] == float(dx) and got["g"]["r_dy"] == float(dy)
    assert got["g"]["r"] == r  # identical IEEE tail on exact moments
    assert 0.97 < r < 1.0
    assert got["const"]["r"] is None and got["const"]["r_dy"] == 0.0


def test_pearson_layout_independent(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_pearson,
    )

    rows = [("g%d" % (i % 2), (i * 17) % 23, (i * 7) % 31) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    outs = []
    for p in (1, 5, 19):
        got = grouped_pearson(df.repartition(p), ["g"], "x", "y").collect()
        outs.append(sorted((r["g"], r["r_num"], r["r_dx"], r["r_dy"], r["r"])
                           for r in got))
    assert outs[0] == outs[1] == outs[2]


def test_spearman_matches_scipy_free_brute_force(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_spearman,
    )

    # monotone but non-linear (+ ties in both columns)
    xs = [1, 2, 2, 3, 5, 8, 9, 9]
    ys = [1, 4, 4, 9, 25, 64, 81, 81]
    inv_ys = [-y for y in ys]
    rows = [("mono", x, y) for x, y in zip(xs, ys)] + [
        ("anti", x, y) for x, y in zip(xs, inv_ys)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: r for r in grouped_spearman(df, ["g"], "x", "y").collect()
    }

    def avg_ranks(vals):
        order = sorted(vals)
        return [
            (order.index(v) + 1 + order.index(v) + order.count(v)) / 2
            for v in vals
        ]

    import math

    def brute_rho(xs, ys):
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(xs)
        mx, my = sum(rx) / n, sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
        )
        return num / den

    # ties make |rho| slightly below 1; exact to float tolerance vs the
    # centered-brute-force formula (different but equivalent algebra)
    assert abs(got["mono"]["rho"] - brute_rho(xs, ys)) < 1e-12
    assert abs(got["anti"]["rho"] - brute_rho(xs, inv_ys)) < 1e-12
    assert got["mono"]["rho"] > 0.99 and got["anti"]["rho"] < -0.99


def test_tv_distance_exact_and_bounds(spark):
    from fractions import Fraction

    from amazon_personalize_connectors_spark.operators.features import (
        tv_distance,
    )

    # A: {1:2, 2:1}; B: {2:2, 3:1}  (n_a=3, n_b=3)
    rows = [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (2, "b"), (3, "b")]
    df = spark.createDataFrame(rows, "v long, pop string")
    r = tv_distance(
        df, "v", F.col("pop") == "a", F.col("pop") == "b"
    ).collect()[0]
    # TV = 1/2 (|2/3-0| + |1/3-2/3| + |0-1/3|) = 2/3
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert Fraction(r["tv_num"], 2 * r["n_a"] * r["n_b"]) == Fraction(2, 3)
    assert r["tv_stat"] == r["tv_num"] / (2 * 9)

    # disjoint supports -> TV = 1; identical -> TV = 0
    dis = spark.createDataFrame(
        [(1, "a"), (2, "b")], "v long, pop string"
    )
    r1 = tv_distance(dis, "v", F.col("pop") == "a", F.col("pop") == "b").collect()[0]
    assert r1["tv_stat"] == 1.0
    same = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b")], "v long, pop string"
    )
    r0 = tv_distance(same, "v", F.col("pop") == "a", F.col("pop") == "b").collect()[0]
    assert r0["tv_stat"] == 0.0


def test_ols_matches_python_exact(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_ols,
    )

    xs = [1, 2, 3, 4, 10, 7, 2, 9]
    ys = [3, 5, 8, 9, 21, 16, 6, 18]
    rows = [("g", x, y) for x, y in zip(xs, ys)]
    # zero x-variance group -> NULL slope/intercept/r2
    rows += [("const", 5, y) for y in range(4)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in grouped_ols(df, ["g"], "x", "y").collect()}

    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    slope = float(num) / float(dx)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    r2 = (float(num) * float(num)) / (float(dx) * float(dy))
    assert got["g"]["n"] == n
    assert got["g"]["slope"] == slope  # identical fixed IEEE tail
    assert got["g"]["intercept"] == intercept
    assert got["g"]["r2"] == r2
    # sanity: numpy's lstsq agrees to float tolerance
    import numpy as np

    fit = np.polyfit(xs, ys, 1)
    assert abs(fit[0] - slope) < 1e-9 and abs(fit[1] - intercept) < 1e-9
    assert got["const"]["slope"] is None
    assert got["const"]["intercept"] is None and got["const"]["r2"] is None


def test_ols_layout_independent(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_ols,
    )

    rows = [("g%d" % (i % 2), (i * 13) % 29, (i * 11) % 37) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    outs = []
    for p in (1, 5, 19):
        got = grouped_ols(df.repartition(p), ["g"], "x", "y").collect()
        outs.append(sorted((r["g"], r["slope"], r["intercept"], r["r2"])
                           for r in got))
    assert outs[0] == outs[1] == outs[2]


def test_chi2_matches_python_bruteforce(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        chi2_independence,
    )

    # skewed 3x2 contingency: flags x statuses with real dependence
    data = (
        [("R", "F")] * 30 + [("R", "O")] * 5
        + [("A", "F")] * 10 + [("A", "O")] * 25
        + [("N", "F")] * 8 + [("N", "O")] * 22
    )
    df = spark.createDataFrame(data, "a string, b string")
    row = chi2_independence(df, "a", "b").collect()[0]

    import math
    from collections import Counter

    o = Counter(data)
    rt = Counter(a for a, _ in data)
    ct = Counter(b for _, b in data)
    n = len(data)
    scale = 1_000_000_000
    quanta = 0
    for (a, b), cnt in o.items():
        dev = float(cnt * n - rt[a] * ct[b])
        term = dev * dev / float(rt[a] * ct[b] * n)
        quanta += math.floor(term * float(scale))
    chi2 = float(quanta) / float(scale)
    assert row["n"] == n and row["n_cells"] == 6 and row["dof"] == 2
    assert row["chi2"] == chi2  # exact quanta, deterministic
    expect_v = math.sqrt(chi2 / (float(n) * 1.0))
    assert row["cramers_v"] == expect_v
    # dependence is real: chi2 far above the 2-dof 99.9% point (13.8)
    assert chi2 > 13.8


def test_chi2_independent_uniform_is_zero(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        chi2_independence,
    )

    # perfectly independent grid: every (a, b) cell equally filled
    data = [(f"a{i}", f"b{j}") for i in range(3) for j in range(4)] * 10
    df = spark.createDataFrame(data, "a string, b string")
    row = chi2_independence(df, "a", "b").collect()[0]
    assert row["chi2"] == 0.0 and row["dof"] == 6
    assert row["cramers_v"] == 0.0


def test_benford_profile_exact_counts_and_constants(spark):
    import math

    from amazon_personalize_connectors_spark.operators.expectations import (
        BENFORD_P,
        benford_profile,
    )

    # multiplicative growth sample: floor(1.31^k) covers decades and
    # leans Benford; plus non-positive rows that must be excluded
    vals = [int(1.31 ** k) for k in range(5, 60)]
    vals += [0, -7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = {r["digit"]: r for r in benford_profile(df, "v").collect()}

    from collections import Counter

    pos = [v for v in vals if v > 0]
    want = Counter(int(str(v)[0]) for v in pos)
    assert sum(r["n"] for r in rows.values()) == len(pos)
    for d, r in rows.items():
        assert r["n"] == want[d]
        assert r["share"] == float(want[d]) / float(len(pos))
        assert r["benford_p"] == BENFORD_P[d]
        assert r["abs_dev"] == abs(r["share"] - r["benford_p"])
    # the pinned constants ARE log10(1 + 1/d)
    for d, p in BENFORD_P.items():
        assert p == math.log10(1.0 + 1.0 / d)
    # leading-1 dominance shows up even in a short multiplicative run
    assert rows[1]["n"] == max(r["n"] for r in rows.values())


def test_revenue_acf_periodic_series(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_pearson,
    )
    from pyspark.sql import functions as F

    # exact 7-periodic series: lag-7 pairs are identical -> r == 1
    base = [100, 250, 90, 400, 160, 700, 30]
    daily = spark.createDataFrame(
        [(i, base[i % 7]) for i in range(70)], "di long, v long"
    )
    a = daily.select("di", F.col("v").alias("x"))
    b = daily.select((F.col("di") - 7).alias("di"), F.col("v").alias("y"))
    pairs = a.join(b, "di").select(F.lit(7).alias("lag"), "x", "y")
    row = grouped_pearson(pairs, ["lag"], "x", "y").collect()[0]
    assert row["n"] == 63 and row["r"] == 1.0


def test_chi2_quantum_overflow_raises_not_clamps(spark):
    """A per-cell term whose quantum exceeds the bigint range must
    raise (non-ANSI double->bigint casts would silently saturate and
    corrupt chi2)."""
    import pytest

    from amazon_personalize_connectors_spark.operators.features import (
        chi2_independence,
    )

    df = spark.createDataFrame(
        [("x", "p")] * 50 + [("y", "q")] * 50, "a string, b string"
    )
    with pytest.raises(Exception, match="bigint quantum"):
        chi2_independence(df, "a", "b", scale=10**18).collect()


def test_stratified_kfold_is_grouped_and_balanced(spark):
    """Same key -> same fold (leakage-safe grouped split), folds cover
    [0, k), and the portable-hash arithmetic matches a Python mirror."""
    from amazon_personalize_connectors_spark.operators.features import (
        kfold_report,
        stratified_kfold,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 400).alias("key"), (F.col("id") % 3).alias("s")
    )
    folded = stratified_kfold(df, "key", 5)
    per_key = folded.groupBy("key").agg(
        F.countDistinct("fold").alias("nf"), F.first("fold").alias("f")
    )
    rows = per_key.collect()
    assert all(r["nf"] == 1 for r in rows)  # grouped: one fold per key
    M = 2_147_483_647
    for r in rows[:50]:
        assert r["f"] == ((r["key"] % M) * 48271 % M) % 5
    folds = {r["f"] for r in rows}
    assert folds <= set(range(5)) and len(folds) == 5
    rep = kfold_report(df, ["s"], "key", 5)
    assert rep.agg(F.sum("n_rows")).collect()[0][0] == 3000
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        stratified_kfold(df, "key", 1)


def test_linkage_scores_fellegi_sunter(spark):
    """FS weights: agreement adds log2(m/u) micros, disagreement adds
    log2((1-m)/(1-u)) micros; NULL agreement counts as disagreement;
    thresholds classify into three decisions."""
    import math

    import pytest

    from amazon_personalize_connectors_spark.operators.linkage import (
        fs_field_weights,
        linkage_scores,
    )

    aw, dw = fs_field_weights(0.9, 0.1)
    assert aw == int(math.floor(math.log2(9.0) * 1_000_000))
    assert dw == int(math.floor(math.log2(1 / 9) * 1_000_000))
    pairs = spark.createDataFrame(
        [(1, True, True), (2, True, None), (3, False, False)],
        "pid int, a1 boolean, a2 boolean",
    )
    out = linkage_scores(
        pairs,
        {
            "f1": (F.col("a1"), 0.9, 0.1),
            "f2": (F.col("a2"), 0.8, 0.2),
        },
        upper_micro=2_000_000,
        lower_micro=0,
    ).collect()
    by = {r["pid"]: r for r in out}
    aw2, dw2 = fs_field_weights(0.8, 0.2)
    assert by[1]["score_micro"] == aw + aw2 and by[1]["decision"] == "match"
    assert by[2]["score_micro"] == aw + dw2  # NULL == disagreement
    assert by[3]["score_micro"] == dw + dw2
    assert by[3]["decision"] == "non_match"
    with pytest.raises(ValueError, match="m must exceed u"):
        fs_field_weights(0.2, 0.8)


def test_mannwhitney_u_exact_small_sample(spark):
    # A = [1, 2, 4], B = [2, 3]: ranks 1, 2.5, 5 / 2.5, 4
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 4), ("b", 2), ("b", 3)],
        "g string, v long",
    )
    from amazon_personalize_connectors_spark.operators.features import (
        mannwhitney_u,
    )

    r = mannwhitney_u(df, "g", "a", "b", "v").collect()[0]
    assert (r.n_a, r.n_b) == (3, 2)
    # R_A = 1 + 2.5 + 5 = 8.5 -> U_A = 8.5 - 6 = 2.5 -> 2U = 5
    assert int(r.two_u_a) == 5
    # one tie group of size 2 -> T = 8 - 2 = 6
    assert int(r.tie_cubes) == 6
    # rank-biserial = 2U/(nA nB) - 1 = 5/6 - 1
    assert abs(r.r_rb - (5 / 6 - 1)) < 1e-12
    import math

    n = 5
    var = 3 * 2 / 12 * ((n + 1) - 6 / (n * (n - 1)))
    assert abs(r.z - (5 - 6) / (2 * math.sqrt(var))) < 1e-12


def test_mannwhitney_u_symmetry(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [1, 5, 7, 7]] + [("b", v) for v in [2, 7, 9]],
        "g string, v long",
    )
    from amazon_personalize_connectors_spark.operators.features import (
        mannwhitney_u,
    )

    ab = mannwhitney_u(df, "g", "a", "b", "v").collect()[0]
    ba = mannwhitney_u(df, "g", "b", "a", "v").collect()[0]
    # U_A + U_B = nA*nB and z flips sign
    assert int(ab.two_u_a) + int(ba.two_u_a) == 2 * ab.n_a * ab.n_b
    assert abs(ab.z + ba.z) < 1e-12


def test_js_divergence_bounds_and_symmetry(spark):
    import math

    from amazon_personalize_connectors_spark.operators.features import (
        js_divergence,
    )

    # identical distributions -> 0
    same = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b")] * 5, "bin long, g string"
    )
    r = js_divergence(same, "bin", F.col("g") == "a", F.col("g") == "b")
    assert abs(r.collect()[0].jsd) < 1e-8
    # disjoint supports -> ln 2 (within quantization error)
    disj = spark.createDataFrame(
        [(1, "a")] * 6 + [(2, "b")] * 4, "bin long, g string"
    )
    r2 = js_divergence(disj, "bin", F.col("g") == "a", F.col("g") == "b")
    assert abs(r2.collect()[0].jsd - math.log(2)) < 1e-8
    # symmetric in A/B
    skew = spark.createDataFrame(
        [(1, "a")] * 6 + [(1, "b")] * 2 + [(2, "a")] * 1 + [(2, "b")] * 5,
        "bin long, g string",
    )
    ab = js_divergence(skew, "bin", F.col("g") == "a", F.col("g") == "b")
    ba = js_divergence(skew, "bin", F.col("g") == "b", F.col("g") == "a")
    assert abs(ab.collect()[0].jsd - ba.collect()[0].jsd) < 1e-8


def test_oof_target_encoding_excludes_own_fold(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        oof_target_encoding,
        stratified_kfold,
    )

    rows = [(k, "c", 100 + k) for k in range(20)] + [(99, "rare", 7)]
    df = spark.createDataFrame(rows, "key long, cat string, y long")
    out = oof_target_encoding(df, "cat", "y", "key", k=3).collect()
    folds = {r.key: r.fold for r in
             stratified_kfold(df, "key", 3).collect()}
    by_fold = {}
    for k, cat, y in rows:
        if cat == "c":
            by_fold.setdefault(folds[k], []).append(y)
    for r in out:
        if r.cat == "c":
            others = [y for f, ys in by_fold.items() if f != r.fold
                      for y in ys]
            assert abs(r.te_oof - sum(others) / len(others)) < 1e-12
        else:
            # 'rare' exists in exactly one fold -> no OOF evidence
            assert r.te_oof is None


def test_cuped_matches_python_ieee_tree(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        cuped_estimate,
    )

    # arms get equal-mean x (A: 3,7,1,9 / B: 4,6,2,8) so the pooled
    # theta is not dominated by arm-x correlation
    rows = [(u, x, 2 * x + (10 if u % 2 == 0 else 0) + (u % 3))
            for u, x in enumerate([3, 4, 7, 6, 1, 2, 9, 8])]
    df = spark.createDataFrame(rows, "u long, pre long, post long")
    r = cuped_estimate(
        df, F.col("u") % 2 == 0, F.col("u") % 2 == 1, "pre", "post"
    ).collect()[0]
    a = [(x, y) for u, x, y in rows if u % 2 == 0]
    b = [(x, y) for u, x, y in rows if u % 2 == 1]
    allr = a + b
    n = float(len(allr))
    sx = float(sum(x for x, _ in allr)); sy = float(sum(y for _, y in allr))
    sxy = float(sum(x * y for x, y in allr))
    sxx = float(sum(x * x for x, _ in allr))
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    diff_raw = (sum(y for _, y in a) / len(a)
                - sum(y for _, y in b) / len(b))
    diff_x = (sum(x for x, _ in a) / len(a)
              - sum(x for x, _ in b) / len(b))
    # same fixed IEEE tree -> bit-identical
    assert r.theta == theta
    assert r.diff_raw == diff_raw
    assert r.diff_cuped == diff_raw - theta * diff_x
    # when y = 2x + effect + noise, theta lands near 2 and the CUPED
    # diff is closer to the true +10 effect than the raw diff
    assert 1.5 < r.theta < 2.5
    assert abs(r.diff_cuped - 10.0) <= abs(r.diff_raw - 10.0) + 1e-12


def test_woe_iv_hand_computed(spark):
    import math

    # bins: a (3 pos / 1 neg), b (1 pos / 3 neg) -> symmetric WoE
    rows = ([("a", 1)] * 3 + [("a", 0)] * 1
            + [("b", 1)] * 1 + [("b", 0)] * 3)
    df = spark.createDataFrame(rows, "bin string, y int")
    from amazon_personalize_connectors_spark.operators.features import woe_iv

    out = {r.bin: r for r in woe_iv(df, "bin", "y").collect()}
    # WoE_a = ln((3/4)/(1/4)) = ln 3; WoE_b = -ln 3
    assert abs(out["a"].woe - math.log(3)) < 1e-12
    assert abs(out["b"].woe + math.log(3)) < 1e-12
    # IV = 2 * (3/4 - 1/4) * ln 3 = ln 3 (within quantization)
    assert abs(out["a"].iv - math.log(3)) < 1e-8
    assert out["a"].iv == out["b"].iv


def test_woe_iv_one_sided_bin_flagged_not_smoothed(spark):
    rows = [("pure", 1)] * 4 + [("mix", 1), ("mix", 0)]
    df = spark.createDataFrame(rows, "bin string, y int")
    from amazon_personalize_connectors_spark.operators.features import woe_iv

    out = {r.bin: r for r in woe_iv(df, "bin", "y").collect()}
    assert out["pure"].woe is None          # no epsilon fudge
    assert out["mix"].woe is not None


def test_bootstrap_ci_matches_python_hash_mirror(spark):
    import hashlib

    from amazon_personalize_connectors_spark.operators.features import (
        bootstrap_ci,
    )

    vals = [100, 220, 310, 475, 520, 610, 740, 888, 930, 1050]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    r = bootstrap_ci(df, "x", n_replicates=8, lo_rank=2, hi_rank=7).collect()[0]

    th = ["5e2d58d8b3bce", "bc5ab1b16779c", "eb715e1dc1583",
          "fb23979734a25"]

    def weight(rep, x):
        hx = hashlib.md5(f"b|{rep}|{x}".encode()).hexdigest()[:13]
        for w, t in enumerate(th):
            if hx < t:
                return w
        return 4

    means = []
    for rep in range(8):
        sw = sum(weight(rep, v) for v in vals)
        swx = sum(weight(rep, v) * v for v in vals)
        means.append(swx / sw if sw else None)
    ms = sorted(m for m in means if m is not None)
    assert r.n_rows == 10 and r.n_replicates == 8
    assert r.mean == sum(vals) / 10
    assert r.ci_lo == ms[1] and r.ci_hi == ms[6]


def test_bootstrap_ci_layout_independent(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        bootstrap_ci,
    )

    df = spark.createDataFrame([(v,) for v in range(1, 200)], "x long")
    a = bootstrap_ci(df, "x").collect()[0]
    b = bootstrap_ci(df.repartition(13), "x").collect()[0]
    assert (a.ci_lo, a.ci_hi, a.mean) == (b.ci_lo, b.ci_hi, b.mean)
    assert a.ci_lo <= a.mean <= a.ci_hi


def test_eb_shrunk_rates_pulls_small_samples_to_prior(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        eb_shrunk_rates,
    )

    # many medium-volume keys around 30% plus one 1/1=100% key
    rows = []
    for k in range(20):
        pos = 2 + (k % 4)          # 2..5 of 12 -> rates .17-.42
        rows += [(k, 1)] * pos + [(k, 0)] * (12 - pos)
    rows += [(99, 1)]              # the 1/1 key
    df = spark.createDataFrame(rows, "k long, y int")
    out = {r.key: r for r in eb_shrunk_rates(df, "k", "y").collect()}
    tiny = out[99]
    assert tiny.rate == 1.0
    assert tiny.alpha is not None and tiny.beta is not None
    # posterior mean pulled well below the raw 100%, above the prior mean
    prior_mean = tiny.alpha / (tiny.alpha + tiny.beta)
    assert prior_mean < tiny.shrunk < 1.0
    assert tiny.shrunk < 0.8
    # high-volume keys barely move
    big = out[0]
    assert abs(big.shrunk - big.rate) < abs(tiny.shrunk - tiny.rate)


def test_eb_shrunk_rates_degenerate_constant_rates(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        eb_shrunk_rates,
    )

    # identical rates -> zero variance -> no prior, raw rates returned
    rows = [(k, y) for k in range(5) for y in (1, 0)]
    df = spark.createDataFrame(rows, "k long, y int")
    out = eb_shrunk_rates(df, "k", "y").collect()
    assert all(r.alpha is None and r.shrunk == r.rate for r in out)


def test_anova_oneway_matches_scipy_formula(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        anova_oneway,
    )

    groups = {"a": [10, 12, 14], "b": [20, 22, 24], "c": [30, 32, 34]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = anova_oneway(df, "g", "v").collect()[0]
    # hand ANOVA: group means 12/22/32, grand 22 -> ssb = 3*(100+0+100)=600
    # ssw = 3 groups * ((2)^2+0+2^2) = 24 -> F = (600/2)/(24/6) = 75
    assert (r["k"], r["n"]) == (3, 9)
    assert abs(r["ssb"] - 600.0) < 1e-3
    assert abs(r["ssw"] - 24.0) < 1e-3
    assert abs(r["f_stat"] - 75.0) < 1e-3


def test_anova_oneway_single_group_null_f(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        anova_oneway,
    )

    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r["k"] == 1 and r["f_stat"] is None


def test_trimmed_mean_hand_example(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        trimmed_mean,
    )

    # 10 values, trim 10% -> drop 1 low (0) and 1 high (1000)
    vals = [0, 10, 20, 30, 40, 50, 60, 70, 80, 1000]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = trimmed_mean(df, ["g"], "v", trim_pct=10, scale=100).collect()[0]
    assert (r["n"], r["n_kept"]) == (10, 8)
    assert r["tmean_q"] == (sum(vals[1:-1]) * 100) // 8  # 4500


def test_trimmed_mean_resists_outlier(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        trimmed_mean,
    )

    base = list(range(1, 20))
    df = spark.createDataFrame(
        [("a", v) for v in base + [10**9]], "g string, v long"
    )
    r = trimmed_mean(df, ["g"], "v", trim_pct=10).collect()[0]
    # the 1e9 outlier is trimmed: mean stays near 10
    assert r["tmean_q"] < 20 * 10**6


def test_trimmed_mean_negative_values_floor(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        trimmed_mean,
    )

    df = spark.createDataFrame(
        [("g", v) for v in (-7, -7, -7)], "g string, v long"
    )
    r = trimmed_mean(df, ["g"], "v", trim_pct=0, scale=10).collect()[0]
    assert r["tmean_q"] == -70


def test_corr_matrix_perfect_and_anti(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        corr_matrix,
    )

    rows = [(i, 2 * i, -3 * i, 7) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    got = {(r["m_a"], r["m_b"]): r["r"]
           for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert abs(got[("a", "b")] - 1.0) < 1e-12
    assert abs(got[("a", "c")] + 1.0) < 1e-12
    assert got[("a", "d")] is None  # zero variance -> NULL
    assert len(got) == 6


def test_corr_matrix_matches_grouped_pearson(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        corr_matrix,
        grouped_pearson,
    )

    rows = [(i, (i * 7) % 5, (i * 3) % 11) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    mat = {(r["m_a"], r["m_b"]): r["r"]
           for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    single = grouped_pearson(df.withColumn("g", F.lit(1)), ["g"], "x", "y")
    r_xy = single.collect()[0]["r"]
    assert mat[("x", "y")] == r_xy  # identical IEEE tails, bit-equal


def test_weighted_quantile_hand_example(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        weighted_quantile,
    )

    # values 1..4 with weights 1,1,6,2 (W=10): median crossing at v=3
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 6), ("g", 4, 2)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    r = weighted_quantile(df, ["g"], "v", "w", 1, 2).collect()[0]
    assert (r["wq_value"], r["total_w"]) == (3, 10)
    # p90: cumw>=9 first at v=4
    r = weighted_quantile(df, ["g"], "v", "w", 9, 10).collect()[0]
    assert r["wq_value"] == 4


def test_weighted_quantile_equal_weights_is_lower_median(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        weighted_quantile,
    )

    rows = [("g", v, 1) for v in (10, 20, 30, 40)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    r = weighted_quantile(df, ["g"], "v", "w", 1, 2).collect()[0]
    assert r["wq_value"] == 20  # cumw 2/4 crosses at the 2nd value


def test_weighted_quantile_duplicate_values_collapse(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        weighted_quantile,
    )

    # same value appearing in many rows must act as ONE mass point
    rows = [("g", 5, 1)] * 10 + [("g", 1, 3)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    r = weighted_quantile(df, ["g"], "v", "w", 1, 2).collect()[0]
    assert r["wq_value"] == 5 and r["total_w"] == 13


def test_mutual_information_known_values(spark):
    import math

    from amazon_personalize_connectors_spark.operators.features import (
        mutual_information,
    )

    # perfectly dependent: y == x -> MI = H(X) = H(Y), NMI = 1
    rows = [("a", "a")] * 2 + [("b", "b")] * 2
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    assert (r["n"], r["classes_x"], r["classes_y"]) == (4, 2, 2)
    assert abs(r["mi"] - math.log(2)) < 1e-6
    assert abs(r["h_x"] - math.log(2)) < 1e-6
    assert abs(r["nmi"] - 1.0) < 1e-6


def test_mutual_information_independent_clamps_at_zero(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        mutual_information,
    )

    # exactly independent product distribution: true MI = 0; each of
    # the 4 cell terms floor()s downward, so the unclamped quantized
    # sum would land a few quanta NEGATIVE (ADVICE r6) — the clamp
    # must hold the [0, 1] contract
    rows = [(x, y) for x in ("a", "b") for y in ("c", "d") for _ in range(3)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi"] >= 0.0 and r["mi"] < 1e-6
    assert r["nmi"] is not None and 0.0 <= r["nmi"] <= 1.0


def test_mutual_information_constant_column_nmi_null(spark):
    from amazon_personalize_connectors_spark.operators.features import (
        mutual_information,
    )

    rows = [("k", y) for y in ("a", "b", "a", "b")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["h_x"] == 0.0 and r["mi"] == 0.0 and r["nmi"] is None


def test_mannwhitney_u_matches_python_reference_and_emits_bigint(spark):
    """Property guard for the r7 BIGINT re-emission (the r6 red row):
    exact columns must match a pure-Python rank-sum reference AND the
    output schema must carry NO decimal — a DECIMAL in a final SELECT
    converts engine-dependently at the driver (BASELINE.md §H)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.features import (
        mannwhitney_u,
    )

    @given(
        st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=12),
        st.lists(st.integers(min_value=-50, max_value=50), min_size=2, max_size=12),
    )
    @settings(max_examples=8, deadline=None)
    def check(a_vals, b_vals):
        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        df = spark.createDataFrame(rows, "g string, v long")
        out = mannwhitney_u(df, "g", "a", "b", "v")
        from pyspark.sql.types import DecimalType, LongType

        by_name = {f.name: f.dataType for f in out.schema.fields}
        assert not any(isinstance(t, DecimalType) for t in by_name.values())
        assert isinstance(by_name["two_u_a"], LongType)
        assert isinstance(by_name["tie_cubes"], LongType)
        r = out.collect()[0]
        # pure-python reference: midranks over the pooled sample
        pooled = sorted(a_vals + b_vals)
        rank_of = {}
        i = 0
        while i < len(pooled):
            j = i
            while j < len(pooled) and pooled[j] == pooled[i]:
                j += 1
            rank_of[pooled[i]] = (i + 1 + j) / 2  # average of ranks i+1..j
            i = j
        two_ra = round(2 * sum(rank_of[v] for v in a_vals))
        na, nb = len(a_vals), len(b_vals)
        assert r["two_u_a"] == two_ra - na * (na + 1)
        from collections import Counter

        t = sum(c**3 - c for c in Counter(pooled).values())
        assert r["tie_cubes"] == t
        n = na + nb
        num = (two_ra - na * (na + 1)) - na * nb
        var = na * nb * ((n + 1) - t / (n * (n - 1))) / 12
        if var > 0:
            assert abs(r["z"] - num / (2 * math.sqrt(var))) < 1e-9
        else:
            assert r["z"] is None  # all-tied pool: z undefined, never 0/0

    check()


def test_ks_two_sample_empty_side_is_null_not_zero_division(spark):
    # degenerate-input guard: an empty subpopulation has no
    # distribution — ks_stat must be NULL, never an ANSI 0/0
    from amazon_personalize_connectors_spark.operators.features import (
        ks_two_sample,
    )

    df = spark.createDataFrame([("g", 5)] * 4, "g string, x long")
    r = ks_two_sample(
        df, "x", F.col("x") >= 0, F.col("x") < 0
    ).collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 0)
    assert r["ks_stat"] is None


def test_drift_metrics_null_against_empty_population(spark):
    # degenerate-input guards (Spark 4 ANSI raises DIVIDE_BY_ZERO even
    # on double division): drift vs an EMPTY subpopulation is
    # undefined — NULL stat, no crash
    from amazon_personalize_connectors_spark.operators.features import (
        js_divergence,
        tv_distance,
    )

    d = spark.createDataFrame([("g", 5)] * 4, "g string, x long")
    in_a, in_b = F.col("g") == "g", F.col("g") == "never"
    jr = js_divergence(d, "x", in_a, in_b).collect()[0]
    assert jr["n_b"] == 0 and jr["jsd"] is None
    tr = tv_distance(d, "x", in_a, in_b).collect()[0]
    assert tr["n_b"] == 0 and tr["tv_stat"] is None
