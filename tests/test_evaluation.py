"""Score-quality evaluation operators (operators/evaluation.py):
brute-force AUC against all-pairs comparison (incl. ties), bin-report
arithmetic against hand counts, Wilson bounds against the same IEEE
expression evaluated in Python, and the partition-layout-independence
property the user_profile_vectors regression taught us to pin."""

import math

from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.operators.evaluation import (
    roc_auc,
    score_bin_report,
    wilson_bounds,
)


def _brute_auc(pairs):
    """All-pairs AUC: P(score+ > score-) + 0.5 P(tie)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(1.0 for p in pos for n in neg if p > n)
    ties = sum(1.0 for p in pos for n in neg if p == n)
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


# ---------------------------------------------------------------------------
# roc_auc
# ---------------------------------------------------------------------------


def test_auc_matches_all_pairs_brute_force(spark):
    pairs = [
        (10, 0), (20, 0), (20, 1), (30, 1), (30, 0), (30, 1),
        (40, 1), (5, 0), (5, 0), (40, 0), (25, 1), (25, 0),
    ]
    df = spark.createDataFrame(
        [("g", s, y) for s, y in pairs], "g string, score long, label int"
    )
    row = roc_auc(df, ["g"], "score", "label").collect()[0]
    expect = _brute_auc(pairs)
    assert row["auc"] == expect
    # the integer numerator is exactly 2 * (wins + ties/2)
    assert row["auc_num2"] == round(
        expect * 2 * row["n_pos"] * row["n_neg"]
    )


def test_auc_perfect_and_inverted_and_degenerate(spark):
    data = (
        [("perfect", 100 + i, 1) for i in range(3)]
        + [("perfect", i, 0) for i in range(3)]
        + [("inverted", i, 1) for i in range(3)]
        + [("inverted", 100 + i, 0) for i in range(3)]
        + [("allpos", i, 1) for i in range(3)]
    )
    df = spark.createDataFrame(data, "g string, score long, label int")
    got = {r["g"]: r for r in roc_auc(df, ["g"], "score", "label").collect()}
    assert got["perfect"]["auc"] == 1.0
    assert got["inverted"]["auc"] == 0.0
    assert got["allpos"]["auc"] is None  # undefined without negatives
    assert got["allpos"]["n_neg"] == 0


def test_auc_partition_layout_independent(spark):
    base = [
        ("g%d" % (i % 3), (i * 7919) % 50, (i * 31) % 2) for i in range(200)
    ]
    df = spark.createDataFrame(base, "g string, score long, label int")
    results = []
    for parts in (1, 3, 17):
        rows = roc_auc(
            df.repartition(parts), ["g"], "score", "label"
        ).collect()
        results.append(
            sorted((r["g"], r["auc_num2"], r["auc"]) for r in rows)
        )
    assert results[0] == results[1] == results[2]


# ---------------------------------------------------------------------------
# score_bin_report
# ---------------------------------------------------------------------------


def test_bin_report_counts_and_cumulatives(spark):
    rows = [(i, 1 if i >= 50 else 0) for i in range(100)]  # pos iff >= 50
    df = spark.createDataFrame(rows, "score long, label int")
    out = {
        r["bin"]: r
        for r in score_bin_report(df, "score", "label", bin_width=25).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert all(out[b]["n"] == 25 for b in out)
    assert out[3]["n_pos"] == 25 and out[0]["n_pos"] == 0
    assert out[3]["bin_lo"] == 75
    # cumulative runs highest-score-first
    assert out[3]["cum_n"] == 25 and out[1]["cum_n"] == 75
    assert out[3]["capture"] == 0.5  # 25 of 50 positives in the top bin
    assert out[2]["capture"] == 1.0
    assert out[2]["cum_precision"] == 1.0  # top 2 bins are all positive
    assert out[0]["cum_precision"] == 0.5


def test_bin_report_no_positives_capture_null(spark):
    df = spark.createDataFrame([(5, 0), (30, 0)], "score long, label int")
    rows = score_bin_report(df, "score", "label", bin_width=10).collect()
    assert all(r["capture"] is None for r in rows)
    assert all(r["frac_pos"] == 0.0 for r in rows)


# ---------------------------------------------------------------------------
# wilson_bounds
# ---------------------------------------------------------------------------


def _py_wilson(pos, n):
    p = pos / n
    denom = 1.0 + 4.0 / n
    center = p + 2.0 / n
    margin = 2.0 * math.sqrt((p * (1.0 - p) + 1.0 / n) / n)
    return (
        max(0.0, (center - margin) / denom),
        min(1.0, (center + margin) / denom),
    )


def test_wilson_matches_python_ieee_tree(spark):
    rows = (
        [("a", 1)] * 6 + [("a", 0)] * 4
        + [("b", 1)] * 2 + [("b", 0)] * 1
        + [("c", 0)] * 5
        + [("d", 1)] * 5
    )
    df = spark.createDataFrame(rows, "g string, label int")
    got = {r["g"]: r for r in wilson_bounds(df, ["g"], "label").collect()}
    for g, pos, n in (("a", 6, 10), ("b", 2, 3), ("c", 0, 5), ("d", 5, 5)):
        lo, hi = _py_wilson(pos, n)
        assert got[g]["n"] == n and got[g]["n_pos"] == pos
        assert got[g]["rate"] == pos / n
        # bit-for-bit: the op and Python evaluate the same IEEE tree
        assert got[g]["wilson_lo"] == lo
        assert got[g]["wilson_hi"] == hi
    # the interval brackets the rate (to an ulp — at p=1 the hi
    # expression rounds to 0.999...9) and stays in [0, 1]
    for r in got.values():
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] + 1e-12
        assert r["wilson_hi"] <= 1.0


def test_wilson_small_n_wide_interval(spark):
    df = spark.createDataFrame(
        [("tiny", 1), ("tiny", 0)] + [("big", 1), ("big", 0)] * 500,
        "g string, label int",
    )
    got = {r["g"]: r for r in wilson_bounds(df, ["g"], "label").collect()}
    width = lambda r: r["wilson_hi"] - r["wilson_lo"]  # noqa: E731
    assert width(got["tiny"]) > width(got["big"])
    assert got["big"]["rate"] == 0.5


# ---------------------------------------------------------------------------
# two_proportion_ztest
# ---------------------------------------------------------------------------


def test_ztest_matches_python_ieee_tree(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        two_proportion_ztest,
    )

    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 45 + [("b", 0)] * 55
    df = spark.createDataFrame(rows, "arm string, y int")
    r = two_proportion_ztest(
        df, F.col("arm") == "a", F.col("arm") == "b", "y"
    ).collect()[0]
    assert (r["n_a"], r["pos_a"], r["n_b"], r["pos_b"]) == (100, 30, 100, 45)
    pa, pb = 30 / 100, 45 / 100
    pp = 75 / 200
    z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / 100 + 1.0 / 100))
    assert r["rate_a"] == pa and r["rate_b"] == pb
    assert r["diff"] == pa - pb
    assert r["z"] == z  # identical IEEE tree
    assert r["z"] < -2.0  # 15-point lift on n=100 is significant


def test_ztest_degenerate_zero_variance(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        two_proportion_ztest,
    )

    # all failures -> pooled rate 0 -> zero variance -> NULL z
    df = spark.createDataFrame(
        [("a", 0)] * 5 + [("b", 0)] * 5, "arm string, y int"
    )
    r = two_proportion_ztest(
        df, F.col("arm") == "a", F.col("arm") == "b", "y"
    ).collect()[0]
    assert r["z"] is None and r["diff"] == 0.0


# ---------------------------------------------------------------------------
# top1_transition_accuracy
# ---------------------------------------------------------------------------


def test_markov_backtest_argmax_and_accuracy(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        top1_transition_accuracy,
    )

    # train: A->B x3, A->C x1 (argmax B); B->C x2, B->A x2 (tie -> A,
    # lexicographic)
    train = [("A", "B")] * 3 + [("A", "C")] + [("B", "C")] * 2 + [("B", "A")] * 2
    # test: A->B, A->C, B->A, B->B, D->A (D unseen in train)
    test = [("A", "B"), ("A", "C"), ("B", "A"), ("B", "B"), ("D", "A")]
    rows = [(f, t, 1) for f, t in train] + [(f, t, 0) for f, t in test]
    df = spark.createDataFrame(rows, "f string, t string, train int")
    out = {
        r["f"]: r
        for r in top1_transition_accuracy(
            df, "f", "t", F.col("train") == 1
        ).collect()
    }
    assert out["A"]["predicted"] == "B"
    assert (out["A"]["n_test"], out["A"]["n_hits"]) == (2, 1)
    assert out["A"]["accuracy"] == 0.5
    assert out["B"]["predicted"] == "A"  # tie broken lexicographically
    assert (out["B"]["n_hits"], out["B"]["n_test"]) == (1, 2)
    # unseen source state: NULL prediction, zero hits
    assert out["D"]["predicted"] is None
    assert (out["D"]["n_test"], out["D"]["n_hits"]) == (1, 0)
    assert out["D"]["accuracy"] == 0.0


# ---------------------------------------------------------------------------
# hypothesis brute-force properties
# ---------------------------------------------------------------------------


def test_auc_matches_bruteforce_hypothesis(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=12),  # heavy ties
                st.integers(min_value=0, max_value=1),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def check(pairs):
        df = spark.createDataFrame(
            [("g", s, y) for s, y in pairs], "g string, score long, label int"
        )
        row = roc_auc(df, ["g"], "score", "label").collect()[0]
        expect = _brute_auc(pairs)
        assert row["auc"] == expect
        n_pos = sum(y for _, y in pairs)
        assert (row["n_pos"], row["n_neg"]) == (n_pos, len(pairs) - n_pos)

    check()


def test_gini_matches_bruteforce_hypothesis(spark):
    from hypothesis import given, settings, strategies as st

    from amazon_personalize_connectors_spark.operators.analytics import (
        concentration_gini,
    )
    from tests.test_analytics import _brute_gini

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=50), min_size=1, max_size=40
        )
    )
    def check(values):
        df = spark.createDataFrame(
            [("g", v) for v in values], "g string, v long"
        )
        r = concentration_gini(df, ["g"], "v").collect()[0]
        assert r["gini"] == _brute_gini(values)
        assert r["n"] == len(values) and r["total"] == sum(values)

    check()


# ---------------------------------------------------------------------------
# ipw_weighted_ratio
# ---------------------------------------------------------------------------


def test_ipw_exact_integer_fold_and_clip(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        ipw_weighted_ratio,
    )

    rows = [
        (1, 1, 5),        # weight 1_000_000
        (4, 2, 5),        # weight 250_000
        (3, 0, 5),        # weight 333_333 (DIV truncates)
        (2_000_000, 5, 5),  # propensity > scale -> weight 0 (clipped)
        (0, 1, 1),        # propensity 0 -> treated as 1
    ]
    df = spark.createDataFrame(rows, "pop long, num long, den long")
    r = ipw_weighted_ratio(df, "pop", "num", "den").collect()[0]
    w = [1_000_000, 250_000, 333_333, 0, 1_000_000]
    sw_num = sum(wi * n for wi, (_, n, _) in zip(w, rows))
    sw_den = sum(wi * d for wi, (_, _, d) in zip(w, rows))
    assert r["n_rows"] == 5
    assert r["sum_w_num"] == sw_num and r["sum_w_den"] == sw_den
    assert r["weighted_ratio"] == sw_num / sw_den
    assert r["raw_ratio"] == 9 / 21


def test_ipw_zero_denominator_null(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        ipw_weighted_ratio,
    )

    df = spark.createDataFrame([(5_000_000, 1, 1)], "pop long, num long, den long")
    r = ipw_weighted_ratio(df, "pop", "num", "den").collect()[0]
    # the only row clips to weight 0 -> weighted ratio undefined
    assert r["sum_w_den"] == 0 and r["weighted_ratio"] is None
    assert r["raw_ratio"] == 1.0


def test_bins_from_grid_equals_raw_report(spark):
    """One maintained grid, two statistics: binning the aggregated
    (_s, _pos, _neg) grid must equal binning the raw rows."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        bins_from_grid,
    )

    rows = [(i % 37, (i * 13) % 2) for i in range(500)]
    df = spark.createDataFrame(rows, "score long, label int")
    raw = sorted(
        tuple(r) for r in score_bin_report(df, "score", "label", 10).collect()
    )
    grid = df.groupBy(F.col("score").alias("_s")).agg(
        F.sum("label").cast("long").alias("_pos"),
        F.sum(F.lit(1) - F.col("label")).cast("long").alias("_neg"),
    )
    via_grid = sorted(tuple(r) for r in bins_from_grid(grid, 10).collect())
    assert raw == via_grid


def test_cohens_kappa_exact(spark):
    """Kappa against a hand-computed confusion matrix, including the
    NULL-as-category and constant-rater edge cases."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        cohens_kappa,
    )

    rows = (
        [("x", "x")] * 20 + [("x", "y")] * 5
        + [("y", "x")] * 10 + [("y", "y")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n, o = 50, 35
    pe_num = 25 * 30 + 25 * 20  # na_x*nb_x + na_y*nb_y
    assert (r["n"], r["n_agree"]) == (n, o)
    assert r["kappa_num"] == n * o - pe_num
    assert r["kappa_den"] == n * n - pe_num
    assert abs(r["kappa"] - (n * o - pe_num) / (n * n - pe_num)) < 1e-12
    # two NULLs agree (null-safe)
    df2 = spark.createDataFrame(
        [("x", "x"), (None, None), (None, "x")], "a string, b string"
    )
    r2 = cohens_kappa(df2, "a", "b").collect()[0]
    assert r2["n_agree"] == 2
    # constant raters in full agreement: den == 0 -> NULL kappa
    df3 = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    assert cohens_kappa(df3, "a", "b").collect()[0]["kappa"] is None


def test_expected_calibration_error_exact(spark):
    """ECE against a hand computation: two bins, known rates."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        expected_calibration_error,
    )

    # scores on a 0-100 integer scale, bin width 50: bin 0 mid=25,
    # bin 1 mid=75 (on scale 100)
    rows = [(10, 1)] * 3 + [(10, 0)] * 7 + [(60, 1)] * 8 + [(60, 0)] * 2
    df = spark.createDataFrame(rows, "s int, y int")
    r = expected_calibration_error(df, "s", "y", bin_width=50, score_scale=100).collect()[0]
    # bin0: |2*100*3 - 10*(0+50)| = |600-500| = 100
    # bin1: |2*100*8 - 10*(100+50)| = |1600-1500| = 100
    assert (r["n"], r["ece_num"], r["ece_den"]) == (20, 200, 4000)
    assert abs(r["ece"] - 0.05) < 1e-12
    import pytest

    with pytest.raises(ValueError, match="positive"):
        expected_calibration_error(df, "s", "y", 0, 100)


def test_diff_in_diff_exact_cells(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        diff_in_diff,
    )

    rows = spark.createDataFrame(
        [
            (True, False, 10), (True, False, 20),   # treated pre: mean 15
            (True, True, 40),                       # treated post: mean 40
            (False, False, 5),                      # control pre: mean 5
            (False, True, 10), (False, True, 20),   # control post: mean 15
        ],
        "tr boolean, po boolean, v long",
    )
    r = diff_in_diff(rows, F.col("tr"), F.col("po"), "v").collect()[0]
    assert (r.s_t_pre, r.n_t_pre) == (30, 2)
    assert (r.s_c_post, r.n_c_post) == (30, 2)
    # DiD = (40 - 15) - (15 - 5) = 15
    assert abs(r.did - 15.0) < 1e-12


def test_diff_in_diff_null_on_empty_cell(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        diff_in_diff,
    )

    rows = spark.createDataFrame(
        [(True, True, 1), (False, False, 2), (False, True, 3)],
        "tr boolean, po boolean, v long",
    )
    r = diff_in_diff(rows, F.col("tr"), F.col("po"), "v").collect()[0]
    assert r.n_t_pre == 0 and r.mean_t_pre is None and r.did is None


def _pava(ns, ps):
    # classic sequential pool-adjacent-violators on (n, pos) bins,
    # tracking how many bins each pool spans for the expansion
    fitted = []
    pools = []
    for n, p in zip(ns, ps):
        pools.append([n, p, 1])
        while len(pools) > 1 and (
            pools[-2][1] * pools[-1][0] >= pools[-1][1] * pools[-2][0]
        ):
            n2, p2, c2 = pools.pop()
            pools[-1][0] += n2
            pools[-1][1] += p2
            pools[-1][2] += c2
    for n, p, c in pools:
        fitted += [p / n] * c
    return fitted


def test_isotonic_calibration_matches_sequential_pava(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        isotonic_calibration,
    )

    # rates 0.5, 0.2, 0.8, 0.4, 0.9 — two violator pools to merge
    bins = [(1, 10, 5), (2, 10, 2), (3, 10, 8), (4, 10, 4), (5, 10, 9)]
    df = spark.createDataFrame(bins, "bin long, n long, pos long")
    got = {r.bin: r.fitted for r in
           isotonic_calibration(df, "bin", "n", "pos").collect()}
    want = _pava([b[1] for b in bins], [b[2] for b in bins])
    for i, b in enumerate(bins):
        assert abs(got[b[0]] - want[i]) < 1e-12
    # monotone non-decreasing
    seq = [got[b[0]] for b in bins]
    assert all(a <= b + 1e-12 for a, b in zip(seq, seq[1:]))


def test_conformal_threshold_exact_rank(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        conformal_threshold,
    )

    # group g: scores 1..9 -> n=9, k=ceil(0.9*10)=9 -> threshold 9
    # group h: scores [5,5,7] -> n=3, k=ceil(0.9*4)=4 > n -> NULL
    rows = [("g", s) for s in range(1, 10)] + [("h", 5), ("h", 5), ("h", 7)]
    df = spark.createDataFrame(rows, "grp string, s long")
    out = {r.grp: (r.n, r.k, r.threshold) for r in
           conformal_threshold(df, ["grp"], "s", 1, 10).collect()}
    assert out["g"] == (9, 9, 9)
    assert out["h"] == (3, 4, None)
    # alpha = 1/2 -> k = ceil(5) = 5 -> median-ish pick
    out2 = {r.grp: r.threshold for r in
            conformal_threshold(df, ["grp"], "s", 1, 2).collect()}
    assert out2["g"] == 5 and out2["h"] == 5


def test_caliper_matched_att_hand_example(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        caliper_matched_att,
    )

    # treated t1 score 10 -> nearest control c2 (score 12, |d|=2);
    # treated t2 score 100 -> no control within caliper 5 -> unmatched
    rows = [
        (1, 1, 10, 50),
        (2, 1, 100, 99),
        (3, 0, 12, 30),
        (4, 0, 4, 10),
    ]
    df = spark.createDataFrame(rows, "key long, treat int, score long, y long")
    r = caliper_matched_att(df, "key", "treat", "score", "y", caliper=5).collect()[0]
    assert (r["n_treated"], r["n_matched"]) == (2, 1)
    assert r["att"] == 20.0  # 50 - 30


def test_caliper_matched_att_tie_breaks_on_key(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        caliper_matched_att,
    )

    # two controls equidistant (scores 8 and 12 from 10): key 3 wins
    rows = [(1, 1, 10, 100), (3, 0, 8, 70), (4, 0, 12, 10)]
    df = spark.createDataFrame(rows, "key long, treat int, score long, y long")
    r = caliper_matched_att(df, "key", "treat", "score", "y", caliper=5).collect()[0]
    assert r["att"] == 30.0  # matched to key 3 (y=70)


def test_caliper_matched_att_no_matches(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        caliper_matched_att,
    )

    rows = [(1, 1, 0, 5), (2, 0, 1000, 7)]
    df = spark.createDataFrame(rows, "key long, treat int, score long, y long")
    r = caliper_matched_att(df, "key", "treat", "score", "y", caliper=5).collect()[0]
    assert (r["n_treated"], r["n_matched"], r["att"]) == (1, 0, None)


def test_caliper_matched_att_negative_scores(spark):
    from amazon_personalize_connectors_spark.operators.evaluation import (
        caliper_matched_att,
    )

    # negative scores exercise the floor-division bucketing
    rows = [(1, 1, -7, 40), (2, 0, -9, 15), (3, 0, 50, 0)]
    df = spark.createDataFrame(rows, "key long, treat int, score long, y long")
    r = caliper_matched_att(df, "key", "treat", "score", "y", caliper=5).collect()[0]
    assert (r["n_matched"], r["att"]) == (1, 25.0)


def test_ztest_empty_arm_yields_nulls_not_zero_division(spark):
    # degenerate-input guard (same class as the Mann-Whitney variance
    # bug): an empty arm has no rate — NULL rate/diff/z, never ANSI 0/0
    from pyspark.sql import functions as F

    from amazon_personalize_connectors_spark.operators.evaluation import (
        two_proportion_ztest,
    )

    df = spark.createDataFrame([("g", 1)] * 4, "g string, label int")
    r = two_proportion_ztest(
        df, F.col("g") == "g", F.col("g") == "never", "label"
    ).collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 0)
    assert r["rate_a"] == 1.0
    assert r["rate_b"] is None and r["diff"] is None and r["z"] is None


def test_isotonic_matches_sequential_pava_reference(spark):
    """The closed form (max-min over interval averages) must equal
    classic sequential pool-adjacent-violators on weighted bins —
    property-checked against a pure-Python PAVA."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.evaluation import (
        isotonic_calibration,
    )

    def pava_per_bin(ns, ps):
        pools = []  # [n, pos, n_bins]
        for n, p in zip(ns, ps):
            pools.append([n, p, 1])
            while len(pools) > 1 and (
                pools[-2][1] * pools[-1][0] >= pools[-1][1] * pools[-2][0]
            ):
                b = pools.pop()
                pools[-1][0] += b[0]
                pools[-1][1] += b[1]
                pools[-1][2] += b[2]
        out = []
        for n, p, c in pools:
            out.extend([p / n] * c)
        return out

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=20),  # n per bin
                st.integers(min_value=0, max_value=20),  # pos <= n enforced
            ),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=8, deadline=None)
    def check(bins):
        ns = [n for n, _ in bins]
        ps = [min(p, n) for n, p in bins]
        df = spark.createDataFrame(
            [(i, ns[i], ps[i]) for i in range(len(bins))],
            "bin int, n long, pos long",
        )
        got = {
            r["bin"]: r["fitted"]
            for r in isotonic_calibration(df, "bin", "n", "pos").collect()
        }
        want = pava_per_bin(ns, ps)
        assert len(got) == len(want)
        for i, w in enumerate(want):
            assert abs(got[i] - w) < 1e-9, (ns, ps, got, want)
        # monotone non-decreasing
        vals = [got[i] for i in range(len(want))]
        assert all(vals[i] <= vals[i + 1] + 1e-12 for i in range(len(vals) - 1))

    check()
