"""CDC snapshot diff / apply round-trip and deletion-neighborhood
edit-distance join."""

import pytest

from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.functions.fuzzy import (
    deletion_variants,
    editdist_self_join,
)
from amazon_personalize_connectors_spark.operators.cdc import (
    apply_changes,
    snapshot_diff,
)


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", None)],
        "k int, name string, v int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c2", 30), (4, "d", None), (5, "e", 50)],
        "k int, name string, v int",
    )
    return old, new


def test_snapshot_diff_ops(spark, snapshots):
    old, new = snapshots
    diff = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(diff) == {1, 3, 5}          # 2 and 4 unchanged (4 has null v)
    assert diff[1]["op"] == "delete" and diff[1]["name"] is None
    assert diff[3]["op"] == "update" and diff[3]["name"] == "c2"
    assert diff[5]["op"] == "insert" and diff[5]["v"] == 50


def test_cdc_roundtrip_identity(spark, snapshots):
    old, new = snapshots
    rolled = apply_changes(old, snapshot_diff(old, new, ["k"]), ["k"])
    got = sorted(map(tuple, rolled.collect()))
    want = sorted(map(tuple, new.collect()))
    assert got == want


def test_apply_changes_handles_delete_only_batch(spark, snapshots):
    old, _ = snapshots
    batch = spark.createDataFrame(
        [(1, "delete", None, None)], "k int, op string, name string, v int"
    )
    got = sorted(r["k"] for r in apply_changes(old, batch, ["k"]).collect())
    assert got == [2, 3, 4]


def test_apply_changes_null_op_is_upsert_not_silent_delete(spark, snapshots):
    # a malformed change row with NULL op must land as an upsert —
    # under a plain `op != 'delete'` filter NULL evaluates to NULL and
    # the key (already evicted by the anti-join) silently disappears
    old, _ = snapshots
    batch = spark.createDataFrame(
        [(2, None, "b2", 21)], "k int, op string, name string, v int"
    )
    got = {r["k"]: r for r in apply_changes(old, batch, ["k"]).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2]["name"] == "b2" and got[2]["v"] == 21


def test_deletion_variants(spark):
    row = spark.range(1).select(
        deletion_variants(F.lit("abc")).alias("v")
    ).collect()[0]
    assert sorted(row["v"]) == ["ab", "abc", "ac", "bc"]


def test_editdist_self_join_matches_bruteforce(spark):
    strings = [
        (1, "kitten"), (2, "sitten"), (3, "kitte"), (4, "kitten"),
        (5, "mitten"), (6, "flour"), (7, "flower"), (8, "flou"),
        (9, ""), (10, "a"),
    ]
    df = spark.createDataFrame(strings, "id int, s string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in editdist_self_join(df, "id", "s").collect()
    }
    # brute force oracle
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(strings, 2)
        if lev(a, b) <= 1
    }
    assert got == want and len(want) >= 5


def test_editdist_join_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "ac")], "id int, s string")
    plan = editdist_self_join(df, "id", "s")._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_editdist2_matches_bruteforce(spark):
    strings = [
        (1, "kitten"), (2, "sitting"), (3, "kiten"), (4, "mitten"),
        (5, "kitte"), (6, "kien"), (7, "abc"), (8, "adc"), (9, "xbc"),
        (10, "a"), (11, ""), (12, "ac"),
    ]
    df = spark.createDataFrame(strings, "id int, s string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in editdist_self_join(df, "id", "s", max_dist=2).collect()
    }
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(strings, 2)
        if lev(a, b) <= 2
    }
    assert got == want and any(d == 2 for _, _, d in want)


def test_retractable_rollup_merge_law_and_group_dropout(spark):
    from amazon_personalize_connectors_spark.operators.cdc import (
        retractable_rollup_merge,
    )

    old = spark.createDataFrame(
        # group A: keys 1,2 ; group B: key 3 (will be fully deleted)
        [(1, "A", 10), (2, "A", 20), (3, "B", 30)],
        "k long, g string, v long",
    )
    new = spark.createDataFrame(
        # key 1 updated, key 2 kept, key 3 deleted, key 4 inserted (C)
        [(1, "A", 15), (2, "A", 20), (4, "C", 7)],
        "k long, g string, v long",
    )
    base = old.groupBy("g").agg(
        F.sum("v").alias("sum_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    got = {
        r["g"]: (r["sum_v"], r["n_rows"])
        for r in retractable_rollup_merge(
            base, old, new, ["k"], "g", "v"
        ).collect()
    }
    # law: equals full recompute over new
    want = {
        r["g"]: (r["s"], r["n"])
        for r in new.groupBy("g")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert "B" not in got  # emptied group drops out, no zero row


def test_retractable_rollup_merge_hypothesis_law(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_personalize_connectors_spark.operators.cdc import (
        retractable_rollup_merge,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        st.dictionaries(  # old: key -> value
            st.integers(1, 12), st.integers(-50, 50), max_size=12
        ),
        st.dictionaries(  # new
            st.integers(1, 12), st.integers(-50, 50), max_size=12
        ),
    )
    def check(old_map, new_map):
        def frame(m):
            rows = [(k, k % 3, v) for k, v in m.items()] or [(99, 0, 0)]
            df = spark.createDataFrame(rows, "k long, g long, v long")
            return df if m else df.where(F.lit(False))

        old, new = frame(old_map), frame(new_map)
        base = old.groupBy("g").agg(
            F.sum("v").alias("sum_v"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        got = {
            r["g"]: (r["sum_v"], r["n_rows"])
            for r in retractable_rollup_merge(
                base, old, new, ["k"], "g", "v"
            ).collect()
        }
        want = {}
        for k, v in new_map.items():
            s, n = want.get(k % 3, (0, 0))
            want[k % 3] = (s + v, n + 1)
        assert got == want

    check()


def test_incremental_join_rollup_law(spark):
    from pyspark.sql import functions as F

    from amazon_personalize_connectors_spark.operators.cdc import (
        incremental_join_rollup,
    )

    # arbitrary 2-way partition of each side; groups that exist only
    # in a delta must appear in the merged rollup
    a_rows = [(k, f"g{k % 3}") for k in range(40)]
    b_rows = [(k % 25, (k * 13) % 97) for k in range(200)]
    a = spark.createDataFrame(a_rows, "ak long, grp string")
    b = spark.createDataFrame(b_rows, "bk long, v long")

    def rollup(aa, bb):
        return (
            aa.join(bb, F.col("ak") == F.col("bk"))
            .groupBy("grp")
            .agg(
                F.sum("v").alias("sum_v"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            )
        )

    full = {r["grp"]: (r["sum_v"], r["n_rows"]) for r in rollup(a, b).collect()}

    for a_pred, b_pred in [
        (F.col("ak") < 20, F.col("bk") < 10),   # both sides split
        (F.lit(True), F.col("bk") % 2 == 0),    # A all-base
        (F.lit(False), F.lit(False)),           # everything in delta
    ]:
        base_a, delta_a = a.where(a_pred), a.where(~a_pred)
        base_b, delta_b = b.where(b_pred), b.where(~b_pred)
        merged = incremental_join_rollup(
            rollup(base_a, base_b),
            base_a, delta_a, base_b, delta_b,
            a_key="ak", b_key="bk", group_col="grp", value_col="v",
        )
        got = {r["grp"]: (r["sum_v"], r["n_rows"]) for r in merged.collect()}
        assert got == full

    # empty deltas: merged == base rollup exactly
    empty_a, empty_b = a.where(F.lit(False)), b.where(F.lit(False))
    merged = incremental_join_rollup(
        rollup(a, b), a, empty_a, b, empty_b,
        a_key="ak", b_key="bk", group_col="grp", value_col="v",
    )
    got = {r["grp"]: (r["sum_v"], r["n_rows"]) for r in merged.collect()}
    assert got == full


def test_merge_upsert_equals_diff_then_apply(spark, snapshots):
    """The VERDICT law: merge with delete-by-source == full snapshot
    replacement == apply_changes(old, snapshot_diff(old, new))."""
    from amazon_personalize_connectors_spark.operators.cdc import (
        merge_upsert,
    )

    old, new = snapshots
    merged = merge_upsert(
        old, new, ["k"], when_not_matched_by_source="delete"
    )
    via_diff = apply_changes(old, snapshot_diff(old, new, ["k"]), ["k"])
    got = sorted(map(tuple, merged.select("k", "name", "v").collect()))
    assert got == sorted(map(tuple, via_diff.select("k", "name", "v").collect()))
    assert got == sorted(map(tuple, new.collect()))


def test_merge_upsert_clauses(spark, snapshots):
    from amazon_personalize_connectors_spark.operators.cdc import (
        merge_upsert,
    )

    old, new = snapshots
    # plain upsert: matched keys updated, source-only inserted,
    # target-only kept
    up = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(old, new, ["k"]).collect()
    }
    assert up[1] == ("a", 10)        # target-only kept
    assert up[3] == ("c2", 30)       # updated from source
    assert up[5] == ("e", 50)        # inserted
    # delete-when-matched removes intersecting keys, keeps the rest
    dl = merge_upsert(
        old, new, ["k"], when_matched="delete", when_not_matched="ignore"
    )
    assert sorted(r["k"] for r in dl.collect()) == [1]
    # conditional clause: only matched rows meeting the condition
    # update; others keep target values (SQL MERGE WHEN MATCHED AND)
    cond = merge_upsert(
        old, new, ["k"],
        matched_condition=F.col("_sv.name") == "c2",
        when_not_matched="ignore",
    )
    got = {r["k"]: (r["name"], r["v"]) for r in cond.collect()}
    assert got[3] == ("c2", 30) and got[2] == ("b", 20) and got[1] == ("a", 10)
    # invalid clause names fail loudly
    with pytest.raises(ValueError, match="when_matched"):
        merge_upsert(old, new, ["k"], when_matched="upsert")
