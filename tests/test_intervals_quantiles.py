"""interval_overlap_join + mergeable histogram quantiles."""

import math
import random

import pytest

from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.functions.sketches import (
    histogram_partials,
    histogram_quantiles,
)
from amazon_personalize_connectors_spark.operators.analytics import (
    interval_overlap_join,
)


def test_interval_overlap_matches_bruteforce(spark):
    rng = random.Random(7)
    lefts = [(i, rng.randrange(0, 500), 0) for i in range(80)]
    lefts = [(i, s, s + rng.randrange(1, 40)) for i, s, _ in lefts]
    rights = [(j, rng.randrange(0, 500), 0) for j in range(60)]
    rights = [(j, s, s + rng.randrange(1, 25)) for j, s, _ in rights]
    ldf = spark.createDataFrame(lefts, "lid int, ls long, le long")
    rdf = spark.createDataFrame(rights, "rid int, rs long, re long")
    got = {
        (r["l_id"], r["r_id"]): r["overlap_len"]
        for r in interval_overlap_join(
            ldf, rdf, ("lid", "ls", "le"), ("rid", "rs", "re"), bucket_width=16
        ).collect()
    }
    want = {}
    for i, ls, le in lefts:
        for j, rs, re in rights:
            ov = min(le, re) - max(ls, rs)
            if ov > 0:
                want[(i, j)] = ov
    assert got == want and len(want) > 50


@pytest.mark.parametrize("bucket_width", [1, 7, 1000])
def test_interval_overlap_bucket_width_invariant(spark, bucket_width):
    ldf = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 6), (3, 100, 200)], "lid int, ls long, le long"
    )
    rdf = spark.createDataFrame(
        [(10, 9, 12), (11, 0, 1), (12, 150, 151)], "rid int, rs long, re long"
    )
    got = sorted(
        (r["l_id"], r["r_id"], r["overlap_len"])
        for r in interval_overlap_join(
            ldf, rdf, ("lid", "ls", "le"), ("rid", "rs", "re"), bucket_width
        ).collect()
    )
    assert got == [(1, 10, 1), (1, 11, 1), (3, 12, 1)]


def test_histogram_quantiles_merge_and_definition(spark):
    rng = random.Random(13)
    rows = [(("a" if k % 3 else "b"), k % 10, float(rng.randrange(0, 1000)))
            for k in range(3000)]
    df = spark.createDataFrame(rows, "g string, sub int, v double")
    width = 25.0
    # partials at the FINER (g, sub) grain, merged up to g
    fine = histogram_partials(df, ["g", "sub"], "v", width)
    got = {
        (r["g"], r["q"]): r["value"]
        for r in histogram_quantiles(fine, ["g"], [0.5, 0.9, 0.99], width).collect()
    }
    # definition check in plain python: first bin whose cum count
    # reaches ceil(q * total), value = bin * width
    from collections import Counter, defaultdict

    bins = defaultdict(Counter)
    for g, _sub, v in rows:
        bins[g][math.floor(v / width)] += 1
    for g, counter in bins.items():
        total = sum(counter.values())
        for q in (0.5, 0.9, 0.99):
            need = math.ceil(q * total)
            cum = 0
            for b in sorted(counter):
                cum += counter[b]
                if cum >= need:
                    assert got[(g, q)] == b * width
                    break
    assert len(got) == 6


def test_weighted_histogram_quantiles(spark):
    """Weighted quantiles: bin mass = sum(weight). A value with weight
    w must behave exactly like w copies of that value."""
    rows = [("g", 10.0, 1), ("g", 20.0, 3), ("g", 30.0, 1)]
    weighted = spark.createDataFrame(rows, "g string, v double, w long")
    expanded = spark.createDataFrame(
        [("g", v) for g, v, w in rows for _ in range(w)], "g string, v double"
    )
    qs = [0.2, 0.5, 0.9]
    a = histogram_quantiles(
        histogram_partials(weighted, ["g"], "v", 10.0, weight_col="w"),
        ["g"], qs, 10.0,
    )
    b = histogram_quantiles(
        histogram_partials(expanded, ["g"], "v", 10.0), ["g"], qs, 10.0
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_interval_overlap_negative_coordinates(spark):
    ldf = spark.createDataFrame([(1, -25, -5)], "lid int, ls long, le long")
    rdf = spark.createDataFrame(
        [(10, -10, 3), (11, -100, -26)], "rid int, rs long, re long"
    )
    got = sorted(
        (r["l_id"], r["r_id"], r["overlap_len"])
        for r in interval_overlap_join(
            ldf, rdf, ("lid", "ls", "le"), ("rid", "rs", "re"), 16
        ).collect()
    )
    assert got == [(1, 10, 5)]
