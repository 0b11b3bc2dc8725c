"""Bench-harness contract guards (no Spark session): the bench's
coverage promises are pinned so a registry edit can't silently break
the driver's BENCH_r{N} accounting."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_names_resolve_and_dont_overlap():
    b = _bench()
    qs = entry.queries()
    groups = {
        "HEADLINE_20": b.HEADLINE_20,
        "BENCH_QUERIES": b.BENCH_QUERIES,
        "HEAVY_ONE_RUN": b.HEAVY_ONE_RUN,
        "STREAM_ONE_RUN": b.STREAM_ONE_RUN,
        "ANN_SERVE_SPLIT_BENCHED": b.ANN_SERVE_SPLIT_BENCHED,
    }
    for gname, names in groups.items():
        missing = [n for n in names if n not in qs]
        assert not missing, f"{gname} names not in registry: {missing}"
    # one timing discipline per query: the three suite groups disjoint
    bq, heavy, stream = (
        set(b.BENCH_QUERIES), set(b.HEAVY_ONE_RUN), set(b.STREAM_ONE_RUN),
    )
    assert not (bq & heavy) and not (bq & stream) and not (heavy & stream)
    assert set(b.HEADLINE_20) <= bq  # headline rows get suite medians too


def test_serve_split_queries_keep_oracle_rows():
    """VERDICT r9 item 3's 'unchanged oracle rows' promise: moving the
    ANN serving family's PERF accounting to the serve split must not
    remove their correctness surface — each stays a full queries() +
    oracle_sql() entry, and none is quietly re-benched in-plan."""
    b = _bench()
    oracles = entry.oracle_sql()
    benched = set(b.BENCH_QUERIES) | set(b.HEAVY_ONE_RUN) | set(b.STREAM_ONE_RUN)
    for name in b.ANN_SERVE_SPLIT_BENCHED:
        assert name in entry.queries(), name
        assert name in oracles, f"{name} lost its oracle row"
        assert name not in benched, f"{name} double-benched in-plan"
