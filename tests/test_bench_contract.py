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


def test_bench_coverage_is_total():
    """VERDICT r11 item 5: benched ∪ excluded must equal the registry
    EXACTLY — a new query that is neither timed nor explicitly listed
    as excluded-by-design fails here instead of silently vanishing
    from the round's perf accounting."""
    b = _bench()
    qs = set(entry.queries())
    benched = (
        set(b.BENCH_QUERIES)
        | set(b.HEAVY_ONE_RUN)
        | set(b.STREAM_ONE_RUN)
        | set(b.ANN_SERVE_SPLIT_BENCHED)
    )
    excluded = set(b.BENCH_EXCLUDED)
    overlap = benched & excluded
    assert not overlap, f"queries both benched and excluded: {sorted(overlap)}"
    uncovered = qs - (benched | excluded)
    orphans = (benched | excluded) - qs
    assert not uncovered, (
        f"queries neither benched nor in BENCH_EXCLUDED: {sorted(uncovered)}"
    )
    assert not orphans, f"bench lists name retired/unknown queries: {sorted(orphans)}"


def test_sf1_scale_gate_current_and_clean():
    """VERDICT r11 item 4: the sf1 sweep is a STANDING gate, not a
    one-off. SCALE_GATE.json must exist, cover the headline + heavy
    family, carry zero errors, and belong to the current round — a
    round that closes without re-running `tools/sf1_gate.py` reddens
    here the moment the next round's CORRECTNESS file lands (same
    deferred-enforcement shape as the evidence-rotation invariant)."""
    import glob
    import json
    import re

    path = os.path.join(REPO, "SCALE_GATE.json")
    assert os.path.exists(path), (
        "SCALE_GATE.json missing — run `python tools/sf1_gate.py`"
    )
    gate = json.load(open(path))
    assert not gate["errors"], f"sf1 gate errors: {gate['errors']}"
    b = _bench()
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "sf1_gate", os.path.join(REPO, "tools", "sf1_gate.py")
    )
    sf1 = _ilu.module_from_spec(spec)
    spec.loader.exec_module(sf1)
    want = (
        set(b.HEADLINE_20)
        | set(b.HEAVY_ONE_RUN)
        | set(sf1.STREAM_FOLD_GATED)  # r13: stream-fold family gated too
    )
    covered = set(gate["queries"])
    missing = want - covered
    assert not missing, f"sf1 gate missing headline/heavy/stream rows: {sorted(missing)}"
    latest = max(
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    assert gate["round"] >= latest, (
        f"SCALE_GATE.json is from round {gate['round']} but the ledger "
        f"reaches r{latest} — re-run tools/sf1_gate.py for this round"
    )


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
