#!/usr/bin/env python
"""Per-query plan fingerprints — the executable form-change gate.

VERDICT r11 item 2: the `_REVERIFY` policy (a query whose REGISTERED
FORM changes after its last driver-green row must re-enter the
verification window) was manual, and round 11 proved it missable in
the same round that invented it: commit b856482 changed
`matrix_profile_ssd`'s plan (a new int64 range guard) after
`revenue_matrix_profile`'s r7 driver row, and nothing forced a
ledger touch. This tool makes the detection executable:

* fingerprint(query) = sha256 of
    - the NORMALIZED analyzed logical plan at sf0.001 (expression
      ids `#123`, plan ids, and absolute paths stripped — those vary
      per session; the operator tree, literals, and schema do not), and
    - the query's `oracle_sql()` text (an oracle edit is equally a
      form change: the driver compares both sides).
  The analyzed plan is the right level: it captures changes made in
  OPERATOR code the query calls (the b856482 class), which
  source-hashing the query function would miss, while staying free
  of physical-planning noise (stats, AQE, codegen ids).

* `--write` computes all fingerprints and writes PLAN_FP.json
  (committed; regenerated whenever a form change is INTENTIONAL —
  in the same commit that records the `_REVERIFY` entry).

* `--check [names...]` recomputes and compares. A mismatch is an
  ERROR unless the query is exempt because its evidence debt is
  already tracked: listed in `_REVERIFY` with an ACTIVE entry (the
  drain rule in tools/rotate_window.py), listed in `_STAGED`, or
  never driver-verified at all. Exit 1 on any unexcused mismatch —
  this is what would have caught b856482.

tests/test_plan_fingerprints.py pins the cheap invariants (coverage,
file hygiene) in the default suite and runs the full recompute gate
when SPARK_GRAFT_FP_FULL=1 (it is part of the round-close checklist
next to the oracle sweeps; a full recompute builds 295 analyzed
plans and takes minutes, not seconds).

Streaming/stateful builders execute real micro-batches when called,
so fingerprinting ALSO exercises them; their plans are the final
returned DataFrame's, which is deterministic for the fixed sf0.001
fixture.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
FP_PATH = os.path.join(ROOT, "PLAN_FP.json")

# session-varying tokens to strip from the analyzed plan string:
#   #123              expression ids (monotonic per session)
#   plan_id=42        cached-plan ids
#   file:/... , /root/...   absolute input paths (location lists are
#                     truncated and reordered by the file index)
#   [N paths]         path-count renderings
#   cast hints with object addresses never appear in analyzed plans.
_NORMALIZERS = [
    (re.compile(r"#\d+"), "#"),
    # higher-order-function lambda variables are numbered by a
    # SESSION-GLOBAL counter (x_1, x_2, ... keep climbing as earlier
    # queries run), so the same plan built in a different order gets
    # different names
    (re.compile(r"\blambda ([xyz])_\d+"), r"lambda \1_"),
    (re.compile(r"\b([xyz])_\d+#"), r"\1_#"),
    # per-session temp-view counter in the streaming result reader
    (re.compile(r"\bapc_stream_result_\d+"), "apc_stream_result_"),
    (re.compile(r"plan_id=\d+"), "plan_id="),
    (re.compile(r"(?:file:)?/[^,\s\]\)]*"), "<path>"),
    (re.compile(r"\.\.\. \d+ more fields"), "<more>"),
    (re.compile(r"\[\d+ paths\]"), "<paths>"),
]


def normalize_plan(plan: str) -> str:
    for pat, rep in _NORMALIZERS:
        plan = pat.sub(rep, plan)
    return plan


def fingerprint(df, sql: str | None) -> str:
    plan = df._jdf.queryExecution().analyzed().toString()
    h = hashlib.sha256()
    h.update(normalize_plan(plan).encode())
    h.update(b"\x00")
    h.update((sql or "<rows-only>").encode())
    return h.hexdigest()[:16]


def compute(names=None) -> dict[str, str]:
    from amazon_personalize_connectors_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("plan-fingerprints", cores=4, shuffle_partitions=4)
    qs = e.queries()
    sqls = e.oracle_sql()
    out: dict[str, str] = {}
    for i, (name, fn) in enumerate(qs.items()):
        if names and name not in names:
            continue
        try:
            out[name] = fingerprint(fn(spark, SF_DIR), sqls.get(name))
        except Exception as exc:  # noqa: BLE001 — a broken builder IS a form change
            out[name] = f"ERR:{type(exc).__name__}"
        print(f"[{len(out):3d}] {name} {out[name]}", file=sys.stderr)
    return out


def exempt_set() -> set[str]:
    """Queries whose fingerprint may legitimately differ from the
    committed file: evidence debt already tracked elsewhere."""
    from rotate_window import active_reverify, classify

    import __spark_entry__ as e

    names, latest = classify(ROOT)
    active = active_reverify(latest, getattr(e, "_REVERIFY", {}))
    staged = set(getattr(e, "_STAGED", []))
    never = {n for n in names if n not in latest}
    return active | staged | never


def compare(
    got: dict[str, str], committed: dict[str, str], exempt: set[str]
) -> tuple[list[str], list[str]]:
    """Pure gate logic: (unexcused mismatches, reverify-tracked ones).
    A query absent from the committed file counts as a mismatch too —
    a new registration must ship its fingerprint in the same commit
    (it is exempt only while never-driver-verified, which
    exempt_set() already grants)."""
    bad, excused = [], []
    for name, fp in got.items():
        want = committed.get(name)
        if fp == want:
            continue
        (excused if name in exempt else bad).append(
            f"{name}: committed={want} recomputed={fp}"
        )
    return bad, excused


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if args.write == args.check:
        ap.error("exactly one of --write / --check")
    names = set(args.names) or None
    got = compute(names)
    if args.write:
        committed = {}
        if names and os.path.exists(FP_PATH):
            committed = json.load(open(FP_PATH))
        committed.update(got)
        with open(FP_PATH, "w") as f:
            json.dump(dict(sorted(committed.items())), f, indent=1)
        print(f"wrote {len(committed)} fingerprints -> {FP_PATH}")
        return
    committed = json.load(open(FP_PATH))
    bad, excused = compare(got, committed, exempt_set())
    for line in excused:
        print(f"[reverify-tracked] {line}")
    if bad:
        print(
            f"\n{len(bad)} FORM CHANGE(S) WITHOUT A _REVERIFY/_STAGED "
            "ENTRY (VERDICT r11 item 2 gate):"
        )
        for line in bad:
            print(f"  {line}")
        print(
            "\nEither revert the plan change, or record it: add the "
            "query to __spark_entry__._REVERIFY (form-change round = "
            "current round - 1) and re-run `tools/plan_fingerprints.py "
            "--write` in the SAME commit."
        )
        sys.exit(1)
    print(f"OK: {len(got)} fingerprints match ({len(excused)} reverify-tracked)")


if __name__ == "__main__":
    main()
