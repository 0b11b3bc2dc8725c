#!/usr/bin/env python
"""Plan the next round's 50-query driver verification window.

The driver oracle-checks only the FIRST 50 entries of
``__spark_entry__.queries()`` (dict order). This tool reads every
CORRECTNESS_r*.json in the repo root, classifies each query by its
latest driver evidence, and prints a recommended window for the next
round, prioritized:

1. queries whose latest driver row is RED (regressions — must re-enter)
2. queries never driver-verified (new operators)
3. queries whose green row is oldest (stalest evidence first)

plus a handful of §2 sentinels that should stay in every window.
Apply the plan by reordering the queries() dict (keep entries outside
the window in any order) and update VERIFIED.md.

Usage: python tools/rotate_window.py [--window 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTINELS = ["flagship_related_flat", "attribution_join", "delta_except"]


def classify(repo_root: str):
    import __spark_entry__ as e

    names = list(e.queries().keys())
    rounds = sorted(
        glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    latest: dict[str, tuple[int, str]] = {}  # name -> (round, 'green'|'red')
    for path in rounds:
        rnum = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        data = json.load(open(path))
        for name, row in data.items():
            if name not in names or row is None:
                continue
            if row.get("err") == "no_oracle":
                # rows-only by design (e.g. hll_user_rollup,
                # multimodal_decode): a driver row IS the weaker check
                # passing — do not burn a red-priority slot on it
                latest[name] = (rnum, "rows-only")
            elif row.get("err"):
                latest[name] = (rnum, "red")
            elif row.get("rows_match") and row.get("hash_match") in (True, None):
                latest[name] = (rnum, "green")
            else:
                latest[name] = (rnum, "red")
    return names, latest


def plan(names, latest, window: int):
    red = [n for n in names if latest.get(n, (0, ""))[1] == "red"]
    never = [n for n in names if n not in latest]
    greens = sorted(
        (n for n in names if latest.get(n, (0, ""))[1] in ("green", "rows-only")),
        key=lambda n: latest[n][0],  # oldest evidence first
    )
    chosen: list[str] = []
    for pool in ([s for s in SENTINELS if s in names], red, never, greens):
        for n in pool:
            if n not in chosen and len(chosen) < window:
                chosen.append(n)
    return chosen


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names, latest = classify(repo_root)
    chosen = plan(names, latest, args.window)
    print(f"# proposed window ({len(chosen)} of {len(names)} queries)")
    for n in chosen:
        rnum, state = latest.get(n, (None, "never"))
        tag = f"r{rnum}:{state}" if rnum else "never-verified"
        print(f"{n:40s} {tag}")
    outside = [n for n in names if n not in chosen]
    stale = [n for n in outside if n not in latest]
    if stale:
        print(f"\n# WARNING: {len(stale)} never-verified queries did NOT fit:")
        for n in stale:
            print(f"  {n}")


if __name__ == "__main__":
    main()
