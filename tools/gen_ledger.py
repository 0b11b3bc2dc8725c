#!/usr/bin/env python
"""Regenerate the `## Ledger` table in VERIFIED.md from the
CORRECTNESS_r*.json files and the current queries() window.

The table is mechanical state (query -> latest driver evidence ->
current-window membership); the prose sections above it stay
hand-written. Run after every window rotation or query addition:

    python tools/gen_ledger.py
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from rotate_window import classify  # noqa: E402


def main() -> None:
    import re

    import __spark_entry__ as e

    names, latest = classify(ROOT)
    window = set(list(e.queries())[:50])
    # label the window column by the round AFTER the latest recorded
    # correctness file (the window is what the NEXT driver run checks)
    import glob

    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    ]
    nxt = (max(rounds) + 1) if rounds else 1
    lines = [
        "## Ledger",
        "",
        f"| query | last driver evidence | r{nxt} window |",
        "|---|---|---|",
    ]
    for n in names:
        ev = f"r{latest[n][0]}:{latest[n][1]}" if n in latest else "never"
        mark = f"r{nxt}-window" if n in window else ""
        lines.append(f"| {n} | {ev} | {mark} |")
    table = "\n".join(lines) + "\n"

    path = os.path.join(ROOT, "VERIFIED.md")
    s = open(path).read()
    idx = s.find("## Ledger")
    if idx == -1:
        s = s.rstrip() + "\n\n" + table
    else:
        s = s[:idx] + table
    open(path, "w").write(s)
    print(f"ledger: {len(names)} rows, {len(window)} in the r{nxt} window")


if __name__ == "__main__":
    main()
