#!/usr/bin/env python
"""Regenerate QUERIES.md from the query docstrings in __spark_entry__.

Usage: python tools/gen_queries_md.py  (writes QUERIES.md in repo root)
"""

import inspect
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as e  # noqa: E402

HEADER = """# Query catalog

Every `queries()` entry in `__spark_entry__.py`, its one-line intent, and
its correctness check (DuckDB value-hash oracle at sf0.01 unless noted).
Generated from the query docstrings — regenerate with
`python tools/gen_queries_md.py`.

| # | Query | Oracle | What it checks |
|---|---|---|---|
"""


def main() -> None:
    qs = e.queries()
    oracles = e.oracle_sql()
    rows = []
    for i, name in enumerate(sorted(qs), 1):
        doc = " ".join((inspect.getdoc(qs[name]) or "").split())
        if len(doc) > 155:
            doc = doc[:152] + "..."
        kind = "hash" if name in oracles else "rows-only"
        rows.append(f"| {i} | `{name}` | {kind} | {doc} |")
    out = os.path.join(ROOT, "QUERIES.md")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote {out}: {len(rows)} queries ({len(oracles)} oracle-checked)")


if __name__ == "__main__":
    main()
