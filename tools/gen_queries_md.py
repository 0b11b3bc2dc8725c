#!/usr/bin/env python
"""Regenerate QUERIES.md from the query docstrings in __spark_entry__.

Usage: python tools/gen_queries_md.py            (writes QUERIES.md)
       python tools/gen_queries_md.py --check    (exit 1 if stale)

``--check`` renders in memory and diffs against the committed file.
The pytest gate (tests/test_docs_freshness.py) does the same compare
via ``render()`` directly, so a query docstring change that skips
regeneration fails the suite, exactly as the PLANS.md invariants
already do (VERDICT r10 item 3); ``--check`` is the CLI convenience
for pre-commit use.
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


def render() -> str:
    qs = e.queries()
    oracles = e.oracle_sql()
    rows = []
    for i, name in enumerate(sorted(qs), 1):
        doc = " ".join((inspect.getdoc(qs[name]) or "").split())
        if len(doc) > 155:
            doc = doc[:152] + "..."
        kind = "hash" if name in oracles else "rows-only"
        rows.append(f"| {i} | `{name}` | {kind} | {doc} |")
    return HEADER + "\n".join(rows) + "\n"


def main() -> None:
    text = render()
    out = os.path.join(ROOT, "QUERIES.md")
    if "--check" in sys.argv[1:]:
        with open(out) as f:
            committed = f.read()
        if committed != text:
            sys.exit(
                "QUERIES.md is stale vs the query docstrings — "
                "regenerate with `python tools/gen_queries_md.py`"
            )
        print("QUERIES.md current")
        return
    n = text.count("\n| ") - 1  # minus the table-header row
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out}: {n} queries")


if __name__ == "__main__":
    main()
