"""Generated-doc freshness gates (VERDICT r10 item 3): QUERIES.md is
generated from query docstrings; a docstring change that skips
regeneration must fail the suite, exactly as PLANS.md invariants
already do. (The r10 post-gate simhash docstring change left
QUERIES.md row 213 stale for a full round — this pins the class.)"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_current():
    spec = importlib.util.spec_from_file_location(
        "gen_queries_md", os.path.join(REPO, "tools", "gen_queries_md.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(REPO, "QUERIES.md")) as f:
        committed = f.read()
    assert committed == mod.render(), (
        "QUERIES.md is stale vs the query docstrings — regenerate with "
        "`python tools/gen_queries_md.py`"
    )
