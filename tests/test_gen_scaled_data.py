"""tools/gen_scaled_data.py invariants (VERDICT r10 item 5): the
locally generated sf1 point is only evidence if replication preserves
the driver data's workload shape — linear key growth with constant
per-key group sizes, near-dup structure that scales linearly (no
cross-copy K-cliques), and embedding geometry preserved within a copy
but decorrelated across copies."""

import importlib.util
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "gen_scaled_data", os.path.join(REPO, "tools", "gen_scaled_data.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _jaccard(a: str, b: str) -> float:
    sa, sb = set(a.split(" ")), set(b.split(" "))
    return len(sa & sb) / len(sa | sb)


def test_salt_text_is_content_keyed_not_positional():
    """Within-copy near-dup structure must survive salting: two docs
    sharing tokens substitute them IDENTICALLY regardless of position,
    so their Jaccard is unchanged; across copies the salted halves
    diverge and Jaccard drops to ~1/3."""
    m = _mod()
    a = "spark sort value filter group window hash batch scan column"
    b = "spark sort value filter group window hash batch scan order"  # 1 token edit
    j0 = _jaccard(a, b)
    a1, b1 = m._salt_text(a, 1), m._salt_text(b, 1)
    assert abs(_jaccard(a1, b1) - j0) < 1e-9  # within-copy preserved
    a2 = m._salt_text(a, 2)
    assert _jaccard(a1, a2) < 0.3  # cross-copy well below thresholds
    assert m._salt_text(a, 1) == a1  # deterministic


def test_rotation_is_orthogonal_and_seeded():
    m = _mod()
    q = m._rotation(64, 3)
    assert np.allclose(q @ q.T, np.eye(64), atol=1e-4)
    assert np.allclose(q, m._rotation(64, 3))
    assert not np.allclose(q, m._rotation(64, 4))


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.1"), reason="driver testdata absent"
)
def test_copy_table_embeddings_geometry(tmp_path):
    """Copy c>0: vec_ids shift by c*stride, norms are preserved (the
    rotation is orthogonal), and a vector decorrelates from its own
    copy — no cosine K-cliques across copies."""
    m = _mod()
    for c in (0, 2):
        m.copy_table("embeddings", c, str(tmp_path))
    base = pq.read_table(f"{tmp_path}/part-000.parquet")
    copy = pq.read_table(f"{tmp_path}/part-002.parquet")
    ids0 = base.column("vec_id").to_numpy()
    ids2 = copy.column("vec_id").to_numpy()
    assert (ids2 - ids0 == 2 * 2000).all()
    v0 = np.asarray(base.column("embedding").to_pylist(), dtype=np.float64)
    v2 = np.asarray(copy.column("embedding").to_pylist(), dtype=np.float64)
    assert np.allclose(
        np.linalg.norm(v0, axis=1), np.linalg.norm(v2, axis=1), rtol=1e-4
    )
    cos = (v0 * v2).sum(1) / (
        np.linalg.norm(v0, axis=1) * np.linalg.norm(v2, axis=1)
    )
    assert np.abs(cos).mean() < 0.3  # decorrelated, not a clique
    assert (base.column("label").to_numpy() == copy.column("label").to_numpy()).all()


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.1"), reason="driver testdata absent"
)
def test_copy_table_documents_consistency(tmp_path):
    m = _mod()
    for c in (0, 1):
        m.copy_table("documents", c, str(tmp_path))
    base = pq.read_table(f"{tmp_path}/part-000.parquet")
    copy = pq.read_table(f"{tmp_path}/part-001.parquet")
    texts0 = base.column("text").to_pylist()
    texts1 = copy.column("text").to_pylist()
    nchars1 = copy.column("n_chars").to_pylist()
    assert all(len(t) == n for t, n in zip(texts1, nchars1))
    # EVERY doc, not a sample: the (token, copy)-keyed 3/4 salt must
    # leave no cross-copy near-dup CLIQUE anywhere (a token-global 50%
    # salt left whole vocab-halves of docs at J 0.75+ — hundreds of
    # pairs). Short-doc chance outliers are fine (full 45-pair audit:
    # 20 of 225k same-doc cross pairs ≥ 0.5, max 0.6) — the
    # regression signal is the COUNT, which must stay ~zero.
    js = [_jaccard(a, b) for a, b in zip(texts0, texts1)]
    high = [j for j in js if j >= 0.5]
    assert len(high) <= 5, f"cross-copy near-dup clique: {len(high)} pairs >= 0.5"
    assert max(js) <= 0.75
    ids0 = base.column("doc_id").to_numpy()
    ids1 = copy.column("doc_id").to_numpy()
    assert (ids1 - ids0 == 5000).all()


def test_scale_slope_merge_keeps_missing_sf_points():
    """SCALE_SLOPE.json merge (self-review r11): a re-run on a
    machine WITHOUT the optional sf1 data must extend the committed
    record, not erase its sf1 points — and exponents recompute from
    the merged series."""
    spec = importlib.util.spec_from_file_location(
        "scale_slope", os.path.join(REPO, "tools", "scale_slope.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    committed = {
        "q": {
            "sec": {"0.01": 1.0, "0.1": 2.0, "1": 20.0},
            "rows_out": {"0.01": 5, "0.1": 50, "1": 500},
            "exponent": {"0.01->0.1": 0.3, "0.1->1": 1.0},
        }
    }
    fresh = {"q": {"sec": {"0.01": 1.0, "0.1": 4.0}, "rows_out": {"0.01": 5, "0.1": 50}}}
    out = mod.merge_results(committed, fresh)["q"]
    assert out["sec"] == {"0.01": 1.0, "0.1": 4.0, "1": 20.0}  # sf1 kept
    assert out["rows_out"]["1"] == 500
    assert out["exponent"] == {"0.01->0.1": 0.6, "0.1->1": 0.7}


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.1"), reason="driver testdata absent"
)
def test_copy_table_preserves_name_key_bijection(tmp_path):
    """s_name/c_name embed the key and act as alternate keys (official
    TPC-H Q21 groups by s_name; the engine groups by suppkey and
    decorates — identical ONLY while the bijection holds). Verbatim
    copies broke it at sf1 and the two groupings diverged (r11 sweep
    finding); copies must rewrite the name from the shifted key."""
    m = _mod()
    for c in (0, 3):
        m.copy_table("supplier", c, str(tmp_path))
    base = pq.read_table(f"{tmp_path}/part-000.parquet")
    copy = pq.read_table(f"{tmp_path}/part-003.parquet")
    names0 = set(base.column("s_name").to_pylist())
    names3 = set(copy.column("s_name").to_pylist())
    assert not names0 & names3  # disjoint across copies
    keys3 = copy.column("s_suppkey").to_pylist()
    assert all(
        n == f"Supplier#{k:09d}"
        for n, k in zip(copy.column("s_name").to_pylist(), keys3)
    )
