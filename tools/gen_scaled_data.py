#!/usr/bin/env python
"""Generate a larger scale factor by replicating /root/testdata/sf0.1
with shifted keys — for scale-slope evidence beyond the driver's SFs
(VERDICT r10 item 5: one more decade turns the 100x extrapolation
into an interpolation).

Why replication is the right scaling model here: the driver's own
SFs scale linearly in key count with CONSTANT per-key group sizes
(orders/customer = 10, lineitem/order = 4, events/user ≈ 67 at every
SF), so K key-shifted copies reproduce exactly that — K× keys, same
join fan-outs, same value distributions. Two tables need more than a
key shift to avoid DISTORTING their workloads:

* documents — verbatim copies would make every doc a K-clique of
  exact dups, exploding near-dup pair counts quadratically in K.
  Copy c>0 salts each token with an ``x{c}`` suffix when
  ``md5(token|c)`` lands in a 3/4 band: content-keyed (not
  positional), so WITHIN a copy two near-dup docs substitute
  identically and their Jaccard is unchanged — and keyed on the
  (token, copy) PAIR at 3/4 density, so the cross-copy expected
  Jaccard is ~1/31 and outliers are impossible in practice (a
  token-global 50% salt left docs drawn from the unsalted half of
  the small vocab at J up to 0.75+ — cross-copy near-dup cliques).
  Dup structure therefore scales linearly, like a real corpus.
* embeddings — verbatim copies would make every vector a K-clique
  in cosine space. Copy c>0 applies a seeded random ORTHOGONAL
  rotation: intra-copy geometry (norms, cosines, label-cluster
  shape) is exactly preserved, cross-copy similarity decorrelates.

region/nation stay fixed (the driver holds them at 5/25 across SFs).

Each output table is a DIRECTORY ``<name>.parquet/part-<c>.parquet``
(one file per copy — Spark reads it identically to a single file and
memory stays bounded while generating).

Usage: python tools/gen_scaled_data.py [--copies 10] [--out DIR]
Default: 10 copies of sf0.1 -> .localdata/sf1 (a clean 10x decade,
so tools/scale_slope.py's per-decade exponent formula stays exact).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# key stride per table = its sf0.1 cardinality (keys are 0-based
# contiguous, verified before writing this)
STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
FIXED = ["region", "nation"]


def _salt_token(tok: str, c: int) -> bool:
    return hashlib.md5(f"{tok}|{c}".encode()).digest()[0] % 4 != 0


def _salt_text(text: str, c: int) -> str:
    return " ".join(
        f"{t}x{c}" if _salt_token(t, c) else t for t in text.split(" ")
    )


def _rotation(dim: int, c: int) -> np.ndarray:
    rng = np.random.default_rng(42_000 + c)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return (q * np.sign(np.diag(r))).astype(np.float32)


def copy_table(name: str, c: int, out_dir: str) -> None:
    tbl = pq.read_table(f"{SRC}/{name}.parquet")
    cols = {col: tbl.column(col) for col in tbl.column_names}
    for key, stride in STRIDES[name].items():
        arr = cols[key].to_numpy()
        cols[key] = pa.array(arr + c * stride, type=tbl.schema.field(key).type)
    # preserve the TPC-H name<->key BIJECTION: s_name/c_name embed the
    # key ("Supplier#%09d"), and queries legitimately treat the name
    # as an alternate key (official Q21 groups by s_name; the engine
    # side groups by suppkey and decorates). Verbatim-copied names
    # made 10 keys share one name at sf1 and the two groupings
    # diverged — a generator artifact, not an engine bug (found by
    # the r11 sf1 correctness sweep). p_name is NON-unique in the
    # driver data (64 values / 20k parts) and stays verbatim.
    if name == "supplier" and c > 0:
        cols["s_name"] = pa.array(
            [f"Supplier#{k:09d}" for k in cols["s_suppkey"].to_pylist()],
            type=pa.string(),
        )
    if name == "customer" and c > 0:
        cols["c_name"] = pa.array(
            [f"Customer#{k:09d}" for k in cols["c_custkey"].to_pylist()],
            type=pa.string(),
        )
    if name == "documents" and c > 0:
        texts = [_salt_text(t, c) for t in cols["text"].to_pylist()]
        cols["text"] = pa.array(texts, type=pa.string())
        cols["n_chars"] = pa.array(
            [len(t) for t in texts], type=tbl.schema.field("n_chars").type
        )
    if name == "embeddings" and c > 0:
        mat = np.asarray(cols["embedding"].to_pylist(), dtype=np.float32)
        rot = mat @ _rotation(mat.shape[1], c)
        cols["embedding"] = pa.array(
            [row.tolist() for row in rot], type=tbl.schema.field("embedding").type
        )
    out = pa.table(cols)
    pq.write_table(out, os.path.join(out_dir, f"part-{c:03d}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata",
            "sf1",
        ),
    )
    args = ap.parse_args()
    if os.path.basename(args.out.rstrip("/")) == "sf1" and args.copies != 10:
        raise SystemExit(
            f"--copies {args.copies} into an 'sf1'-named dir would corrupt "
            "tools/scale_slope.py's per-decade exponent math (it labels that "
            "dir SF=1, a full 10x step from sf0.1) — pass --out with an "
            "honest name or use --copies 10"
        )
    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    os.makedirs(args.out)
    for name in FIXED:
        shutil.copy(f"{SRC}/{name}.parquet", f"{args.out}/{name}.parquet")
    for name in STRIDES:
        d = os.path.join(args.out, f"{name}.parquet")
        os.makedirs(d)
        for c in range(args.copies):
            copy_table(name, c, d)
        print(f"{name}: {args.copies} copies -> {d}", flush=True)
    print(f"done: {args.out}")


if __name__ == "__main__":
    main()
