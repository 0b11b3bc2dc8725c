#!/usr/bin/env python
"""ANN index family head-to-head (VERDICT r7 item 4): build time,
probe time, and recall@5 for every ANN strategy in the repo, on the
driver embeddings table at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1).

Ground truth is the EXACT COSINE top-5 (``brute_force_topk``) — the
standard ANN-benchmark convention, so quantization error shows up in
the quantized families' recall instead of being defined away. Probe
queries are ``vec_id % 50 == 0`` (the registry's held-out proxy).

Prints one JSON line:
  {"metric": "ann_family", "sf": ..., "k": 5,
   "methods": {name: {"build_s": x, "probe_s": y, "recall_at_5": r,
                      "note": "..."}}}
and (with --markdown) the BASELINE.md §I table body.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amazon_personalize_connectors_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 5


def _pairs(df):
    return {(r["q_id"], r["n_id"]) for r in df.select("q_id", "n_id").collect()}


def _recall(approx: set, exact: set) -> float:
    return round(len(approx & exact) / len(exact), 4) if exact else 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    from amazon_personalize_connectors_spark.functions import similarity as S

    spark = get_spark("apc-ann-bench")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.count()  # warm the scan
    qs = emb.where(F.col("vec_id") % 50 == 0)
    n_q = qs.count()

    results: dict[str, dict] = {}

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, round(time.perf_counter() - t0, 3)

    # exact cosine ground truth (also the brute-force baseline row)
    exact_df, t_brute = timed(lambda: S.brute_force_topk(emb, qs, K))
    exact = _pairs(exact_df)
    results["brute_force"] = {
        "build_s": 0.0, "probe_s": t_brute, "recall_at_5": 1.0,
        "note": "exact cosine; per-query window over |corpus|x|queries|",
    }

    part, t_part = timed(lambda: _pairs(S.brute_force_topk_partial(emb, qs, K)))
    results["partial_topk"] = {
        "build_s": 0.0, "probe_s": t_part, "recall_at_5": _recall(part, exact),
        "note": "exact cosine, two-stage partial top-k (corpus never shuffles)",
    }

    with tempfile.TemporaryDirectory(prefix="annb-") as tmp:
        ivf_path = os.path.join(tmp, "ivf")
        _, t_build_ivf = timed(lambda: S.ivf_index_build(spark, emb, ivf_path))
        for nprobe in (1, 2):
            got, t_probe = timed(
                lambda np=nprobe: _pairs(
                    S.ivf_probe_topk_indexed(spark, ivf_path, qs, K, nprobe=np)
                )
            )
            results[f"ivf_nprobe{nprobe}"] = {
                "build_s": t_build_ivf if nprobe == 1 else 0.0,
                "probe_s": t_probe,
                "recall_at_5": _recall(got, exact),
                "note": "persisted inverted lists, partition-pruned probe"
                if nprobe == 1 else "same index, 2 cells per query",
            }

        # refined IVF (r8): 2 Lloyd rounds repair the geometry-blind
        # label seeding, then the same one-list assignment + nprobe=2.
        # Build cost = the refine rounds (in-plan, not persisted here);
        # probe timing includes the final assignment joins.
        got, t_riv = timed(
            lambda: _pairs(
                S.ivf_refined_probe_topk(emb, qs, rounds=2, nprobe=2, k=K)
            )
        )
        results["ivf_refined_nprobe2"] = {
            "build_s": 0.0, "probe_s": t_riv,
            "recall_at_5": _recall(got, exact),
            "note": "2 Lloyd rounds from label seeds, nprobe=2 (r8)",
        }

        got, t_sq8 = timed(lambda: _pairs(S.sq8_topk(emb, qs, K)))
        results["sq8"] = {
            "build_s": 0.0, "probe_s": t_sq8, "recall_at_5": _recall(got, exact),
            "note": "symmetric int8 codes in-plan (stats+encode inside probe)",
        }

        got, t_sq8c = timed(lambda: _pairs(S.sq8_cosine_topk(emb, qs, K)))
        results["sq8_cosine"] = {
            "build_s": 0.0, "probe_s": t_sq8c,
            "recall_at_5": _recall(got, exact),
            "note": "unit-normalized int8 codes (r8): symmetric dot = cosine estimate",
        }

        got, t_pq = timed(lambda: _pairs(S.pq_adc_topk(emb, qs, K)))
        results["pq_adc"] = {
            "build_s": 0.0, "probe_s": t_pq, "recall_at_5": _recall(got, exact),
            "note": "m=8,k=16 codebook + ADC LUT in-plan",
        }

        hnsw_path = os.path.join(tmp, "hnsw")
        _, t_build_h = timed(
            lambda: S.hnsw_index_build(spark, emb, hnsw_path, m=12)
        )
        got, t_probe_h = timed(
            lambda: _pairs(
                S.hnsw_probe_topk(spark, hnsw_path, qs, K, ef=16, rounds=3)
            )
        )
        results["hnsw_graph"] = {
            "build_s": t_build_h, "probe_s": t_probe_h,
            "recall_at_5": _recall(got, exact),
            "note": "multi-table LSH kNN graph + hubs; 3-round ef=16 beam",
        }

        # same index, wider/deeper beam — the serve-time recall dial
        # (measured r8: ef is the binding constraint, not the graph)
        got, t_probe_h2 = timed(
            lambda: _pairs(
                S.hnsw_probe_topk(spark, hnsw_path, qs, K, ef=48, rounds=4)
            )
        )
        results["hnsw_graph_ef48"] = {
            "build_s": 0.0, "probe_s": t_probe_h2,
            "recall_at_5": _recall(got, exact),
            "note": "same graph, 4-round ef=48 beam (serve-time dial)",
        }

    line = {
        "metric": "ann_family", "sf": SF_DIR, "k": K, "n_queries": n_q,
        "methods": results,
    }
    print(json.dumps(line))
    if args.markdown:
        print()
        print("| method | build s | probe s | recall@5 | note |")
        print("|---|---|---|---|---|")
        for name, r in results.items():
            print(
                f"| {name} | {r['build_s']:.2f} | {r['probe_s']:.2f} "
                f"| {r['recall_at_5']:.3f} | {r['note']} |"
            )


if __name__ == "__main__":
    main()
