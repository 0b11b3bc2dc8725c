#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

The headline metric is the flagship related-items pipeline wall time
(scan → split → attribution join → explode → decorate → re-nest →
stamp → count), per BASELINE.md §B. Each query is timed to a full
materialization (count of the final frame) so the whole plan executes;
nothing is cached between queries.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_personalize_connectors_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Bench rigor: each query runs N_RUNS times; per-query time = MEDIAN.
# A single run at sf0.1 showed 1.3-1.5x same-session swings (see
# BASELINE.md round-1 variance note) — medians make round-over-round
# comparisons trustworthy.
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# The 20 round-1 headline queries — BASELINE.md §B's 62.8 s reference
# was measured over exactly this set, so the printed driver line keeps
# its ``value``/``queries`` fields scoped to these 20 for a stable
# round-over-round comparison. (Rounds 2-3 printed all ~104 queries
# plus spread on one line; the driver's output capture truncated it
# and both rounds lost their official bench row — the full per-query
# detail now goes to BENCH_LOCAL.json instead of stdout.)
HEADLINE_20 = [
    "flagship_related_flat",
    "attribution_join",
    "decorate_flat",
    "renest_ordered",
    "user_pers_flat",
    "delta_except",
    "delta_anti_hash",
    "payload_pivot",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh",
    "simhash",
    "ann_topk",
    "embedding_neardup",
    "ivf_assign",
    "text_quality",
    "doc_fingerprint",
    "events_hourly",
    "events_sessionize",
    "lineitem_pricing",
]

BENCH_QUERIES = [
    "flagship_related_flat",
    "attribution_join",
    "decorate_flat",
    "renest_ordered",
    "user_pers_flat",
    "delta_except",
    "delta_anti_hash",
    "state_digest_update",
    "payload_pivot",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "ngram_jaccard_materialized",
    "minhash_lsh",
    "simhash",
    "simhash64",
    "simhash_neardup",
    "ann_topk",
    "ann_topk_partial",
    "embedding_neardup",
    "ivf_assign",
    "kmeans_refine",
    "text_quality",
    "quality_filter",
    "llm_corpus_survivors",
    "repetition_signals",
    "chunk_documents",
    "doc_fingerprint",
    "events_hourly",
    "events_sessionize",
    "lineitem_pricing",
    "running_revenue",
    "decontaminate",
    "pack_sequences",
    "pii_scrub",
    "rp_lsh_pairs",
    "lang_mixture",
    "ntile_quartiles",
    "sample_k_per_group",
    "approx_median_check",
    "corpus_prep_pipeline",
    "line_dedup",
    "session_window_native",
    "variant_props",
    "bigram_stats",
    "ivf_index_probe",
    "ann_quantized",
    "sq8_cosine_topk",
    "maxsim_multivector",
    "maxsim_rerank",
    "maxsim_ann_pipeline",
    "maxsim_neardup",
    "maxsim_neardup_clustered",
    "ivf_refined_probe",
    "ivf_refined_index_probe",
    "pq_adc",
    "rrf_fusion",
    "lm_coverage",
    "bpe_pair_stats",
    "zorder_layout",
    "expectations_audit",
    "neardup_triangles",
    "substring_dedup",
    "cumulative_uniques",
    "rolling_revenue_28d",
    "gap_fill_daily",
    "cohort_retention",
    "orders_islands",
    "basket_lift",
    "priority_sample",
    "column_profile",
    "ann_recall",
    "dedup_canonical",
    "temporal_split",
    "rolling_distinct_users",
    "markov_transitions",
    "rfm_features",
    "scd2_dimension",
    "incremental_rollup_merge",
    "distinct_rollup_bitmap",
    "bloom_prune_semi",
    "hll_user_rollup",
    "snapshot_cdc",
    "cdc_roundtrip",
    "editdist_join",
    "interval_overlap",
    "histogram_quantiles",
    "er_clusters",
    "tpch_q3",
    "tpch_q5",
    "covisitation_topk",
    "rec_coverage",
    "rec_hitrate",
    "negative_sampling",
    "user_profile_vectors",
    "funnel_windows",
    "gap_fill_locf",
    "price_outliers",
    "revenue_trend",
    "bm25_search",
    "scd2_durations",
    "hashed_features",
    "price_percentile_rank",
    "skew_report",
    "session_paths",
    "revenue_contribution",
    "skipgram_pairs",
    "vocab_coverage",
    "trending_items",
    "cohort_revenue",
    "covisitation_mrr",
    "decayed_popularity",
    "asof_nearest",
    "target_encoding",
    "winsorize_prices",
    "next_item_examples",
    "frequent_tokens",
    "ks_drift",
    "containment_pairs",
    "covisitation_incremental",
    "stream_sessionize_stateful",
    "tpch_q10",
    "tpch_q18",
    "tpch_q4",
    "tpch_q6",
    "tpch_q14",
    "tpch_q17",
    "last_touch_attribution",
    "audience_overlap",
    "revenue_anomalies",
    "rec_ndcg",
    "k_anonymity",
    "privacy_gate",
    "retractable_rollup",
    "tpch_q7",
    "tpch_q8",
    "tpch_q13",
    "tpch_q15",
    "tpch_q22",
    "grouping_sets_revenue",
    "embedding_drift",
    "survival_repurchase",
    "rec_diversity_ils",
    "tpch_q1",
    "tpch_q19",
    "scd2_pit_revenue",
    "source_quality",
    "except_all_returns",
    "unpivot_metrics",
    "forecast_mase",
    "mad_outliers",
    "rec_auc_segments",
    "score_calibration",
    "wilson_ctr",
    "revenue_gini",
    "user_similarity",
    "ab_test_purchase",
    "markov_backtest",
    "ipw_hitrate",
    "price_qty_corr",
    "qty_price_spearman",
    "tv_drift",
    "fk_discovery",
    "fd_discovery",
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    "price_qty_ols",
    "chi2_flag_status",
    "benford_audit",
    "revenue_acf",
    "ivm_join_rollup",
    "sorted_neighborhood",
    "linear_attribution",
    "psi_drift",
    "bitemporal_report",
    "pareto_skyline",
    "merge_upsert",
    "variant_drift_scan",
    "linkage_fs",
    "kfold_report",
    "annotator_kappa",
    "score_ece",
    "revenue_changepoint",
    "mannwhitney_value",
    "seasonal_decompose",
    "quota_allocation",
    "cms_heavy_hitters",
    "did_purchase_value",
    "cuped_purchase",
    "oof_target_encoding",
    "rolling_ols_slope",
    "growth_accounting",
    "woe_iv_priority",
    "js_drift",
    "conformal_threshold",
    "isotonic_calibration",
    "graph_walks",
    "als_user_step",
    "t_closeness",
    "ams_f2",
    "open_orders_sweep",
    "compaction_plan",
    "priority_revenue_ewma",
    "anova_price_flag",
    "caliper_match_att",
    "audio_frame_energy",
    "image_ahash",
    "trimmed_mean_price",
    "lineitem_corr_matrix",
    "weighted_median_price",
    "basket_triples",
    "revenue_share_hierarchy",
    "bootstrap_ci",
    "eb_shrunk_ctr",
    "shapley_attribution",
    "stock_balance_floor",
    "price_interpolate_daily",
    "mi_priority_status",
    "image_resize_pixels",
    "image_palette_resize",
    "ivf_multiprobe",
    "embedding_decontaminate",
    "embedding_decontaminate_lsh",
]

# ANN serving family benched through the SERVE SPLIT, not in-plan
# (VERDICT r9 item 3): hnsw_topk / hnsw_recall rebuilt their index
# inside every benched run (~60 s/round of the suite) even though the
# store layer persists it — and both decompose EXACTLY into the serve
# split's hnsw_build + hnsw_probe_only rows, so a regression in
# either path still moves a bench number. Their CORRECTNESS rows are
# untouched (still full queries()/oracle_sql() entries, still
# driver-hash-checked). hnsw_stream_index_probe does NOT decompose
# that way (its cost is 3 stream folds + store assembly, which no
# serve row times), so it STAYS benched in HEAVY_ONE_RUN —
# code-review r10 caught that dropping it left a 5x fold/assemble
# regression invisible. Listed here so the drop is loud, not silent:
ANN_SERVE_SPLIT_BENCHED = [
    "hnsw_topk",
    "hnsw_recall",
]

# Heavy-but-bounded queries whose cost is fixed by a domain contract,
# not the scale factor (theilsen: calendar-bounded pair grid; dbscan /
# mmr: bounded iterative rounds with localCheckpoint barriers).
# r13 (VERDICT r12 item 1 — measurement-bug fix, declared in
# OPTIMIZATION_r13.md): these rows are now MEDIANS of N_RUNS
# back-to-back runs instead of a single end-of-suite sample. The
# one-shot rows carried ±2-3x session-order noise (r12 evidence:
# hnsw_compact 49.1 s one-shot vs 17.9 s isolated median vs 13.5 s
# mid-session), which made the driver's ground truth untrustworthy
# for exactly the family r12 optimized hardest. Methodology
# unchanged otherwise (same queries, same count()-to-materialization
# timing, same clearCache+GC between runs); costs ~2-3 min of extra
# suite wall time. Old single-sample values remain on record in
# BENCH_r12.json / BENCH_LOCAL.json history.
HEAVY_ONE_RUN = [
    "hnsw_compact",     # two folds + full-store compaction, fixed-size
    "hnsw_stream_index_probe",  # 3 folds + assemble + probe — the
    # fold/assemble path has no serve-split row (see
    # ANN_SERVE_SPLIT_BENCHED note), so it keeps an e2e bench row
    "winnowing_dedup",
    "bpe_train",
    "bpe_vocab",
    "theilsen_revenue",
    "dbscan_embeddings",
    "mmr_rerank",
    "kcore_parts",
    "revenue_matrix_profile",
    "part_reach_bfs",
]

# The streaming maintenance family drains micro-batches rewriting a
# versioned store by design — law-check queries whose wall time is
# dominated by trigger overhead, not throughput. They are benched ONCE
# per round (not N_RUNS medians) so BENCH_r{N} still records a time +
# rows_out row for each without tripling the suite cost.
STREAM_ONE_RUN = [
    "stream_hnsw_edges",
    "stream_calibration",
    "stream_quantiles",
    "stream_ivm_rollup",
    "stream_running_stats",
    "stream_model_refresh",
    "stream_ks_drift",
    "stream_auc_monitor",
    "stream_minhash_lsh",
    "stream_js_drift",
    "stream_conformal",
    "stream_cms_topk",
    "stream_distinct_users",
    "stream_capped_balance",
]


# Machine-readable bench-exclusion list (VERDICT r11 item 5): the
# registry rows deliberately NOT timed by this harness — previously
# prose in VERIFIED.md, now data so a new query can't silently be
# neither benched nor excluded (tests/test_bench_contract.py asserts
# benched-groups ∪ BENCH_EXCLUDED == the full registry, disjoint).
# Three exclusion classes:
#   * variant/law-check twins whose BENCHED sibling exercises the same
#     operator path at equal-or-larger cost (e.g. the materialized /
#     capped / legacy-window / salted forms, split halves);
#   * batch-law stream twins — their stateful siblings in
#     STREAM_ONE_RUN carry the drain cost accounting;
#   * bounded rows-only checks whose wall time is fixed per-query
#     harness overhead, not operator throughput.
BENCH_EXCLUDED = [
    "approx_distinct",
    "asof_join",
    "band_join_bucketed",
    "band_join_features",
    "bigram_perplexity",
    "contiguous_ids",
    "cube_revenue",
    "doc_entropy",
    "dup_ngram_fraction",
    "error_split_errors",
    "error_split_ok",
    "event_funnel",
    "events_props",
    "explode_outer",
    "hash_split",
    "hybrid_filtered_ann",
    "intersect_items",
    "ivf_centroids",
    "lang_profile",
    "leakage_safe_split",
    "line_dedup_materialized",
    "multimodal_decode",
    "neardup_components",
    "neardup_pagerank",
    "percentiles",
    "pivot_events",
    "renest_capped",
    "renest_legacy_window",
    "rollup_revenue",
    "salted_attribution",
    "semi_anti_join",
    "sliding_windows",
    "source_overlap",
    "stamp_literals",
    "stratified_sample",
    "stream_dedup",
    "stream_interval_join",
    "stream_static_join",
    "stream_windowed_counts",
    "text_tokens",
    "tfidf_top_terms",
    "token_pmi",
    "topk_per_group",
    "topk_slice",
    "window_analytics",
    "zipf_alpha",
]


def _sentinel(spark) -> float:
    """Constant-work environment sentinel (VERDICT r9 item 5): a
    fixed, data-independent, CPU-bound workload (codegen'd hash +
    aggregate over a synthetic range — no I/O, no shuffle skew, no SF
    dependence) timed like any query. Round-over-round, the ratio of
    sentinel times measures MACHINE speed drift (co-tenant load,
    thermal state), so a uniform suite-wide slowdown can be attributed
    to environment instead of being mistaken for a code regression
    (the r8→r9 headline rows moved a uniform ~1.27x from contention).
    Median of N_RUNS, same discipline as the query rows."""
    from pyspark.sql import functions as F

    times = []
    for _ in range(max(1, N_RUNS)):
        t0 = time.perf_counter()
        (
            spark.range(0, 150_000_000, 1, 32)
            .select(F.xxhash64(F.col("id")).alias("h"))
            .agg(F.sum(F.col("h") % F.lit(1_000_003)).alias("s"))
            .collect()
        )
        times.append(round(time.perf_counter() - t0, 3))
    return round(statistics.median(times), 3)


def serve_probe_specs(spark, sf_dir: str, root: str, auto_width: bool = False) -> dict:
    """THE canonical serve-split workloads — single source of truth
    for build/probe parameters, shared by bench.py:_serve_probe and
    tools/scale_slope.py:probe_slopes (code-review r10: the two had
    drifted-copy parameter lists; a retune of one would silently make
    the other measure a different workload). Returns
    {name: {"build": thunk, "probe": thunk}} where each build writes
    its persisted index under ``root`` and each probe runs against
    it. Parameters mirror the e2e queries (hnsw_topk /
    ivf_refined_index_probe) so the serve numbers decompose them.

    ``auto_width=True`` switches the HNSW build's LSH blocking from
    the e2e-mirror fixed width (n_bits=4 — comparable bench numbers
    at the pinned sf0.1) to the documented scale policy
    (``n_bits=None`` → auto_n_bits ≈ log2(N/target_bucket), the
    sizing a 100 TB deployment uses — similarity.py's pair-cap
    message points at it). tools/scale_slope.py uses this so the
    probe-slope series measures ONE policy across every SF; at sf1
    (20k vectors) the fixed width correctly REFUSES via the pair cap
    (4 tables × N²/2⁴ ≈ 100M candidate pairs > 50M), which is the
    guard doing its job, not a probe-path defect."""
    from pyspark.sql import functions as F

    from amazon_personalize_connectors_spark.functions.similarity import (
        hnsw_index_build,
        hnsw_probe_topk,
        ivf_probe_topk_indexed,
        refined_ivf_index_build,
    )
    from amazon_personalize_connectors_spark.sources import synthetic

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return {
        "hnsw": {
            "build": lambda: hnsw_index_build(
                spark,
                emb,
                f"{root}/hnsw",
                m=12,
                **({"n_bits": None, "target_bucket": 256} if auto_width else {}),
            ),
            "probe": lambda: hnsw_probe_topk(
                spark, f"{root}/hnsw", queries_df, k=5, ef=16, rounds=3
            ),
        },
        "ivf_refined": {
            "build": lambda: refined_ivf_index_build(
                spark, emb, f"{root}/ivf", rounds=2
            ),
            "probe": lambda: ivf_probe_topk_indexed(
                spark, f"{root}/ivf", queries_df, k=5, nprobe=2
            ),
        },
    }


def _serve_probe(spark) -> dict:
    """Build-once / probe-many serving measurement (VERDICT r8 item 4):
    the e2e hnsw_topk / ivf_refined_probe queries rebuild their index
    every run — the right shape for an oracle-checked correctness
    query, the wrong accounting for a serving system, where the build
    amortizes over every probe. This phase builds each persisted index
    ONCE into a temp dir and reports the build cost and the MEDIAN
    probe-only wall time separately (same graph/probe parameters as
    the e2e queries, so the numbers decompose them directly)."""
    import shutil
    import tempfile

    out: dict = {}
    root = tempfile.mkdtemp(prefix="apcs_bench_serve_")
    try:
        specs = serve_probe_specs(spark, SF_DIR, root)
        for name, spec in specs.items():
            t0 = time.perf_counter()
            spec["build"]()
            out[f"{name}_build"] = round(time.perf_counter() - t0, 3)
        for name, spec in specs.items():
            samples = []
            for _ in range(max(1, N_RUNS)):
                t0 = time.perf_counter()
                out[f"{name}_probe_only_rows"] = spec["probe"]().count()
                samples.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            out[f"{name}_probe_only"] = round(statistics.median(samples), 3)
    except Exception as exc:  # noqa: BLE001 — serve phase is additive
        out["error"] = f"{type(exc).__name__}: {exc}"[:300]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _run_suite(spark, qs, names: list[str]):
    """Interleaved N_RUNS passes over ``names``; returns (samples,
    rows_out, errors). rows_out records each query's first-run count so
    row-count drift can't masquerade as a perf change (every timing is
    a count() to full materialization, so the row count is free)."""
    samples: dict[str, list[float]] = {n: [] for n in names if n in qs}
    rows_out: dict[str, int] = {}
    errors: dict[str, str] = {}
    for _ in range(max(1, N_RUNS)):
        for name in samples:
            if name in errors:
                continue
            try:
                t0 = time.perf_counter()
                cnt = qs[name](spark, SF_DIR).count()
                samples[name].append(round(time.perf_counter() - t0, 3))
                if name in rows_out and rows_out[name] != cnt:
                    errors[name] = (
                        f"row-count drift across runs: {rows_out[name]} vs {cnt}"
                    )
                rows_out[name] = cnt
            except Exception as exc:  # noqa: BLE001 — record and move on
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            # No cross-query reuse or memory bleed: drop caches and
            # force a JVM GC so ContextCleaner reclaims accumulated
            # broadcasts — without this, a long sequential session
            # degrades later queries by 10-60x (broadcast blocks pin
            # the driver heap).
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    return samples, rows_out, errors


def _headline_isolated() -> dict:
    """Run ONLY the pinned headline-20 in this process (invoked as a
    fresh subprocess → fresh JVM): suite composition frozen, so the
    per-query medians are comparable round-over-round — the full-suite
    session runs hotter (GC/page-cache/broadcast-cleanup pressure) and
    contaminated the r3→r4 per-query deltas."""
    import __spark_entry__ as e

    spark = get_spark("apc-bench-headline")
    qs = e.queries()
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    # sentinel bracketing the phase: the isolated numbers are the
    # round-over-round comparison of record, so the machine-speed
    # measurement must cover THIS window, not just the later suite
    sent_before = _sentinel(spark)
    samples, rows_out, errors = _run_suite(spark, qs, HEADLINE_20)
    sent_after = _sentinel(spark)
    times = {
        n: round(statistics.median(s), 3) for n, s in samples.items() if s
    }
    return {
        "queries": times,
        "rows_out": rows_out,
        "errors": errors,
        "sentinel": [sent_before, sent_after],
    }


def main() -> None:
    import __spark_entry__ as e

    if os.environ.get("SPARK_GRAFT_BENCH_MODE") == "headline":
        print(json.dumps(_headline_isolated()))
        return

    if os.environ.get("SPARK_GRAFT_BENCH_MODE") == "ann":
        # ANN family head-to-head (BASELINE.md §I): build/probe/recall
        # for brute, partial, IVF nprobe 1-2, SQ8, PQ-ADC, HNSW
        import importlib.util as _ilu

        spec = _ilu.spec_from_file_location(
            "ann_bench",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "ann_bench.py"),
        )
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.argv = [sys.argv[0]]
        mod.main()
        return

    # Phase 1 — isolated headline-20 in a FRESH JVM (subprocess):
    # frozen composition, no suite contamination. Falls back to the
    # in-session numbers if the subprocess fails for any reason.
    import subprocess

    isolated: dict = {}
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "SPARK_GRAFT_BENCH_MODE": "headline"},
            capture_output=True,
            text=True,
            timeout=1200,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                isolated = json.loads(line)
                break
    except Exception:  # noqa: BLE001 — isolation is best-effort
        isolated = {}

    spark = get_spark("apc-bench")
    qs = e.queries()
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()

    # Interleave whole-suite passes (run 1 of every query, then run 2,
    # ...) rather than back-to-back repeats of one query: back-to-back
    # repeats share hot page cache/JIT state and understate variance,
    # while interleaving exposes the session-order effects we're trying
    # to measure out.
    # A failing query must cost ONE row, not the round's whole bench
    # (round-2 post-mortem: one loader bug crashed the entire run and
    # left the round with zero official numbers). Errors are recorded
    # per-query and excluded from the suite total.
    samples, rows_out, errors = _run_suite(spark, qs, BENCH_QUERIES)

    # heavy bounded-cost family: median of N_RUNS timed runs each
    # (r13 — see HEAVY_ONE_RUN note; was a single end-of-suite sample
    # through r12), merged into the main tables
    h_samples, h_rows, h_errors = _run_suite(spark, qs, HEAVY_ONE_RUN)
    samples.update(h_samples)
    rows_out.update(h_rows)
    errors.update(h_errors)

    # streaming family: one timed drain each (see STREAM_ONE_RUN note)
    stream_times: dict[str, float] = {}
    stream_rows: dict[str, int] = {}
    for name in STREAM_ONE_RUN:
        if name not in qs:
            continue
        try:
            t0 = time.perf_counter()
            stream_rows[name] = qs[name](spark, SF_DIR).count()
            stream_times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # serving split: persisted-index build once, probe-only medians
    # (VERDICT r8 item 4 — see _serve_probe)
    serve = _serve_probe(spark)

    # constant-work environment sentinel (see _sentinel)
    sentinel = _sentinel(spark)

    ok = {name: s for name, s in samples.items() if s and name not in errors}
    times = {name: round(statistics.median(s), 3) for name, s in ok.items()}
    spread = {name: [round(min(s), 3), round(max(s), 3)] for name, s in ok.items()}
    suite_total = round(sum(times.values()), 3)
    # headline numbers come from the ISOLATED fresh-JVM phase when it
    # succeeded (frozen composition — comparable round-over-round);
    # in-session medians are the fallback
    iso_times = isolated.get("queries") or {}
    headline_isolated = bool(iso_times) and not isolated.get("errors")
    src = iso_times if headline_isolated else times
    headline = {n: src[n] for n in HEADLINE_20 if n in src}
    headline_total = round(sum(headline.values()), 3)

    # full per-query detail (all queries, medians + spread) to a repo
    # file — NOT stdout, which the driver captures with a line limit
    full = {
        "metric": "suite_queries_total_wall",
        "value": suite_total,
        "unit": "sec",
        "queries": times,
        "spread": spread,
        "rows_out": rows_out,
        "headline_isolated": isolated,
        "stream_queries": stream_times,
        "stream_rows_out": stream_rows,
        "serve_probe": serve,
        "sentinel": sentinel,
        "ann_serve_split_benched": ANN_SERVE_SPLIT_BENCHED,
        "sf": sf,
        "runs_per_query": max(1, N_RUNS),
        "errors": errors,
    }
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    with open(local_path, "w") as f:
        json.dump(full, f, indent=1)

    # ONE compact driver line: value/queries scoped to the 20
    # round-1 headline queries (the BASELINE.md §B comparison set),
    # suite totals as scalars — small enough to survive the driver's
    # output capture
    out = {
        "metric": "headline_queries_total_wall",
        "value": headline_total,
        "unit": "sec",
        "queries": headline,
        "headline_isolated": headline_isolated,
        "rows_out": {n: rows_out[n] for n in HEADLINE_20 if n in rows_out},
        "stream_queries": stream_times,
        "stream_rows_out": stream_rows,
        "serve_probe": serve,
        "sentinel": sentinel,
        "sf": sf,
        "runs_per_query": max(1, N_RUNS),
        "suite_total": suite_total,
        "suite_n_queries": len(times),
        "n_errors": len(errors),
    }
    if errors:
        out["error_queries"] = sorted(errors)[:10]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
