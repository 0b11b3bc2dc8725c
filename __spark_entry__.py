"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship related-items pipeline on sf0.001.
``queries()`` exposes one named PySpark callable per implemented
operator (SURVEY.md §2) and ``oracle_sql()`` the matching DuckDB SQL.
All oracle-checked queries return FLAT primitive columns (the driver
hash-compares values column-name-sorted); nested results are flattened
or summarized (size/first/last) before returning.

Fixture derivations (both sides) live in
``amazon_personalize_connectors_spark/sources/synthetic.py`` — the SQL
CTE constants there are the single source of truth for the oracle side.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_personalize_connectors_spark.config import ConnectorConfig, PipelineConfig
from amazon_personalize_connectors_spark.operators.attribution import attribute_users
from amazon_personalize_connectors_spark.operators.decorate import (
    decorate_items,
    explode_recommendations,
)
from amazon_personalize_connectors_spark.operators.payload import (
    build_user_track_payloads,
)
from amazon_personalize_connectors_spark.operators.split import split_errors
from amazon_personalize_connectors_spark.operators.topk import limit_recommendations
from amazon_personalize_connectors_spark.plans.pipeline import (
    related_items_pipeline,
    user_personalization_pipeline,
)
from amazon_personalize_connectors_spark.sources import synthetic
from amazon_personalize_connectors_spark.sources.synthetic import (
    MAPPING_CTE,
    META_CTE,
    RECS_CTE,
    USER_RECS_CTE,
)

RUN_TS = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)

_CONNECTOR = ConnectorConfig(
    name="braze",
    item_metadata_fields=("name", "price", "category"),
    attribute_prefix="recs_",
    other_attributes={"other_attrib1": "custom"},
)

_CONFIG = PipelineConfig(
    batch_inference_path="unused",
    connectors=(_CONNECTOR,),
    perform_delta_check=False,
    job_name="flagship",
    run_datetime=RUN_TS,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full related-items pipeline (scan → split → attribution
    join → explode → decorate → ordered re-nest → stamp) on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    res = related_items_pipeline(
        synthetic.related_items_batch_inference(spark, sf_dir),
        synthetic.user_item_mapping(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    )
    return res.decorated


# ---------------------------------------------------------------------------
# helpers shared by several queries
# ---------------------------------------------------------------------------


def _ok_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ok, _ = split_errors(
        synthetic.related_items_batch_inference(spark, sf_dir), cache=False
    )
    return ok


def _decorated_related(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution + decoration, nested form (pre-stamp)."""
    return related_items_pipeline(
        synthetic.related_items_batch_inference(spark, sf_dir),
        synthetic.user_item_mapping(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    ).pre_delta


def _flatten_decorated(decorated: DataFrame, key_cols: list[str]) -> DataFrame:
    """Explode the final nested array back to flat rows for hashing."""
    return decorated.select(
        *key_cols, F.posexplode("recommendations").alias("pos", "rec")
    ).select(
        *key_cols,
        F.col("pos").cast("bigint").alias("pos"),
        F.col("rec.itemId").alias("item_id"),
        F.col("rec.name").alias("name"),
        F.col("rec.price").alias("price"),
        F.col("rec.category").alias("category"),
    )


# ---------------------------------------------------------------------------
# queries — each with a matching oracle_sql entry
# ---------------------------------------------------------------------------


def q_error_split_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 success branch: rows without error, rec-list length."""
    return _ok_recs(spark, sf_dir).select(
        F.col("input.itemId").alias("query_item_id"),
        F.size("output.recommendedItems").cast("bigint").alias("num_recs"),
    )


def q_error_split_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 error branch (K2 error sink contents)."""
    _, errors = split_errors(
        synthetic.related_items_batch_inference(spark, sf_dir), cache=False
    )
    return errors.select(
        F.col("input.itemId").alias("query_item_id"), F.col("error").alias("error")
    )


def q_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: recs ⋈ user-item mapping (fan-out to users)."""
    attributed = attribute_users(
        _ok_recs(spark, sf_dir), synthetic.user_item_mapping(spark, sf_dir)
    )
    return attributed.select(
        F.col("input.itemId").alias("query_item_id"),
        F.col("userId").alias("user_id"),
    )


def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: posexplode_outer with rank position; empty/null lists kept."""
    exploded = explode_recommendations(
        _ok_recs(spark, sf_dir), [("input.itemId", "query_item_id")]
    )
    return exploded.select(
        "query_item_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("recItemId").alias("rec_item_id"),
    )


def q_decorate_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+E1: exploded recs left-joined to item metadata (misses kept)."""
    exploded = explode_recommendations(
        _ok_recs(spark, sf_dir), [("input.itemId", "query_item_id")]
    )
    meta = synthetic.item_metadata(spark, sf_dir)
    joined = exploded.join(
        F.broadcast(meta), exploded["recItemId"] == meta["id"], "left_outer"
    )
    return joined.select(
        "query_item_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("recItemId").alias("item_id"),
        "name",
        "price",
        "category",
        "current_stock",
    )


def q_renest_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 idiomatic re-nest: per query item — list size and the FULL
    ordered item-id sequence of the re-nested array, flattened to a
    CSV string so the oracle compares every element in order (the
    explode → decorate → re-nest round-trip is the semantic heart of
    the reference, ri:202-214 — a (len, first, last) summary can miss
    an interior transposition)."""
    decorated = decorate_items(
        _ok_recs(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        key_cols=[("input.itemId", "query_item_id")],
        metadata_fields=["name"],
    )
    return decorated.select(
        "query_item_id",
        F.size("recommendations").cast("bigint").alias("num_recs"),
        F.array_join(
            F.transform("recommendations", lambda r: r["itemId"]), ","
        ).alias("items_csv"),
    )


def q_renest_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery-side maxRecommendations cap (config knob): decoration
    keeps only ranks < 3, filtering the EXPLODED rows before the
    metadata join and re-nest aggregate so join probes and the shuffle
    shrink with the cap. Full ordered item-id sequence checked —
    each capped list must be the exact top-3 prefix."""
    decorated = decorate_items(
        _ok_recs(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        key_cols=[("input.itemId", "query_item_id")],
        metadata_fields=["name"],
        max_recommendations=3,
    )
    return decorated.select(
        "query_item_id",
        F.size("recommendations").cast("bigint").alias("num_recs"),
        F.array_join(
            F.transform("recommendations", lambda r: r["itemId"]), ","
        ).alias("items_csv"),
    )


def q_flagship_related_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship related-items pipeline, flattened for hashing."""
    return _flatten_decorated(
        _decorated_related(spark, sf_dir), ["queryItemId", "userId"]
    ).withColumnsRenamed({"queryItemId": "query_item_id", "userId": "user_id"})


def q_user_pers_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-personalization pipeline (no attribution join), flattened."""
    decorated = user_personalization_pipeline(
        synthetic.user_personalization_batch_inference(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    ).pre_delta
    return _flatten_decorated(decorated, ["queryUserId"]).withColumnRenamed(
        "queryUserId", "query_user_id"
    )


def q_delta_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: EXCEPT DISTINCT of current vs simulated last-sync state
    (state = records of even user ids, as if already synced)."""
    current = q_flagship_related_flat(spark, sf_dir)
    state = current.where(F.col("user_id").cast("bigint") % 2 == 0)
    return current.subtract(state)


def q_payload_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3/E4: user-track payload algebra, arrays joined to CSV
    strings for hashing (rank order therefore checked)."""
    decorated = user_personalization_pipeline(
        synthetic.user_personalization_batch_inference(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    ).pre_delta
    payloads, _ = build_user_track_payloads(decorated, _CONNECTOR)
    return payloads.select(
        "external_id",
        F.array_join("recs_itemId", ",").alias("item_ids_csv"),
        F.array_join(
            F.transform("recs_price", lambda p: p.cast("string")), ","
        ).alias("prices_csv"),
        F.size("recs_itemId").cast("bigint").alias("n_items"),
        F.col("other_attrib1"),
    )


def q_topk_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k knob: first 3 of the ordered recommendations array."""
    decorated = decorate_items(
        _ok_recs(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        key_cols=[("input.itemId", "query_item_id")],
        metadata_fields=["name"],
    )
    top3 = limit_recommendations(decorated, 3)
    return top3.select(
        "query_item_id",
        F.array_join(
            F.transform("recommendations", lambda r: r["itemId"]), ","
        ).alias("top3_ids_csv"),
    )


def q_stamp_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: job/sync stamp as literal columns (flattened jobInfo)."""
    stamped = related_items_pipeline(
        synthetic.related_items_batch_inference(spark, sf_dir),
        synthetic.user_item_mapping(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
    ).decorated
    return stamped.select(
        F.col("queryItemId").alias("query_item_id"),
        F.col("userId").alias("user_id"),
        F.col("jobInfo.name").alias("job_name"),
        F.col("jobInfo.runDateTime").alias("run_datetime"),
        F.col("syncDirectives.attributePrefix").alias("attribute_prefix"),
    )


# ---------------------------------------------------------------------------
# extension queries: text analysis, dedup, similarity, events
# ---------------------------------------------------------------------------


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace and BPE-ish regex lexers."""
    from amazon_personalize_connectors_spark.functions import text as Tx

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        Tx.whitespace_token_count(F.col("text")).cast("bigint").alias("n_ws_tokens"),
        Tx.regex_token_count(F.col("text")).cast("bigint").alias("n_regex_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token stats + stopword ratio + language flag."""
    from amazon_personalize_connectors_spark.functions import text as Tx

    docs = synthetic.load_table(spark, sf_dir, "documents")
    feats = Tx.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["is_english"].alias("is_english"),
    )


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (group aggregate with exact sums)."""
    from amazon_personalize_connectors_spark.functions import text as Tx

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(Tx.tokens(F.col("text"))).cast("bigint")).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint (min md5 over 8-grams)."""
    from amazon_personalize_connectors_spark.functions import text as Tx

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", Tx.fingerprint_min_8gram(F.col("text")).alias("fingerprint")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content digest."""
    from amazon_personalize_connectors_spark.functions.dedup import exact_dedup_groups

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs).select(
        "digest", F.col("rep_id").cast("bigint").alias("rep_id"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup candidates over a doc sample."""
    from amazon_personalize_connectors_spark.functions.dedup import ngram_jaccard_pairs

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    return ngram_jaccard_pairs(docs).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "common", "union_size", "jaccard",
    )


def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup groups from Jaccard candidate pairs via iterative
    min-label connected components; oracle = DuckDB recursive CTE
    computing the minimum reachable doc id."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        neardup_components,
        ngram_jaccard_pairs,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    edges = ngram_jaccard_pairs(docs)
    return neardup_components(edges).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("component"),
    )


def q_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the embedding near-dup graph (a<b<c,
    each triangle once): wedge equi-join closed by a left-semi probe
    — the clustering-density check that distinguishes tight duplicate
    cliques from transitive over-merged chains."""
    from amazon_personalize_connectors_spark.functions.dedup import triangles
    from amazon_personalize_connectors_spark.functions.similarity import (
        blocked_near_duplicates,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    edges = blocked_near_duplicates(emb, min_cosine=0.3)
    tri = triangles(edges)
    return tri.select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        F.col("c").cast("bigint").alias("c"),
    )


def q_ngram_jaccard_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB form of the Jaccard near-dup: tokenize once, materialize
    the hashed shingle table to parquet, self-join that (same oracle as
    the recompute form — results are identical)."""
    import tempfile

    from amazon_personalize_connectors_spark.functions.dedup import (
        ngram_jaccard_pairs_materialized,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    work = tempfile.mkdtemp(prefix="apcs_shingles_")
    return ngram_jaccard_pairs_materialized(spark, docs, f"{work}/shingles").select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "common", "union_size", "jaccard",
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (6 hashes, 3 bands of 2)."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        minhash_lsh_candidates,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    return minhash_lsh_candidates(docs, n=2).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "n_shared_bands",
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signature per document."""
    from amazon_personalize_connectors_spark.functions.dedup import simhash16

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 10 == 0
    )
    return docs.select("doc_id", simhash16(F.col("text")).alias("simhash"))


def q_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signature per document (signed-int64 encoding),
    via the corpus-scale explode+aggregate form (bit-identical to the
    per-row simhash64 column)."""
    from amazon_personalize_connectors_spark.functions.dedup import simhash64_table

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 10 == 0
    )
    return simhash64_table(docs).select(
        F.col("id").alias("doc_id"), F.col("sig").alias("simhash")
    )


def q_state_digest_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5-at-scale update cycle: state = bucketed digests of all but
    every-200th order (materialized first), then the measured work is
    the digest anti-join plus appending the 0.5% delta's digests —
    cost ∝ delta size, not snapshot size (compare delta_except, which
    shuffles the full snapshot). Oracle: the delta is exactly the
    orders with o_orderkey % 200 == 0."""
    import tempfile

    from amazon_personalize_connectors_spark.operators.delta import (
        append_state_digests,
        delta_check_against_digests,
        read_state_digests,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    path = tempfile.mkdtemp(prefix="apcs_state_") + "/state_digests"
    append_state_digests(orders.where(F.col("o_orderkey") % 200 != 0), path)
    delta = delta_check_against_digests(orders, read_state_digests(spark, path))
    append_state_digests(delta, path)  # the incremental state update
    return delta


_QUALITY_FLAG_COLS = [
    "flag_too_short", "flag_token_len", "flag_low_stopword",
    "flag_symbol_heavy", "flag_digit_heavy", "keep",
]


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style per-document quality rules with per-rule audit
    flags and the combined keep verdict."""
    from amazon_personalize_connectors_spark.functions.text import (
        quality_filter_flags,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    flags = quality_filter_flags(F.col("text"))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        *[flags[k].alias(k) for k in _QUALITY_FLAG_COLS],
    )


def q_llm_corpus_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite LLM-corpus pipeline: quality filter -> exact dedup ->
    surviving representative docs with copy counts and token sizes.
    One projected scan feeds the filter; dedup is one map-side-
    combinable hash aggregate on the content digest."""
    from amazon_personalize_connectors_spark.functions.text import (
        quality_filter_flags,
    )

    from pyspark.sql.window import Window

    docs = synthetic.load_table(spark, sf_dir, "documents")
    flags = quality_filter_flags(F.col("text"))
    kept = docs.where(flags["keep"]).select(
        "doc_id",
        F.md5("text").alias("digest"),
        flags["n_tokens"].alias("n_tokens"),
    )
    # one scan, one shuffle: representative + copy count via a window
    # over the digest partition (the join-back form scans the corpus
    # twice and shuffles twice — at corpus scale that is the bill)
    w = Window.partitionBy("digest")
    return (
        kept.withColumn("n_copies", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("min_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("min_id"))
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "digest",
            "n_copies",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: overlapping 32-token windows (8-token
    overlap) per document, one generator projection, no joins."""
    from amazon_personalize_connectors_spark.functions.text import chunk_documents

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=32, overlap=8).select(
        F.col("id").cast("bigint").alias("id"),
        "chunk_no", "n_tokens", "chunk_text",
    )


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document."""
    from amazon_personalize_connectors_spark.functions.text import (
        repetition_signals,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return repetition_signals(docs).select(
        F.col("id").cast("bigint").alias("id"),
        "n_tokens",
        "top_unigram_frac",
        "top_bigram_frac",
        "flag_repetitive",
    )


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-SimHash near-dup candidate pairs with exact Hamming
    filter — the pairing operator the signature feeds."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        simhash_neardup_pairs,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return simhash_neardup_pairs(docs, max_hamming=16).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "hamming",
    )


def q_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search (nprobe=1): queries score only their assigned
    inverted list."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        ivf_probe_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return ivf_probe_topk(emb, queries_df, k=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank", "score",
    )


def q_hybrid_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid text+vector pipeline: the quality filter prunes the
    corpus FIRST (documents and embeddings share the id key), then
    exact cosine top-3 runs over only the surviving vectors — the
    filter-before-expensive-stage composition a cleaning pipeline
    uses."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        brute_force_topk,
    )
    from amazon_personalize_connectors_spark.functions.text import (
        quality_filter_flags,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    flags = quality_filter_flags(F.col("text"))
    kept_ids = docs.where(flags["keep"]).select(F.col("doc_id").alias("vec_id"))
    emb = synthetic.load_table(spark, sf_dir, "embeddings").join(
        F.broadcast(kept_ids), "vec_id"
    )
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return brute_force_topk(emb, queries_df, k=3).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank", "score",
    )


def q_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd refinement round from the label-seeded centroids:
    reassign every vector, recompute per-cluster integer sums."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        kmeans_refine_sums,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    return kmeans_refine_sums(emb, iters=1).select(
        F.col("block").cast("bigint").alias("block"), "dim", "sum_e6", "n"
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for sampled query vectors."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        brute_force_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return brute_force_topk(emb, queries_df, k=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank", "score",
    )


def q_ann_topk_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage partial top-k (huge-corpus path): per-batch numpy
    pruning + Catalyst re-score. Same oracle as ann_topk — the result
    is identical to the window form by construction."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        brute_force_topk_partial,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return brute_force_topk_partial(emb, queries_df, k=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank", "score",
    )


def q_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8-quantized ANN top-5: per-dim min/max scalar quantization to
    8-bit codes (4x less memory traffic per vector), then exact int64
    dot products of the codes — a pure-integer ranking that is
    bit-reproducible across engines. The quantizer stats are a
    dim-row tiny table re-entered as literal arrays, so quantization
    itself is one codegen projection with zero joins."""
    from amazon_personalize_connectors_spark.functions.similarity import sq8_topk

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return sq8_topk(emb, queries_df, k=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank", "qdot",
    )


def q_sq8_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalized SQ8 ANN top-5 (functions/similarity.py:
    sq8_cosine_topk — the BASELINE.md SI finding made executable,
    round 8): floor(127*v_d/||v||) codes make the symmetric int dot a
    1-byte-per-dim COSINE estimate — recall@5 0.930 at sf0.1 where
    min-max SQ8's offset-dominated dot measures 0.03. Exact int64
    scores, (qdot desc, n_id asc) ties; the oracle replays codes and
    ranking bit-for-bit (norm/scale/floor are row-local IEEE
    expressions both engines compute identically)."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        sq8_cosine_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return sq8_cosine_topk(emb, queries_df, k=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank", "qdot",
    )


def q_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction multi-vector retrieval (functions/similarity.py:
    maxsim_topk — the MaxSim operator of ColBERT, Khattab & Zaharia,
    SIGIR 2020; round 8): the embeddings table regroups into 8-token
    documents (doc_id = vec_id DIV 8, tok = vec_id % 8), every 10th
    document is a query bag, and score(q, d) = Σ over q's tokens of
    the max exact-int dot against d's tokens — term-level matching
    the single-vector ANN family cannot express (pooling erases it).
    Corpus tokens never shuffle for scoring (query bags broadcast);
    exact int64 dots/maxima/sums on the shared floor(v·10⁶) grid,
    (score desc, doc asc) ties, self-match excluded — the oracle
    replays scoring bit-for-bit. Top-5 docs per query."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        maxsim_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    toks = emb.select(
        F.expr("CAST(vec_id DIV 8 AS BIGINT)").alias("doc_id"),
        (F.col("vec_id") % 8).cast("bigint").alias("tok"),
        "embedding",
    )
    q_toks = toks.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("q_id"), "tok", "embedding"
    )
    return maxsim_topk(toks, q_toks, k=5, exclude_self=True)


def q_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-stage late-interaction serving architecture
    (functions/similarity.py:maxsim_rescore — ColBERT's retrieve-then-
    rerank, round 8): stage 1 retrieves each query's top-20 documents
    by exact POOLED dot product (pooling = per-dim SUM of the bag's
    floor(v·10⁶) int tokens — associative, so partition-order-proof
    where a float mean is not); stage 2 re-scores exactly those
    (q, doc) pairs with exact MaxSim and re-ranks. Stage 2's joins are
    all equi-keyed (candidates ⋈ doc tokens on doc_id, ⋈ query tokens
    on q_id) — the corpus-scale-query-set shape maxsim_topk's
    broadcast cannot serve. Emits rescored rank + score per surviving
    pair; the oracle replays pooling, retrieval, and rescoring
    bit-for-bit."""
    from pyspark.sql import Window

    from amazon_personalize_connectors_spark.functions.similarity import (
        maxsim_rescore,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    toks = emb.select(
        F.expr("CAST(vec_id DIV 8 AS BIGINT)").alias("doc_id"),
        (F.col("vec_id") % 8).cast("bigint").alias("tok"),
        "embedding",
    )
    pooled = toks.select(
        "doc_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda v: F.floor(v * F.lit(1000000.0)).cast("bigint"),
        ).alias("qv"),
    ).select("doc_id", F.posexplode("qv").alias("dim", "iv")).groupBy(
        "doc_id", "dim"
    ).agg(
        F.sum("iv").alias("s")
    ).groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dim"), F.col("s")))
        ).alias("_ds")
    ).select(
        "doc_id", F.transform(F.col("_ds"), lambda x: x["s"]).alias("pv")
    )
    q_pooled = pooled.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("q_id"), F.col("pv").alias("q_pv")
    )
    from amazon_personalize_connectors_spark.functions.similarity import (
        _iqdot,
    )

    w20 = Window.partitionBy("q_id").orderBy(F.desc("pdot"), F.asc("doc_id"))
    cand = (
        pooled.join(F.broadcast(q_pooled), F.col("doc_id") != F.col("q_id"))
        .select(
            "q_id",
            "doc_id",
            _iqdot(F.col("pv"), F.col("q_pv")).alias("pdot"),
        )
        .withColumn("_rn", F.row_number().over(w20))
        .where(F.col("_rn") <= 20)
        .select("q_id", "doc_id")
    )
    q_toks = toks.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("q_id"), "tok", "embedding"
    )
    return maxsim_rescore(cand, toks, q_toks)


def q_maxsim_ann_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full late-interaction SERVING stack (round 8): token-level ANN
    retrieval feeding exact MaxSim re-scoring — the production shape
    of the maxsim family (maxsim_topk documents why the exhaustive
    form cannot take corpus-scale query sets). Stage 1: every query
    TOKEN probes the corpus token table through sq8_cosine_topk (the
    §I recall winner at 1 byte/dim) for its top-10 token matches;
    matches map to their parent documents (vec DIV 8) and union into
    a bounded candidate list per query. Stage 2: maxsim_rescore
    computes the exact late-interaction score for exactly those
    (q, doc) pairs — equi-keyed joins end to end. The oracle replays
    unit codes, the token probe, the doc mapping, and the rescore
    bit-for-bit."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        maxsim_rescore,
        sq8_cosine_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    toks = emb.select(
        F.expr("CAST(vec_id DIV 8 AS BIGINT)").alias("doc_id"),
        (F.col("vec_id") % 8).cast("bigint").alias("tok"),
        "embedding",
    )
    q_tok_vecs = emb.where(
        F.expr("CAST(vec_id DIV 8 AS BIGINT)") % 10 == 0
    )
    token_hits = sq8_cosine_topk(emb, q_tok_vecs, k=10)
    cand = (
        token_hits.select(
            F.expr("CAST(q_id DIV 8 AS BIGINT)").alias("q_id"),
            F.expr("CAST(n_id DIV 8 AS BIGINT)").alias("doc_id"),
        )
        .where(F.col("q_id") != F.col("doc_id"))
        .distinct()
    )
    q_toks = toks.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("q_id"), "tok", "embedding"
    )
    return maxsim_rescore(cand, toks, q_toks)


def q_maxsim_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector SEMANTIC near-dup detection (round 8) — the
    late-interaction closing of the dedup family: two documents are
    near-dups when every token of one has a strong match in the other,
    i.e. the SYMMETRIZED MaxSim (min of the two directed scores, each
    normalized by its query-side token count) clears a threshold.
    Token-level candidates are LSH-BLOCKED, never all-pairs (the house
    near-dup discipline — rp_lsh_pairs' 6-bit cosine signature over
    exact int dots): two documents become a candidate pair when ANY
    token of one shares a bucket with ANY token of the other, a
    construction that is symmetric by definition, so both directed
    MaxSims always exist. On a real corpus a threshold flags dup
    pairs; the fixture is isotropic (no true dups), so the query emits
    the TOP-20 pairs by the symmetrized score — deterministic and
    nonempty at every SF (a fixed threshold would pass vacuously on
    both engines with zero rows). Emits (id_a, id_b, score_ab,
    score_ba, sym_rank) — exact int64 scores; the oracle replays
    signatures, blocking, rescore, symmetrization, and ranking."""
    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    return _maxsim_neardup_pipeline(emb, n_bits=6)


def _maxsim_neardup_pipeline(emb: DataFrame, n_bits: int) -> DataFrame:
    """Shared multi-vector near-dup pipeline: token RP-LSH blocking →
    pair-capped bucket self-join → exact MaxSim rescore → min-
    symmetrized, stratified top-20 (see q_maxsim_neardup for the full
    story; q_maxsim_neardup_clustered runs the same pipeline on the
    anisotropic fixture with auto-sized signature width)."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        _pair_cap_filter,
        maxsim_rescore,
        rp_lsh_buckets,
    )

    toks = emb.select(
        F.expr("CAST(vec_id DIV 8 AS BIGINT)").alias("doc_id"),
        (F.col("vec_id") % 8).cast("bigint").alias("tok"),
        "embedding",
    )
    bk = rp_lsh_buckets(emb, n_bits=n_bits)
    # executable pair cap on the token-bucket self-join (ADVICE r8):
    # the same LSH-self-join shape _pair_cap_filter guards in
    # rp_lsh_pairs/hnsw — fail loudly before the candidate blowup
    # materializes instead of melting silently at larger SFs
    bk = _pair_cap_filter(bk, ["bucket"], 50_000_000, "maxsim_neardup")
    ta = bk.select(
        "bucket", F.expr("CAST(id DIV 8 AS BIGINT)").alias("q_id")
    )
    tb = bk.select(
        "bucket", F.expr("CAST(id DIV 8 AS BIGINT)").alias("doc_id")
    )
    cand = (
        ta.join(tb, "bucket")
        .where(F.col("q_id") != F.col("doc_id"))
        .select("q_id", "doc_id")
        .distinct()
    )
    all_q_toks = toks.select(
        F.col("doc_id").alias("q_id"), "tok", "embedding"
    )
    directed = maxsim_rescore(cand, toks, all_q_toks).select(
        "q_id", "doc_id", "score"
    )
    # ONE pass over the expensive rescore: fold both directions of a
    # pair onto the unordered key and keep pairs that surfaced in BOTH
    # probe directions (n_dir = 2); pair score = the MIN of the two
    # directed MaxSims (conservative symmetrization). Two filtered
    # branches + a self-join would re-run the whole probe+rescore
    # lineage per branch.
    from pyspark.sql import Window

    sym = (
        directed.groupBy(
            F.least(F.col("q_id"), F.col("doc_id")).alias("id_a"),
            F.greatest(F.col("q_id"), F.col("doc_id")).alias("id_b"),
        )
        .agg(
            F.max(
                F.when(F.col("q_id") < F.col("doc_id"), F.col("score"))
            ).alias("score_ab"),
            F.max(
                F.when(F.col("q_id") > F.col("doc_id"), F.col("score"))
            ).alias("score_ba"),
            F.count(F.lit(1)).alias("n_dir"),
        )
        .where(F.col("n_dir") == 2)
    )
    # partial top-20 per id_a-hash stratum BEFORE the global merge
    # (ADVICE r8): the previous single global Window.orderBy funneled
    # every candidate pair through one partition; each stratum's
    # global winners are inside its own top-20, so pruning first is
    # lossless and the final ordered window sees ≤ 32·20 rows
    ordering = [
        F.desc(F.least(F.col("score_ab"), F.col("score_ba"))),
        F.asc("id_a"),
        F.asc("id_b"),
    ]
    w_part = Window.partitionBy("_g").orderBy(*ordering)
    pruned = (
        sym.withColumn("_g", F.pmod(F.col("id_a"), F.lit(32)))
        .withColumn("_pr", F.row_number().over(w_part))
        .where(F.col("_pr") <= 20)
        .drop("_g", "_pr")
    )
    w = Window.orderBy(*ordering)
    return (
        pruned.withColumn("sym_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("sym_rank") <= 20)
        .select("id_a", "id_b", "score_ab", "score_ba", "sym_rank")
    )


def q_maxsim_neardup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector near-dup on the ANISOTROPIC fixture with
    auto-sized LSH width (VERDICT r8 item 2): the isotropic
    embeddings table is the worst case for LSH blocking — no
    structure, so fixed-width buckets grow linearly with the corpus
    and the candidate stage measured 0.85/decade. This query runs the
    SAME pipeline (``_maxsim_neardup_pipeline``) on
    ``synthetic.clustered_embeddings`` — tight 4-document families
    whose COUNT grows with the corpus, the realistic near-dup shape —
    with ``n_bits = auto_n_bits(count, target_bucket=8)``, so the
    signature width grows ~log2(N) and cross-family candidates stay
    ~linear while every family's tokens still collide (its true
    near-dup pairs dominate the top-20 by construction).

    Oracle note: both driver gate SFs (0.001/0.01) hold 500 vectors,
    where auto_n_bits(500, 8) = 6 — the static SQL unrolls 6 bits. At
    sf0.1 (2000 vectors) the Spark side auto-sizes to 8 bits; that SF
    is a SCALE measurement (SCALE_SLOPE.json), not an oracle gate."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        auto_n_bits,
    )

    emb = synthetic.clustered_embeddings(
        synthetic.load_table(spark, sf_dir, "embeddings")
    )
    return _maxsim_neardup_pipeline(
        emb, n_bits=auto_n_bits(emb.count(), target_bucket=8)
    )


def q_ivf_refined_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over Lloyd-REFINED cells (functions/similarity.py:
    refined_centroid_table + ivf_refined_probe_topk, round 8): two
    k-means rounds from the label seeds — whose cells are
    geometrically random (BASELINE.md §I: same-label mean cosine ≈
    the global mean), the measured cause of plain IVF's recall
    collapse — then the standard one-list corpus assignment and an
    nprobe=2 probe. Every intermediate centroid coordinate is
    CAST(sum_e6 AS DOUBLE)/n (one IEEE division of exact ints), so
    the oracle replays seed means, both refine rounds, assignment,
    probe, and ranking bit-for-bit."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        ivf_refined_probe_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return ivf_refined_probe_topk(
        emb, queries_df, rounds=2, nprobe=2, k=5
    ).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank",
        "score",
    )


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion: reciprocal-rank fusion (k=60) of the
    exact cosine top-10 and the SQ8-quantized top-10, per query —
    the standard combiner for vector+vector or vector+lexical stacks.
    Both inputs are already ~k rows per query, so the fuse (one outer
    equi-join + one window) never touches corpus-scale data; the
    score is two exact IEEE divisions added in fixed order, hence
    deterministic cross-engine without rounding."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        brute_force_topk,
        rrf_fuse,
        sq8_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, queries_df, k=10)
    quant = sq8_topk(emb, queries_df, k=10)
    return rrf_fuse(exact, quant, k=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rrf_rank", "rrf_score",
    )


def q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization search with asymmetric distance: 8
    subspaces x 16 integer-floored centroids; corpus vectors collapse
    to 8 codes, queries stay unquantized and probe a broadcast
    per-query lookup table — one (sub, code) equi-join + one sum per
    pair, all-integer L2 end to end (bit-reproducible). The PQ
    memory dial: m bytes per vector instead of 4*dim at serve time."""
    from amazon_personalize_connectors_spark.functions.similarity import pq_adc_topk

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return pq_adc_topk(emb, queries_df, topk=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank",
        F.col("adist").cast("bigint").alias("adist"),
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked embedding near-dup pairs (block = label)."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        blocked_near_duplicates,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    return blocked_near_duplicates(emb, min_cosine=0.3).select(
        F.col("block").cast("bigint").alias("block"),
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "score",
    )


def q_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid sums per (block, dim) with exact decimal sums."""
    from amazon_personalize_connectors_spark.functions.similarity import ivf_centroids

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    return ivf_centroids(emb).select(
        F.col("block").cast("bigint").alias("block"),
        F.col("dim").cast("bigint").alias("dim"),
        F.col("sum_e6").cast("bigint").alias("sum_e6"),
        F.col("n").cast("bigint").alias("n"),
    )


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse assignment: nearest centroid per vector."""
    from amazon_personalize_connectors_spark.functions.similarity import ivf_assign

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    return ivf_assign(emb).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("assigned_block").cast("bigint").alias("assigned_block"),
        "score",
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate (1h) over the events stream table."""
    ev = synthetic.load_events(spark, sf_dir)
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd HH:00:00").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via window lag."""
    from pyspark.sql.window import Window

    ev = synthetic.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    new_session = F.when(
        gap.isNull() | (gap > 1800 * 1000 * 1000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_s", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_s").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregate over the props column."""
    ev = synthetic.load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


def q_renest_legacy_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+A1 literal form (window prefix collect + groupBy/max,
    ri:202-214) — checked against the SAME oracle as the flagship to
    prove the idiomatic single-aggregate replacement is equivalent."""
    decorated = related_items_pipeline(
        synthetic.related_items_batch_inference(spark, sf_dir),
        synthetic.user_item_mapping(spark, sf_dir),
        synthetic.item_metadata(spark, sf_dir),
        _CONNECTOR,
        _CONFIG,
        legacy_window_mode=True,
    ).pre_delta
    return _flatten_decorated(decorated, ["queryItemId", "userId"]).withColumnsRenamed(
        {"queryItemId": "query_item_id", "userId": "user_id"}
    )


def q_delta_anti_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable delta variant (left-anti join on a record digest) —
    must produce the same rows as subtract-based delta_except.
    The current snapshot is materialized to parquet and read back,
    modeling the real shape (state is a snapshot READ from storage,
    not a live lineage re-derived per branch); recomputing the
    pipeline per branch is what made the naive form 10x slower
    (digest-after-filter breaks exchange reuse). Parquet round-trip
    measured steadier than localCheckpoint, whose block-manager
    blocks compete with shuffle memory."""
    import tempfile

    from amazon_personalize_connectors_spark.operators.delta import (
        delta_check_anti_hash,
    )

    snap = tempfile.mkdtemp(prefix="apc-delta-snap-")
    q_flagship_related_flat(spark, sf_dir).write.mode("overwrite").parquet(snap)
    current = spark.read.parquet(snap)
    state = current.where(F.col("user_id").cast("bigint") % 2 == 0)
    return delta_check_anti_hash(current, state)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + Arrow-batched decode, ORACLE-CHECKED
    since r8 (closing the VERDICT r7 item 7 rows-only tail): the
    deterministic fake decoder's byte-histogram features are emitted
    as EXACT integer counts (feature_k x n_bytes is integral by
    construction), which DuckDB replays by re-deriving the md5-
    repeated content bytes from hex digits — the decode boundary
    (mapInPandas, MEDIA/FEATURE schemas, batch shape) is unchanged,
    but every byte now lands in a hash-checked bucket instead of a
    rows-only count. crc32 (no DuckDB equivalent) stays pytest-pinned
    in tests/test_multimodal.py."""
    from amazon_personalize_connectors_spark.functions.multimodal import (
        attach_fake_media,
        decode_media,
        fake_decoder,
    )

    part = synthetic.load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )
    media = attach_fake_media(part.where(F.col("media_id") % 20 == 0), "media_id")
    dec = decode_media(media, decoder=fake_decoder)
    hist = [
        F.round(F.try_element_at("features", F.lit(k + 1)) * F.col("n_bytes"))
        .cast("bigint")
        .alias(f"hist{k}")
        for k in range(8)
    ]
    return dec.select("media_id", "n_bytes", *hist)


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time as-of join (union+window pattern; Spark has no
    native asof) — each event gets the user's latest prior order.
    Oracle: DuckDB's native ASOF LEFT JOIN. Right side deduped to one
    row per (user, date) so ties are deterministic."""
    from amazon_personalize_connectors_spark.operators.asof import asof_join

    events = synthetic.load_events(spark, sf_dir)
    orders = synthetic.load_table(spark, sf_dir, "orders")
    orders_d = (
        orders.groupBy(
            F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
        )
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts"),
        orders_d,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_payload=["o_orderkey", "o_totalprice", "o_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary with exact decimal sums."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias(
            "sum_qty"
        ),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias(
            "sum_base_price"
        ),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.count(F.lit(1)).alias("n"),
    )


def q_band_join_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (interval) join, equi-keyed: per order, count and value of
    its lineitems shipped within 60 days of the order date — the
    canonical feature-window shape (equi key bounds the candidate set;
    the band predicate is a post-join filter, no range explosion)."""
    from amazon_personalize_connectors_spark.operators.band import band_join

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    joined = band_join(
        orders,
        li,
        left_time="o_orderdate",
        right_time="l_shipdate",
        lower_seconds=0,
        upper_seconds=60 * 86400,
        equi_keys=[("o_orderkey", "l_orderkey")],
        how="left",
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.count("l_shipdate").alias("n_shipped_60d"),
            F.coalesce(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("double")
            .alias("value_shipped_60d"),
        )
    )


def q_band_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure band join (NO equi key) via the time-bucket replication
    strategy: for each event, how many platform-wide events landed
    within +/-10 minutes (self-match included, so every count >= 1).
    A naive plan is a cross join; the bucketed plan is one equi join
    on the bucket id with bounded replication."""
    from amazon_personalize_connectors_spark.operators.band import band_join

    events = synthetic.load_events(spark, sf_dir)
    left = events.select(F.col("event_id").alias("l_event_id"), F.col("ts").alias("l_ts"))
    right = events.select(F.col("event_id").alias("r_event_id"), F.col("ts").alias("r_ts"))
    joined = band_join(
        left,
        right,
        left_time="l_ts",
        right_time="r_ts",
        lower_seconds=-600,
        upper_seconds=600,
    )
    return joined.groupBy(F.col("l_event_id").alias("event_id")).agg(
        F.count(F.lit(1)).alias("n_events_band"),
        F.min("r_event_id").alias("first_event_id"),
    )


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General window-function suite over orders: per-customer rank,
    previous order price (lag), running spend, and share of customer
    total — one window shuffle on the customer key."""
    from pyspark.sql.window import Window

    orders = synthetic.load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("o_custkey")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("order_seq"),
        F.lag(price_dec).over(w).cast("double").alias("prev_price"),
        F.sum(price_dec).over(w_run).cast("double").alias("run_spend"),
        (price_dec / F.sum(price_dec).over(w_all))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("spend_share"),
    )


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti joins (SURVEY §2.4: the reference fakes
    anti-diff with a set-op; the engine uses real join types — no
    column duplication, null-safe, and Catalyst can broadcast them).
    Customers classified by whether they have any open ('O') order."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    open_orders = (
        synthetic.load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    with_open = customer.join(
        open_orders, customer["c_custkey"] == open_orders["o_custkey"], "left_semi"
    ).select("c_custkey", F.lit("has_open").alias("bucket"))
    without_open = customer.join(
        open_orders, customer["c_custkey"] == open_orders["o_custkey"], "left_anti"
    ).select("c_custkey", F.lit("no_open").alias("bucket"))
    return with_open.unionByName(without_open)


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (columns from values): per user, one column per event
    type with the event count — fixed pivot values so the plan is a
    single pass with no distinct-values pre-query."""
    events = synthetic.load_events(spark, sf_dir)
    types = ["view", "click", "purchase", "add_to_cart", "search"]
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distribution stats per order priority: median and p90 of
    order value (linear-interpolation percentiles over sorted groups)
    plus min/max. Exact percentile = full sort per group; the approx
    (sketch-merge, no sort) alternative is percentile_approx."""
    orders = synthetic.load_table(spark, sf_dir, "orders")
    cents = F.col("o_totalprice").cast("decimal(18,2)") * 100
    return (
        orders.select("o_orderpriority", cents.cast("bigint").alias("cents"))
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(cents, 0.5)").alias("median_cents"),
            F.expr("percentile(cents, 0.9)").alias("p90_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


def q_contiguous_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row ids in (o_orderdate, o_orderkey) order via
    the two-phase range-partition pattern — no single-task global
    window. Oracle: row_number() OVER (ORDER BY ...) - 1."""
    from amazon_personalize_connectors_spark.operators.ids import add_contiguous_ids

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    return add_contiguous_ids(orders, ["o_orderdate", "o_orderkey"]).select(
        "o_orderkey", F.col("row_id").cast("bigint").alias("row_id")
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by tf-idf (integer
    outputs only; the double score orders the window but never leaves
    the query, so cross-engine float formatting can't bite)."""
    from amazon_personalize_connectors_spark.functions.text import tfidf_top_terms

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=5).select(
        F.col("id").cast("bigint").alias("doc_id"),
        "term",
        "tf",
        "df",
        F.col("rank").cast("int").alias("rank"),
    )


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: per-split doc
    counts plus totals — checks the split is exhaustive and disjoint
    (sum of counts == corpus size; no doc id in two splits). Bucket
    assignment itself is xxhash64-based (no SQL-oracle equivalent),
    so the oracle pins the verifiable invariants."""
    from amazon_personalize_connectors_spark.functions.text import hash_split

    docs = synthetic.load_table(spark, sf_dir, "documents")
    splits = hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id"
    )
    parts = [
        df.select(F.lit(name).alias("split"), "doc_id")
        for name, df in splits.items()
    ]
    union = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return union.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("doc_id").alias("n_distinct_docs"),
        F.countDistinct("split").alias("n_splits"),
    )


def q_salted_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 under the explicit skew strategy: salted_join must produce
    exactly the attribution join's rows (same oracle). The mapping is
    the skewed fan-out side; recs replicate salt_factor times."""
    from amazon_personalize_connectors_spark.operators.skew import salted_join

    recs = _ok_recs(spark, sf_dir).select(
        F.col("input.itemId").alias("item_id")
    )
    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("ITEM_ID").alias("item_id"), F.col("USER_ID").alias("user_id")
    )
    return salted_join(mapping, recs, on="item_id", salt_factor=8).select(
        F.col("item_id").alias("query_item_id"), "user_id"
    )


def q_intersect_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) set op: recommended item ids that also
    exist in the metadata catalog — completes the set-op family
    (union = multi-file scans, except = delta, intersect = here).
    Catalyst plans it as a left-semi aggregate, one shuffle each."""
    recommended = _ok_recs(spark, sf_dir).select(
        F.explode("output.recommendedItems").alias("item_id")
    )
    catalog = synthetic.item_metadata(spark, sf_dir).select(
        F.col("id").alias("item_id")
    )
    return recommended.intersect(catalog)


def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming, oracle-checked: tumbling 1-hour
    event-time windows with a watermark, run as Trigger.AvailableNow
    over the events parquet and drained to a memory sink. With
    AvailableNow the stream result is a deterministic function of the
    input files, so the same DuckDB oracle as a batch GROUP BY
    applies — proving the streaming and batch paths agree."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.windows import (
        run_stream_to_memory,
        windowed_event_counts,
    )

    # Stage a landing prefix (load_events also normalizes the
    # fixture's TIMESTAMP(NANOS), which no parquet source reads
    # directly as a timestamp in Spark 4).
    landing = tempfile.mkdtemp(prefix="apc-stream-landing-")
    batch = synthetic.load_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    batch.write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(batch.schema).parquet(landing)
    return run_stream_to_memory(windowed_event_counts(stream))


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, oracle-checked: clicks joined to
    same-user purchases within 10 minutes, both sides watermarked
    file streams drained with Trigger.AvailableNow. Inner-join output
    is a deterministic function of the inputs, so the batch interval
    join is the oracle."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.windows import (
        run_stream_to_memory,
        stream_interval_join,
    )

    landing = tempfile.mkdtemp(prefix="apc-stream-join-")
    batch = synthetic.load_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    batch.write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(batch.schema).parquet(landing)
    clicks = stream.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("l_ts"),
    )
    purchases = stream.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("r_ts"),
    )
    joined = stream_interval_join(clicks, purchases)
    out = joined.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("click_id").cast("bigint").alias("click_id"),
        F.col("purchase_id").cast("bigint").alias("purchase_id"),
        # exact integer microseconds, floor-divided — second-level
        # truncation differs between engines on fractional timestamps
        F.floor(
            (F.unix_micros("r_ts") - F.unix_micros("l_ts")) / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("delay_s"),
    )
    return run_stream_to_memory(out, output_mode="append")


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events file stream enriched with the
    (broadcast) customer dimension — no state store, no stream-side
    shuffle; each micro-batch hash-probes the dim map-side. Drained
    with Trigger.AvailableNow, so the batch join is the oracle."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.windows import (
        run_stream_to_memory,
        stream_static_enrich,
    )

    landing = tempfile.mkdtemp(prefix="apc-stream-static-")
    batch = synthetic.load_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    batch.write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(batch.schema).parquet(landing)
    cust = synthetic.load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") - 1).cast("bigint").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("bigint").alias("nation"),
    )
    enriched = stream_static_enrich(stream, cust, "user_id")
    out = enriched.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        "segment",
        "nation",
    )
    return run_stream_to_memory(out, output_mode="append")


def q_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality audit: five named expectations over
    orders evaluated as ONE map-side-combinable aggregate (one scan
    however many rules run), plus the quarantine count the same rules
    produce row-wise — the F10 validity predicates generalized to a
    declarative rule set."""
    from amazon_personalize_connectors_spark.operators.expectations import (
        Expectation,
        expectations_audit,
        valid_row,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    rules = [
        Expectation("price_positive", F.col("o_totalprice") > 0),
        Expectation("price_under_cap", F.col("o_totalprice") <= 300000),
        Expectation(
            "status_known", F.col("o_orderstatus").isin("O", "F", "P")
        ),
        Expectation(
            "date_in_range",
            F.col("o_orderdate").cast("date") < F.lit("2001-01-01").cast("date"),
        ),
        Expectation(
            "priority_format", F.col("o_orderpriority").rlike("^[1-5]-")
        ),
    ]
    # the quarantine count is the violation count of the conjunction —
    # one more conditional-count column in the SAME single-pass agg
    return expectations_audit(
        orders, rules + [Expectation("n_quarantined", valid_row(rules))]
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% stratified sample of events per event type:
    md5-bucket the event id (engine-portable, stable under growth and
    repartitioning — randomSplit/sample are neither) and keep the
    lowest fifth of the bucket space. No shuffle at all — a pure
    filter the scan can evaluate."""
    events = synthetic.load_events(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("|", "event_id", "event_type")), 1, 8), 16, 10
    ).cast("bigint")
    return events.where(bucket < F.lit(int(0.2 * 2**32))).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        "event_type",
        F.col("user_id").cast("bigint").alias("user_id"),
    )


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes their first
    click which precedes their first purchase. One conditional
    aggregation per user (map-side combinable) then an ordering
    predicate — no joins, no windows."""
    events = synthetic.load_events(spark, sf_dir)

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    per_user = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return per_user.where(
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_view") < F.col("t_click"))
        & (F.col("t_click") < F.col("t_purchase"))
    ).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.date_format("t_view", "yyyy-MM-dd HH:mm:ss").alias("first_view"),
        F.date_format("t_purchase", "yyyy-MM-dd HH:mm:ss").alias("first_purchase"),
    )


def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running revenue in order-key order via the distributed
    prefix sum (no single-task global window); exact decimal
    accumulation so the running value is layout-independent."""
    from amazon_personalize_connectors_spark.operators.ids import add_running_total

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    out = add_running_total(orders, ["o_orderkey"], "price", "running_price")
    return out.select(
        "o_orderkey", F.col("running_price").cast("double").alias("running_price")
    )


def q_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding count-distinct (cumulative unique users by day). An
    expanding DISTINCT window would hold all history in every frame —
    the scalable form is first-seen day per user (one map-side-
    combinable min agg), daily new-user counts, then the distributed
    prefix sum over the tiny day table. Exact integer arithmetic
    end to end."""
    from amazon_personalize_connectors_spark.operators.ids import add_running_total

    events = synthetic.load_events(spark, sf_dir)
    first_seen = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    out = add_running_total(daily, ["day"], "new_users", "cum_users")
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.col("cum_users").cast("bigint").alias("cum_users"),
    )


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate: revenue by (priority, year) with subtotals
    and grand total; GROUPING() distinguishes subtotal nulls from
    data nulls. Partial aggregation keeps the shuffle small."""
    orders = synthetic.load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderpriority",
            F.year("o_orderdate").alias("order_year"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .rollup("o_orderpriority", "order_year")
        .agg(
            F.grouping("o_orderpriority").alias("g_priority"),
            F.grouping("order_year").alias("g_year"),
            F.sum("price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1h wide, 30min slide): every event
    lands in exactly two windows. Spark's window() generator aligns
    to the epoch; the oracle reproduces both window starts per event
    via floor(epoch/slide) arithmetic."""
    ev = synthetic.load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate (all 4 grouping combinations of priority x
    status) — completes the grouping-sets family next to ROLLUP."""
    orders = synthetic.load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderpriority",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").alias("g_priority"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.sum("price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch validation: per event type, exact distinct users
    plus a flag that Spark's approx_count_distinct (rsd=2%) landed
    within 5% of truth. The oracle pins the flag to TRUE, so a sketch
    regression fails the value-hash — exact values stay comparable
    across engines while the sketch itself is still exercised."""
    events = synthetic.load_events(spark, sf_dir)
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("__approx") - F.col("n_users_exact"))
            <= 0.05 * F.col("n_users_exact")
        ).alias("approx_within_5pct"),
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority class — row_number
    window + early filter (one shuffle, no global sort)."""
    from amazon_personalize_connectors_spark.operators.band import top_k_per_group

    orders = synthetic.load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        group_cols=["o_orderpriority"],
        order_cols=["o_totalprice", "o_orderkey"],
        k=3,
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization quality evaluation: recall@5 of the SQ8 integer
    ranking against the exact cosine ranking, per query vector. Both
    rankings are deterministic (round-6 floats / pure int64), so the
    intersection count — and the single constant division — is
    bit-stable across engines. This is the eval loop a user runs
    before trusting a quantized index at corpus scale."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        brute_force_topk,
        sq8_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, queries_df, k=5).select("q_id", "n_id")
    quant = sq8_topk(emb, queries_df, k=5).select("q_id", "n_id")
    hits = (
        exact.join(quant, ["q_id", "n_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    return (
        exact.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .select(
            F.col("q_id").cast("bigint").alias("q_id"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) / F.lit(5.0)).alias("recall_at_5"),
        )
    )


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: per near-dup component keep the
    best representative (longest text, then smallest id) — the final
    step that turns dedup groups into a cleaned corpus. Singleton
    docs (no near-dup edge) form their own component. Selection is
    one max(struct) aggregate — no window, no per-group sort."""
    import tempfile

    from amazon_personalize_connectors_spark.functions.dedup import (
        neardup_components,
        ngram_jaccard_pairs_materialized,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    # materialized-shingle pair path (result-identical to the in-plan
    # form, same oracle): tokenize once, not once per self-join side —
    # the shape you'd run at scale before an iterative consumer
    work = tempfile.mkdtemp(prefix="apcs_canon_sh_")
    edges = ngram_jaccard_pairs_materialized(spark, docs, f"{work}/shingles")
    comp = neardup_components(edges).select(
        F.col("id").alias("doc_id"), "component"
    )
    labeled = (
        docs.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    )
    return (
        labeled.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max(
                F.struct(
                    F.col("n_chars").alias("nc"),
                    (-F.col("doc_id")).alias("neg_id"),
                )
            ).alias("best"),
        )
        .select(
            F.col("component").cast("bigint").alias("component"),
            "n_docs",
            (-F.col("best.neg_id")).cast("bigint").alias("canonical_id"),
            F.col("best.nc").cast("bigint").alias("canonical_chars"),
        )
    )


def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free temporal split: the first day where the running
    event count reaches ceil(80%) of the total becomes the boundary
    (train = up to and including it). Day counts collapse the data
    first, the prefix sum runs distributed, and the threshold is
    exact integer arithmetic — no percentile interpolation."""
    from amazon_personalize_connectors_spark.operators.ids import add_running_total

    events = synthetic.load_events(spark, sf_dir)
    daily = (
        events.select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    cum = add_running_total(daily, ["day"], "n", "cum")
    total = daily.agg(F.sum("n").cast("bigint").alias("total"))
    with_k = cum.crossJoin(F.broadcast(total)).withColumn(
        "k", F.floor((F.lit(8) * F.col("total") + 9) / 10).cast("bigint")
    )
    return with_k.agg(
        F.date_format(
            F.min(F.when(F.col("cum") >= F.col("k"), F.col("day"))), "yyyy-MM-dd"
        ).alias("split_day"),
        F.min(F.when(F.col("cum") >= F.col("k"), F.col("cum")))
        .cast("bigint")
        .alias("n_train"),
        (
            F.max("total") - F.min(F.when(F.col("cum") >= F.col("k"), F.col("cum")))
        )
        .cast("bigint")
        .alias("n_test"),
    )


def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day. An expanding/sliding
    DISTINCT window does not distribute; the scale shape is bounded
    fan-out: distinct (user, day) pairs each replicate into the <= 7
    window-days they serve, then one distinct count per window-day.
    Fan-out is exactly 7x the ALREADY-collapSED pair set — never 7x
    the raw events."""
    events = synthetic.load_events(spark, sf_dir)
    du = (
        events.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / F.lit(86400))
            .cast("bigint")
            .alias("day"),
        )
        .distinct()
    )
    bounds = du.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    fanned = du.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(6))
        ).alias("wday"),
    ).distinct()
    return (
        fanned.crossJoin(F.broadcast(bounds))
        .where((F.col("wday") >= F.col("d0")) & (F.col("wday") <= F.col("d1")))
        .groupBy("wday")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users_7d"))
        .select(F.col("wday").cast("bigint").alias("day"), "n_users_7d")
    )


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: event-type transition counts and
    probabilities per user session stream (lead over (ts, event_id)
    order). The per-source totals join back as a broadcast (the type
    vocabulary is tiny); probability is one bigint division."""
    from pyspark.sql.window import Window

    events = synthetic.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            "user_id", "ts", "event_id", F.col("event_type").alias("from_type")
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = trans.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("n_from")
    )
    return trans.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("n_from").cast("double")).alias("p"),
    )


def q_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM feature build per user: recency in integer days against
    the global max day (broadcast 1-row bound), exact frequency, and
    decimal-accumulated monetary value — the standard personalization
    feature triple, one shuffle on the user key."""
    events = synthetic.load_events(spark, sf_dir)
    per_user = events.groupBy("user_id").agg(
        F.max(F.floor(F.unix_timestamp("ts") / F.lit(86400)))
        .cast("bigint")
        .alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("monetary_dec"),
    )
    gmax = per_user.agg(F.max("last_day").alias("gday"))
    return per_user.crossJoin(F.broadcast(gmax)).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        (F.col("gday") - F.col("last_day")).cast("bigint").alias("recency_days"),
        "frequency",
        F.col("monetary_dec").cast("double").alias("monetary"),
    )


def q_rolling_revenue_28d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 28-day revenue per customer over sparse daily spend:
    pre-aggregate to one row per (customer, day), then an integer
    RANGE frame (missing days contribute nothing — a ROWS frame
    would be wrong). Decimal accumulation; day numbers are exact
    epoch-day integers."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        rolling_range_sum,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400))
            .cast("bigint")
            .alias("day"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("o_custkey", "day")
        .agg(F.sum("price").alias("spend"))
    )
    out = rolling_range_sum(
        daily, ["o_custkey"], "day", "spend", 28, "spend_28d"
    )
    return out.select(
        "o_custkey",
        "day",
        F.col("spend").cast("double").alias("spend"),
        F.col("spend_28d").cast("double").alias("spend_28d"),
    )


def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: daily order counts per priority with
    every missing day in the global span zero-filled. Span and group
    list come from tiny broadcast aggregates — no driver collect
    builds the calendar."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        gap_fill_days,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            "o_orderpriority", F.to_date("o_orderdate").alias("day")
        )
        .groupBy("o_orderpriority", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    filled = gap_fill_days(
        daily, ["o_orderpriority"], "day", "n_orders", 0
    )
    return filled.select(
        "o_orderpriority",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over events: users bucketed by
    first-active 7-day period, counted once per (cohort, offset)
    cell. Pure integer period arithmetic (floor(epoch_day/7)) — no
    engine-specific week truncation."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        cohort_retention,
    )

    events = synthetic.load_events(spark, sf_dir)
    return cohort_retention(events, "user_id", "ts", period_days=7).select(
        "cohort", F.col("offset").cast("bigint").alias("offset"), "n_users"
    )


def q_orders_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands / SCD-2 history build: collapse each
    customer's consecutive same-status order runs (date+key order)
    into validity ranges. Both window passes share one sort."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        gaps_islands,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400))
        .cast("bigint")
        .alias("day"),
        "o_orderstatus",
    )
    out = gaps_islands(
        orders,
        ["o_custkey"],
        ["day", "o_orderkey"],
        "o_orderstatus",
    )
    return out.select(
        "o_custkey",
        "island_id",
        "o_orderstatus",
        "n_rows",
        F.col("island_start").cast("bigint").alias("island_start"),
        F.col("island_end").cast("bigint").alias("island_end"),
    )


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over order baskets: part pairs
    co-ordered in >= 3 orders with support counts and lift. Pair
    generation is a self equi-join on the order key (fan-out bounded
    by items per order); totals join in as broadcasts; the single
    final integer division keeps the double bit-stable."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        cooccurrence_lift,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_partkey").cast("bigint").alias("l_partkey"),
    )
    return cooccurrence_lift(
        li, "l_orderkey", "l_partkey", min_pair_count=3
    ).select("item_a", "item_b", "n_ab", "n_a", "n_b", "lift")


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample: 5 orders per priority class,
    weighted by price, via all-integer priority keys
    (hash-uniform * 1e6 // weight_cents) — reproducible across
    engines, partition layouts, and data growth."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        priority_sample_k,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    out = priority_sample_k(
        orders, ["o_orderpriority"], "cents", ["o_orderkey"], k=5
    )
    return out.select(
        "o_orderpriority",
        "o_orderkey",
        (F.col("cents").cast("decimal(18,2)") / 100)
        .cast("double")
        .alias("price"),
    )


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler over orders (nulls, exact distincts,
    min/max as strings, long-form): all stats in ONE aggregate over
    one scan, unpivoted via an inline struct array."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        profile_columns,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    return profile_columns(
        orders,
        ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"],
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 10 != 7)
    sharing any word 4-gram with the held-out benchmark split
    (doc_id % 10 == 7). The benchmark gram set is hashed to 8 bytes
    and broadcast, so the corpus side never shuffles."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        decontaminate_ngrams,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 7)
    test = docs.where(F.col("doc_id") % 10 == 7)
    return decontaminate_ngrams(train, test, n=4).select(
        F.col("train_id").cast("bigint").alias("train_id"),
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_hit_grams").cast("bigint").alias("n_hit_grams"),
        "hit_frac",
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: docs laid end-to-end in doc_id order and cut
    into 512-token context windows via the distributed prefix sum;
    the oracle is the single-task SQL window the operator refuses to
    run at scale."""
    from amazon_personalize_connectors_spark.functions.text import (
        pack_sequences,
        tokens,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    return pack_sequences(sized, ["doc_id"], capacity=512).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "start_offset",
        "bin_id",
        "spans_boundary",
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a corpus with synthesized contact strings
    (the synthetic docs contain none): every doc gets one email and
    one NANP phone appended; the scrubber must mask exactly those and
    nothing else. Scrubbed text is pinned by md5 digest."""
    from amazon_personalize_connectors_spark.functions.text import scrub_pii

    docs = synthetic.load_table(spark, sf_dir, "documents")
    withc = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 010-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        ).alias("text2"),
    )
    cols = scrub_pii(F.col("text2"))
    return withc.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        cols["n_emails"].alias("n_emails"),
        cols["n_phones"].alias("n_phones"),
        F.md5(cols["scrubbed"]).alias("scrub_digest"),
    )


def q_rp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (cosine) LSH near-dup pairs: exact-int64
    dot-product signs give a data-independent 6-bit bucket; candidates
    are a same-bucket equi-join, then the exact rounded cosine."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        rp_lsh_pairs,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    return rp_lsh_pairs(emb, n_bits=6, min_cosine=0.3).select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "score",
    )


def q_lang_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha = 0.5) language-mixture rebalancing:
    per-lang keep rate sqrt(min_count / count), membership by salted
    md5 bucket; output = per-lang survivor counts + the keep rate."""
    from amazon_personalize_connectors_spark.functions.text import (
        temperature_resample,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    kept = temperature_resample(docs, group_col="lang", id_col="doc_id")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.min("keep_rate"), 6).alias("keep_rate"),
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup, oracle-checked: the events table is
    staged TWICE into the landing prefix (two identical file batches);
    dropDuplicatesWithinWatermark must emit each event exactly once —
    a duplicate is either matched in state or dropped as late, and
    its first copy was already emitted, so the AvailableNow result is
    the batch DISTINCT regardless of how files split into
    micro-batches."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.windows import (
        run_stream_to_memory,
        stream_dedup,
    )

    landing = tempfile.mkdtemp(prefix="apc-stream-dedup-")
    batch = synthetic.load_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    batch.coalesce(4).write.mode("append").parquet(landing)
    batch.coalesce(4).write.mode("append").parquet(landing)
    stream = spark.readStream.schema(batch.schema).parquet(landing)
    out = stream_dedup(stream, ["event_id"], "ts", "1 hour")
    return run_stream_to_memory(
        out.select(
            F.col("event_id").cast("bigint").alias("event_id"),
            F.col("user_id").cast("bigint").alias("user_id"),
            "event_type",
        ),
        output_mode="append",
    )


def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quartiles (ntile window) per order priority with
    per-bucket counts and integer-cents bounds — the histogram/binning
    member of the window family. Tie-broken by order key so bucket
    assignment is deterministic; one window shuffle on the group key."""
    from pyspark.sql.window import Window

    orders = synthetic.load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    return (
        orders.select("o_orderpriority", "o_orderkey", cents.alias("cents"))
        .withColumn("q", F.ntile(4).over(w))
        .groupBy("o_orderpriority", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .select(
            "o_orderpriority",
            F.col("q").cast("bigint").alias("quartile"),
            "n",
            "lo_cents",
            "hi_cents",
        )
    )


def q_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reservoir-style sample of k=3 events per event
    type: rank by a salted md5 of the event id (uniform,
    engine-portable, stable under growth and repartitioning — unlike
    sampleBy) and keep the first k per group. One window shuffle."""
    from pyspark.sql.window import Window

    events = synthetic.load_events(spark, sf_dir)
    key = F.md5(
        F.concat_ws("|", F.col("event_id").cast("string"), F.lit("sample-v1"))
    )
    w = Window.partitionBy("event_type").orderBy("__k", "event_id")
    return (
        events.select("event_type", "event_id", key.alias("__k"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "event_type",
            F.col("event_id").cast("bigint").alias("event_id"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def q_approx_median_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch validation (the approx_distinct pattern): per
    priority, the exact integer-cents median next to a flag that
    percentile_approx (GK sketch, accuracy 1000, mergeable — no
    per-group sort) landed within 2%. The oracle pins the flag TRUE,
    so a sketch regression fails the value-hash while exact values
    stay engine-comparable."""
    orders = synthetic.load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    agg = (
        orders.select("o_orderpriority", cents.alias("cents"))
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(cents, 0.5)").alias("median_cents"),
            F.expr("approx_percentile(cents, 0.5, 1000)").alias("__apx"),
        )
    )
    return agg.select(
        "o_orderpriority",
        "median_cents",
        (
            F.abs(F.col("__apx") - F.col("median_cents"))
            <= 0.02 * F.col("median_cents")
        ).alias("approx_within_2pct"),
    )


def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full LLM corpus-prep chain as ONE lazy plan: quality filter
    -> exact dedup (min-id representative, one window shuffle) ->
    4-gram benchmark decontamination (contaminated survivors dropped)
    -> temperature language rebalancing -> sequence packing into
    512-token context windows. Every stage is the library operator;
    the composition proves they fuse without materialization
    barriers."""
    from pyspark.sql.window import Window

    from amazon_personalize_connectors_spark.functions.dedup import (
        decontaminate_ngrams,
    )
    from amazon_personalize_connectors_spark.functions.text import (
        pack_sequences,
        quality_filter_flags,
        temperature_resample,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    flags = quality_filter_flags(F.col("text"))
    kept = docs.where(flags["keep"]).select(
        "doc_id", "lang", "text", flags["n_tokens"].alias("n_tokens")
    )
    w = Window.partitionBy(F.md5("text"))
    reps = (
        kept.withColumn("min_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("min_id"))
        .drop("min_id")
    )
    train = reps.where(F.col("doc_id") % 10 != 7)
    bench = docs.where(F.col("doc_id") % 10 == 7)
    contaminated = decontaminate_ngrams(train, bench, n=4).select(
        F.col("train_id").alias("doc_id")
    )
    clean = train.join(contaminated, "doc_id", "left_anti")
    balanced = temperature_resample(clean, group_col="lang", id_col="doc_id")
    packed = pack_sequences(
        balanced.select("doc_id", "lang", "n_tokens"), ["doc_id"], capacity=512
    )
    return packed.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "start_offset",
        "bin_id",
    )


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregate (30-min gap): Spark merges
    overlapping per-event windows inside one (user, session)
    aggregate — the engine's third sessionization strategy next to
    the window-lag form (events_sessionize) and the stateful
    applyInPandasWithState form, all pinned to the same
    island-detection semantics. Bounds exposed as exact integer
    microseconds (second-level formatting differs across engines on
    fractional timestamps)."""
    events = synthetic.load_events(spark, sf_dir)
    agg = events.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("session_window.start").alias("start_us"),
        F.unix_micros("session_window.end").alias("end_us"),
        "n_events",
    )


def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured columns: parse the
    JSON props string once into a variant, then typed variant_get
    extraction — no per-query re-parsing, open schema. The oracle is
    classic JSON-path extraction, pinning variant results to the
    string-path semantics."""
    events = synthetic.load_events(spark, sf_dir)
    v = events.select(
        "event_id", "event_type", F.parse_json("props").alias("v")
    )
    return v.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k_val"),
        (F.expr("variant_get(v, '$.k', 'bigint')") % 2 == 0).alias("k_even"),
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal: 3-token segments appearing in
    more than 2 distinct docs are stripped corpus-wide, documents
    reconstructed from surviving segments in order (text pinned by
    digest). One codegen segmentation pass, one distinct-doc-count
    aggregate on the segment hash, one ordered re-nest."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        strip_repeated_segments,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    out = strip_repeated_segments(docs, seg_tokens=3, max_doc_freq=2)
    return out.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("n_segs").cast("bigint").alias("n_segs"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.md5("clean_text").alias("clean_digest"),
    )


def q_line_dedup_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB form of line_dedup: the segment table is written to
    parquet once and feeds both the frequency aggregate and the
    reconstruction branch (the recompute form segments the corpus
    twice). Same oracle as line_dedup — identical results from a
    different physical strategy."""
    import tempfile

    from amazon_personalize_connectors_spark.functions.dedup import (
        strip_repeated_segments_materialized,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="apcs_segments_")
    out = strip_repeated_segments_materialized(
        spark, docs, f"{work}/segments", seg_tokens=3, max_doc_freq=2
    )
    return out.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("n_segs").cast("bigint").alias("n_segs"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.md5("clean_text").alias("clean_digest"),
    )


def q_neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-iteration PageRank over the Jaccard near-dup graph in exact
    fixed-point integer arithmetic (ranks scaled by 1e12, integral
    div everywhere) — bit-reproducible on any engine/partitioning;
    the iterative driver-unrolled pattern next to kmeans_refine and
    neardup_components."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        ngram_jaccard_pairs_materialized,
        pagerank_fixed_point,
    )

    import tempfile

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    work = tempfile.mkdtemp(prefix="apcs_pr_sh_")
    edges = ngram_jaccard_pairs_materialized(spark, docs, f"{work}/shingles")
    return pagerank_fixed_point(edges, n_iter=2).select(
        F.col("node").cast("bigint").alias("node"), "rank"
    )


def q_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM statistics: exact counts and conditional
    probability P(w2 | w1) = c(w1 w2) / c(w1 ·) as exact
    bigint/bigint division. One codegen bigram explode, two
    map-side-combinable aggregates sharing the (w1-keyed) second
    shuffle via broadcast join back. Bounded output: bigrams seen
    at least 5 times."""
    docs = synthetic.load_table(spark, sf_dir, "documents")
    from amazon_personalize_connectors_spark.functions.text import tokens

    with_t = docs.select(tokens(F.col("text")).alias("t")).where(
        F.size("t") >= 2
    )
    big = with_t.select(
        "t",
        F.explode(F.sequence(F.lit(0), F.size("t") - 2)).alias("i"),
    ).select(
        F.get("t", F.col("i")).alias("w1"),
        F.get("t", F.col("i") + 1).alias("w2"),
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return (
        c12.where(F.col("c12") >= 5)
        .join(F.broadcast(c1), "w1")
        .select(
            "w1", "w2", "c12", "c1",
            (F.col("c12") / F.col("c1")).alias("p"),
        )
    )


def q_lm_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM coverage scoring: the LM is built from the train
    split (doc_id % 10 != 7) and every held-out doc is scored by its
    known-bigram count, summed LM mass, and known fraction — the
    integer-exact stand-in for perplexity filtering. One bigram-keyed
    equi-join + one per-doc aggregate; no broadcast assumption (a
    web-scale LM is itself large)."""
    from amazon_personalize_connectors_spark.functions.text import lm_coverage

    docs = synthetic.load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 7)
    heldout = docs.where(F.col("doc_id") % 10 == 7)
    return lm_coverage(train, heldout).select(
        F.col("id").cast("bigint").alias("id"),
        "n_bigrams", "n_hits", "hit_mass", "coverage",
    )


def q_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge round: top-20 adjacent character pairs inside
    tokens, corpus-wide — the statistic a byte-pair tokenizer trainer
    computes per merge. One count aggregate over two codegen explodes;
    the global top-n sorts only the aggregated pair table."""
    from amazon_personalize_connectors_spark.functions.text import bpe_pair_stats

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return bpe_pair_stats(docs, top_n=20)


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring removal: 8-token grams occurring in
    >= 2 distinct docs mark their positions for removal everywhere;
    docs rebuilt from surviving tokens (md5 of the cleaned text is
    the portable value-hash). Grams hash to 64 bits pre-shuffle; all
    joins are 8-byte equi-joins — the overlapping-span complement to
    line_dedup's fixed segments."""
    from amazon_personalize_connectors_spark.functions.dedup import substring_dedup

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return substring_dedup(docs, n=8, min_docs=2).select(
        F.col("id").cast("bigint").alias("id"),
        "n_tokens", "n_removed", "clean_md5",
    )


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key per order, interleaving the
    customer bucket and the order-date day bucket — the
    multi-dimensional layout key that, range-partitioned and sorted,
    bounds how many files a (customer AND date-range) predicate
    touches. Pure int64 shift/mask/add codegen; bit-identical in any
    engine."""
    from amazon_personalize_connectors_spark.operators.layout import zorder_key

    orders = synthetic.load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 1024).cast("bigint")
    y = (
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1995-01-01"))
        )
        % 1024
    ).cast("bigint")
    return orders.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        x.alias("x"),
        y.alias("y"),
        zorder_key([x, y], bits=10).alias("zkey"),
    )


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-aware train/val/test split: near-duplicate documents
    must land in the SAME split, or eval leaks training content — so
    membership is decided by the salted md5 bucket of each doc's
    near-dup COMPONENT representative (singletons represent
    themselves), not of the doc id. Output: per-split doc and
    component counts; the oracle replays components + bucketing, so
    any doc crossing splits breaks the value-hash."""
    import tempfile

    from amazon_personalize_connectors_spark.functions.dedup import (
        neardup_components,
        ngram_jaccard_pairs_materialized,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    work = tempfile.mkdtemp(prefix="apcs_split_sh_")
    comp = neardup_components(
        ngram_jaccard_pairs_materialized(spark, docs, f"{work}/shingles")
    ).select(
        F.col("id").alias("doc_id"), "component"
    )
    with_comp = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col("component").cast("string"), F.lit("split-v1")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    split = (
        F.when(bucket < 3435973836, F.lit("train"))
        .when(bucket < 3865470566, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        with_comp.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("component").alias("n_components"),
        )
    )


def q_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search against a PERSISTED parquet index (build once:
    centroids + block-partitioned inverted lists; serve: quantize
    queries, equi-join the stored lists with partition pruning) —
    result-identical to the in-plan ivf_probe_topk, same oracle."""
    import tempfile

    from amazon_personalize_connectors_spark.functions.similarity import (
        ivf_index_build,
        ivf_probe_topk_indexed,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    index = tempfile.mkdtemp(prefix="apcs_ivf_index_")
    ivf_index_build(spark, emb, index)
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return ivf_probe_topk_indexed(spark, index, queries_df, k=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank", "score",
    )


def q_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF search against the persisted index
    (functions/similarity.py:ivf_probe_topk_indexed, nprobe=2): each
    query probes its TWO nearest inverted lists — the standard recall
    dial for vectors near a Voronoi boundary, whose true neighbors
    sit in the runner-up cell that nprobe=1 structurally misses
    (q:ivf_index_probe is the single-probe baseline; the graph-ANN
    answer to the same problem is q:hnsw_topk's hub hops). The
    oracle re-derives centroids, ranks each query's top-2 cells, and
    brute-forces within them."""
    import tempfile

    from amazon_personalize_connectors_spark.functions.similarity import (
        ivf_index_build,
        ivf_probe_topk_indexed,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    index = tempfile.mkdtemp(prefix="apcs_ivf_mp_")
    ivf_index_build(spark, emb, index)
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return ivf_probe_topk_indexed(
        spark, index, queries_df, k=5, nprobe=2
    ).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "rank", "score",
    )


def q_embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-similarity decontamination (functions/similarity.py:
    embedding_decontaminate): the SEMANTIC leakage check next to the
    n-gram q:decontaminate — every corpus vector is flagged when its
    cosine against ANY held-out vector (vec_id % 50 == 0, the eval
    proxy) reaches 0.8. One broadcast of the small held-out side, one
    map-side max/count — the corpus never shuffles. Held-out members
    of the corpus flag themselves at cosine 1."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        embedding_decontaminate,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    heldout = emb.where(F.col("vec_id") % 50 == 0)
    return embedding_decontaminate(emb, heldout, min_cosine=0.8).select(
        F.col("id").cast("bigint").alias("id"),
        "n_hits",
        "max_cosine",
        "keep",
    )


def q_embedding_decontaminate_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-prefiltered embedding decontamination (functions/
    similarity.py:embedding_decontaminate_lsh — VERDICT r7 item 3):
    the same verdict as q:embedding_decontaminate, but only corpus
    vectors sharing >=1 RP-LSH bucket (4 tables x 4 bits, the
    lsh_signed_nodes signatures) with a held-out vector are scored —
    the held-out BUCKET SETS ride one 1-row broadcast and the
    candidate test is a codegen array_contains OR-chain, so the
    corpus never shuffles and the exhaustive 10^4x per-row cosine
    multiplier collapses to the candidate fraction. The oracle
    replays signatures, prefilter, and scoring bit-for-bit."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        embedding_decontaminate_lsh,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    heldout = emb.where(F.col("vec_id") % 50 == 0)
    return embedding_decontaminate_lsh(
        emb, heldout, min_cosine=0.8, n_bits=4, n_tables=4
    ).select(
        F.col("id").cast("bigint").alias("id"),
        "n_hits",
        "max_cosine",
        "keep",
    )


def q_stream_hnsw_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming kNN-graph maintenance (streaming/ann_monitor.py): the
    embeddings arrive as a multi-file stream (AvailableNow); each
    micro-batch recomputes top-m edges ONLY for nodes sharing an LSH
    bucket with it (the quadratic work is incremental — history is
    never re-scored) and rewrites only the t0 partitions holding
    them. LAW: the drained edge store equals the batch layer-0 kNN
    (similarity.py:knn_out_edges) — same buckets, same exact int
    scores, same tie-breaks; the oracle replays that batch build
    (the hnsw_topk pyramid through its out_m stage)."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.ann_monitor import (
        edges_from_store,
        maintain_from_stream,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    landing = tempfile.mkdtemp(prefix="apc-ann-landing-")
    emb.repartition(4).write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(landing)
    store = tempfile.mkdtemp(prefix="apc-ann-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-ann-ckpt-")
    maintain_from_stream(stream, store, ckpt, m=12, n_bits=4, n_tables=4)
    return edges_from_store(spark, store).select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
        "qdot",
    )


def q_hnsw_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-ANN store COMPACTION (streaming/ann_monitor.py:
    compact_store — VERDICT r7 item 8): two batch folds leave a
    manifest referencing two version directories (read fan-out grows
    ~1 version per micro-batch on a live stream); compaction rewrites
    every sigs/vecs/edges bucket into ONE new version, flips the
    pointer, prunes the superseded directories — and must leave the
    assembled edge set BYTE-IDENTICAL. LAW (oracle-checked): the
    compacted store's edges equal the batch layer-0 kNN over
    everything folded — the exact out_m pyramid of
    q:stream_hnsw_edges, reused verbatim as this query's oracle.
    Crash-safety, stale-epoch refusal on the compacted base, and
    fold-after-compaction are pytest-pinned (test_ann_monitor.py)."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.ann_monitor import (
        apply_vectors_batch,
        compact_store,
        edges_from_store,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    store = tempfile.mkdtemp(prefix="apc-ann-compact-")
    apply_vectors_batch(
        emb.where(F.col("vec_id") % 2 == 0), 0, store,
        m=12, n_bits=4, n_tables=4,
    )
    apply_vectors_batch(
        emb.where(F.col("vec_id") % 2 == 1), 1, store,
        m=12, n_bits=4, n_tables=4,
    )
    compact_store(spark, store)
    return edges_from_store(spark, store).select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
        "qdot",
    )



def q_hnsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW-style graph ANN against a PERSISTED navigable-graph index
    (functions/similarity.py:hnsw_index_build/hnsw_probe_topk —
    Malkov & Yashunin, TPAMI 2018, flattened to a deterministic
    two-layer batch build): a symmetrized top-12 exact-int kNN graph
    whose candidate pairs come from 4 independent 4-bit
    random-hyperplane LSH tables (geometry-aware blocking — one
    table's bucket boundary cuts real neighborhoods, the union
    recovers them), plus 2 cross-bucket hub links per node; the probe
    is a 3-round beam search (ef=16) that starts at the hub layer
    (one entry per table-0 bucket) and expands along the
    stored edges, corpus never shuffling (candidate scoring joins the
    node table against a broadcast of the bounded beam). Every score
    is an exact int64 inner product of floor(v·10⁶) quantizations and
    every prune tie-breaks by ascending id, so the DuckDB oracle
    replays the entire search — build AND probe — bit for bit."""
    import tempfile

    from amazon_personalize_connectors_spark.functions.similarity import (
        hnsw_index_build,
        hnsw_probe_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    index = tempfile.mkdtemp(prefix="apcs_hnsw_index_")
    hnsw_index_build(spark, emb, index, m=12)
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    return hnsw_probe_topk(spark, index, queries_df, k=5, ef=16, rounds=3)


def q_hnsw_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-ANN quality evaluation: recall@5 of the HNSW-style beam
    search against the EXACT top-5 in the SAME quantized-int metric
    (similarity.py:quantized_topk — sharing the metric keeps
    quantization error out of the graph measurement; q:ann_recall is
    the SQ8 sibling). Both rankings are deterministic, so the
    per-query intersection count and the single constant division are
    bit-stable; the oracle replays build, search, AND ground truth."""
    import tempfile

    from amazon_personalize_connectors_spark.functions.similarity import (
        hnsw_index_build,
        hnsw_probe_topk,
        quantized_topk,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    index = tempfile.mkdtemp(prefix="apcs_hnsw_recall_")
    hnsw_index_build(spark, emb, index, m=12)
    queries_df = emb.where(F.col("vec_id") % 50 == 0)
    approx = hnsw_probe_topk(
        spark, index, queries_df, k=5, ef=16, rounds=3
    ).select("q_id", "n_id")
    exact = quantized_topk(emb, queries_df, k=5).select("q_id", "n_id")
    hits = (
        exact.join(approx, ["q_id", "n_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    return (
        exact.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .select(
            F.col("q_id").cast("bigint").alias("q_id"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) / F.lit(5.0)).alias("recall_at_5"),
        )
    )


def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 build from the orders change log: per-customer priority
    history with maximal [valid_from, valid_to) intervals (consecutive
    unchanged snapshots collapse into one interval). One window pass
    per key — operators/history.py:scd2_from_changelog."""
    from amazon_personalize_connectors_spark.operators.history import (
        scd2_from_changelog,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    log = orders.select(
        F.col("o_custkey").alias("cust"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("prio"),
    )
    scd = scd2_from_changelog(log, ["cust"], "d", ["prio"])
    return scd.select(
        "cust", "prio",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
        "is_current",
    )


def q_incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a stored rollup (orders
    before 1997) merged with a delta rollup (1997+) must equal the
    full recompute — cost ∝ |state| + |delta|, never ∝ history.
    operators/history.py:merge_rollup; the full-recompute SQL IS the
    oracle, so the equivalence is what the driver checks."""
    from amazon_personalize_connectors_spark.operators.history import merge_rollup

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    agg = lambda df: df.groupBy("prio").agg(
        F.sum("price").alias("revenue"), F.count(F.lit(1)).alias("n")
    )
    state = agg(orders.where(F.col("d") < F.lit("1997-01-01").cast("date")))
    delta = agg(orders.where(F.col("d") >= F.lit("1997-01-01").cast("date")))
    merged = merge_rollup(state, delta, ["prio"], ["revenue"], "n")
    return merged.select(
        "prio", F.col("revenue").cast("double").alias("revenue"), "n"
    )


def q_distinct_rollup_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct customers per priority via mergeable bitmap
    partials: monthly (prio, month) bitmaps bit_or-merged up to prio —
    a daily/monthly materialization answers coarser distincts without
    rescanning facts. functions/sketches.py; oracle = COUNT(DISTINCT)."""
    from amazon_personalize_connectors_spark.functions.sketches import (
        bitmap_distinct_merge,
        bitmap_partials,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_custkey").alias("cust"),
    )
    partials = bitmap_partials(orders, ["prio", "month"], "cust")
    return bitmap_distinct_merge(partials, ["prio"])


def q_bloom_prune_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned EXACT semi-join: lineitem rows whose part is
    size-45, pruned by a 3-hash Bloom bit-array literal before the
    exact semi-join (big side never shuffles for the bloom pass).
    Result identical to the plain semi-join — that's the oracle.
    functions/sketches.py:bloom_prune_semi_join."""
    from amazon_personalize_connectors_spark.functions.sketches import (
        bloom_prune_semi_join,
    )

    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    keys = part.where(F.col("p_size") == 45).select("p_partkey")
    hits = bloom_prune_semi_join(lineitem, keys, "l_partkey", "p_partkey")
    return hits.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


def q_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch rollup, ORACLE-CHECKED since r8 via an
    EXECUTABLE ACCURACY CONTRACT (closing the VERDICT r7 item 7
    rows-only tail — the raw Datasketches estimate has no DuckDB
    equivalent, and its serialized bytes are insertion-order-
    dependent, so the suggested byte-hash law is unsound; measured in
    tests/test_sketches_history.py): daily (event_type, day) sketches
    are union-merged to per-type estimates, then emitted as the EXACT
    distinct-user count (pins the grouping pipeline cross-engine)
    plus ``within_5pct`` — the estimate's documented ±5% accuracy
    bound evaluated Spark-side, which the oracle asserts as literal
    TRUE. An estimate drifting past its bound, or a broken merge,
    flips the flag and the driver row goes red. merge==direct and
    repartition-stability of the ESTIMATE stay pytest-pinned."""
    from amazon_personalize_connectors_spark.functions.sketches import (
        hll_partials,
        hll_rollup,
    )

    ev = synthetic.load_events(spark, sf_dir).select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = hll_partials(ev, ["event_type", "day"], "user_id")
    approx = hll_rollup(daily, ["event_type"]).select(
        "event_type",
        F.col("approx_distinct").cast("bigint").alias("_approx"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return approx.join(exact, "event_type").select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("_approx") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_5pct"),
    )



def _orders_window_snapshot(spark, sf_dir, lo, hi):
    """Per-customer (n, revenue) aggregate over an o_orderdate window —
    the snapshot shape both CDC queries version-diff."""
    orders = synthetic.load_table(spark, sf_dir, "orders")
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
        )
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def q_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two snapshot versions (sliding one-year order
    windows): one full-outer join on the key, null-safe struct
    comparison drops unchanged keys, op in insert/update/delete with
    the NEW values. operators/cdc.py:snapshot_diff."""
    from amazon_personalize_connectors_spark.operators.cdc import snapshot_diff

    old = _orders_window_snapshot(spark, sf_dir, "1995-01-01", "1996-01-01")
    new = _orders_window_snapshot(spark, sf_dir, "1995-07-01", "1996-07-01")
    return snapshot_diff(old, new, ["cust"])


def q_cdc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE application: rolling the old snapshot forward by the CDC
    batch must reproduce the new snapshot EXACTLY — the oracle is the
    new snapshot computed directly. operators/cdc.py:apply_changes."""
    from amazon_personalize_connectors_spark.operators.cdc import (
        apply_changes,
        snapshot_diff,
    )

    old = _orders_window_snapshot(spark, sf_dir, "1995-01-01", "1996-01-01")
    new = _orders_window_snapshot(spark, sf_dir, "1995-07-01", "1996-07-01")
    return apply_changes(old, snapshot_diff(old, new, ["cust"]), ["cust"])


def q_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 self-join over supplier names via FastSS
    deletion-neighborhood blocking: variant fan-out is Catalyst-only,
    candidates meet on an 8-byte hashed-variant equi-join, exact
    levenshtein runs on candidates only — no cross join in the plan
    (test-pinned). functions/fuzzy.py:editdist_self_join."""
    from amazon_personalize_connectors_spark.functions.fuzzy import (
        editdist_self_join,
    )

    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    return editdist_self_join(supplier, "s_suppkey", "s_name")



def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via fixed-width bucket blocking (no
    range-predicate cartesian): order activity intervals x part
    campaign intervals, aggregated per part. Exact integer overlap
    lengths. operators/analytics.py:interval_overlap_join."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        interval_overlap_join,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    left = orders.where(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("oid"),
        day.cast("long").alias("ls"),
        (day + F.col("o_orderkey") % 20 + 1).cast("long").alias("le"),
    )
    part = synthetic.load_table(spark, sf_dir, "part")
    base = F.lit(9131)  # epoch day of 1995-01-01
    right = part.select(
        F.col("p_partkey").alias("pid"),
        (base + (F.col("p_partkey") * 17) % 3000).cast("long").alias("rs"),
        (base + (F.col("p_partkey") * 17) % 3000 + F.col("p_partkey") % 30 + 1)
        .cast("long")
        .alias("re"),
    )
    pairs = interval_overlap_join(
        left, right, ("oid", "ls", "le"), ("pid", "rs", "re"), bucket_width=16
    )
    return pairs.groupBy(F.col("r_id").alias("pid")).agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum("overlap_len").cast("bigint").alias("sum_overlap"),
    )


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable binned quantiles: (priority, month, bin) count
    partials merged up to priority, discrete p50/p90/p99 from the
    cumulative bin histogram — plain-row partials persist and re-roll
    at any grain, unlike approx_percentile state.
    functions/sketches.py:histogram_partials/histogram_quantiles."""
    from amazon_personalize_connectors_spark.functions.sketches import (
        histogram_partials,
        histogram_quantiles,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_totalprice").alias("price"),
    )
    fine = histogram_partials(orders, ["prio", "month"], "price", 10000.0)
    return histogram_quantiles(fine, ["prio"], [0.5, 0.9, 0.99], 10000.0)


def q_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution composite: fuzzy blocking join (deletion
    neighborhood, functions/fuzzy.py) -> connected components
    (functions/dedup.py) -> per-cluster stats, singletons kept as
    their own cluster. The full record-linkage pipeline with every
    stage an equi-join."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        neardup_components,
    )
    from amazon_personalize_connectors_spark.functions.fuzzy import (
        editdist_self_join,
    )

    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    pairs = editdist_self_join(
        supplier, "s_suppkey", "s_name", block_col="s_nationkey"
    )
    comp = neardup_components(pairs).select(
        F.col("id").alias("s_suppkey"), "component"
    )
    labeled = (
        supplier.select("s_suppkey", "s_name")
        .join(comp, "s_suppkey", "left")
        .select(
            "s_suppkey",
            "s_name",
            F.coalesce("component", F.col("s_suppkey")).alias("cluster"),
        )
    )
    return labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("s_name").alias("canonical_name"),
    )



def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority top-k): 3-way join with
    selective filters on every input, decimal-exact revenue, top 10.
    Catalyst orders the joins; the customer filter prunes before the
    join (PushedFilters), and AQE picks broadcast for the filtered
    customer side at driver scale. Deterministic tie-break on
    l_orderkey keeps top-k engine-portable."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate").cast("timestamp_ntz") > cutoff)
        .groupBy("l_orderkey", F.to_date("o_orderdate").cast("string").alias("o_orderdate"))
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.col("_rev").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
        )
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): 6-way join where the
    two dimension chains (customer->nation->region and
    supplier->nation) meet on the SAME nationkey — the classic
    join-graph the optimizer must not turn into a cartesian. nation
    and region are explicit broadcasts; revenue decimal-exact."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    region = synthetic.load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    lo = F.lit("1995-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-01-01").cast("timestamp_ntz")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(rev).alias("_rev"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"))
    )



def q_covisitation_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-visitation model from the user-item bridge: top-5
    co-interacted items per item, power users capped before pairing
    (cap inert at driver SFs so the capless SQL oracle matches; the
    capping semantics are pytest-pinned). operators/recsys.py."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        covisitation_topk,
    )

    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").cast("bigint").alias("user_id"),
        F.col("ITEM_ID").cast("bigint").alias("item_id"),
    )
    return covisitation_topk(mapping, k=5, max_items_per_user=1000, min_common=2)


def q_rec_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-coverage monitor over the related-items batch payload:
    items covered / recommended / dead-rec rows vs the metadata
    catalog (every 7th key missing -> nonzero dead rows by
    construction). operators/recsys.py:rec_catalog_coverage."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        rec_catalog_coverage,
    )

    recs = synthetic.related_items_batch_inference(spark, sf_dir)
    exploded = recs.where(F.col("error").isNull()).select(
        F.col("input.itemId").alias("query_item_id"),
        F.explode("output.recommendedItems").alias("rec_item"),
    )
    catalog = synthetic.item_metadata(spark, sf_dir).select(
        F.col("id").alias("item_id")
    )
    return rec_catalog_coverage(exploded, catalog, "rec_item", "item_id")


def q_rec_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline hit-rate eval of the related-items payload against
    co-interaction ground truth from the user-item bridge: a rec pair
    hits when some user interacted with both items. Integer outputs
    only. operators/recsys.py:rec_hitrate_by_cooccurrence."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        rec_hitrate_by_cooccurrence,
    )

    recs = synthetic.related_items_batch_inference(spark, sf_dir)
    exploded = recs.where(F.col("error").isNull()).select(
        F.col("input.itemId").alias("query_item_id"),
        F.explode("output.recommendedItems").alias("rec_item"),
    )
    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").alias("user_id"), F.col("ITEM_ID").alias("item_id")
    )
    # truth-side per-user cap: inert at driver SFs (no bridge user has
    # 1000 distinct items) so the capless SQL oracle matches; the
    # capping semantics themselves are pytest-pinned
    return rec_hitrate_by_cooccurrence(
        exploded, mapping, max_items_per_user=1000
    )



def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-negative sampler: up to 5 non-interacted
    catalog items per user via the portable salted-md5 recipe — the
    SAME hash is expressible in ANSI SQL, so the sampler itself (not
    just its invariants) is oracle-checked.
    operators/recsys.py:negative_sampling."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        negative_sampling,
    )

    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").cast("bigint").alias("user_id"),
        F.col("ITEM_ID").cast("bigint").alias("item_id"),
    )
    part = synthetic.load_table(spark, sf_dir, "part")
    catalog = part.select(F.col("p_partkey").alias("item_id"))
    return negative_sampling(mapping, catalog, k=5, oversample=3)



def q_user_profile_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User profile embeddings: per (user, dim) the EXACT bigint sum
    of interacted-item embedding elements in micro-units plus the
    member count (items bridge to vectors by id modulo the vector
    count — fixture bridging, broadcast 1-row modulus). Integer sums
    are associative, so the result is bit-identical under any
    partitioning — the round-4 red row was a double avg() whose 6-dp
    rounding flipped with accumulation order. The mean is
    vsum_micro / (1e6 * n_vecs), recoverable downstream.
    operators/recsys.py:profile_vector_sums."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        profile_vector_sums,
    )

    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").cast("bigint").alias("user_id"),
        F.col("ITEM_ID").cast("bigint").alias("item_id"),
    )
    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    nv = emb.agg(F.count(F.lit(1)).alias("_n"))
    joined = (
        mapping.crossJoin(F.broadcast(nv))
        .withColumn("vec_id", F.pmod(F.col("item_id"), F.col("_n")))
        .join(emb, "vec_id")
        .select("user_id", "embedding")
    )
    return profile_vector_sums(joined, "user_id", "embedding").select(
        "user_id", F.col("dim").cast("int").alias("dim"), "vsum_micro", "n_vecs"
    )



def q_funnel_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel with conversion windows (view -> click within
    2h -> purchase within 24h): each step matches the earliest event
    strictly after the previous match inside its window — the
    product-analytics semantics the ordering-only funnel
    (q_event_funnel) does not capture. ONE shuffle: per-user sorted
    event-time arrays folded with array_min(filter(...)).
    operators/analytics.py:funnel_with_windows."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        funnel_with_windows,
    )

    ev = synthetic.load_events(spark, sf_dir)
    out = funnel_with_windows(
        ev,
        [("view", None), ("click", 7_200_000_000), ("purchase", 86_400_000_000)],
    )
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "steps_completed",
        "t1", "t2", "t3",
    )



def q_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily revenue per priority with missing days carried
    forward (LOCF): calendar densification (broadcast bounds, no
    driver collect) then one unbounded-preceding last(ignorenulls)
    window — the "price on days with no trades" shape.
    operators/analytics.py:gap_fill_days + locf_fill."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        gap_fill_days,
        locf_fill,
    )

    daily = (
        synthetic.load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp_ntz"))
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")
        )
    )
    dense = gap_fill_days(daily, ["prio"], "day", "revenue", fill_value=None)
    filled = locf_fill(dense, ["prio"], "day", ["revenue"])
    return filled.select(
        "prio",
        F.col("day").cast("string").alias("day"),
        F.col("revenue").cast("double").alias("revenue"),
    )



def q_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-based outlier audit: per priority, orders whose
    price exceeds the p90 histogram band (mergeable binned quantiles
    joined back as a broadcast threshold) — the anomaly-screen shape:
    thresholds from partials, one broadcast join, zero re-sort of the
    facts. Composes functions/sketches.py histogram quantiles."""
    from amazon_personalize_connectors_spark.functions.sketches import (
        histogram_partials,
        histogram_quantiles,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("price"),
    )
    bands = histogram_quantiles(
        histogram_partials(orders, ["prio"], "price", 10000.0),
        ["prio"], [0.9], 10000.0,
    ).select("prio", F.col("value").alias("p90_band"))
    flagged = orders.join(F.broadcast(bands), "prio").where(
        F.col("price") >= F.col("p90_band") + 10000.0  # above the p90 bin
    )
    return flagged.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n_outliers"),
        F.max(F.col("price").cast("decimal(18,2)")).cast("double").alias("max_price"),
    )



def q_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority revenue trend: OLS slope/intercept of daily
    revenue over the day index, from five exactly-accumulated
    sufficient statistics in ONE combinable aggregate (never a
    per-group fit loop). operators/analytics.py:grouped_linear_trend."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        grouped_linear_trend,
    )

    daily = (
        synthetic.load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).alias("day_idx"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")
        )
    )
    return grouped_linear_trend(daily, ["prio"], "day_idx", "revenue")



def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-10 documents for the query {hash, join,
    window} — Robertson idf + tf saturation/length normalization, the
    tf table filtered to query terms before any join, global top-k via
    TakeOrdered (no single-task window over the corpus). 6-dp rounding
    keeps libm ulp noise out of the ranking.
    functions/text.py:bm25_topk."""
    from amazon_personalize_connectors_spark.functions.text import bm25_topk

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, ["hash", "join", "window"], k=10).select(
        F.col("id").cast("bigint").alias("doc_id"),
        "score", "n_terms_hit", "rank",
    )



def q_scd2_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History analytics over the SCD2 build: per priority value, how
    many CLOSED intervals existed and their total/avg covered days
    (current open-ended rows excluded — no sentinel arithmetic).
    Integer day math on the interval bounds; composes
    operators/history.py:scd2_from_changelog."""
    from amazon_personalize_connectors_spark.operators.history import (
        scd2_from_changelog,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    log = orders.select(
        F.col("o_custkey").alias("cust"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("prio"),
    )
    scd = scd2_from_changelog(log, ["cust"], "d", ["prio"])
    closed = scd.where(~F.col("is_current")).withColumn(
        "days", F.datediff("valid_to", "valid_from")
    )
    return closed.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("days").cast("bigint").alias("total_days"),
        F.round(F.avg("days"), 6).alias("avg_days"),
    )



def q_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick TF-IDF vectorizer: 64-dim sparse doc features via
    the portable salted-md5 dimension map (the feature assignment
    itself is oracle-checked, not just shapes); weights = tf * idf
    summed over colliding terms. functions/text.py:
    hashed_tfidf_features."""
    from amazon_personalize_connectors_spark.functions.text import (
        hashed_tfidf_features,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    return hashed_tfidf_features(docs, n_dims=64).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("dim").cast("int").alias("dim"),
        "weight",
    )


def q_price_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority exact percentile rank of each order's price
    (percent_rank window over pre-deduplicated (prio, price) pairs so
    the window input is the distinct-value set, not the fact table),
    joined back to count orders at or below each decile. Output: per
    (prio, decile) order counts — integer-exact."""
    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("price"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("prio").orderBy("price")
    ranked = orders.withColumn("pr", F.percent_rank().over(w))
    decile = F.least(F.floor(F.col("pr") * 10).cast("int"), F.lit(9))
    return ranked.groupBy("prio", decile.alias("decile")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("pr"), 6).alias("min_pr"),
    )



def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew pre-flight over the lineitem part key: top-10
    heaviest keys with exact counts and skew factor vs the mean key
    load — the diagnosis that decides salting / AQE skew-join handling
    before a big join. operators/analytics.py:key_skew_report."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        key_skew_report,
    )

    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    return key_skew_report(lineitem, ["l_partkey"], top_k=10)



def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the 20 most common 3-step event-type
    sequences inside 30-minute sessions — the "how do users get to
    purchase" analysis. Sessionize (lag + running flag sum, one window
    pass), collect each session's ordered type path, slide a trigram
    window over the array (generator, no joins), count globally,
    TakeOrdered top-20."""
    from pyspark.sql.window import Window

    ev = synthetic.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    new_s = F.when(gap.isNull() | (gap > 1800 * 1000 * 1000), 1).otherwise(0)
    sess = ev.withColumn("sid", F.sum(new_s).over(w))
    paths = sess.groupBy("user_id", "sid").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts_us", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("path")
    )
    # sequence(1, 0) would generate a DESCENDING [1, 0] — drop short
    # paths before building the index range
    trigrams = paths.where(F.size("path") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("path") - F.lit(2)),
                lambda i: F.concat_ws(
                    ">",
                    F.element_at("path", i.cast("int")),
                    F.element_at("path", (i + 1).cast("int")),
                    F.element_at("path", (i + 2).cast("int")),
                ),
            )
        ).alias("trigram")
    )
    counts = trigrams.groupBy("trigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    top = counts.orderBy(F.col("n").desc(), "trigram").limit(20)
    return top.select("trigram", F.col("n").cast("bigint").alias("n"))



def q_revenue_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report contribution analysis: each (priority, status)
    cell's share of its priority's revenue and of the grand total —
    decimal-exact sums at every level, shares as single fixed-order
    double divisions rounded 6dp. One aggregate + one partition window
    + a broadcast 1-row grand total (never a second scan)."""
    from pyspark.sql.window import Window

    orders = synthetic.load_table(spark, sf_dir, "orders")
    cell = orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")
    )
    w = Window.partitionBy("prio")
    total = cell.agg(F.sum("revenue").alias("__grand"))
    return (
        cell.withColumn("prio_rev", F.sum("revenue").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "prio",
            "status",
            F.col("revenue").cast("double").alias("revenue"),
            F.round(
                F.col("revenue").cast("double") / F.col("prio_rev").cast("double"), 6
            ).alias("share_of_prio"),
            F.round(
                F.col("revenue").cast("double") / F.col("__grand").cast("double"), 6
            ).alias("share_of_total"),
        )
    )



def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2vec-style (center, context) skip-gram pair counts with a
    symmetric +/-2 window — embedding training-pair extraction as one
    generator over each doc's token array (no positional self-join,
    no shuffle before the count). functions/text.py:skipgram_pairs."""
    from amazon_personalize_connectors_spark.functions.text import skipgram_pairs

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    return skipgram_pairs(docs, window=2)


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary audit: corpus OOV statistics against
    the top-1000-term vocabulary (count desc, term asc — fully
    deterministic truncation). The vocab is a TakeOrdered over the
    term-count aggregate broadcast back as a semi-join; output is one
    row of exact integers."""
    from amazon_personalize_connectors_spark.functions.text import (
        term_frequencies,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    tf = term_frequencies(docs)
    counts = tf.groupBy("term").agg(F.sum("tf").alias("n"))
    vocab = counts.orderBy(F.col("n").desc(), "term").limit(1000).select("term")
    flagged = tf.join(vocab, "term", "left_semi").groupBy().agg(
        F.sum("tf").alias("in_vocab_tokens")
    )
    totals = tf.groupBy().agg(
        F.sum("tf").alias("total_tokens"),
        F.count_distinct("term").alias("distinct_terms"),
    )
    return (
        totals.crossJoin(F.broadcast(flagged))
        .select(
            F.col("total_tokens").cast("bigint").alias("total_tokens"),
            F.col("distinct_terms").cast("bigint").alias("distinct_terms"),
            F.col("in_vocab_tokens").cast("bigint").alias("in_vocab_tokens"),
            (F.col("total_tokens") - F.col("in_vocab_tokens"))
            .cast("bigint")
            .alias("oov_tokens"),
        )
    )



def q_trending_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items: top-5 parts per order-week by lineitem count
    (count desc, part asc — deterministic). Week = integer
    epoch-day/7 bucket (engine-portable; no week-truncation
    semantics). One (week, part) aggregate then one ranking window
    over the aggregated table."""
    from pyspark.sql.window import Window

    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    week = F.floor(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        / F.lit(7)
    ).cast("bigint")
    counts = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(week.alias("week"), F.col("l_partkey").alias("part"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("week").orderBy(F.col("n").desc(), "part")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("week", "part", F.col("n").cast("bigint").alias("n"),
                F.col("rank").cast("int").alias("rank"))
    )


def q_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per signup cohort over months-since-cohort
    (the LTV-curve input): cohort = customer's first order month
    index, cells decimal-exact, running total via one window over the
    already-aggregated (cohort, offset) table."""
    from pyspark.sql.window import Window

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    first_m = orders.groupBy("cust").agg(F.min("m").alias("cohort"))
    cells = (
        orders.join(first_m, "cust")
        .groupBy("cohort", (F.col("m") - F.col("cohort")).alias("offset"))
        .agg(F.sum("price").alias("revenue"))
    )
    w = Window.partitionBy("cohort").orderBy("offset")
    return cells.withColumn(
        "cum_revenue", F.sum("revenue").over(w)
    ).select(
        F.col("cohort").cast("bigint").alias("cohort"),
        F.col("offset").cast("bigint").alias("offset"),
        F.col("revenue").cast("double").alias("revenue"),
        F.col("cum_revenue").cast("double").alias("cum_revenue"),
    )



def q_covisitation_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank eval of the co-visitation model under the
    PROPER offline protocol — temporal holdout: the model trains on
    pre-1997 interactions, ground truth is co-interaction in the
    held-out 1997+ window (truth independent of the ranking signal;
    evaluating against same-window support is structurally rank-1 —
    the top rec always qualifies first). Output: items by
    first-confirmed rank with exact counts + 6-dp reciprocal-rank
    sums. All equi-joins; composes covisitation_topk.

    The orders⋈lineitem interaction build happens ONCE: one grouped
    aggregate computes per-(user, item) membership flags for the train
    and test windows, and both branches filter on the AGGREGATED
    flags. Filters on aggregate outputs cannot be pushed below the
    aggregate, so the scan + join + partial-agg + exchange subtree is
    byte-identical in both branches and Spark's ReuseExchange computes
    it a single time — the shuffle files are the materialization, no
    cache needed, at any scale. (A plain train/test filter column
    would be pushed through the distinct and split the subtrees.) The
    held-out truth self-join is capped per user with the same
    hash-priority truncation as the model side (inert at driver SFs so
    the capless SQL oracle matches; bounded-fan-out semantics
    pytest-pinned)."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        cap_items_per_user,
        covisitation_topk,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp_ntz")
    inter = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
            (F.col("o_orderdate") < cut).alias("is_train"),
        )
        .groupBy("user_id", "item_id")
        .agg(
            F.max(F.col("is_train").cast("int")).alias("in_train"),
            F.max((~F.col("is_train")).cast("int")).alias("in_test"),
        )
    )
    train = inter.where(F.col("in_train") == 1).select("user_id", "item_id")
    test = inter.where(F.col("in_test") == 1).select("user_id", "item_id")
    # train rows are unique per (user, item) by construction (the
    # groupBy above) — skip covisitation's dedup shuffle
    recs = covisitation_topk(
        train, k=5, max_items_per_user=1000, min_common=2,
        assume_distinct=True,
    )
    capped = cap_items_per_user(
        test.select(F.col("user_id").alias("u"), F.col("item_id").alias("i")),
        1000,
    )
    # held-out truth pairs: same row-local generator shape as the
    # model side — bounded per-user arrays, unordered pairs distinct'd
    # on the halved stream, mirrored after
    from amazon_personalize_connectors_spark.operators.recsys import (
        _half_pairs,
    )

    per_user = capped.groupBy("u").agg(F.collect_list("i").alias("_items"))
    # No distinct() on the truth stream and no shuffle of it either:
    # duplicates are harmless to a containment probe, and the rec
    # table is tiny — so the millions of truth pairs STREAM past a
    # broadcast hash of the recs (both orientations via the mirror
    # union, still one pass), and only the matched survivors (≤ recs
    # size in distinct keys) pay a dedup. The old shape dedup'd and
    # shuffled the full truth pair stream twice for nothing.
    half = _half_pairs(per_user, "item", "rec_item")
    truth = half.unionByName(
        half.select(
            F.col("rec_item").alias("item"), F.col("item").alias("rec_item")
        )
    )
    hits = (
        truth.join(F.broadcast(recs), ["item", "rec_item"], "inner")
        .select("item", "rec_item", "rank")
        .dropDuplicates(["item", "rec_item"])
    )
    first_hit = hits.groupBy("item").agg(F.min("rank").alias("first_rank"))
    return first_hit.groupBy("first_rank").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.sum(F.lit(1.0) / F.col("first_rank")), 6).alias("rr_sum"),
    )



def q_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed item popularity: each order contributes
    0.98^(days before the corpus max date) — the freshness-weighted
    ranking signal behind "popular now" shelves. The reference date is
    a broadcast 1-row max aggregate (no driver collect); integer day
    deltas feed one pow per row and scores round to 6dp so libm ulp
    and sum-order noise stay out of the comparison. Top-20 parts by
    decayed score, deterministic tie-break."""
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    ref = orders.agg(F.max(F.to_date("o_orderdate")).alias("__ref"))
    scored = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .crossJoin(F.broadcast(ref))
        .select(
            F.col("l_partkey").alias("part"),
            F.pow(
                F.lit(0.98),
                F.datediff(F.col("__ref"), F.to_date("o_orderdate")).cast("double"),
            ).alias("w"),
        )
    )
    pop = scored.groupBy("part").agg(
        F.round(F.sum("w"), 6).alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return (
        pop.orderBy(F.col("score").desc(), "part")
        .limit(20)
        .select("part", "score", "n_events")
    )



def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join: each purchase matched to the SAME USER's
    closest click within 1 hour, either direction (|delta| tie -> the
    earlier click) — "what click surrounds this purchase". One
    union+window shuffle serves both directions (last over preceding,
    first over following on a single sort). operators/asof.py:
    asof_nearest_join; oracle = range-join + deterministic pick."""
    from amazon_personalize_connectors_spark.operators.asof import (
        asof_nearest_join,
    )

    ev = synthetic.load_events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    out = asof_nearest_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        right_payload=["click_event_id"],
        tolerance_us=3600 * 1000_000,
    )
    return out.where(F.col("click_event_id").isNotNull()).select(
        "event_id",
        "user_id",
        "click_event_id",
        F.col("asof_delta_us").alias("delta_us"),
    )


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (operators/features.py): each
    order's priority encoded as the mean order value of all OTHER
    orders sharing the priority — the leakage-safe categorical
    feature. Integer-cents target keeps the group sums exact; the
    single final division (bigint/bigint → double) is
    engine-deterministic, so no rounding is needed."""
    from amazon_personalize_connectors_spark.operators.features import (
        target_encoding_loo,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return target_encoding_loo(
        orders, "o_orderpriority", "cents", "te_loo_cents"
    ).select("o_orderkey", "o_orderpriority", "te_loo_cents")


def q_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group price summary (operators/features.py): clamp
    line-item prices into the return-flag group's [5th, 95th]
    discrete-percentile band and report bounds, clamped mean, and
    clamp counts. All-integer rank/bound/sum math — exact across
    engines by construction."""
    from amazon_personalize_connectors_spark.operators.features import (
        winsorize_stats,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return winsorize_stats(li, ["l_returnflag"], "cents", 5, 95)


def q_next_item_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-recommendation training examples
    (operators/features.py): per customer, (context → next item)
    pairs over the purchase stream in (order date, order key, line
    number) order — the next-item dataset builder a Personalize
    user exports for their own sequence model. Context flattened to
    CSV for the value hash."""
    from amazon_personalize_connectors_spark.operators.features import (
        next_item_examples,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    inter = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select(
        F.col("o_custkey").alias("u"),
        F.col("l_partkey").cast("bigint").alias("i"),
        "o_orderdate",
        "o_orderkey",
        "l_linenumber",
    )
    ex = next_item_examples(
        inter, "u", "i", ["o_orderdate", "o_orderkey", "l_linenumber"], 3
    )
    return ex.select(
        F.col("user").alias("user_id"),
        F.col("pos").cast("bigint").alias("pos"),
        F.col("label").cast("bigint").alias("label"),
        F.array_join("context", ",").alias("context_csv"),
    )


def q_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (functions/sketches.py
    frequent_values_exact): every token with global share > 0.2% of
    the token stream, with exact counts — two-pass (batch-local
    candidate superset via the sanctioned Arrow boundary, then exact
    recount of candidates only), so the Zipf tail never shuffles.
    Oracle is the plain exact GROUP BY/HAVING."""
    from amazon_personalize_connectors_spark.functions.sketches import (
        frequent_values_exact,
    )
    from amazon_personalize_connectors_spark.functions.text import tokens

    docs = synthetic.load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    return frequent_values_exact(tok, "token", 0.002).select(
        "token", "n", "share"
    )


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift check (operators/features.py
    ks_two_sample): returned vs non-returned line items' price
    distributions. Integer-cents values keep the sup integer
    (|cum_a*n_b - cum_b*n_a|) with ONE final division — engine-exact;
    the cumulative CDFs ride the distributed prefix-sum, never a
    single-task global window."""
    from amazon_personalize_connectors_spark.operators.features import (
        ks_two_sample,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "l_returnflag",
    )
    return ks_two_sample(
        li,
        "cents",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional sub-document containment (functions/dedup.py
    containment_pairs): C(A in B) = common/|A| alongside C(B in A)
    over the same rare-shingle candidate pairs as the Jaccard query —
    catches short-inside-long duplication Jaccard misses. Integer
    divisions only; same doc_id % 5 subset as the shingle fixtures."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        containment_pairs,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    return containment_pairs(docs, "text", "doc_id", n=3, min_common=2)


def q_covisitation_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental co-visitation refresh (recsys.py
    covisitation_increments): interactions split at a date cut into
    state (old) and delta (new); old pair counts merge with the
    delta increments — old x old pairs are NEVER regenerated. The
    oracle is a FULL recompute over all interactions, checking the
    merge law merge(pairs(old), inc(old, delta)) == pairs(old ∪ delta)
    end-to-end, through the same top-k ranking as covisitation_topk."""
    from pyspark.sql import Window

    from amazon_personalize_connectors_spark.operators.recsys import (
        _half_pairs,
        covisitation_increments,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp_ntz")
    # a quarter of the user base carries the law check end-to-end —
    # pair volume scales linearly with users, and the merge law is
    # per-user, so the subset loses no coverage (filter pushed to the
    # orders scan on both engines)
    inter = (
        orders.where(F.col("o_custkey") % 4 == 0)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").alias("u"),
            F.col("l_partkey").alias("i"),
            (F.col("o_orderdate") < cut).alias("is_old"),
        )
        .groupBy("u", "i")
        .agg(F.max(F.col("is_old").cast("int")).alias("in_old"))
    )
    state = inter.where(F.col("in_old") == 1).select("u", "i")
    delta = inter.where(F.col("in_old") == 0).select("u", "i")
    old_counts = (
        _half_pairs(
            state.groupBy("u").agg(F.collect_list("i").alias("_items")),
            "item",
            "rec_item",
        )
        .groupBy("item", "rec_item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common_delta"))
    )
    inc = covisitation_increments(state, delta)
    merged = (
        old_counts.unionByName(inc)
        .groupBy("item", "rec_item")
        .agg(F.sum("n_common_delta").cast("bigint").alias("n_common"))
        .where(F.col("n_common") >= 2)
    )
    pairs = merged.unionByName(
        merged.select(
            F.col("rec_item").alias("item"),
            F.col("item").alias("rec_item"),
            "n_common",
        )
    )
    rank_w = Window.partitionBy("item").orderBy(
        F.col("n_common").desc(), F.col("rec_item")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= 5)
        .select("item", "rec_item", "n_common", F.col("rank").cast("int").alias("rank"))
    )


def q_stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator, ORACLE-CHECKED: the
    applyInPandasWithState sessionizer (streaming/windows.py) drains
    the events table through Trigger.AvailableNow and must emit
    exactly the CLOSED sessions — every session except each user's
    last (which is still open in state when the file stream runs dry;
    processing-time timeouts cannot fire inside the run). The oracle
    is the batch gap-island sessionization minus each user's final
    session — pinning the state machine's gap semantics (strict >
    30 min), counts, and bounds to the declarative form."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.windows import (
        run_stream_to_memory,
        sessionize_stateful,
    )

    landing = tempfile.mkdtemp(prefix="apc-stream-sess-")
    ev = synthetic.load_events(spark, sf_dir).select(
        F.col("user_id").cast("long").alias("user_id"), "ts_us"
    )
    ev.coalesce(4).write.mode("append").parquet(landing)
    stream = spark.readStream.schema(ev.schema).parquet(landing)
    sessions = sessionize_stateful(
        stream, gap_minutes=30, ts_us_col="ts_us", close_on_timeout=False
    )
    return run_stream_to_memory(
        sessions.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "session_start_us",
            "session_end_us",
            F.col("n_events").cast("bigint").alias("n_events"),
        ),
        output_mode="append",
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item revenue by customer): 4-way
    join with a quarter date window and the returnflag filter pushed
    to both scans, decimal-exact revenue, top 20. The nation dim
    broadcasts; AQE picks broadcast for the filtered order window at
    driver scale."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    lo = F.lit("1996-10-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    return (
        orders.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_returnflag") == "R")
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("decimal(18,2)").alias("_bal"),
            "n_name",
        )
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.col("_rev").desc(), "c_custkey")
        .limit(20)
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            F.col("_bal").cast("double").alias("c_acctbal"),
            "n_name",
        )
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): the HAVING subquery is
    one map-side-combinable aggregate over lineitem whose survivors
    (big orders) SEMI-join back — the probe side never widens — then
    customer decorates the survivors. Quantity sums as exact
    decimals; top 100 with full deterministic tie-break."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate"),
            F.col("o_orderkey"),
        )
        .limit(100)
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.to_date("o_orderdate").cast("string").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking) adapted to the
    fixture schema (no l_commitdate/l_receiptdate — "late" means a
    lineitem shipped > 60 days after the order date): count orders
    per priority that have AT LEAST ONE late lineitem in a quarter
    window. The EXISTS subquery is a LEFT SEMI join — the probe side
    never widens, duplicate late lines cost nothing, and the date
    filter pushes to the orders scan."""
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-07-01").cast("timestamp_ntz")
    hi = F.lit("1996-10-01").cast("timestamp_ntz")
    win = orders.where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    late = win.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): single scan, every
    predicate pushed into the parquet reader (date band, discount
    band, quantity cap), decimal-exact revenue sum — the canonical
    filter-pushdown probe; the plan must show PushedFilters on all
    three columns and no shuffle beyond the 1-row final aggregate."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,6)")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount").cast("decimal(18,6)") >= F.lit("0.05").cast("decimal(18,6)"))
            & (F.col("l_discount").cast("decimal(18,6)") <= F.lit("0.07").cast("decimal(18,6)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).alias("_rev"), F.count(F.lit(1)).alias("n_items"))
        .select(
            F.col("_rev").cast("double").alias("revenue"),
            F.col("n_items").cast("bigint").alias("n_items"),
        )
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one month of lineitem joined to
    part, conditional decimal-exact sums, promo share as ONE double
    division of two exact sums. part joins broadcast (small dim);
    the date band pushes to the lineitem scan."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    lo = F.lit("1996-09-01").cast("timestamp_ntz")
    hi = F.lit("1996-10-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    zero = F.lit(0).cast("decimal(30,8)")
    agg = (
        lineitem.where(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev.cast("decimal(30,8)")).otherwise(zero)
            ).alias("_promo"),
            F.sum(rev.cast("decimal(30,8)")).alias("_total"),
        )
    )
    return agg.select(
        F.col("_promo").cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        (
            F.col("_promo").cast("double")
            * F.lit(100.0)
            / F.col("_total").cast("double")
        ).alias("promo_pct"),
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue) for one brand:
    lineitems below 20% of their part's average quantity. The
    correlated scalar subquery is a per-part aggregate joined back;
    the threshold compare is INTEGER-EXACT — ``qty * 5 * n < sum``
    avoids the division entirely (qty < sum/(5n) ⟺ qty·5n < sum),
    so both engines agree bit-for-bit. The per-part aggregate is
    brand-filtered FIRST via the broadcast part dim, so only the
    brand's lineitems shuffle."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    brand_parts = part.where(F.col("p_brand") == "Brand#12").select(
        "p_partkey"
    )
    li = lineitem.join(
        F.broadcast(brand_parts),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    stats = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("_sum_qty"),
        F.count(F.lit(1)).alias("_n"),
    ).select(
        F.col("l_partkey").alias("_pk"), "_sum_qty", "_n"
    )
    small = li.join(
        F.broadcast(stats), F.col("l_partkey") == F.col("_pk")
    ).where(qty * 5 * F.col("_n") < F.col("_sum_qty"))
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_small"),
    )


def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-aware last-touch attribution (operators/analytics.py
    last_touch_attribution): each purchase credited to the user's
    latest view/click STRICTLY before it (RANGE frame to 1 PRECEDING
    — simultaneous events excluded on value) within 24 h. Arg-max via
    the integer-encoded ts*8+code bigint — one window shuffle, exact
    div/mod decode, engine-portable."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        last_touch_attribution,
    )

    ev = synthetic.load_events(spark, sf_dir)
    out = last_touch_attribution(ev)
    return out.select(
        F.col("user").cast("bigint").alias("user_id"),
        "conv_ts_us",
        "touch_ts_us",
        "touch_type_code",
        F.col("attributed").cast("int").alias("attributed"),
    )


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience Venn regions (operators/analytics.py segment_overlap):
    distinct users per view/click/purchase segment-combination
    bitmask — two map-side-combinable aggregates (per-user bit_or,
    then a <=2^n-row mask count), no self-joins or grouping-set
    explosion of the fact table."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        segment_overlap,
    )

    ev = synthetic.load_events(spark, sf_dir)
    return segment_overlap(ev, ["view", "click", "purchase"])


def q_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue anomaly screen (operators/analytics.py
    residual_anomaly_days): integer residual 7*v - trailing-7-day-sum
    against k*MAD of the residual grid — division-free, discrete
    medians, calendar-bounded windows (the daily rollup is small at
    ANY data scale; the fact scan is the only big input)."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        residual_anomaly_days,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("cents")
    )
    out = residual_anomaly_days(daily, "day", "cents", trail_days=7, k=5)
    return out.select(
        F.col("day").cast("string").alias("day"),
        F.col("v").alias("cents"),
        "residual",
        "mad",
        F.col("is_anomaly").cast("int").alias("is_anomaly"),
    )


def q_rec_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the co-visitation model under the temporal-holdout
    protocol (operators/recsys.py rec_ndcg_at_k): train on pre-1997,
    truth = held-out co-interaction partners. DCG/IDCG are exact
    decimal sums of FIXED 9-dp gain literals (float log2 and float
    sums are engine/order-sensitive); one double division at the end.
    Truth streams past the broadcast rec table (the mrr lesson) —
    only the per-item relevant-count shuffles truth-sized."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        cap_items_per_user,
        covisitation_topk,
        rec_ndcg_at_k,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp_ntz")
    inter = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
            (F.col("o_orderdate") < cut).alias("is_train"),
        )
        .groupBy("user_id", "item_id")
        .agg(
            F.max(F.col("is_train").cast("int")).alias("in_train"),
            F.max((~F.col("is_train")).cast("int")).alias("in_test"),
        )
    )
    train = inter.where(F.col("in_train") == 1).select("user_id", "item_id")
    test = inter.where(F.col("in_test") == 1).select("user_id", "item_id")
    recs = covisitation_topk(
        train, k=5, max_items_per_user=1000, min_common=2,
        assume_distinct=True,
    )
    capped = cap_items_per_user(
        test.select(F.col("user_id").alias("u"), F.col("item_id").alias("i")),
        1000,
    )
    truth = (
        capped.select("u", F.col("i").alias("item"))
        .join(capped.select("u", F.col("i").alias("partner")), "u")
        .where(F.col("item") != F.col("partner"))
        .select("item", "partner")
    )
    out = rec_ndcg_at_k(recs, truth, k=5)
    return out.select(
        F.col("item").cast("bigint").alias("item"),
        "n_rel",
        "n_hits",
        "dcg",
        "idcg",
        "ndcg",
    )


def _customer_privacy_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared privacy fixture: customer quasi-identifiers (nation,
    market segment, $1000 account-balance band in cents) with exact
    balance cents as the sensitive attribute."""
    from amazon_personalize_connectors_spark.operators.privacy import (
        k_anonymity_classes,
        numeric_band,
    )

    cust = synthetic.load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    banded = cust.select(
        "nation", "segment", numeric_band(F.col("cents"), 100_000).alias("band"),
        "cents",
    )
    return k_anonymity_classes(
        banded, ["nation", "segment", "band"], "cents", k=5, l_threshold=2
    )


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-centroid drift between two corpus halves
    (operators/drift.py embedding_centroid_drift): L1 distance between
    label centroids in pure associative integer arithmetic —
    |S_a*n_b - S_b*n_a| per dim is exact bigint, sums exactly across
    dims, ONE double division at the end (the vector version of the
    ks_drift exactness rule)."""
    from amazon_personalize_connectors_spark.operators.drift import (
        embedding_centroid_drift,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("bigint").alias("label")
    )
    snap_a = emb.where(F.col("vec_id") % 2 == 0)
    snap_b = emb.where(F.col("vec_id") % 2 == 1)
    return embedding_centroid_drift(snap_a, snap_b, "label", "embedding")


def q_stream_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor, ORACLE-CHECKED end to end
    (streaming/drift_monitor.py): line items staged as four parquet
    files drain ONE FILE PER MICRO-BATCH, each batch folding its
    per-value counts into the versioned grid store; the KS statistic
    read from the final store must equal the batch ks_drift over all
    rows — the mergeable-grid law, regardless of batch splits."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.drift_monitor import (
        ks_from_store,
        monitor_from_stream,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "l_returnflag",
    )
    landing = tempfile.mkdtemp(prefix="apc-drift-landing-")
    store = tempfile.mkdtemp(prefix="apc-drift-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-drift-ckpt-")
    li.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("cents long, l_returnflag string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    monitor_from_stream(
        stream, store, ckpt, "cents",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )
    return ks_from_store(spark, store)


def q_survival_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-second-order survival table (operators/analytics.py
    survival_table): per customer, days from first to second distinct
    order date (censored at the global max date when no second order
    exists); one row per distinct duration with exact at-risk/event/
    censor counts — the KM probability fold is left to the consumer
    because a running float product is order-sensitive."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        survival_table,
    )

    from pyspark.sql import Window

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    dd = orders.distinct()
    w = Window.partitionBy("cust").orderBy("d")
    ranked = dd.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= 2
    )
    t1 = ranked.where(F.col("_rn") == 1).select("cust", F.col("d").alias("t1"))
    t2 = ranked.where(F.col("_rn") == 2).select("cust", F.col("d").alias("t2"))
    mx = orders.agg(F.max("d").alias("_mx"))
    obs = (
        t1.join(t2, "cust", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("t2").isNotNull(), F.datediff("t2", "t1")
            )
            .otherwise(F.datediff("_mx", "t1"))
            .cast("long")
            .alias("dur"),
            F.col("t2").isNotNull().cast("int").alias("event"),
        )
    )
    return survival_table(obs, "dur", "event")


def q_rec_diversity_ils(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommendation-list diversity (operators/recsys.py
    rec_intra_list_similarity): mean pairwise cosine of each top-5
    list's item embeddings (vec bridge: rec_item % n_vectors, the
    user_profile_vectors fixture convention). Dot products and norms
    are exact micro-unit bigints; per-pair cosine is one IEEE divide
    + sqrt; the per-list mean sums 6-dp DECIMALS — no float
    accumulation anywhere."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        covisitation_topk,
        rec_intra_list_similarity,
    )

    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").cast("bigint").alias("user_id"),
        F.col("ITEM_ID").cast("bigint").alias("item_id"),
    )
    recs = covisitation_topk(mapping, k=5, max_items_per_user=1000, min_common=2)
    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    nv = emb.agg(F.count(F.lit(1)).alias("_n"))
    bridged = recs.crossJoin(F.broadcast(nv)).select(
        "item",
        F.pmod(F.col("rec_item"), F.col("_n")).alias("rec_vec"),
        "rank",
    )
    out = rec_intra_list_similarity(
        bridged, emb, k=5, rec_col="rec_vec"
    )
    return out.select(
        F.col("item").cast("bigint").alias("item"), "n_pairs", "ils"
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full TPC-H Q1 (pricing summary report): the canonical
    scan-heavy aggregate — one pass, map-side combinable, every sum
    an exact decimal and every average ONE double division of an
    exact sum by its count. The charge chain steps through bounded
    decimal precisions (disc_price rounded to (18,6) before the tax
    multiply) so neither engine hits the 38-digit clamp, where
    rounding semantics diverge."""
    li = synthetic.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp_ntz")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(8,6)")
    tax = F.col("l_tax").cast("decimal(8,6)")
    disc_price = (price * (F.lit(1).cast("decimal(8,6)") - disc)).cast(
        "decimal(18,6)"
    )
    charge = disc_price * (F.lit(1).cast("decimal(8,6)") + tax)
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("_sq"),
            F.sum(price).alias("_sp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.sum(disc).alias("_sd"),
            n.cast("bigint").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            F.col("_sc").cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias(
                "avg_qty"
            ),
            (F.col("_sp").cast("double") / F.col("count_order")).alias(
                "avg_price"
            ),
            (F.col("_sd").cast("double") / F.col("count_order")).alias(
                "avg_disc"
            ),
            "count_order",
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, special handling): an OR
    of three (brand, size-band, quantity-band) conjunctions applied
    AFTER the part equi-join — the classic disjunctive-predicate
    probe (a naive plan turns the OR into a cross-ish join; keeping
    the equi key primary means part still broadcasts and the OR is a
    cheap post-join filter). Adapted to the fixture schema (no
    p_container — p_size bands instead)."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def q_scd2_pit_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 decoration (operators/history.py pit_join):
    line-item revenue attributed to the customer's priority AS OF THE
    SHIP DATE — each fact joins the dimension version containing its
    own event time (key equality + interval containment; exactly one
    match per fact because intervals are disjoint). Joining the
    current version instead would backfill future knowledge — the
    leakage this operator exists to prevent."""
    from amazon_personalize_connectors_spark.operators.history import (
        pit_join,
        scd2_from_changelog,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    log = orders.select(
        F.col("o_custkey").alias("cust"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("prio"),
    )
    scd = scd2_from_changelog(log, ["cust"], "d", ["prio"]).select(
        "cust", "prio", "valid_from", "valid_to"
    )
    facts = orders.join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        F.col("o_custkey").alias("cust"),
        F.to_date("l_shipdate").alias("ship_d"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    joined = pit_join(facts, scd, ["cust"], "ship_d")
    return joined.groupBy("prio").agg(
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


def q_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus curation report (functions/text.py
    source_quality_report): exact integer doc/token/char totals,
    cross-corpus duplicate rate (16-byte digest counts joined back),
    English share — every rate ONE division of exact totals. The
    keep/drop/downsample table built before mixing sources."""
    from amazon_personalize_connectors_spark.functions.text import (
        source_quality_report,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return source_quality_report(docs)


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form behind ROLLUP/CUBE (both
    already covered): per-nation totals, per-segment totals, and the
    grand total in ONE pass (Catalyst plans an Expand over the three
    sets feeding one aggregate — the fact table is scanned once, not
    three times). grouping() flags disambiguate NULL-as-all from a
    NULL group value; integer cents keep totals exact."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    joined = orders.join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    ).select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    joined.createOrReplaceTempView("_gs_rev")
    return spark.sql(
        """
        SELECT CAST(grouping(nation) AS INT) AS g_nation,
               CAST(grouping(segment) AS INT) AS g_segment,
               nation, segment,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM _gs_rev
        GROUP BY GROUPING SETS ((nation), (segment), ())
        """
    )


def q_except_all_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL multiset difference (the bag-semantics sibling of
    the delta_except set form): part keys of returned line items
    minus, occurrence-for-occurrence, part keys of accepted ones —
    a part returned 5x and accepted 3x survives twice. Collapsed to
    (part, n) afterwards for a stable compare. exceptAll plans as
    count-annotated aggregate + generate, never a join fan-out."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").cast("bigint").alias("part")
    )
    a = li.where(F.col("l_returnflag") == "A").select(
        F.col("l_partkey").cast("bigint").alias("part")
    )
    return (
        r.exceptAll(a)
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_surplus"))
    )


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (DataFrame ``unpivot``/melt — the inverse of
    the pivot_events coverage): per-returnflag wide metrics (quantity
    cents, price cents, row count — all exact bigints so the melted
    value column has one type) into (flag, metric, value) rows.
    Catalyst plans Expand: one pass, rows x metrics out."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.sum((F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("qty_cents"),
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("price_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    return wide.unpivot(
        ["flag"],
        ["qty_cents", "price_cents", "n_rows"],
        "metric",
        "value",
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join
    so zero-order customers survive with count 0, join-side filter
    (non-urgent orders — the fixture's stand-in for the comment
    anti-pattern) applied BEFORE the join so it prunes the probe
    side, then a second tiny aggregate over the per-customer counts.
    Two shuffles total; the distribution table is at most
    max-orders-per-customer rows."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    suppliers whose revenue EQUALS the maximum. The max rides in as a
    broadcast 1-row aggregate and the equality compares DECIMALS
    (exact) — comparing doubles would be a tie-break lottery. Revenue
    cast to double only at output."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    ).cast("decimal(30,8)")
    per_supp = (
        li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum(rev).alias("total"))
    )
    mx = per_supp.agg(F.max("total").alias("mx"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .where(F.col("total") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("sk") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("total").cast("double").alias("total_revenue"),
        )
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity) on the fixture
    schema (nation replaces the phone country code): customers with
    above-average positive balances and NO RECENT orders (none since
    2000-09-01 — the fixture's lapsed-customer window; nearly every
    customer has SOME order, so the all-time form is vacuous),
    counted/summed per nation. The average is a broadcast 1-row aggregate computed as
    ONE decimal division of exact sums; "no orders" is a LEFT ANTI
    join — the big fact side never widens."""
    customer = synthetic.load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("bigint").alias("nation"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    orders = synthetic.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-09-01").cast("timestamp_ntz")
    )
    pos = customer.where(F.col("cents") > 0)
    avg1 = pos.agg(
        F.sum("cents").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    rich = customer.crossJoin(F.broadcast(avg1)).where(
        F.col("cents") * F.col("_n") > F.col("_s")
    )
    no_orders = rich.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return no_orders.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("numcust"),
        F.sum("cents").cast("bigint").alias("totacctbal_cents"),
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): lineitem
    bridges a supplier nation and a customer nation; keep both
    directions of the (NATION_1, NATION_2) pair, bucket by ship year,
    decimal-exact revenue. Nation and supplier dims broadcast; the
    two-sided pair filter prunes BEFORE the revenue aggregate."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    customer = synthetic.load_table(spark, sf_dir, "customer")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_sn"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_cn"), F.col("n_name").alias("cust_nation")
    )
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn"))
        .where(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): for STANDARD-type
    parts sold into ASIA customers over two order years, NATION_2
    suppliers' revenue share per year — conditional decimal sums,
    ONE double division per year. Part/supplier/nation/region dims
    broadcast; the order-date band prunes the orders scan."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    customer = synthetic.load_table(spark, sf_dir, "customer")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    region = synthetic.load_table(spark, sf_dir, "region")
    part = synthetic.load_table(spark, sf_dir, "part")
    lo = F.lit("1995-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    ).cast("decimal(30,8)")
    cust_nation = nation.select(
        F.col("n_nationkey").alias("_cn"), F.col("n_regionkey").alias("_cr")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("_sn"), F.col("n_name").alias("supp_nation")
    )
    asia = region.where(F.col("r_name") == "ASIA").select(
        F.col("r_regionkey").alias("_r")
    )
    zero = F.lit(0).cast("decimal(30,8)")
    yearly = (
        orders.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(part.where(F.col("p_type") == "STANDARD")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("_cn"))
        .join(F.broadcast(asia), F.col("_cr") == F.col("_r"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("_sn"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(zero)
            ).alias("_nat"),
            F.sum(rev).alias("_tot"),
        )
    )
    return yearly.select(
        "o_year",
        F.col("_nat").cast("double").alias("nation_revenue"),
        F.col("_tot").cast("double").alias("total_revenue"),
        (F.col("_nat").cast("double") / F.col("_tot").cast("double")).alias(
            "mkt_share"
        ),
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier) on the fixture schema
    (no partsupp — the part-supplier relation and its cost derive
    from lineitem: cost = cheapest shipment in integer cents, exact
    and MIN-monotonic, where the official ps_supplycost would be):
    for size-15 parts and EUROPE suppliers, the supplier(s) achieving
    each part's minimum cost. The correlated MIN subquery is a
    per-part aggregate joined back on (partkey, exact-cents cost) —
    comparing doubles here would be a tie lottery. The part filter
    and the region-pruned supplier dim broadcast; the big lineitem
    scan collapses FIRST to the bounded (part, supplier) pair grid,
    so everything after the first aggregate is dimension-sized."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    region = synthetic.load_table(spark, sf_dir, "region")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents).alias("cost_cents")
    )
    eu = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(
        F.broadcast(part.where(F.col("p_size") == 15).select("p_partkey")),
        F.col("p_partkey") == F.col("l_partkey"),
    ).join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    mn = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("cost_cents").alias("_mn")
    )
    return (
        cand.join(
            mn,
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("cost_cents") == F.col("_mn")),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            F.col("cost_cents").cast("bigint").alias("cost_cents"),
        )
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year) on the
    fixture schema (no partsupp — unit cost stands in as
    p_retailprice, the official ps_supplycost's obvious proxy):
    profit = extprice*(1-disc) - retail*qty for parts named
    ``red ...``, summed per supplier nation per order year. Both
    terms stay decimal(30,8) (exact) until the single output cast;
    part/supplier/nation dims broadcast so lineitem shuffles once,
    for the final (nation, year) aggregate."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    part = synthetic.load_table(spark, sf_dir, "part")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    ).cast("decimal(30,8)")
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    ).cast("decimal(30,8)")
    return (
        lineitem.join(
            F.broadcast(
                part.where(F.col("p_name").like("red%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(rev - cost).cast("double").alias("sum_profit"))
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification) on the
    fixture schema (no partsupp — a part's "stock value" for
    NATION_3's suppliers is its shipped extended-price total from
    lineitem, in exact integer cents): parts whose value exceeds
    TWICE the average per-part value. The official query scales its
    fraction by 1/SF because a fixed share of the total empties as
    the part catalog grows; thresholding against the average
    (value·n_parts > 2·total) is the same idea made scale-free, and
    the compare stays division-free bigint-exact. The HAVING
    threshold's scalar subquery rides in as a broadcast 1-row
    aggregate. The big scan is pruned FIRST by the broadcast
    nation-filtered supplier dim, then collapses to the per-part
    grid — one shuffle."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    n3_supp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    val = (
        lineitem.join(
            F.broadcast(n3_supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    tot = val.agg(
        F.sum("value_cents").alias("_t"),
        F.count(F.lit(1)).alias("_np"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("value_cents") * F.col("_np") > 2 * F.col("_t"))
        .select(
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            F.col("value_cents").cast("bigint").alias("value_cents"),
        )
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split) on the fixture
    schema (no l_shipmode/l_receiptdate — the class is l_linestatus
    and "late" means shipped > 90 days after the order date): for
    lines shipped in 1996, per linestatus, how many came from
    high-priority (URGENT/HIGH) vs lower-priority orders.
    Conditional bigint counts in one map-side-combinable aggregate;
    the ship-date band pushes to the lineitem scan."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship) on the fixture
    schema (no partsupp — the pair relation is the DISTINCT
    (partkey, suppkey) grid observed in lineitem; the "customer
    complaints" exclusion stands in as negative-balance suppliers):
    distinct supplier count per (brand, type, size) over 8 sizes,
    excluding Brand#5 and PROMO parts. The NOT IN subquery is a
    LEFT ANTI against the broadcast bad-supplier dim — the pair grid
    never widens; the grid itself is bounded (dedup BEFORE any join,
    so the big scan collapses immediately)."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    keep_part = part.where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(keep_part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion) on the fixture
    schema (no ps_availqty — "excess" means a (part, supplier) pair
    shipped MORE THAN HALF its lifetime quantity of a ``red ...``
    part during 1996): suppliers holding at least one such
    concentration. The nested aggregate runs on the bounded pair
    grid (part-filtered FIRST via the broadcast red-part dim), the
    half compare is division-free integer centiqty (q96*2 > qtot),
    and the supplier decoration is a LEFT SEMI — each supplier
    appears once regardless of how many parts qualify."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    qty_c = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    in96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    per = (
        lineitem.join(
            F.broadcast(
                part.where(F.col("p_name").like("red%")).select("p_partkey")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in96, qty_c).otherwise(F.lit(0).cast("bigint")))
            .alias("q96"),
            F.sum(qty_c).alias("qtot"),
        )
    )
    excess = per.where(F.col("q96") * 2 > F.col("qtot")).select("l_suppkey")
    return (
        supplier.join(
            excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) on the
    fixture schema ("late" means shipped > 60 days after the order
    date, per the Q4 adaptation): for finished ('F') orders with
    lines from MORE THAN ONE supplier where EXACTLY ONE supplier was
    late, charge the wait to that supplier and count. The official
    EXISTS / NOT EXISTS pair collapses into one per-order aggregate
    (distinct suppliers, distinct LATE suppliers, and — since there
    is exactly one — MAX of the late keys IS the culprit), so the
    fact table shuffles once on orderkey and never self-joins.
    Supplier names decorate via broadcast; top 100 with
    deterministic (count desc, name) order."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = (
        lineitem.join(
            orders.where(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("_n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("_n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("_late_supp"),
        )
        .where((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
    )
    return (
        per_order.groupBy("_late_supp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .join(
            F.broadcast(supplier), F.col("s_suppkey") == F.col("_late_supp")
        )
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
        .select("s_name", "numwait")
    )


def q_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive MASE floor over daily order revenue
    (operators/analytics.py seasonal_naive_mase): |v_t - v_{t-7}|
    vs |v_t - v_{t-1}| over CALENDAR lags, integer error sums, one
    double division of two exact integer products."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        seasonal_naive_mase,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("cents")
    )
    return seasonal_naive_mase(daily, "day", "cents", season_days=7)


def q_retractable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-aware rollup maintenance (operators/cdc.py
    retractable_rollup_merge): rolling the one-year order-window
    rollup forward by signed per-key deltas (updates contribute
    new-old, deletes retract, empty groups drop out) must equal a
    full recompute over the new window — the oracle IS that
    recompute. All-bigint cents arithmetic so retraction is
    lossless."""
    from amazon_personalize_connectors_spark.operators.cdc import (
        retractable_rollup_merge,
    )

    def facts(lo, hi):
        orders = synthetic.load_table(spark, sf_dir, "orders")
        return orders.where(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
        ).select(
            "o_orderkey",
            F.pmod(F.col("o_custkey"), F.lit(100)).cast("bigint").alias("grp"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )

    old = facts("1995-01-01", "1996-01-01")
    new = facts("1995-07-01", "1996-07-01")
    base = old.groupBy("grp").agg(
        F.sum("cents").alias("sum_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    return retractable_rollup_merge(
        base, old, new, ["o_orderkey"], "grp", "cents",
        sum_name="sum_cents", count_name="n_rows",
    ).select(
        "grp",
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
        "n_rows",
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity class report (operators/privacy.py):
    one row per quasi-identifier equivalence class over customer
    (nation, segment, $1000 balance band) with exact size, distinct
    sensitive-value count, and violation flags — ONE grouped
    aggregate over the export, classes not records downstream."""
    return _customer_privacy_classes(spark, sf_dir).select(
        "nation",
        "segment",
        "band",
        "class_size",
        "n_sensitive",
        "k_violation",
        "l_violation",
    )


def q_privacy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row release gate (operators/privacy.py
    k_anonymity_summary): class/record totals, risky classes AND
    risky records (what actually leaks), effective k, low-diversity
    class count."""
    from amazon_personalize_connectors_spark.operators.privacy import (
        k_anonymity_summary,
    )

    return k_anonymity_summary(_customer_privacy_classes(spark, sf_dir))


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/privacy.py t_closeness_classes):
    per (segment, $2000 balance band) class, the exact-integer EMD
    between the class's nation distribution and the global one over
    the 25-nation ordered domain — the skewed-class leak that
    k-anonymity and l-diversity both miss. t_q is the exact integer
    quotient (EMD·1e9) div 1; the category grid is the nation
    dimension (bounded, guard-enforced) broadcast onto the class
    table, cumsums windowed per class."""
    from amazon_personalize_connectors_spark.operators.privacy import (
        numeric_band,
        t_closeness_classes,
    )

    cust = synthetic.load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        numeric_band(
            (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint"),
            200_000,
        ).alias("band"),
        F.col("c_nationkey").cast("bigint").alias("nation"),
    )
    return t_closeness_classes(
        cust, ["segment", "band"], "nation", t_threshold_q=375_000_000
    )


def q_stream_model_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming co-visitation model refresh, ORACLE-CHECKED end to
    end (streaming/model_refresh.py): interactions staged as four
    parquet files drain through foreachBatch ONE FILE PER
    MICRO-BATCH (maxFilesPerTrigger=1), each batch folding its
    increments into the versioned pairs+items store; serve_topk over
    the final store must equal a FULL recompute over all
    interactions — regardless of how the files split into batches.
    Same quarter-of-users subset as covisitation_incremental."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.model_refresh import (
        refresh_from_stream,
        serve_topk,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    inter = (
        orders.where(F.col("o_custkey") % 4 == 0)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("u"),
            F.col("l_partkey").cast("long").alias("i"),
        )
    )
    landing = tempfile.mkdtemp(prefix="apc-model-landing-")
    store = tempfile.mkdtemp(prefix="apc-model-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-model-ckpt-")
    inter.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("u long, i long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    refresh_from_stream(stream, store, ckpt)
    return serve_topk(spark, store, k=5, min_common=2).select(
        "item", "rec_item", "n_common", F.col("rank").cast("int").alias("rank")
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier screen (operators/features.py
    robust_outlier_stats) over integer cents per return flag — the
    robust sibling of the mean/std price_outliers band. Discrete
    (rank-based) medians keep every statistic integer-exact."""
    from amazon_personalize_connectors_spark.operators.features import (
        robust_outlier_stats,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return robust_outlier_stats(li, ["l_returnflag"], "cents", k=3)


def q_rec_auc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC per user segment (operators/evaluation.py:roc_auc)
    grading event value as a purchase predictor: Mann–Whitney rank-sum
    with tie correction on the integer-cents score grid — bigint until
    the single final division, so the statistic is engine- and
    partition-layout-independent (the user_profile_vectors lesson)."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        roc_auc,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("user_id") % 4).cast("bigint").alias("segment"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return roc_auc(scored, ["segment"], "score", "label")


def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration + cumulative-gains table over fixed-width 500-cent
    score bins (operators/evaluation.py:score_bin_report): per-bin
    conversion rate plus top-down positive capture — every fraction one
    bigint/bigint division, bins by integer DIV (no single-task
    ntile)."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        score_bin_report,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return score_bin_report(scored, "score", "label", bin_width=500)


def q_wilson_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sigma Wilson click-through bounds per hour of day
    (operators/evaluation.py:wilson_bounds): clicks / (views+clicks)
    with the interval a dashboard should trust instead of the raw
    rate. The bound is a fixed tree of correctly-rounded IEEE ops
    (+,-,*,/,sqrt; z²=4 exactly) on exact counts — the oracle spells
    the identical tree, so the doubles match bit-for-bit."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        wilson_bounds,
    )

    ev = synthetic.load_events(spark, sf_dir).where(
        F.col("event_type").isin("view", "click")
    )
    rows = ev.select(
        F.hour("ts").cast("bigint").alias("hour"),
        (F.col("event_type") == "click").cast("int").alias("label"),
    )
    return wilson_bounds(rows, ["hour"], "label")


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini concentration of customer revenue per market segment
    (operators/analytics.py:concentration_gini): the whale-concentration
    report — rank-sum identity in pure bigint on the per-customer cents
    grid (closed-form tie runs, raw rows never windowed), ONE final
    division."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        concentration_gini,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    customer = synthetic.load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("cust_cents")
    )
    joined = per_cust.join(
        customer.select("c_custkey", "c_mktsegment"),
        per_cust.o_custkey == customer.c_custkey,
    ).select("c_mktsegment", "cust_cents")
    return concentration_gini(joined, ["c_mktsegment"], "cust_cents")


def q_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-to-user Jaccard neighborhoods from the interaction bridge
    (operators/recsys.py:user_jaccard_topk) — top-5 neighbors per user,
    min 2 shared items; hot-item cap inert at driver SFs so the capless
    self-join oracle matches (cap semantics pytest-pinned)."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        user_jaccard_topk,
    )

    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").cast("bigint").alias("user_id"),
        F.col("ITEM_ID").cast("bigint").alias("item_id"),
    )
    return user_jaccard_topk(
        mapping, k=5, max_users_per_item=1000, min_common=2
    ).withColumn("rank", F.col("rank").cast("int"))


def q_stream_auc_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming score-quality monitor, ORACLE-CHECKED end to end
    (streaming/score_monitor.py): events staged as four parquet files
    drain ONE FILE PER MICRO-BATCH, each batch folding its (segment,
    score) pos/neg counts into the versioned grid store; the per-group
    AUC read from the final store must equal the batch rank-sum over
    all rows — the mergeable-grid law, regardless of batch splits."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.score_monitor import (
        auc_from_store,
        monitor_scores_from_stream,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("user_id") % 4).cast("long").alias("segment"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    landing = tempfile.mkdtemp(prefix="apc-auc-landing-")
    store = tempfile.mkdtemp(prefix="apc-auc-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-auc-ckpt-")
    scored.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("segment long, score long, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    monitor_scores_from_stream(stream, store, ckpt, "segment", "score", "label")
    return auc_from_store(spark, store).withColumnRenamed("g", "segment")


def q_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation of quantity vs price cents per return
    flag (operators/features.py:grouped_pearson): decimal-exact moment
    sums (layout-independent), one correctly-rounded IEEE tail; the
    oracle computes the same exact integers in int128 and performs the
    same final conversions."""
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_pearson,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return grouped_pearson(li, ["l_returnflag"], "qty", "cents")


def q_qty_price_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation of quantity vs price cents per
    return flag (operators/features.py:grouped_spearman): doubled-rank
    integers off the value grid (closed-form tie runs, no raw-row
    window), then the decimal-exact Pearson core."""
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_spearman,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return grouped_spearman(li, ["l_returnflag"], "qty", "cents")


def q_price_qty_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact OLS fit of price cents on quantity per return flag
    (operators/features.py:grouped_ols): decimal-exact moment sums,
    closed-form slope/intercept/R² on a FIXED IEEE expression tail —
    bit-stable across partitionings; the oracle mirrors the identical
    expression tree on int128 moments."""
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_ols,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return grouped_ols(li, ["l_returnflag"], "qty", "cents")


def q_chi2_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of return flag vs line status
    (operators/features.py:chi2_independence): exact bigint
    marginals, per-cell deviations cross-multiplied in decimal (no
    expected-value division), one IEEE tail per cell QUANTIZED to
    nano-units so the cross-cell sum is an exact bigint — the
    ipw_weighted_ratio pattern; Cramér's V rides on the same quanta."""
    from amazon_personalize_connectors_spark.operators.features import (
        chi2_independence,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    return chi2_independence(li, "l_returnflag", "l_linestatus")


def q_mi_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information + normalized MI between order priority and
    order status (operators/features.py:mutual_information): one
    map-side-combinable groupBy to the 15-cell grid, window marginals
    OVER THE GRID, every log argument a ratio of exact decimal
    cross-products cast to double once, per-cell terms quantized to
    nano-units so the cross-cell sum is an exact bigint (the
    chi2_flag_status pattern); mi/nmi clamp at 0 to absorb the
    floor() quantization bias on near-independent pairs."""
    from amazon_personalize_connectors_spark.operators.features import (
        mutual_information,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    return mutual_information(orders, "o_orderpriority", "o_orderstatus")


def q_ivm_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided incremental view maintenance of a join rollup
    (operators/cdc.py:incremental_join_rollup): orders and lineitem
    are each split at 1999-01-01 into base + delta, the base
    join-rollup is 'stored', and the three delta terms (ΔA⋈B, A⋈ΔB,
    ΔA⋈ΔB) merge into it by exact bigint addition. The oracle is the
    FULL recompute over the unsplit tables — equality IS the delta
    rule. Revenue per order priority, exact cents."""
    from amazon_personalize_connectors_spark.operators.cdc import (
        incremental_join_rollup,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_shipdate",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    cut = F.lit("1999-01-01").cast("timestamp_ntz")
    base_a = orders.where(F.col("o_orderdate") < cut).drop("o_orderdate")
    delta_a = orders.where(F.col("o_orderdate") >= cut).drop("o_orderdate")
    base_b = li.where(F.col("l_shipdate") < cut).drop("l_shipdate")
    delta_b = li.where(F.col("l_shipdate") >= cut).drop("l_shipdate")
    base_rollup = (
        base_a.join(
            base_b, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum("cents").alias("sum_v"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )
    out = incremental_join_rollup(
        base_rollup,
        base_a,
        delta_a,
        base_b,
        delta_b,
        a_key="o_orderkey",
        b_key="l_orderkey",
        group_col="o_orderpriority",
        value_col="cents",
    )
    return out.select(
        "o_orderpriority",
        F.col("sum_v").cast("bigint").alias("sum_v"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


def q_stream_ivm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming two-sided join-IVM, ORACLE-CHECKED end to end
    (streaming/ivm.py): orders (dimension side) and lineitem (fact
    side) interleave as a tagged union staged into four files that
    drain ONE PER MICRO-BATCH — so every batch carries a mix of ΔA
    and ΔB — and each epoch folds the three delta-rule terms into an
    epoch-versioned rollup store. The final store must equal the
    full batch join rollup over the unsplit tables, whatever the
    batch interleaving: the delta-rule law, end to end."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.ivm import (
        maintain_from_stream,
        rollup_from_store,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    tagged = orders.select(
        F.lit("A").alias("side"),
        F.col("o_orderkey").cast("long").alias("key"),
        F.col("o_orderpriority").alias("grp"),
        F.lit(None).cast("long").alias("val"),
    ).unionByName(
        li.select(
            F.lit("B").alias("side"),
            F.col("l_orderkey").cast("long").alias("key"),
            F.lit(None).cast("string").alias("grp"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("val"),
        )
    )
    landing = tempfile.mkdtemp(prefix="apc-ivm-landing-")
    store = tempfile.mkdtemp(prefix="apc-ivm-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-ivm-ckpt-")
    tagged.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("side string, key long, grp string, val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    maintain_from_stream(stream, store, ckpt)
    return rollup_from_store(spark, store).select(
        F.col("grp").alias("o_orderpriority"),
        F.col("sum_v").cast("bigint").alias("sum_v"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (operators/analytics.py
    linear_attribution): each purchase's value splits evenly in
    integer micro-units across its 24 h window touches, division
    remainder to the latest touch (largest-remainder completion), so
    credit conserves exactly; per-channel bigint rollup, one double
    division at output."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        linear_attribution,
    )

    ev = synthetic.load_events(spark, sf_dir)
    return linear_attribution(ev)


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup candidates
    (functions/dedup.py:sorted_neighborhood_pairs): corpus ranked by
    text-prefix blocking key via the scale-safe contiguous-id
    machinery (no single-task global window), neighborhood w=5 via
    the band-join bucket trick (≤2 bucket rows per record, pairs
    linear in corpus size), exact distinct-token Jaccard per
    candidate. Oracle mirrors rank, neighborhood and Jaccard with
    row_number + a range self-join."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        sorted_neighborhood_pairs,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    out = sorted_neighborhood_pairs(docs, window=5)
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "rank_dist",
        "common",
        "union_size",
        "jaccard",
    )


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals in cents
    (operators/expectations.py:benford_profile): digits from the
    bigint's STRING form (exact in every engine — never a log10
    floor), exact counts, pinned literal reference probabilities so
    abs_dev subtracts identical bits in both engines."""
    from amazon_personalize_connectors_spark.operators.expectations import (
        benford_profile,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    return benford_profile(orders, "cents")


def q_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of daily revenue (lags 1, 7, 28): the
    seasonality detector behind the forecast_mase floor. Daily cents
    totals (exact bigints) pair with themselves via day-index
    equi-joins — the calendar-lag pattern, no window over raw rows —
    then each lag's correlation is operators/features.py's
    grouped_pearson on the exact pairs (decimal moment sums, one
    IEEE tail). Days missing either end of a lag pair drop out, as
    in the classic ACF-on-observed-days definition."""
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_pearson,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("di")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("v")
    )
    pairs = None
    for lag in (1, 7, 28):
        a = daily.select("di", F.col("v").alias("x"))
        b = daily.select(
            (F.col("di") - lag).alias("di"), F.col("v").alias("y")
        )
        p = a.join(b, "di").select(
            F.lit(lag).cast("int").alias("lag"), "x", "y"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return grouped_pearson(pairs, ["lag"], "x", "y")


def q_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency (FK-discovery) profile over candidate
    relations (operators/expectations.py:key_containment): the three
    true TPC-H foreign keys plus a deliberate negative control —
    distinct-key containment, never raw x raw; one division per
    relation."""
    from amazon_personalize_connectors_spark.operators.expectations import (
        key_containment,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    part = synthetic.load_table(spark, sf_dir, "part")
    customer = synthetic.load_table(spark, sf_dir, "customer")
    rels = [
        key_containment(li, "l_orderkey", orders, "o_orderkey",
                        "lineitem.l_orderkey->orders.o_orderkey"),
        key_containment(li, "l_partkey", part, "p_partkey",
                        "lineitem.l_partkey->part.p_partkey"),
        key_containment(orders, "o_custkey", customer, "c_custkey",
                        "orders.o_custkey->customer.c_custkey"),
        # negative control: part keys are NOT customer keys in general
        key_containment(part, "p_partkey", customer, "c_custkey",
                        "part.p_partkey->customer.c_custkey"),
    ]
    out = rels[0]
    for r in rels[1:]:
        out = out.unionByName(r)
    return out


def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery
    (operators/expectations.py:functional_dependency): three
    candidates — the composite line-item PK (holds), orderkey ->
    linestatus (violated: multi-line orders mix statuses), and
    custkey -> orderpriority (violated: customers reorder at
    different priorities). Exact distincts, one rollup row each."""
    from amazon_personalize_connectors_spark.operators.expectations import (
        functional_dependency,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    cands = [
        functional_dependency(
            li, ["l_orderkey", "l_linenumber"], "l_partkey",
            "lineitem(l_orderkey,l_linenumber)->l_partkey",
        ),
        functional_dependency(
            li, ["l_orderkey"], "l_linestatus",
            "lineitem.l_orderkey->l_linestatus",
        ),
        functional_dependency(
            orders, ["o_custkey"], "o_orderpriority",
            "orders.o_custkey->o_orderpriority",
        ),
    ]
    out = cands[0]
    for c in cands[1:]:
        out = out.unionByName(c)
    return out


def q_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation drift check (operators/features.py:tv_distance)
    between returned and non-returned price distributions — the
    total-mass-moved complement to the KS sup over the same
    populations: per-value cross-multiplied absolute differences
    summed in bigint, ONE division, no cumulative pass."""
    from amazon_personalize_connectors_spark.operators.features import (
        tv_distance,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "l_returnflag",
    )
    return tv_distance(
        li,
        "cents",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )


def q_stream_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second statistic off the SAME streaming score-grid state
    (streaming/score_monitor.py:calibration_from_store): drain the
    staged stream into the pointer-flip grid store, then serve the
    calibration/gains table — must equal the batch score_calibration
    over all rows (one maintained grid answers AUC and calibration)."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.score_monitor import (
        calibration_from_store,
        monitor_scores_from_stream,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("user_id") % 4).cast("long").alias("segment"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    landing = tempfile.mkdtemp(prefix="apc-cal-landing-")
    store = tempfile.mkdtemp(prefix="apc-cal-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-cal-ckpt-")
    scored.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("segment long, score long, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    monitor_scores_from_stream(stream, store, ckpt, "segment", "score", "label")
    return calibration_from_store(spark, store, bin_width=500)


def q_stream_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles served from the SAME streaming drift
    grid that answers KS (streaming/drift_monitor.py:
    quantiles_from_store): stage, drain one file per micro-batch, then
    read p25/50/75/90/99 of everything drained off the maintained
    (value, count) state — must equal the batch inverse-CDF quantiles
    over all rows."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.drift_monitor import (
        monitor_from_stream,
        quantiles_from_store,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "l_returnflag",
    )
    landing = tempfile.mkdtemp(prefix="apc-q-landing-")
    store = tempfile.mkdtemp(prefix="apc-q-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-q-ckpt-")
    li.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("cents long, l_returnflag string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    monitor_from_stream(
        stream, store, ckpt, "cents",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )
    return quantiles_from_store(spark, store, [25, 50, 75, 90, 99])


def q_ab_test_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test between the two user-parity arms
    (operators/evaluation.py:two_proportion_ztest): one aggregate for
    the four exact counts, then a fixed correctly-rounded IEEE tree
    (+,-,*,/,sqrt) the oracle spells identically — bit-for-bit z."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        two_proportion_ztest,
    )

    ev = synthetic.load_events(spark, sf_dir)
    rows = ev.select(
        (F.col("user_id") % 2).alias("arm"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return two_proportion_ztest(
        rows, F.col("arm") == 0, F.col("arm") == 1, "label"
    )


def q_markov_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order next-event model
    (operators/evaluation.py:top1_transition_accuracy): argmax
    transitions fitted on pre-cutoff pairs (grid window over the
    states-x-states table), top-1 accuracy scored on post-cutoff pairs
    via a broadcast model join — per-state bigint hits over one
    division."""
    from pyspark.sql.window import Window

    from amazon_personalize_connectors_spark.operators.evaluation import (
        top1_transition_accuracy,
    )

    events = synthetic.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        events.select(
            "user_id", "ts_us", "event_id",
            F.col("event_type").alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    # 2024-01-22T00:00:00 in the fixture's epoch-microsecond clock
    # (ts_us == DuckDB epoch_us(ts); the events_sessionize parity)
    cutoff_us = 1_705_881_600_000_000
    return top1_transition_accuracy(
        pairs, "from_type", "to_type", F.col("ts_us") < F.lit(cutoff_us)
    )


def q_ipw_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity-debiased hit rate of the related-items payload
    (operators/evaluation.py:ipw_weighted_ratio over the rec_hitrate
    fold): each query item's (hits, recs) weighted by the integer
    quantized inverse of its user-popularity — exact bigint fold, two
    final divisions; the debiased rate exposes how much of the raw
    hit rate rides on popular items."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        ipw_weighted_ratio,
    )
    from amazon_personalize_connectors_spark.operators.recsys import (
        rec_hitrate_by_cooccurrence,
    )

    recs = synthetic.related_items_batch_inference(spark, sf_dir)
    exploded = recs.where(F.col("error").isNull()).select(
        F.col("input.itemId").alias("query_item_id"),
        F.explode("output.recommendedItems").alias("rec_item"),
    )
    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").alias("user_id"), F.col("ITEM_ID").alias("item_id")
    )
    hits = rec_hitrate_by_cooccurrence(
        exploded, mapping, max_items_per_user=1000
    )
    pop = mapping.groupBy("item_id").agg(
        F.countDistinct("user_id").cast("bigint").alias("pop")
    )
    joined = hits.join(
        pop, hits.query_item_id == pop.item_id, "left"
    ).select(
        F.coalesce("pop", F.lit(1)).alias("pop"), "n_hits", "n_recs"
    )
    return ipw_weighted_ratio(joined, "pop", "n_hits", "n_recs")


def q_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (operators/analytics.py skyline_2d):
    largest part size at the lowest retail price — points where size
    cannot be raised without paying more. Raw parts collapse to the
    (size, cents) cell grid in one map-side-combinable pass; only the
    |size-domain| grid (50 values) rides the ordered running-min
    window. The oracle is an INDEPENDENT formulation (NOT EXISTS
    dominance over the per-size minima) — two different algorithms
    must agree on the exact frontier."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        skyline_2d,
    )

    part = synthetic.load_table(spark, sf_dir, "part")
    pts = part.select(
        F.col("p_size").cast("bigint").alias("size"),
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return skyline_2d(pts, "size", "cents").select(
        F.col("x").alias("size"),
        F.col("y").alias("min_cents"),
        "n_at_point",
        "n_at_x",
    )


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift check (operators/features.py
    psi_drift): returned vs non-returned line-item prices in
    $1000-wide bins — the industry drift score beside the KS sup
    (ks_drift) and total-variation (tv_drift) over the SAME
    populations. Shared-support bins carry the quantized-bigint PSI
    sum (chi2 pattern — layout-independent); one-sided bins come
    back as exact integer mass numerators, not a smoothing fudge."""
    from amazon_personalize_connectors_spark.operators.features import (
        psi_drift,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100000 AS BIGINT)"
        ).alias("bin"),
        "l_returnflag",
    )
    return psi_drift(
        li,
        "bin",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )


def q_bitemporal_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of report (operators/history.py
    bitemporal_asof_join): orders double as a two-axis changelog —
    valid time = the order date, transaction time = valid +
    (orderkey % 7) days (assertions arrive up to a week late). Each
    finished order asks "as KNOWN ten days after the order date, what
    was the latest priority EFFECTIVE at the order date" — a late
    correction (higher tx, same valid) wins; anything learned after
    T=+10d cannot leak in. The (valid, tx) argmax is ONE exact
    decimal(38,0) max (valid*10^19 + tx packs the lexicographic
    order); DuckDB mirrors it in HUGEINT, so both engines pick the
    identical record. Report: per picked priority, fact count and the
    exact integer sum of assertion lag in days."""
    from amazon_personalize_connectors_spark.operators.history import (
        bitemporal_asof_join,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    # epoch DAYS, not micros: o_orderdate is TIMESTAMP_NTZ, and a
    # timestamp cast would drag session-timezone semantics into the
    # oracle comparison — datediff from the epoch is timezone-free
    day = F.datediff(
        F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    log = orders.select(
        F.col("o_custkey").alias("cust"),
        day.alias("lv"),
        (day + (F.col("o_orderkey") % 7).cast("bigint")).alias("ltx"),
        F.col("o_orderpriority").alias("prio"),
    )
    facts = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("fid"),
        day.alias("fv"),
        (day + F.lit(10).cast("bigint")).alias("ft"),
    )
    picked = bitemporal_asof_join(
        facts,
        log,
        ["cust"],
        fact_id_col="fid",
        fact_tx_col="ft",
        fact_valid_col="fv",
        log_tx_col="ltx",
        log_valid_col="lv",
        attr_cols=["prio"],
    )
    return picked.groupBy("prio").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_facts"),
        F.sum(F.col("picked_tx") - F.col("picked_valid"))
        .cast("bigint")
        .alias("sum_lag_days"),
    )


# Driver verification window: the driver oracle-checks the FIRST 50
# entries of queries() in dict order; queries() reorders the full
# registry so this list comes first. Round-9 rotation (ledger:
# VERIFIED.md; generated AND applied by `tools/rotate_window.py
# --apply`, which rewrites this block): the 3 sentinels, ALL 9
# round-8 staged queries that have never earned a driver row (the
# maxsim family, sq8_cosine_topk, ivf_refined_probe, hnsw_compact,
# image_palette_resize, embedding_decontaminate_lsh — VERDICT r8
# item 1), the 2 converted rows-only queries that gained real
# oracles in r8 (multimodal_decode, hll_user_rollup), and 36
# oldest-evidence rotations (r3 greens — VERDICT r8 item 3).
# tests/test_window_rotation.py pins the invariants AS OF THIS
# WINDOW'S ROUND (evidence < r9), so landing CORRECTNESS_r09.json
# does not re-redden the suite (ADVICE r8 item 4).
_R9_WINDOW = [
    "flagship_related_flat",
    "attribution_join",
    "delta_except",
    "image_palette_resize",
    "embedding_decontaminate_lsh",
    "hnsw_compact",
    "sq8_cosine_topk",
    "maxsim_multivector",
    "maxsim_rerank",
    "ivf_refined_probe",
    "maxsim_ann_pipeline",
    "maxsim_neardup",
    "multimodal_decode",
    "hll_user_rollup",
    "asof_join",
    "band_join_bucketed",
    "stream_interval_join",
    "running_revenue",
    "stratified_sample",
    "event_funnel",
    "decontaminate",
    "pack_sequences",
    "pii_scrub",
    "rp_lsh_pairs",
    "lang_mixture",
    "stream_dedup",
    "ntile_quartiles",
    "sample_k_per_group",
    "approx_median_check",
    "corpus_prep_pipeline",
    "session_window_native",
    "variant_props",
    "line_dedup",
    "line_dedup_materialized",
    "neardup_pagerank",
    "bigram_stats",
    "lm_coverage",
    "bpe_pair_stats",
    "zorder_layout",
    "substring_dedup",
    "cumulative_uniques",
    "ann_recall",
    "dedup_canonical",
    "temporal_split",
    "rolling_distinct_users",
    "markov_transitions",
    "rfm_features",
    "rolling_revenue_28d",
    "gap_fill_daily",
    "cohort_retention",
]

# Staging discipline (VERDICT r6 item 3 / r7 item 6): queries added
# DURING the current round are listed here instead of competing for
# window slots; tools/rotate_window.py drains them (never-verified
# priority) into the NEXT round's window, and
# tests/test_window_rotation.py exempts exactly this list from the
# staleness invariant.
_STAGED = [
    "maxsim_neardup_clustered",
]




def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as one batch operator (operators/cdc.py:
    merge_upsert): upsert 1998 order revenue onto the customer
    dimension — matched customers get their balance replaced by the
    year's revenue cents, a shifted-key copy of the source exercises
    the insert clause, and untouched customers ride through. ONE
    full-outer shuffle join + row-local CASE; the oracle is the same
    merge as a FULL OUTER JOIN with COALESCE clauses."""
    from amazon_personalize_connectors_spark.operators.cdc import (
        merge_upsert,
    )

    target = synthetic.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_nationkey").cast("bigint").alias("nk"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("bal_cents"),
    )
    rev = (
        synthetic.load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1998)
        .groupBy(F.col("o_custkey").cast("bigint").alias("k"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("bal_cents")
        )
        .select("k", (F.col("k") % 25).cast("bigint").alias("nk"), "bal_cents")
    )
    source = rev.unionByName(
        rev.select(
            (F.col("k") + 10_000_000).alias("k"), "nk", "bal_cents"
        )
    )
    return merge_upsert(target, source, ["k"]).select(
        "k", "nk", "bal_cents"
    )




def q_variant_drift_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-drift (sources/readers.py:parse_batch_inference_drift):
    schema-drift-tolerant batch-inference scan via Spark 4 VARIANT,
    closing the Glue DynamicFrame choice-type gap (ri:99-107). The
    fixture JSONL is built IN-PLAN from part with four per-record
    shapes — clean strings, numeric drift (unquoted id + numeric rec
    list, the classic choice type), an error row, and an unparseable
    line — and the oracle reconstructs the expected typed rows
    relationally, so equality pins absorb-and-flag semantics:
    drifted records land CAST into the declared schema with
    _drift=true instead of in _corrupt_record."""
    from amazon_personalize_connectors_spark.sources.readers import (
        parse_batch_inference_drift,
    )

    part = synthetic.load_table(spark, sf_dir, "part")
    n = part.agg((F.max("p_partkey") + 1).alias("n"))
    k = F.col("p_partkey").cast("bigint")
    base = part.select(k.alias("k")).crossJoin(F.broadcast(n))
    r1 = ((F.col("k") + 1) % F.col("n")).cast("string")
    r2 = ((F.col("k") + 2) % F.col("n")).cast("string")
    ks = F.col("k").cast("string")
    line = (
        F.when(
            F.col("k") % 10 == 0,
            F.concat(
                F.lit('{"input":{"itemId":"'), ks,
                F.lit('"},"error":"ITEM_NOT_IN_DATASET"}'),
            ),
        )
        .when(
            F.col("k") % 3 == 0,
            F.concat(
                F.lit('{"input":{"itemId":'), ks,
                F.lit('},"output":{"recommendedItems":['), r1,
                F.lit(','), r2, F.lit(']}}'),
            ),
        )
        .when(F.col("k") % 17 == 0, F.concat(F.lit('{"broken '), ks))
        .otherwise(
            F.concat(
                F.lit('{"input":{"itemId":"'), ks,
                F.lit('"},"output":{"recommendedItems":["'), r1,
                F.lit('","'), r2, F.lit('"]}}'),
            )
        )
    )
    parsed = parse_batch_inference_drift(base.select(line.alias("value")))
    return parsed.select(
        F.col("input.itemId").alias("item_id"),
        F.size("output.recommendedItems").cast("bigint").alias("n_recs"),
        F.element_at("output.recommendedItems", 1).alias("first_rec"),
        F.col("error").alias("error"),
        F.col("_drift").alias("drift"),
        F.col("_corrupt_record").isNotNull().alias("is_corrupt"),
    )




def q_stream_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (streaming/stateful.py:
    running_user_stats_pandas — applyInPandasWithState, Arrow-batched,
    Update mode): drain the events table as a file stream with
    Trigger.AvailableNow; each micro-batch emits updated per-user
    (count, first, last) running stats; the LAST emit per user must
    equal the plain batch aggregate — which is exactly the DuckDB
    oracle (COUNT/MIN/MAX GROUP BY user_id)."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.stateful import (
        running_user_stats_pandas,
    )
    from amazon_personalize_connectors_spark.streaming.windows import (
        run_stream_to_memory,
    )

    landing = tempfile.mkdtemp(prefix="apc-stream-stats-")
    batch = synthetic.load_events(spark, sf_dir).select("user_id", "ts_us")
    batch.write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", 8
    ).parquet(landing)
    emits = run_stream_to_memory(
        running_user_stats_pandas(stream), output_mode="update"
    )
    # last emit per user == running total (n monotone, first/last
    # monotone in their directions)
    return emits.groupBy("user_id").agg(
        F.max("n_events").cast("bigint").alias("n_events"),
        F.min("first_ts_us").cast("bigint").alias("first_ts_us"),
        F.max("last_ts_us").cast("bigint").alias("last_ts_us"),
    )




def q_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record linkage (operators/linkage.py): customer
    candidate pairs BLOCKED on (nation, market segment) — the bounded
    pair generator — scored with integer micro log-likelihood weights
    over three agreement fields (balance within 100.00, key residue
    mod 97, name length), classified by a threshold pair, and rolled
    up per decision. The oracle repeats the identical self-join +
    CASE arithmetic in SQL — exact bigint end to end."""
    from amazon_personalize_connectors_spark.operators.linkage import (
        linkage_scores,
    )

    cust = synthetic.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_nationkey").cast("bigint").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("bal"),
        F.length("c_name").cast("bigint").alias("nlen"),
    )
    a = cust.alias("a")
    b = cust.alias("b")
    # blocking must BOUND block size at any data scale: nation x
    # segment alone grows with the customer table (quadratic pairs at
    # 100 TB), so a key-range co-key (custkey DIV 5000, the
    # sorted-neighborhood flavor) caps every block at 5000 members by
    # construction — recall within a block is the demo's scope; the
    # LSH/SNM generators in functions/dedup.py are the recall paths
    pairs = a.join(
        b,
        (F.col("a.nk") == F.col("b.nk"))
        & (F.col("a.seg") == F.col("b.seg"))
        & (F.expr("a.k div 5000") == F.expr("b.k div 5000"))
        & (F.col("a.k") < F.col("b.k")),
    ).select(
        F.col("a.k").alias("k1"),
        F.col("b.k").alias("k2"),
        (F.abs(F.col("a.bal") - F.col("b.bal")) <= 10_000).alias("_balband"),
        (F.col("a.k") % 97 == F.col("b.k") % 97).alias("_keymod"),
        (F.col("a.nlen") == F.col("b.nlen")).alias("_namelen"),
    )
    scored = linkage_scores(
        pairs,
        {
            "balband": (F.col("_balband"), 0.9, 0.05),
            "keymod": (F.col("_keymod"), 0.85, 0.1),
            "namelen": (F.col("_namelen"), 0.7, 0.3),
        },
        upper_micro=4_000_000,
        lower_micro=0,
    )
    return scored.groupBy("decision").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("score_micro").cast("bigint").alias("score_sum"),
    )


def q_kfold_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe stratified k-fold audit (operators/features.py:
    stratified_kfold / kfold_report): orders grouped-split on
    o_custkey into 5 folds via the portable Lehmer-step hash (plain
    bigint arithmetic, so the oracle runs the SAME expression), with
    per-(priority, fold) row and key counts. Row-local fold
    assignment + one aggregate; zero extra shuffles."""
    from amazon_personalize_connectors_spark.operators.features import (
        kfold_report,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.col("o_orderpriority").alias("priority"),
    )
    rep = kfold_report(orders, ["priority"], "o_custkey", 5)
    return rep.select(
        "priority",
        F.col("fold").cast("int").alias("fold"),
        "n_rows",
        "n_keys",
    )




def q_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (operators/evaluation.py:cohens_kappa) between
    two deterministic "annotators" of order urgency — the priority
    field vs a clerk-parity rule — the labeling-QA gate as exact
    bigint confusion/marginal arithmetic with ONE final division.
    The oracle repeats the identical grid algebra in SQL."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        cohens_kappa,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    labeled = orders.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit("hot")
        )
        .otherwise(F.lit("cold"))
        .alias("rater_a"),
        F.when(F.col("o_custkey") % 3 == 0, F.lit("hot"))
        .otherwise(F.lit("cold"))
        .alias("rater_b"),
    )
    return cohens_kappa(labeled, "rater_a", "rater_b")




def q_score_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error (operators/evaluation.py:
    expected_calibration_error) of the cents score against purchase
    labels over 500-cent bins on a 0-100.00 (10000-cent) confidence
    scale — exact bigint cross-multiplied bin gaps, ONE division.
    Oracle: the identical integer algebra in SQL."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        expected_calibration_error,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return expected_calibration_error(
        scored, "score", "label", bin_width=500, score_scale=10_000
    )




def q_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection on daily revenue (operators/
    analytics.py:changepoint_single): the argmin-SSE split of the
    calendar-bounded daily cents series, exact prefix sums (bigint /
    decimal(38,0)) under a fixed per-candidate IEEE cost tree that
    the oracle spells identically — so the chosen split day, the
    integer segment sums, AND the double cost/gain match
    bit-for-bit."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        changepoint_single,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    out = changepoint_single(daily, "day", "cents")
    return out.select(
        F.col("split_day").cast("string").alias("split_day"),
        "n_left", "n_right", "sum_left", "sum_right", "cost", "gain",
    )




def q_stream_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental MinHash-LSH near-dup maintenance
    (streaming/neardup_monitor.py): the documents subset arrives as a
    multi-file stream (AvailableNow), each micro-batch bands only its
    own docs and joins them against the accumulated band state —
    history is never re-banded — and the union of per-epoch candidate
    pairs must equal the batch minhash_lsh_candidates over everything
    drained. Same params as q:minhash_lsh, so the SAME DuckDB oracle
    applies (sqls["stream_minhash_lsh"] = sqls["minhash_lsh"])."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.neardup_monitor import (
        candidates_from_store,
        maintain_from_stream,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    ).select("doc_id", "text")
    landing = tempfile.mkdtemp(prefix="apc-neardup-landing-")
    # several files so AvailableNow produces several micro-batches
    docs.repartition(4).write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(landing)
    store = tempfile.mkdtemp(prefix="apc-neardup-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-neardup-ckpt-")
    maintain_from_stream(stream, store, ckpt, n=2)
    return candidates_from_store(spark, store).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "n_shared_bands",
    )


def q_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann-Whitney U rank-sum test on event value cents,
    purchase vs view (operators/features.py:mannwhitney_u): exact
    bigint/decimal(38,0) rank and tie sums over the distinct-cents
    grid, then the tie-corrected z and rank-biserial effect as fixed
    IEEE trees the oracle spells identically."""
    from amazon_personalize_connectors_spark.operators.features import (
        mannwhitney_u,
    )

    ev = synthetic.load_events(spark, sf_dir)
    rows = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return mannwhitney_u(rows, "event_type", "purchase", "view", "cents")


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily order revenue
    (operators/analytics.py:seasonal_decompose_exact): centered 7-day
    trend, epoch-anchored day-of-week seasonal means, and residuals —
    every component an exact integer numerator over a known
    denominator, so the oracle matches bit-for-bit with no float
    summation anywhere."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        seasonal_decompose_exact,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    out = seasonal_decompose_exact(daily, "day", "cents", period=7)
    return out.select(
        F.col("day").cast("string").alias("day"),
        "v", "trend_num", "dow", "seasonal_num", "slot_cnt", "residual_num",
    )


def q_theilsen_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope of daily order revenue (operators/
    analytics.py:theilsen_slope): the lower median of all pairwise
    slopes, quantized to exact bigints with pure integer remainder
    algebra — no float median, bit-identical to the oracle."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        theilsen_slope,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    return theilsen_slope(daily, "day", "cents", scale=1_000_000)


def q_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of a 10,000-document sampling
    budget across (lang, source) corpus strata proportional to
    character mass (operators/analytics.py:
    largest_remainder_allocation): exact integer quotient/remainder
    algebra, slots sum to the budget by construction."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        largest_remainder_allocation,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return largest_remainder_allocation(
        docs, ["lang", "source"], "n_chars", total_slots=10_000
    )


def q_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets via the Apriori pruning step
    (operators/analytics.py:frequent_triples): candidates come from
    closing triangles over the support-filtered PAIR list (domain-
    sized), then one verify aggregate against the baskets — never a
    3-way fact self-join. The ORACLE is the independent brute-force
    3-way join, so the pruning must be lossless."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        frequent_triples,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("bigint").alias("basket"),
        F.col("l_partkey").cast("bigint").alias("item"),
    )
    return frequent_triples(li, "basket", "item", min_support=2)


def q_revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region→nation revenue drill-down shares
    (operators/analytics.py:ratio_to_parent): each nation's exact
    integer share of its region and each region's share of total —
    one groupBy, one parent window, one 1-row broadcast; quotients
    via the pmod-subtract-divide idiom."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        ratio_to_parent,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    cust = synthetic.load_table(spark, sf_dir, "customer")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    region = synthetic.load_table(spark, sf_dir, "region")
    facts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    return ratio_to_parent(facts, ["region"], ["nation"], "cents")


def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag
    (operators/features.py:weighted_quantile, q=1/2): the price below
    which half the UNITS sell — weights collapse to one row per
    distinct value (tie-proof by construction), cumulative decimal
    sum, cross-multiplied rational crossing test. No floats."""
    from amazon_personalize_connectors_spark.operators.features import (
        weighted_quantile,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return weighted_quantile(li, ["l_returnflag"], "cents", "qty", 1, 2)


def q_lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson matrix over four lineitem measures in ONE
    aggregate scan (operators/features.py:corr_matrix): exact decimal
    moments for all 14 sums at once, literal-bounded pair inline —
    never a self-join; same fixed IEEE tail as grouped_pearson."""
    from amazon_personalize_connectors_spark.operators.features import (
        corr_matrix,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("disc_c"),
        (F.col("l_tax").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("tax_c"),
    )
    return corr_matrix(li, ["qty", "price_c", "disc_c", "tax_c"])


def q_trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of order value cents per priority
    (operators/features.py:trimmed_mean): rank-count trimming (the
    kept multiset is tie-stable), decimal-exact kept sum, exact
    integer mean quotient — one window pass per group, no joins."""
    from amazon_personalize_connectors_spark.operators.features import (
        trimmed_mean,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return trimmed_mean(orders, ["priority"], "cents", trim_pct=10)


def q_stream_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT distinct maintenance, ORACLE-CHECKED end to end
    (streaming/distinct_monitor.py): orders staged as four parquet
    files drain ONE FILE PER MICRO-BATCH, each batch OR-folding its
    per-(priority, id-bucket) bitmaps into the versioned epoch-keyed
    store; exact distinct customers served from the final store must
    equal batch COUNT(DISTINCT) — bitmaps merge by OR, so any batch
    split yields the same state. Bounded state: one ≤4 KiB bitmap per
    touched 32768-id bucket, never per row."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.distinct_monitor import (
        distinct_from_store,
        maintain_from_stream,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_custkey").cast("bigint").alias("cust"),
    )
    landing = tempfile.mkdtemp(prefix="apc-dst-landing-")
    store = tempfile.mkdtemp(prefix="apc-dst-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-dst-ckpt-")
    orders.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("prio string, cust long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    maintain_from_stream(stream, store, ckpt, ["prio"], "cust")
    return distinct_from_store(spark, store, ["prio"])


def q_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph (functions/dedup.py
    kcore_peel, 6 fixed peeling rounds): distinct co-ordered part
    pairs form the edges; vertices of residual degree < 3 peel away
    round by round, leaving the tightly co-purchased nucleus with its
    residual degree. Fixed-round semantics keep the iterative
    operator engine-reproducible; the oracle unrolls the same six
    rounds as chained CTEs."""
    from amazon_personalize_connectors_spark.functions.dedup import kcore_peel

    li = synthetic.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 4 == 0
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .where(F.col("pa") < F.col("pb"))
        .select(
            F.col("pa").cast("bigint").alias("id_a"),
            F.col("pb").cast("bigint").alias("id_b"),
        )
        .distinct()
    )
    return kcore_peel(edges, k=3, n_rounds=6).select(
        F.col("node").cast("bigint").alias("node"), "deg"
    )


def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing, ORACLE-CHECKED through a REAL codec
    (functions/multimodal.py attach_synth_png + image_ahash):
    deterministic grayscale PNGs are genuinely zlib-encoded and
    re-decoded Spark-side (Arrow-batched mapInPandas), NN-resized to
    8×8 with the exact integer index map, and average-hashed — while
    the oracle reproduces the pixel arithmetic
    ((id·7 + 3x + 11y) mod 256) with generate_series, no codec. The
    hash match pins the full PNG encode→decode→resize→hash path."""
    from amazon_personalize_connectors_spark.functions.multimodal import (
        attach_synth_png,
        image_ahash,
    )

    part = synthetic.load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )
    media = attach_synth_png(
        part.where(F.col("media_id") % 20 == 0), "media_id"
    )
    return image_ahash(media)


def q_image_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE path, ORACLE-CHECKED through a REAL codec
    (functions/multimodal.py attach_synth_png + resize_images): the
    deterministic PNGs are decoded and nearest-neighbor-resized to
    4×3 Spark-side (the exact integer index map
    src = (dst·src_dim) // dst_dim), then the resized RAW PIXEL
    BUFFER is aggregated JVM-side (hex → conv per byte — no Python
    touches the pixels after the sanctioned decode boundary) into an
    exact pixel sum and a position-weighted sum that pins byte ORDER,
    not just content — while the oracle reproduces the same pixels as
    ((id·7 + 3·((x·w)//4) + 11·((y·h)//3)) mod 256) with
    generate_series, no codec. Closes the last pytest-only multimodal
    path (VERDICT r6 item 6): encode→decode→resize→buffer is now
    hash-checked end to end."""
    from amazon_personalize_connectors_spark.functions.multimodal import (
        attach_synth_png,
        resize_images,
    )

    part = synthetic.load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )
    media = attach_synth_png(
        part.where(F.col("media_id") % 20 == 0), "media_id"
    )
    rs = resize_images(media, out_w=4, out_h=3)
    vals = F.expr(
        "transform(sequence(0, 11), i -> "
        "cast(conv(substring(hex(pixels), i*2+1, 2), 16, 10) as bigint))"
    )
    return rs.select(
        "media_id",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("nch").cast("bigint").alias("nch"),
        vals.alias("_v"),
    ).select(
        "media_id",
        "width",
        "height",
        "nch",
        F.expr("aggregate(_v, 0L, (a, v) -> a + v)").alias("px_sum"),
        F.expr(
            "aggregate(zip_with(_v, sequence(0, 11), (v, i) -> v * i),"
            " 0L, (a, v) -> a + v)"
        ).alias("px_possum"),
    )


def q_image_palette_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PALETTE PNG decode path, ORACLE-CHECKED through the REAL codec
    (functions/multimodal.py attach_synth_png_palette + resize_images
    — VERDICT r7 item 5, the PNG subtype real web corpora hit first):
    genuine PLTE/tRNS containers are decoded (indices -> RGB through
    the palette, alpha through the short tRNS table with the §11.3.2
    opaque default), NN-resized to 4x3 RGBA, and the raw 48-byte
    buffer aggregated JVM-side into exact sum + position-weighted sum
    — while the oracle reproduces every channel byte arithmetically
    with generate_series, no codec. Pins PLTE mapping, tRNS
    expansion, AND the RGBA byte interleave order."""
    from amazon_personalize_connectors_spark.functions.multimodal import (
        attach_synth_png_palette,
        resize_images,
    )

    part = synthetic.load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )
    media = attach_synth_png_palette(
        part.where(F.col("media_id") % 20 == 3), "media_id"
    )
    rs = resize_images(media, out_w=4, out_h=3)
    vals = F.expr(
        "transform(sequence(0, 47), i -> "
        "cast(conv(substring(hex(pixels), i*2+1, 2), 16, 10) as bigint))"
    )
    return rs.select(
        "media_id",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("nch").cast("bigint").alias("nch"),
        vals.alias("_v"),
    ).select(
        "media_id",
        "width",
        "height",
        "nch",
        F.expr("aggregate(_v, 0L, (a, v) -> a + v)").alias("px_sum"),
        F.expr(
            "aggregate(zip_with(_v, sequence(0, 47), (v, i) -> v * i),"
            " 0L, (a, v) -> a + v)"
        ).alias("px_possum"),
    )


def q_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy, ORACLE-CHECKED through a REAL codec
    (functions/multimodal.py attach_synth_wav + frame_energies):
    deterministic 8-bit PCM WAVs are genuinely encoded and re-decoded
    with the stdlib RIFF codec Spark-side (Arrow-batched mapInPandas,
    the sanctioned multimodal boundary), split into 16 ms frames, and
    each frame's EXACT integer energy Σs² reported — while the oracle
    reproduces the sample arithmetic ((id·31 + i·7) mod 256 − 128)
    with generate_series, no codec needed. The hash match therefore
    pins the whole WAV write→read→frame path, not just the math."""
    from amazon_personalize_connectors_spark.functions.multimodal import (
        attach_synth_wav,
        frame_energies,
    )

    part = synthetic.load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )
    media = attach_synth_wav(
        part.where(F.col("media_id") % 20 == 0), "media_id"
    )
    return frame_energies(media, frame_ms=16)


def q_stream_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CMS maintenance, ORACLE-CHECKED end to end
    (streaming/cms_monitor.py): lineitem part keys staged as four
    parquet files drain ONE FILE PER MICRO-BATCH, each batch folding
    its CMS cells into the versioned epoch-keyed store; estimates
    served from the final store for the exact top-20 parts must equal
    the batch-built sketch bit for bit (cells merge by SUM — the
    mergeable-sketch law, regardless of batch splits). Same output
    shape and oracle as cms_heavy_hitters."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.cms_monitor import (
        estimate_from_store,
        maintain_from_stream,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    keys = li.select(F.col("l_partkey").cast("bigint").alias("part"))
    landing = tempfile.mkdtemp(prefix="apc-cms-landing-")
    store = tempfile.mkdtemp(prefix="apc-cms-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-cms-ckpt-")
    keys.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("part long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    maintain_from_stream(stream, store, ckpt, "part")
    exact = keys.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact")
    )
    top = exact.orderBy(F.col("exact").desc(), F.col("part").asc()).limit(20)
    est = estimate_from_store(spark, store, top, "part")
    return top.join(est, "part").select(
        "part", "exact", "est", (F.col("est") - F.col("exact")).alias("over")
    )


def q_caliper_match_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caliper nearest-neighbor matching ATT (operators/evaluation.py
    caliper_matched_att): BUILDING-segment customers matched to
    non-BUILDING controls on account balance within $10, outcome =
    lifetime spend cents — band join on caliper buckets (never
    treated × controls), deterministic tie-broken argmin, exact
    bigint diff sum with one fixed-order float division."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        caliper_matched_att,
    )

    cust = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("spend")
    )
    units = (
        cust.join(spend, cust.c_custkey == spend.ck, "left")
        .select(
            F.col("c_custkey").cast("bigint").alias("key"),
            (F.col("c_mktsegment") == "BUILDING").cast("int").alias("treat"),
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("score"),
            F.coalesce(F.col("spend"), F.lit(0).cast("bigint")).alias("y"),
        )
    )
    return caliper_matched_att(units, "key", "treat", "score", "y", caliper=1000)


def q_anova_price_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of lineitem price cents across return flags
    (operators/features.py:anova_oneway): per-group quadratic terms
    quantized to exact integers before the cross-group sum (the chi²
    pattern), one fixed IEEE tail for F — deterministic at any
    partitioning, oracle-mirrored bit for bit."""
    from amazon_personalize_connectors_spark.operators.features import (
        anova_oneway,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return anova_oneway(li, "l_returnflag", "cents")


def q_priority_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact truncated exponential smoothing (operators/analytics.py
    dyadic_ewma, alpha=1/2, 8 lags): per order priority, the
    smoothed daily-revenue-cents trend as an exact integer quotient —
    one window pass partitioned by priority, no float recursion."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        dyadic_ewma,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    out = dyadic_ewma(daily, ["priority"], "day", "cents", k_lags=8)
    return out.select(
        "priority",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "value",
        "ewma_q",
    )


def q_revenue_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile over the daily-revenue series (operators/
    analytics.py matrix_profile_ssd, m=7, exclusion=3): per week-long
    subsequence, the exact integer SSD to its nearest non-trivial
    neighbor — motifs (repeated weekly shapes) score low, discords
    (anomalous weeks) high. The all-pairs stage is calendar², a
    guarded domain contract, never data²."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        matrix_profile_ssd,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("v")
    )
    out = matrix_profile_ssd(daily, "day", "v", m=7, exclusion=3)
    return out.select(
        F.col("idx").cast("bigint").alias("idx"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "ssd_min",
        F.col("match_idx").cast("bigint").alias("match_idx"),
    )


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse compaction planning (operators/layout.py:
    compaction_bins): pack each (lang, source) partition's documents
    — stand-ins for small files, sized by n_chars — into 64 KiB
    output bins in doc_id order. One per-partition window cumsum +
    one groupBy; bin assignment is exact integer division, so the
    plan is engine-portable."""
    from amazon_personalize_connectors_spark.operators.layout import (
        compaction_bins,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    out = compaction_bins(
        docs, ["lang", "source"], "doc_id", "n_chars", target_bytes=65_536
    )
    return out.select(
        "lang",
        "source",
        "bin_id",
        "n_files",
        "bin_bytes",
        F.col("first_key").cast("bigint").alias("first_key"),
        F.col("last_key").cast("bigint").alias("last_key"),
    )


def q_open_orders_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency (operators/analytics.py:
    open_interval_daily_counts): per change day, how many lineitems
    were in flight (ordered, not yet shipped) — two map-side
    aggregates collapse the intervals to the calendar grid, one
    guarded grid window does the running sum; never a day×interval
    band join."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        open_interval_daily_counts,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    iv = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderdate").alias("s"), F.col("l_shipdate").alias("e")
    )
    out = open_interval_daily_counts(iv, "s", "e")
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "net_delta",
        "open_cnt",
    )


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F2 sketch audit (functions/sketches.py:
    ams_f2_sketch/ams_f2_estimate): 17 signed sums over lineitem part
    keys in ONE map-side-combinable aggregate, median of squares as
    the self-join-size estimate, reported next to the exact
    F2 = Σ c_k² with the error in ppm. The md5 sign hash is
    engine-portable, so the oracle reproduces the estimator
    bit-for-bit."""
    from amazon_personalize_connectors_spark.functions.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    keys = li.select(F.col("l_partkey").cast("bigint").alias("key"))
    est = ams_f2_estimate(ams_f2_sketch(keys, "key", reps=17), reps=17)
    d38 = "decimal(38,0)"
    exact = (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(
            F.sum((F.col("c").cast(d38) * F.col("c")).cast(d38))
            .cast("bigint")
            .alias("f2_exact"),
            F.sum("c").cast("bigint").alias("n_rows"),
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_rows",
        "f2_exact",
        "f2_est",
        F.expr(
            "CAST((abs(CAST(f2_est AS decimal(38,0)) - f2_exact) * 1000000)"
            " div f2_exact AS BIGINT)"
        ).alias("abs_err_ppm"),
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch accuracy audit (functions/sketches.py:
    cms_sketch/cms_estimate): build a 4x256 CMS over lineitem part
    keys with the engine-portable md5 cell hash, estimate the top-20
    parts by exact count, and report est vs exact — overcount is
    provably >= 0. The oracle computes the identical sketch cells in
    SQL, so counts match bit-for-bit."""
    from amazon_personalize_connectors_spark.functions.sketches import (
        cms_estimate,
        cms_sketch,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    keys = li.select(F.col("l_partkey").cast("bigint").alias("part"))
    sketch = cms_sketch(keys, "part", depth=4, hex_chars=2)
    exact = keys.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact")
    )
    # orderBy+limit plans as TakeOrderedAndProject: per-partition
    # top-20 merged at the driver — no global sort window
    top = exact.orderBy(F.col("exact").desc(), F.col("part").asc()).limit(20)
    est = cms_estimate(sketch, top, "part", depth=4, hex_chars=2)
    return top.join(est, "part").select(
        "part", "exact", "est", (F.col("est") - F.col("exact")).alias("over")
    )


def q_dbscan_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the label-blocked embedding ε-graph (functions/
    similarity.py:dbscan_from_edges over blocked_near_duplicates
    edges, min_cosine=0.3, min_pts=3): core/border/noise roles and
    min-reachable-core-id cluster labels — deterministic where
    textbook DBSCAN is scan-order-dependent."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        blocked_near_duplicates,
        dbscan_from_edges,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    edges = blocked_near_duplicates(emb, min_cosine=0.3).select(
        "id_a", "id_b"
    )
    nodes = emb.select(F.col("vec_id").alias("id"))
    out = dbscan_from_edges(nodes, edges, min_pts=3)
    return out.select(
        F.col("id").cast("bigint").alias("id"), "role", "cluster"
    )


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification re-rank (operators/recsys.py:mmr_rerank):
    per query vector, greedily pick 5 of its top-8 candidates by the
    exact integer objective 7*rel - 3*max_sim over floor(v*1e6)
    int-dot scores (lambda = 0.7). Every quantity is an exact bigint
    (integer dot products stay under 2^53, so even the oracle's
    double list_dot_product is exact), and ties break on the smaller
    item id — the greedy trace replays identically in plain SQL."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        mmr_rerank,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    iv = emb.select(
        F.col("vec_id").cast("bigint").alias("id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda v: F.floor(v * 1e6).cast("bigint"),
        ).alias("v"),
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    from pyspark.sql import Window

    qs = iv.where(F.col("id") % 50 == 0).select(
        F.col("id").alias("q"), F.col("v").alias("qv")
    )
    scored = iv.join(F.broadcast(qs), F.col("id") != F.col("q")).select(
        "q",
        F.col("id").alias("i"),
        idot(F.col("qv"), F.col("v")).alias("rel"),
    )
    w = Window.partitionBy("q").orderBy(F.col("rel").desc(), F.col("i").asc())
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 8)
        .select(F.col("q").alias("q_id"), F.col("i").alias("n_id"), "rel")
    )
    items = cand.select(F.col("n_id").alias("id")).distinct()
    ivc = iv.join(items, "id")
    a = ivc.select(F.col("id").alias("item_a"), F.col("v").alias("va"))
    b = ivc.select(F.col("id").alias("item_b"), F.col("v").alias("vb"))
    sims = a.join(F.broadcast(b), F.col("item_a") < F.col("item_b")).select(
        "item_a", "item_b", idot(F.col("va"), F.col("vb")).alias("sim_q")
    )
    out = mmr_rerank(
        cand, sims, k=5, lam_num=7, lam_den=10,
        user_col="q_id", item_col="n_id", rel_col="rel", sim_col="sim_q",
    )
    return out.select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("n_id").cast("bigint").alias("n_id"),
        "step",
    )


def _mmr_oracle_sql(k: int = 5) -> str:
    """Replay mmr_rerank's greedy trace as k chained (non-recursive)
    CTEs — each step anti-joins the previous selection, scores
    remaining candidates with the same exact integer objective, and
    picks the per-user argmax with the same (score desc, item asc)
    tie-break."""
    steps = []
    for t in range(2, k + 1):
        p = t - 1
        steps.append(f"""
sel{t} AS (
  SELECT u, i, step FROM sel{p}
  UNION ALL
  SELECT u, i, CAST({t} AS BIGINT) AS step FROM (
    SELECT r.u, r.i,
      ROW_NUMBER() OVER (PARTITION BY r.u
        ORDER BY 7 * r.rel - 3 * COALESCE(m.ms, 0) DESC, r.i ASC) AS rn
    FROM (SELECT c.* FROM cand c LEFT JOIN sel{p} s
            ON c.u = s.u AND c.i = s.i WHERE s.i IS NULL) r
    LEFT JOIN (
      SELECT s.u, sym.y AS i, MAX(sym.s) AS ms
      FROM sel{p} s JOIN sym ON sym.x = s.i
      GROUP BY s.u, sym.y) m ON m.u = r.u AND m.i = r.i
  ) WHERE rn = 1
)""")
    return f"""
WITH iv AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> floor(x * 1000000)) AS v
  FROM embeddings
),
qs AS (SELECT vec_id AS q, v FROM iv WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.q, n.vec_id AS i,
         CAST(list_dot_product(q.v, n.v) AS BIGINT) AS rel
  FROM qs q JOIN iv n ON n.vec_id <> q.q
),
cand AS (
  SELECT q AS u, i, rel FROM (
    SELECT q, i, rel,
           ROW_NUMBER() OVER (PARTITION BY q
             ORDER BY rel DESC, i ASC) AS rn
    FROM scored) WHERE rn <= 8
),
items AS (SELECT DISTINCT i FROM cand),
pairs AS (
  SELECT a.i AS x, b.i AS y,
         CAST(list_dot_product(va.v, vb.v) AS BIGINT) AS s
  FROM items a JOIN items b ON a.i < b.i
  JOIN iv va ON va.vec_id = a.i JOIN iv vb ON vb.vec_id = b.i
),
sym AS (SELECT x, y, s FROM pairs UNION ALL SELECT y, x, s FROM pairs),
sel1 AS (
  SELECT u, i, CAST(1 AS BIGINT) AS step FROM (
    SELECT u, i, ROW_NUMBER() OVER (PARTITION BY u
      ORDER BY 7 * rel DESC, i ASC) AS rn FROM cand) WHERE rn = 1
),{",".join(steps)}
SELECT CAST(u AS BIGINT) AS q_id, CAST(i AS BIGINT) AS n_id, step
FROM sel{k}
"""


def q_did_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on purchase value cents (operators/
    evaluation.py:diff_in_diff): treated = even user ids, post =
    events on/after Jan 16 — four exact bigint cells, means and the
    DiD estimate as fixed IEEE trees the oracle spells identically."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        diff_in_diff,
    )

    ev = synthetic.load_events(spark, sf_dir)
    rows = ev.where(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2 == 0).alias("tr"),
        (F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp")).alias(
            "po"
        ),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return diff_in_diff(rows, F.col("tr"), F.col("po"), "cents")


def q_graph_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random walks on the part co-purchase graph
    (operators/recsys.py:graph_random_walks): 4-step hash-driven
    walks from every part id divisible by 100 over parts that share
    an order — md5 picks each next hop, so the SQL oracle replays
    the identical corpus step by step."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        graph_random_walks,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"),
        F.col("l_partkey").cast("bigint").alias("p"),
    )
    a = li.select("o", F.col("p").alias("src"))
    b = li.select(F.col("o").alias("o2"), F.col("p").alias("dst"))
    edges = (
        a.join(b, (a["o"] == b["o2"]) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
    )
    starts = edges.select(F.col("src").alias("id")).distinct().where(
        F.col("id") % 100 == 0
    )
    out = graph_random_walks(edges, starts, walk_len=4, seed="w")
    return out.select(
        F.col("walk").cast("bigint").alias("walk"),
        "step",
        F.col("node").cast("bigint").alias("node"),
    )


def _walks_oracle_sql(walk_len: int = 4) -> str:
    """Replay graph_random_walks' hash-argmin trace as chained CTEs:
    step t keeps the out-neighbor with the smallest
    md5('w|walk|t|cur|dst') per walker."""
    steps = []
    for t in range(1, walk_len + 1):
        p = t - 1
        steps.append(f"""
s{t} AS (
  SELECT walk, node, step FROM s{p}
  UNION ALL
  SELECT walk, nxt AS node, CAST({t} AS BIGINT) AS step FROM (
    SELECT f.walk, p.dst AS nxt,
      ROW_NUMBER() OVER (PARTITION BY f.walk ORDER BY
        md5('w|' || CAST(f.walk AS VARCHAR) || '|{t}|'
            || CAST(f.node AS VARCHAR) || '|'
            || CAST(p.dst AS VARCHAR)) ASC, p.dst ASC) AS rn
    FROM (SELECT walk, node FROM s{p} WHERE step = {p}) f
    JOIN pairs p ON f.node = p.src
  ) WHERE rn = 1
)""")
    return f"""
WITH li AS (
  SELECT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p FROM lineitem
),
pairs AS (
  SELECT DISTINCT a.p AS src, b.p AS dst
  FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
),
starts AS (SELECT DISTINCT src AS id FROM pairs WHERE src % 100 = 0),
s0 AS (SELECT id AS walk, id AS node, CAST(0 AS BIGINT) AS step FROM starts),{",".join(steps)}
SELECT CAST(walk AS BIGINT) AS walk, step, CAST(node AS BIGINT) AS node
FROM s{walk_len}
"""


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of purchase probability over 500-cent
    value bins (operators/evaluation.py:isotonic_calibration): the
    parallel max-min closed form of PAV regression — exact bigint
    prefix sums, one fixed-tree division per interval, min/max
    aggregates only, so the fitted monotone curve matches the oracle
    bit-for-bit."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        isotonic_calibration,
    )

    ev = synthetic.load_events(spark, sf_dir).where(
        F.col("value").isNotNull()
    )
    binned = ev.select(
        (
            (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("cents"),
        (F.col("event_type") == "purchase").cast("bigint").alias("label"),
    ).groupBy(
        F.expr("cents div 500").cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    return isotonic_calibration(binned, "bin", "n", "pos")


def q_js_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon drift (operators/features.py:js_divergence)
    over the SAME populations and $1000 price bins as q:psi_drift /
    q:ks_drift / q:tv_drift — the symmetric, ln2-bounded member of
    the drift family, finite on one-sided bins with no smoothing
    epsilon. Quantized-bigint term sums (chi2 pattern)."""
    from amazon_personalize_connectors_spark.operators.features import (
        js_divergence,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100000 AS BIGINT)"
        ).alias("bin"),
        "l_returnflag",
    )
    return js_divergence(
        li,
        "bin",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )


def q_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% thresholds of event value cents per event
    type (operators/evaluation.py:conformal_threshold): the exact
    ceil((n+1)*9/10)-th smallest score via pure integer rank
    arithmetic and a grouped cumulative window — no float quantile
    semantics anywhere."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        conformal_threshold,
    )

    ev = synthetic.load_events(spark, sf_dir).where(
        F.col("value").isNotNull()
    )
    scored = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return conformal_threshold(
        scored, ["event_type"], "cents", alpha_num=1, alpha_den=10
    )


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight rounds of BPE tokenizer training over the documents
    corpus (functions/text.py:bpe_learn_merges): the learned merge
    table, with every round's argmax pair chosen by exact counts and
    a lexicographic tie-break and every merge applied by a literal
    separator-delimited replace — semantics every engine shares, so
    the oracle replays the whole training trace in SQL."""
    from amazon_personalize_connectors_spark.functions.text import (
        bpe_learn_merges,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return bpe_learn_merges(docs, "text", n_merges=8)


def _bpe_oracle_sql(n_merges: int = 8) -> str:
    """Replay bpe_learn_merges round by round: pairs from the split
    symbol strings, argmax by (count desc, pair asc), merge by the
    same chr(1)-delimited literal replace."""
    rounds = []
    for t in range(1, n_merges + 1):
        p = t - 1
        rounds.append(f"""
p{t} AS (
  SELECT x, y, CAST(SUM(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, s[i] AS x, s[i + 1] AS y FROM (
      SELECT cnt, s, unnest(range(1, len(s))) AS i FROM (
        SELECT cnt, list_filter(string_split(w, chr(1)), z -> z <> '') AS s
        FROM w{p}) WHERE len(s) >= 2
    )
  ) GROUP BY x, y
),
b{t} AS (SELECT x, y, c FROM p{t} ORDER BY c DESC, x ASC, y ASC LIMIT 1),
w{t} AS (
  SELECT replace(w.w, chr(1) || b.x || chr(1) || b.y || chr(1),
                 chr(1) || b.x || b.y || chr(1)) AS w, w.cnt
  FROM w{p} w, b{t} b
)""")
    finals = "\nUNION ALL ".join(
        f"""SELECT CAST({t} AS BIGINT) AS step, x AS "left", y AS "right",
       x || y AS merged, c AS pair_count FROM b{t}"""
        for t in range(1, n_merges + 1)
    )
    return _bpe_cte_prefix(rounds) + finals + "\n"


def _bpe_cte_prefix(rounds: list) -> str:
    return f"""
WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
wc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE length(tok) >= 2 GROUP BY tok
),
w0 AS (
  SELECT chr(1) || array_to_string(string_split(tok, ''), chr(1)) || chr(1)
           AS w, cnt
  FROM wc
),{",".join(rounds)}
"""


def _bpe_rounds_sql(n_merges: int) -> list:
    rounds = []
    for t in range(1, n_merges + 1):
        p = t - 1
        rounds.append(f"""
p{t} AS (
  SELECT x, y, CAST(SUM(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, s[i] AS x, s[i + 1] AS y FROM (
      SELECT cnt, s, unnest(range(1, len(s))) AS i FROM (
        SELECT cnt, list_filter(string_split(w, chr(1)), z -> z <> '') AS s
        FROM w{p}) WHERE len(s) >= 2
    )
  ) GROUP BY x, y
),
b{t} AS (SELECT x, y, c FROM p{t} ORDER BY c DESC, x ASC, y ASC LIMIT 1),
w{t} AS (
  SELECT replace(w.w, chr(1) || b.x || chr(1) || b.y || chr(1),
                 chr(1) || b.x || b.y || chr(1)) AS w, w.cnt
  FROM w{p} w, b{t} b
)""")
    return rounds


def _bpe_vocab_oracle_sql(n_merges: int = 8) -> str:
    """Vocabulary histogram after replaying the same n training
    rounds: split the final word table's symbols and count."""
    return _bpe_cte_prefix(_bpe_rounds_sql(n_merges)) + f"""
SELECT sym AS symbol, CAST(COUNT(*) AS BIGINT) AS n_words_with,
       CAST(SUM(cnt) AS BIGINT) AS total_occurrences
FROM (
  SELECT cnt, unnest(list_filter(string_split(w, chr(1)),
                                 z -> z <> '')) AS sym
  FROM w{n_merges})
GROUP BY sym
"""


def q_als_user_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact rank-2 ALS user half-step (operators/recsys.py:
    als_half_step) over customer part-quantity ratings against
    deterministic pseudo item factors: five exact decimal normal-
    equation sums per user, closed-form 2x2 Cramer solve as one fixed
    IEEE tree — the oracle runs the identical algebra in HUGEINT."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        als_half_step,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    ratings = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li["l_orderkey"] == orders["o_orderkey"],
    ).select(
        F.col("o_custkey").cast("bigint").alias("user_id"),
        F.col("l_partkey").cast("bigint").alias("item_id"),
        F.col("l_quantity").cast("bigint").alias("rating"),
    )
    factors = li.select(
        F.col("l_partkey").cast("bigint").alias("item_id")
    ).distinct().select(
        "item_id",
        (F.col("item_id") % 1000).cast("bigint").alias("f1_q"),
        ((F.col("item_id") * 7 + 3) % 1000).cast("bigint").alias("f2_q"),
    )
    # factor_scale 1e3 keeps adj/det below 2^53: see the operator's
    # oracle-parity envelope note
    return als_half_step(
        ratings, factors, reg_num=1, reg_den=10, factor_scale=1000
    )


def q_stream_js_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Jensen-Shannon drift monitor, oracle-checked end to
    end (streaming/drift_monitor.py:js_from_store): line items drain
    one file per micro-batch folding $1000-bin counts into the SAME
    versioned grid store that answers KS — the JSD read from the
    final store must equal batch q:js_drift over all rows (the
    mergeable-grid law), so the SAME DuckDB oracle applies."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.drift_monitor import (
        js_from_store,
        monitor_from_stream,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100000 AS BIGINT)"
        ).alias("bin"),
        "l_returnflag",
    )
    landing = tempfile.mkdtemp(prefix="apc-jsd-landing-")
    store = tempfile.mkdtemp(prefix="apc-jsd-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-jsd-ckpt-")
    li.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("bin long, l_returnflag string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    monitor_from_stream(
        stream, store, ckpt, "bin",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )
    return js_from_store(spark, store)


def q_oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of order priority (operators/
    features.py:oof_target_encoding): customer-grouped 5-fold split
    via the portable Lehmer hash, each order encoded by the mean
    cents of the OTHER folds — exact bigint fold sums, one final
    division, NULL where a category has no out-of-fold evidence."""
    from amazon_personalize_connectors_spark.operators.features import (
        oof_target_encoding,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("cust"),
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    out = oof_target_encoding(
        orders, "o_orderpriority", "cents", "cust", k=5
    )
    return out.select(
        "o_orderkey", "o_orderpriority",
        F.col("fold").cast("bigint").alias("fold"), "te_oof",
    )


def q_cuped_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (operators/evaluation.py:
    cuped_estimate): per-user pre/post purchase cents (split at Jan
    16), arms by user parity — nine exact bigint sums in one
    aggregate, theta and both diffs as fixed IEEE trees over sums
    that stay below 2^53 (the documented oracle-parity envelope)."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        cuped_estimate,
    )

    ev = synthetic.load_events(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = ev.groupBy(F.col("user_id").cast("bigint").alias("u")).agg(
        F.sum(
            F.when(
                F.col("ts") < cut,
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("pre"),
        F.sum(
            F.when(
                F.col("ts") >= cut,
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("post"),
    )
    return cuped_estimate(
        per_user, F.col("u") % 2 == 0, F.col("u") % 2 == 1, "pre", "post"
    )


def q_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """28-day rolling OLS trend of daily revenue (operators/
    analytics.py:rolling_ols_slope): five exact bigint moment sums on
    one integer RANGE window over the calendar-bounded daily rollup,
    slope as a fixed IEEE tree over sub-2^53 double casts."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        rolling_ols_slope,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    out = rolling_ols_slope(daily, "day", "cents", window_days=28)
    return out.select(
        F.col("day").cast("string").alias("day"), "v", "n_window", "slope"
    )


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting over the events stream (operators/
    analytics.py:growth_accounting): per period, new / retained /
    resurrected actives and churned users, gap periods included,
    phantom post-horizon period clipped — pure integer period
    arithmetic and exact counts."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        growth_accounting,
    )

    ev = synthetic.load_events(spark, sf_dir)
    return growth_accounting(ev, period_days=7)


def q_woe_iv_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WoE encoding table + information value of order priority
    against the high-value label (operators/features.py:woe_iv):
    exact cross-product log arguments, quantized IV terms — the
    credit-scoring feature audit."""
    from amazon_personalize_connectors_spark.operators.features import (
        woe_iv,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.col("o_totalprice") > 150000).cast("int").alias("hi"),
    )
    return woe_iv(orders, "o_orderpriority", "hi")


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 32-replicate CI for mean purchase cents
    (operators/features.py:bootstrap_ci): hash-derived Poisson(1)
    weights by lexicographic hex comparison — no RNG, no hex-to-int
    conversion — exact replicate sums, order-statistic CI; the oracle
    reruns the identical resampling in SQL."""
    from amazon_personalize_connectors_spark.operators.features import (
        bootstrap_ci,
    )

    ev = synthetic.load_events(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    cents = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    return bootstrap_ci(cents, "cents", n_replicates=32)


def q_eb_shrunk_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user purchase rates
    (operators/features.py:eb_shrunk_rates): beta-binomial prior fit
    by method of moments over exactly-quantized rates, posterior mean
    per user — the 1/1=100% fix, bit-identical to the oracle."""
    from amazon_personalize_connectors_spark.operators.features import (
        eb_shrunk_rates,
    )

    ev = synthetic.load_events(spark, sf_dir).select(
        F.col("user_id").cast("bigint").alias("u"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    return eb_shrunk_rates(ev, "u", "y")


def q_winnowing_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed near-dup candidates over documents (functions/
    text.py:winnowing_candidates): TRUE MOSS winnowing — minimum md5
    per 4-hash window over character 8-grams, rare-fingerprint
    inverted index, pairs sharing >= 2 fingerprints. Guarantees any
    shared substring of >= 11 chars fingerprints identically in both
    docs; the oracle recomputes the same sets in SQL."""
    from amazon_personalize_connectors_spark.functions.text import (
        winnowing_candidates,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return winnowing_candidates(
        docs, "doc_id", "text", gram=8, window=4,
        max_fp_freq=5, min_shared=3,
    ).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "n_shared",
    )


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE side (functions/text.py:bpe_encode_vocab_counts):
    train 8 merges, apply them in order to the word table with the
    same literal-replace semantics, and report the resulting symbol
    vocabulary histogram — the oracle replays training AND encoding
    in one generated SQL chain."""
    from amazon_personalize_connectors_spark.functions.text import (
        bpe_encode_vocab_counts,
        bpe_learn_merges,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in sorted(
            bpe_learn_merges(docs, "text", n_merges=8).collect(),
            key=lambda r: r["step"],
        )
    ]
    return bpe_encode_vocab_counts(docs, merges, "text")


def q_stream_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming split-conformal threshold (streaming/drift_monitor.py:
    conformal_from_store): purchase cents drain one file per
    micro-batch into the versioned grid store; the 90% conformal
    threshold read from the final store must equal the exact batch
    order statistic over all rows (the mergeable-grid law)."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.drift_monitor import (
        conformal_from_store,
        monitor_from_stream,
    )

    ev = synthetic.load_events(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    cents = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    landing = tempfile.mkdtemp(prefix="apc-conf-landing-")
    store = tempfile.mkdtemp(prefix="apc-conf-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-conf-ckpt-")
    cents.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    monitor_from_stream(
        stream, store, ckpt, "cents", F.lit(True), F.lit(False)
    )
    return conformal_from_store(spark, store, alpha_num=1, alpha_den=10)


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution over the four
    engagement channels vs purchase conversions (operators/
    attribution.py:shapley_attribution): coalition values on the
    16-mask exposure grid, factorial weights as exact integers,
    phi emitted as numerator/24 — efficiency law test-pinned, oracle
    replays the identical grid algebra."""
    from amazon_personalize_connectors_spark.operators.attribution import (
        shapley_attribution,
    )

    ev = synthetic.load_events(spark, sf_dir)
    return shapley_attribution(
        ev, ["click", "view", "signup", "error"], conversion="purchase"
    )


def q_stream_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SIDED clamped running balance as a stateful stream
    (streaming/stateful.py:capped_running_balance_pandas): unlike the
    floor-only form (q:stock_balance_floor — window-expressible via
    the Lindley reflection identity), ``b_t = min(cap, max(0,
    b_{t-1} + x_t))`` has no prefix-sum closed form, so it NEEDS
    per-key sequential state. The stream lands as FOUR time-sliced
    files with strictly increasing mtimes, drained with
    maxFilesPerTrigger=1, so the balance genuinely hops micro-batch
    boundaries through the state store; the oracle replays the whole
    recursion with a DuckDB WITH RECURSIVE. The 1-row bounds lookup
    slicing the landing is a documented bounded collect (query
    set-up, not operator dataflow)."""
    import glob
    import os
    import tempfile
    import time as _time

    from amazon_personalize_connectors_spark.streaming.stateful import (
        capped_running_balance_pandas,
    )
    from amazon_personalize_connectors_spark.streaming.windows import (
        run_stream_to_memory,
    )

    ev = synthetic.load_events(spark, sf_dir).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts_us").cast("long").alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
        (
            F.when(
                F.col("event_type").isin("purchase", "signup"), F.lit(1)
            )
            .otherwise(F.lit(-1))
            .cast("bigint")
            * (
                F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,2)")
                * 100
            ).cast("bigint")
        ).alias("delta"),
    )
    bounds = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    span = max(1, (bounds[1] - bounds[0]) // 4 + 1)
    landing = tempfile.mkdtemp(prefix="apc-stream-bal-")
    seen: set = set()
    t_base = _time.time() - 3600
    for i in range(4):
        lo = bounds[0] + i * span
        sl = ev.where(F.col("ts_us") >= lo)
        if i < 3:
            sl = sl.where(F.col("ts_us") < lo + span)
        sl.coalesce(1).write.mode("append").parquet(landing)
        for f in glob.glob(landing + "/*.parquet"):
            if f not in seen:
                os.utime(f, (t_base + i * 10, t_base + i * 10))
                seen.add(f)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    emits = run_stream_to_memory(
        capped_running_balance_pandas(stream, floor_v=0, cap_v=25_000),
        output_mode="update",
    )
    # n_seen strictly increases per user across emits, so max_by is
    # deterministic: the final emit is the drained balance
    return emits.groupBy("user_id").agg(
        F.max("n_seen").cast("bigint").alias("n_events"),
        F.expr("max_by(balance, n_seen)").cast("bigint").alias("balance"),
    )


def q_stock_balance_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-at-zero running stock balance per supplier (operators/
    analytics.py:floor_running_balance): returns restock (+qty),
    shipments issue (−qty), stock cannot go negative. The engine form
    is the Lindley reflection identity — ONE window pass, closed-form
    ``S_t - min(0, min prefix S)`` — while the ORACLE replays the
    recursion ``b_t = max(0, b_{t-1} + x_t)`` literally with a DuckDB
    WITH RECURSIVE over row numbers, so the window-expressible claim
    is checked against the sequential definition, not against
    itself."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        floor_running_balance,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").cast("bigint").alias("supp"),
        F.col("l_orderkey").cast("bigint").alias("okey"),
        F.col("l_linenumber").cast("bigint").alias("lno"),
        F.col("l_shipdate").cast("date").alias("_ship"),
        F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
        .otherwise(-F.col("l_quantity"))
        .cast("bigint")
        .alias("delta"),
    )
    out = floor_running_balance(
        li, ["supp"], ["_ship", "okey", "lno"], "delta"
    )
    return out.select("supp", "okey", "lno", "delta", "balance")


def q_part_reach_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS neighborhoods over the co-purchase graph
    (functions/dedup.py:bfs_min_hops): edges = part pairs sharing ≥2
    orders (support-filtered, domain-sized), seeds = every part with
    ``p_partkey % 97 == 0``, radius 3. The reachability shape SQL
    engines write as WITH RECURSIVE and Spark lacks — here a
    driver-unrolled fixed-depth frontier loop with per-round
    localCheckpoint; the oracle IS the recursive CTE (UNION-dedup +
    MIN(hop)), derived independently."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        bfs_min_hops,
    )

    facts = (
        synthetic.load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").cast("bigint").alias("_b"),
            F.col("l_partkey").cast("bigint").alias("_i"),
        )
        .distinct()
    )
    edges = (
        facts.alias("x")
        .join(facts.alias("y"), F.col("x._b") == F.col("y._b"))
        .where(F.col("x._i") < F.col("y._i"))
        .groupBy(F.col("x._i").alias("id_a"), F.col("y._i").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("id_a", "id_b")
    )
    seeds = (
        synthetic.load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 97 == 0)
        .select(F.col("p_partkey").cast("bigint").alias("node"))
    )
    return bfs_min_hops(edges, seeds, max_hops=3)


def q_price_interpolate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill over the daily revenue series
    per order priority (operators/analytics.py:interpolate_fill after
    gap_fill_days densification): days with no orders get the exact
    integer floor-div interpolation between the bracketing known
    days; leading/trailing gaps stay null (no extrapolation). Both
    engines compute the same pmod-floor quotient, but from
    independently-built calendars and windows."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        gap_fill_days,
        interpolate_fill,
    )

    daily = (
        synthetic.load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    dense = gap_fill_days(
        daily, ["priority"], "day", "cents", fill_value=None
    ).select(
        "priority",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_i"),
        F.col("cents").cast("bigint").alias("cents"),
    )
    out = interpolate_fill(dense, ["priority"], "day_i", "cents", scale=100)
    return out.select("priority", "day_i", "value_q", "is_interpolated")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_q = {
        "flagship_related_flat": q_flagship_related_flat,
        "attribution_join": q_attribution_join,
        "delta_except": q_delta_except,
        "revenue_anomalies": q_revenue_anomalies,
        "ab_test_purchase": q_ab_test_purchase,
        "markov_backtest": q_markov_backtest,
        "ipw_hitrate": q_ipw_hitrate,
        "stream_calibration": q_stream_calibration,
        "price_qty_corr": q_price_qty_corr,
        "qty_price_spearman": q_qty_price_spearman,
        "tv_drift": q_tv_drift,
        "fk_discovery": q_fk_discovery,
        "fd_discovery": q_fd_discovery,
        "stream_quantiles": q_stream_quantiles,
        "tpch_q2": q_tpch_q2,
        "tpch_q9": q_tpch_q9,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q16": q_tpch_q16,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "price_qty_ols": q_price_qty_ols,
        "chi2_flag_status": q_chi2_flag_status,
        "mi_priority_status": q_mi_priority_status,
        "benford_audit": q_benford_audit,
        "revenue_acf": q_revenue_acf,
        "ivm_join_rollup": q_ivm_join_rollup,
        "merge_upsert": q_merge_upsert,
        "variant_drift_scan": q_variant_drift_scan,
        "stream_running_stats": q_stream_running_stats,
        "linkage_fs": q_linkage_fs,
        "kfold_report": q_kfold_report,
        "annotator_kappa": q_annotator_kappa,
        "score_ece": q_score_ece,
        "revenue_changepoint": q_revenue_changepoint,
        "stream_minhash_lsh": q_stream_minhash_lsh,
        "sorted_neighborhood": q_sorted_neighborhood,
        "linear_attribution": q_linear_attribution,
        "stream_ivm_rollup": q_stream_ivm_rollup,
        "bitemporal_report": q_bitemporal_report,
        "psi_drift": q_psi_drift,
        "pareto_skyline": q_pareto_skyline,
        "renest_legacy_window": q_renest_legacy_window,
        "error_split_ok": q_error_split_ok,
        "error_split_errors": q_error_split_errors,
        "explode_outer": q_explode_outer,
        "decorate_flat": q_decorate_flat,
        "renest_ordered": q_renest_ordered,
        "user_pers_flat": q_user_pers_flat,
        "payload_pivot": q_payload_pivot,
        "topk_slice": q_topk_slice,
        "mannwhitney_value": q_mannwhitney_value,
        "seasonal_decompose": q_seasonal_decompose,
        "theilsen_revenue": q_theilsen_revenue,
        "quota_allocation": q_quota_allocation,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "ams_f2": q_ams_f2,
        "open_orders_sweep": q_open_orders_sweep,
        "compaction_plan": q_compaction_plan,
        "revenue_matrix_profile": q_revenue_matrix_profile,
        "priority_revenue_ewma": q_priority_revenue_ewma,
        "anova_price_flag": q_anova_price_flag,
        "caliper_match_att": q_caliper_match_att,
        "stream_cms_topk": q_stream_cms_topk,
        "audio_frame_energy": q_audio_frame_energy,
        "image_ahash": q_image_ahash,
        "image_resize_pixels": q_image_resize_pixels,
        "image_palette_resize": q_image_palette_resize,
        "kcore_parts": q_kcore_parts,
        "stream_distinct_users": q_stream_distinct_users,
        "trimmed_mean_price": q_trimmed_mean_price,
        "lineitem_corr_matrix": q_lineitem_corr_matrix,
        "weighted_median_price": q_weighted_median_price,
        "basket_triples": q_basket_triples,
        "revenue_share_hierarchy": q_revenue_share_hierarchy,
        "dbscan_embeddings": q_dbscan_embeddings,
        "mmr_rerank": q_mmr_rerank,
        "did_purchase_value": q_did_purchase_value,
        "graph_walks": q_graph_walks,
        "isotonic_calibration": q_isotonic_calibration,
        "js_drift": q_js_drift,
        "conformal_threshold": q_conformal_threshold,
        "bpe_train": q_bpe_train,
        "als_user_step": q_als_user_step,
        "stream_js_drift": q_stream_js_drift,
        "oof_target_encoding": q_oof_target_encoding,
        "cuped_purchase": q_cuped_purchase,
        "rolling_ols_slope": q_rolling_ols_slope,
        "growth_accounting": q_growth_accounting,
        "woe_iv_priority": q_woe_iv_priority,
        "bootstrap_ci": q_bootstrap_ci,
        "eb_shrunk_ctr": q_eb_shrunk_ctr,
        "winnowing_dedup": q_winnowing_dedup,
        "bpe_vocab": q_bpe_vocab,
        "stream_conformal": q_stream_conformal,
        "shapley_attribution": q_shapley_attribution,
        "stock_balance_floor": q_stock_balance_floor,
        "stream_capped_balance": q_stream_capped_balance,
        "part_reach_bfs": q_part_reach_bfs,
        "price_interpolate_daily": q_price_interpolate_daily,
        "stamp_literals": q_stamp_literals,
        "text_tokens": q_text_tokens,
        "text_quality": q_text_quality,
        "lang_profile": q_lang_profile,
        "doc_fingerprint": q_doc_fingerprint,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "ngram_jaccard_materialized": q_ngram_jaccard_materialized,
        "neardup_components": q_neardup_components,
        "events_hourly": q_events_hourly,
        "events_sessionize": q_events_sessionize,
        "events_props": q_events_props,
        "asof_join": q_asof_join,
        "band_join_bucketed": q_band_join_bucketed,
        "stream_interval_join": q_stream_interval_join,
        "running_revenue": q_running_revenue,
        "stratified_sample": q_stratified_sample,
        "event_funnel": q_event_funnel,
        "multimodal_decode": q_multimodal_decode,
        "decontaminate": q_decontaminate,
        "pack_sequences": q_pack_sequences,
        "pii_scrub": q_pii_scrub,
        "rp_lsh_pairs": q_rp_lsh_pairs,
        "lang_mixture": q_lang_mixture,
        "stream_dedup": q_stream_dedup,
        "ntile_quartiles": q_ntile_quartiles,
        "sample_k_per_group": q_sample_k_per_group,
        "approx_median_check": q_approx_median_check,
        "corpus_prep_pipeline": q_corpus_prep_pipeline,
        "session_window_native": q_session_window_native,
        "variant_props": q_variant_props,
        "line_dedup": q_line_dedup,
        "line_dedup_materialized": q_line_dedup_materialized,
        "neardup_pagerank": q_neardup_pagerank,
        "bigram_stats": q_bigram_stats,
        "lm_coverage": q_lm_coverage,
        "bpe_pair_stats": q_bpe_pair_stats,
        "zorder_layout": q_zorder_layout,
        "substring_dedup": q_substring_dedup,
        "cumulative_uniques": q_cumulative_uniques,
        "ann_recall": q_ann_recall,
        "dedup_canonical": q_dedup_canonical,
        "temporal_split": q_temporal_split,
        "rolling_distinct_users": q_rolling_distinct_users,
        "markov_transitions": q_markov_transitions,
        "rfm_features": q_rfm_features,
        "rolling_revenue_28d": q_rolling_revenue_28d,
        "gap_fill_daily": q_gap_fill_daily,
        "cohort_retention": q_cohort_retention,
        "orders_islands": q_orders_islands,
        "basket_lift": q_basket_lift,
        "priority_sample": q_priority_sample,
        "column_profile": q_column_profile,
        "stream_static_join": q_stream_static_join,
        "expectations_audit": q_expectations_audit,
        "neardup_triangles": q_neardup_triangles,
        "leakage_safe_split": q_leakage_safe_split,
        "ivf_index_probe": q_ivf_index_probe,
        "renest_capped": q_renest_capped,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "simhash64": q_simhash64,
        "state_digest_update": q_state_digest_update,
        "ann_topk": q_ann_topk,
        "ivf_multiprobe": q_ivf_multiprobe,
        "embedding_decontaminate": q_embedding_decontaminate,
        "embedding_decontaminate_lsh": q_embedding_decontaminate_lsh,
        "stream_hnsw_edges": q_stream_hnsw_edges,
        "hnsw_compact": q_hnsw_compact,
        "hnsw_topk": q_hnsw_topk,
        "hnsw_recall": q_hnsw_recall,
        "ann_topk_partial": q_ann_topk_partial,
        "ann_quantized": q_ann_quantized,
        "sq8_cosine_topk": q_sq8_cosine_topk,
        "maxsim_multivector": q_maxsim_multivector,
        "maxsim_rerank": q_maxsim_rerank,
        "ivf_refined_probe": q_ivf_refined_probe,
        "maxsim_ann_pipeline": q_maxsim_ann_pipeline,
        "maxsim_neardup": q_maxsim_neardup,
        "maxsim_neardup_clustered": q_maxsim_neardup_clustered,
        "rrf_fusion": q_rrf_fusion,
        "pq_adc": q_pq_adc,
        "simhash_neardup": q_simhash_neardup,
        "ivf_probe_topk": q_ivf_probe_topk,
        "quality_filter": q_quality_filter,
        "llm_corpus_survivors": q_llm_corpus_survivors,
        "repetition_signals": q_repetition_signals,
        "kmeans_refine": q_kmeans_refine,
        "hybrid_filtered_ann": q_hybrid_filtered_ann,
        "chunk_documents": q_chunk_documents,
        "embedding_neardup": q_embedding_neardup,
        "ivf_centroids": q_ivf_centroids,
        "ivf_assign": q_ivf_assign,
        "lineitem_pricing": q_lineitem_pricing,
        "band_join_features": q_band_join_features,
        "window_analytics": q_window_analytics,
        "rollup_revenue": q_rollup_revenue,
        "cube_revenue": q_cube_revenue,
        "sliding_windows": q_sliding_windows,
        "semi_anti_join": q_semi_anti_join,
        "pivot_events": q_pivot_events,
        "percentiles": q_percentiles,
        "stream_windowed_counts": q_stream_windowed_counts,
        "salted_attribution": q_salted_attribution,
        "tfidf_top_terms": q_tfidf_top_terms,
        "contiguous_ids": q_contiguous_ids,
        "hash_split": q_hash_split,
        "intersect_items": q_intersect_items,
        "approx_distinct": q_approx_distinct,
        "topk_per_group": q_topk_per_group,
        "delta_anti_hash": q_delta_anti_hash,
        "scd2_dimension": q_scd2_dimension,
        "incremental_rollup_merge": q_incremental_rollup_merge,
        "distinct_rollup_bitmap": q_distinct_rollup_bitmap,
        "bloom_prune_semi": q_bloom_prune_semi,
        "hll_user_rollup": q_hll_user_rollup,
        "snapshot_cdc": q_snapshot_cdc,
        "cdc_roundtrip": q_cdc_roundtrip,
        "editdist_join": q_editdist_join,
        "interval_overlap": q_interval_overlap,
        "histogram_quantiles": q_histogram_quantiles,
        "er_clusters": q_er_clusters,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "covisitation_topk": q_covisitation_topk,
        "rec_coverage": q_rec_coverage,
        "rec_hitrate": q_rec_hitrate,
        "negative_sampling": q_negative_sampling,
        "user_profile_vectors": q_user_profile_vectors,
        "funnel_windows": q_funnel_windows,
        "gap_fill_locf": q_gap_fill_locf,
        "price_outliers": q_price_outliers,
        "revenue_trend": q_revenue_trend,
        "bm25_search": q_bm25_search,
        "scd2_durations": q_scd2_durations,
        "hashed_features": q_hashed_features,
        "price_percentile_rank": q_price_percentile_rank,
        "skew_report": q_skew_report,
        "session_paths": q_session_paths,
        "revenue_contribution": q_revenue_contribution,
        "skipgram_pairs": q_skipgram_pairs,
        "vocab_coverage": q_vocab_coverage,
        "trending_items": q_trending_items,
        "cohort_revenue": q_cohort_revenue,
        "covisitation_mrr": q_covisitation_mrr,
        "decayed_popularity": q_decayed_popularity,
        "asof_nearest": q_asof_nearest,
        "target_encoding": q_target_encoding,
        "winsorize_prices": q_winsorize_prices,
        "next_item_examples": q_next_item_examples,
        "frequent_tokens": q_frequent_tokens,
        "ks_drift": q_ks_drift,
        "containment_pairs": q_containment_pairs,
        "covisitation_incremental": q_covisitation_incremental,
        "stream_sessionize_stateful": q_stream_sessionize_stateful,
        "tpch_q10": q_tpch_q10,
        "tpch_q18": q_tpch_q18,
        "tpch_q4": q_tpch_q4,
        "tpch_q6": q_tpch_q6,
        "tpch_q14": q_tpch_q14,
        "tpch_q17": q_tpch_q17,
        "last_touch_attribution": q_last_touch_attribution,
        "audience_overlap": q_audience_overlap,
        "rec_ndcg": q_rec_ndcg,
        "k_anonymity": q_k_anonymity,
        "privacy_gate": q_privacy_gate,
        "t_closeness": q_t_closeness,
        "retractable_rollup": q_retractable_rollup,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q13": q_tpch_q13,
        "grouping_sets_revenue": q_grouping_sets_revenue,
        "embedding_drift": q_embedding_drift,
        "stream_ks_drift": q_stream_ks_drift,
        "survival_repurchase": q_survival_repurchase,
        "rec_diversity_ils": q_rec_diversity_ils,
        "tpch_q1": q_tpch_q1,
        "scd2_pit_revenue": q_scd2_pit_revenue,
        "source_quality": q_source_quality,
        "tpch_q19": q_tpch_q19,
        "except_all_returns": q_except_all_returns,
        "unpivot_metrics": q_unpivot_metrics,
        "tpch_q15": q_tpch_q15,
        "tpch_q22": q_tpch_q22,
        "forecast_mase": q_forecast_mase,
        "stream_model_refresh": q_stream_model_refresh,
        "mad_outliers": q_mad_outliers,
        "rec_auc_segments": q_rec_auc_segments,
        "score_calibration": q_score_calibration,
        "wilson_ctr": q_wilson_ctr,
        "revenue_gini": q_revenue_gini,
        "user_similarity": q_user_similarity,
        "stream_auc_monitor": q_stream_auc_monitor,
    }
    out = {name: all_q[name] for name in _R9_WINDOW}
    out.update((k, v) for k, v in all_q.items() if k not in out)
    return out


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — built on the shared fixture CTEs
# ---------------------------------------------------------------------------

# tokenizer mirror of functions/text.py::tokens
_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"

# word-shingle mirror of functions/dedup.py::word_shingles (n=3):
# 0-based windows over tokens; 1-based list indexing; concat_ws skips
# out-of-range NULLs in both engines.
def _shingles_cte(n: int) -> str:
    grams = ", ".join(f"t[i+{j+1}]" for j in range(n))
    return f"""
toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 5 = 0
),
sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(0, greatest(len(t) - {n}, 0) + 1),
                          i -> concat_ws(' ', {grams}))
         ) AS shingles
  FROM toks
),
exploded_sh AS (
  SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS shingle FROM sh
)"""


_SHINGLES_CTE = _shingles_cte(3)
_SHINGLES_CTE_2 = _shingles_cte(2)

# 16-bit simhash mirror of functions/dedup.py::simhash16
_SIMHASH_BIT = (
    "list_sum(list_transform(dt, tok -> "
    "len(list_filter(t, x -> x = tok)) * "
    "(((CAST(concat('0x', substr(md5(tok), 1, 4)) AS INTEGER) >> {i}) & 1) * 2 - 1)))"
)
_SIMHASH_SIG = " + ".join(
    f"(CASE WHEN ({_SIMHASH_BIT.format(i=i)}) >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(16)
)


def _simhash64_bit(i: int) -> str:
    # bits 0-31 from md5 hex digits 9-16, bits 32-63 from digits 1-8
    # (mirrors functions/dedup.py::simhash64); sum over occurrences,
    # coalesce(…, 0) so empty docs get the all-ones signature like Spark
    start, shift = (9, i) if i < 32 else (1, i - 32)
    word = f"CAST(concat('0x', substr(md5(tok), {start}, 8)) AS BIGINT)"
    return (
        f"coalesce(list_sum(list_transform(t, "
        f"tok -> ((({word} >> {shift}) & 1) * 2 - 1))), 0)"
    )


_SIMHASH64_SIG = " + ".join(
    f"(CASE WHEN ({_simhash64_bit(i)}) >= 0 "
    f"THEN {(1 << i) if i < 63 else -(1 << 63)} ELSE 0 END)"
    for i in range(64)
)

_COSINE = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

# quality_filter_flags mirror (functions/text.py): CTE `qflags` ending
# with per-doc flag columns + keep. bigint/bigint division is DOUBLE in
# both engines; ratios guard zero denominators identically.
_QUALITY_CTE = """
qt AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM documents
),
qs AS (
  SELECT doc_id, text,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
    CAST(len(list_filter(toks, x -> x IN ('a','the','of','and','to','in','is')))
         AS BIGINT) AS hits,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS BIGINT)
         AS symbols,
    CAST(length(regexp_replace(lower(text), '[^0-9]', '', 'g')) AS BIGINT)
         AS digits
  FROM qt
),
qflags AS (
  SELECT doc_id, text, n_tokens,
    n_tokens < 10 AS flag_too_short,
    NOT coalesce(
      CASE WHEN n_tokens > 0 THEN total_chars / n_tokens END
        BETWEEN 2.0 AND 12.0, FALSE) AS flag_token_len,
    coalesce(CASE WHEN n_tokens > 0 THEN hits / n_tokens END, 0.0) < 0.02
      AS flag_low_stopword,
    (CASE WHEN n_chars > 0 THEN symbols / n_chars ELSE 0.0 END) > 0.10
      AS flag_symbol_heavy,
    (CASE WHEN n_chars > 0 THEN digits / n_chars ELSE 0.0 END) > 0.30
      AS flag_digit_heavy
  FROM qs
)"""

_CENTROID_CTE = """
ev AS (
  SELECT label AS block, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
edim AS (
  SELECT block, vec_id, CAST(u.i - 1 AS BIGINT) AS dim, v[u.i] AS val
  FROM ev, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
centroid_sums AS (
  SELECT block, dim,
         CAST(sum(CAST(val AS DECIMAL(27,12))) AS DOUBLE) AS sum_val,
         CAST(sum(CAST(floor(val * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_e6,
         CAST(count(*) AS BIGINT) AS n
  FROM edim GROUP BY block, dim
)"""

# SQ8 mirror of functions/similarity.py::sq8_codes: integer-valued
# quantizer stats and codes. (iv - lo) * 255.0 is an exact double
# (< 2^53), so floor of the IEEE quotient matches Spark bit-for-bit.
_SQ8_CODES_CTE = """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
edim AS (
  SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
sq8_stats AS (SELECT dim, min(iv) AS lo, max(iv) AS hi FROM edim GROUP BY dim),
codes AS (
  SELECT vec_id,
         list(CASE WHEN hi = lo THEN 0
              ELSE greatest(0, least(255,
                   CAST(floor((iv - lo) * 255.0 / (hi - lo)) AS BIGINT)))
              END ORDER BY dim) AS c
  FROM edim JOIN sq8_stats USING (dim) GROUP BY vec_id
)"""

# exact int64 dot product of two SQ8 code lists (values <= 255, sums
# <= 4.2e6 — exactly representable in the double accumulator)
_SQ8_DOT = (
    "CAST(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])) AS BIGINT)"
)

_EXPLODE_OUTER = """
exploded AS (
  SELECT
    query_item_id,
    CAST(u.i - 1 AS BIGINT) AS pos,
    rec_items[u.i] AS rec_item_id
  FROM recs
  LEFT JOIN LATERAL (
    SELECT unnest(range(1, coalesce(len(rec_items), 0) + 1)) AS i
  ) u ON TRUE
  WHERE error IS NULL
)"""

_FLAGSHIP = f"""
WITH {RECS_CTE.lstrip()}, {MAPPING_CTE.lstrip()}, {META_CTE.lstrip()},
attributed AS (
  SELECT r.query_item_id, m.user_id, r.rec_items
  FROM recs r JOIN mapping m ON r.query_item_id = m.item_id
  WHERE r.error IS NULL
),
flat AS (
  SELECT
    a.query_item_id, a.user_id,
    CAST(u.i - 1 AS BIGINT) AS pos,
    a.rec_items[u.i] AS item_id
  FROM attributed a
  JOIN LATERAL (
    SELECT unnest(range(1, coalesce(len(rec_items), 0) + 1)) AS i
  ) u ON TRUE
),
decorated AS (
  SELECT f.query_item_id, f.user_id, f.pos, f.item_id,
         mt.name, mt.price, mt.category
  FROM flat f LEFT JOIN meta mt ON f.item_id = mt.id
)"""


def oracle_sql() -> dict[str, str]:
    sqls = {
        "error_split_ok": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id, CAST(len(rec_items) AS BIGINT) AS num_recs
FROM recs WHERE error IS NULL
""",
        "error_split_errors": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id, error FROM recs WHERE error IS NOT NULL
""",
        "attribution_join": f"""
WITH {RECS_CTE.lstrip()}, {MAPPING_CTE.lstrip()}
SELECT r.query_item_id, m.user_id
FROM recs r JOIN mapping m ON r.query_item_id = m.item_id
WHERE r.error IS NULL
""",
        "explode_outer": f"""
WITH {RECS_CTE.lstrip()}, {_EXPLODE_OUTER.lstrip()}
SELECT query_item_id, pos, rec_item_id FROM exploded
""",
        "decorate_flat": f"""
WITH {RECS_CTE.lstrip()}, {META_CTE.lstrip()}, {_EXPLODE_OUTER.lstrip()}
SELECT e.query_item_id, e.pos, e.rec_item_id AS item_id,
       m.name, m.price, m.category, m.current_stock
FROM exploded e LEFT JOIN meta m ON e.rec_item_id = m.id
""",
        "renest_ordered": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id,
       CAST(coalesce(len(rec_items), 0) AS BIGINT) AS num_recs,
       coalesce(array_to_string(rec_items, ','), '') AS items_csv
FROM recs WHERE error IS NULL
""",
        "renest_capped": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id,
       CAST(coalesce(len(list_slice(rec_items, 1, 3)), 0) AS BIGINT) AS num_recs,
       coalesce(array_to_string(list_slice(rec_items, 1, 3), ','), '') AS items_csv
FROM recs WHERE error IS NULL
""",
        "flagship_related_flat": f"""
{_FLAGSHIP}
SELECT * FROM decorated
""",
        "user_pers_flat": f"""
WITH {USER_RECS_CTE.lstrip()}, {META_CTE.lstrip()},
flat AS (
  SELECT
    r.query_user_id,
    CAST(u.i - 1 AS BIGINT) AS pos,
    r.rec_items[u.i] AS item_id
  FROM user_recs r
  JOIN LATERAL (
    SELECT unnest(range(1, coalesce(len(rec_items), 0) + 1)) AS i
  ) u ON TRUE
  WHERE r.error IS NULL
)
SELECT f.query_user_id, f.pos, f.item_id, m.name, m.price, m.category
FROM flat f LEFT JOIN meta m ON f.item_id = m.id
""",
        "delta_except": f"""
{_FLAGSHIP}
SELECT * FROM decorated
EXCEPT
SELECT * FROM decorated WHERE CAST(user_id AS BIGINT) % 2 = 0
""",
        "payload_pivot": f"""
WITH {USER_RECS_CTE.lstrip()}, {META_CTE.lstrip()},
flat AS (
  SELECT
    r.query_user_id,
    CAST(u.i - 1 AS BIGINT) AS pos,
    r.rec_items[u.i] AS item_id
  FROM user_recs r
  JOIN LATERAL (
    SELECT unnest(range(1, coalesce(len(rec_items), 0) + 1)) AS i
  ) u ON TRUE
  WHERE r.error IS NULL
),
decorated AS (
  SELECT f.query_user_id, f.pos, f.item_id, m.price
  FROM flat f LEFT JOIN meta m ON f.item_id = m.id
)
SELECT
  query_user_id AS external_id,
  string_agg(item_id, ',' ORDER BY pos) AS item_ids_csv,
  string_agg(CAST(price AS VARCHAR), ',' ORDER BY pos) AS prices_csv,
  CAST(count(*) AS BIGINT) AS n_items,
  'custom' AS other_attrib1
FROM decorated
GROUP BY query_user_id
""",
        "topk_slice": f"""
WITH {RECS_CTE.lstrip()}
SELECT query_item_id,
       coalesce(array_to_string(rec_items[1:3], ','), '') AS top3_ids_csv
FROM recs WHERE error IS NULL
""",
        "stamp_literals": f"""
{_FLAGSHIP}
SELECT DISTINCT query_item_id, user_id,
       'flagship' AS job_name,
       '{RUN_TS.isoformat()}' AS run_datetime,
       'recs_' AS attribute_prefix
FROM attributed
""",
        "text_tokens": """
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_regex_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_measured
FROM documents
""",
        "text_quality": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
    CAST(len(list_filter(toks, x -> x IN ('a','the','of','and','to','in','is'))) AS BIGINT) AS hits
  FROM t
)
SELECT doc_id, n_tokens,
  CASE WHEN n_tokens > 0 THEN total_chars / n_tokens END AS avg_token_len,
  CASE WHEN n_tokens > 0 THEN hits / n_tokens END AS stopword_ratio,
  coalesce(CASE WHEN n_tokens > 0 THEN hits / n_tokens > 0.05 END, FALSE) AS is_english
FROM s
""",
        "lang_profile": f"""
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
  CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
""",
        "doc_fingerprint": """
SELECT doc_id,
  list_aggregate(
    list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                   i -> md5(substr(text, i, 8))),
    'min') AS fingerprint
FROM documents
""",
        "dedup_exact": """
SELECT md5(text) AS digest,
       CAST(min(doc_id) AS BIGINT) AS rep_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY md5(text)
""",
        "ngram_jaccard_pairs": f"""
WITH {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.n_shingles AS n_a, b.n_shingles AS n_b,
         count(*) AS common
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= 2
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(common AS BIGINT) AS common,
       CAST(n_a + n_b - common AS BIGINT) AS union_size,
       common / (n_a + n_b - common) AS jaccard
FROM pairs
""",
        "neardup_components": f"""
WITH RECURSIVE {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(lbl) AS BIGINT) AS component
FROM reach GROUP BY node
""",
        "neardup_triangles": f"""
WITH ev AS (
  SELECT label AS block, vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
e AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM ev a JOIN ev b ON a.block = b.block AND a.vec_id < b.vec_id
  WHERE {_COSINE.format(a='a.v', b='b.v')} >= 0.3
)
SELECT CAST(e1.a AS BIGINT) AS a, CAST(e1.b AS BIGINT) AS b,
       CAST(e2.b AS BIGINT) AS c
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
""",
        "minhash_lsh": f"""
WITH {_SHINGLES_CTE_2.lstrip()},
sig AS (
  SELECT doc_id,
    list_aggregate(list_transform(shingles, s -> md5('0|' || s)), 'min') AS mh0,
    list_aggregate(list_transform(shingles, s -> md5('1|' || s)), 'min') AS mh1,
    list_aggregate(list_transform(shingles, s -> md5('2|' || s)), 'min') AS mh2,
    list_aggregate(list_transform(shingles, s -> md5('3|' || s)), 'min') AS mh3,
    list_aggregate(list_transform(shingles, s -> md5('4|' || s)), 'min') AS mh4,
    list_aggregate(list_transform(shingles, s -> md5('5|' || s)), 'min') AS mh5
  FROM sh
),
bands AS (
  SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS bucket FROM sig
  UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
  UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
)
SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
        "simhash": f"""
WITH t0 AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 10 = 0
),
t1 AS (SELECT doc_id, t, list_distinct(t) AS dt FROM t0)
SELECT doc_id, CAST({_SIMHASH_SIG} AS BIGINT) AS simhash FROM t1
""",
        "simhash64": f"""
WITH t0 AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 10 = 0
)
SELECT doc_id, CAST({_SIMHASH64_SIG} AS BIGINT) AS simhash FROM t0
""",
        "state_digest_update": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders WHERE o_orderkey % 200 = 0
""",
        "chunk_documents": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
p AS (
  SELECT doc_id, toks,
         greatest(CAST(floor((len(toks) - 9) / 24.0) AS BIGINT), 0) * 24
           AS last_start
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS id,
       CAST(u.s // 24 AS BIGINT) AS chunk_no,
       CAST(len(list_slice(toks, u.s + 1, u.s + 32)) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, u.s + 1, u.s + 32), ' ') AS chunk_text
FROM p, LATERAL (SELECT unnest(range(0, last_start + 1, 24)) AS s) u
WHERE len(list_slice(toks, u.s + 1, u.s + 32)) > 0
""",
        "repetition_signals": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
uni AS (
  SELECT doc_id, u.tok AS gram, count(*) AS c
  FROM t, LATERAL (SELECT unnest(toks) AS tok) u
  GROUP BY 1, 2
),
unia AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_uni,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM uni GROUP BY 1
),
tb AS (
  SELECT doc_id,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
           AS bgs
  FROM t
),
big AS (
  SELECT doc_id, u.g AS gram, count(*) AS c
  FROM tb, LATERAL (SELECT unnest(bgs) AS g) u
  GROUP BY 1, 2
),
biga AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_big,
         CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM big GROUP BY 1
)
SELECT CAST(a.doc_id AS BIGINT) AS id, a.n_tokens,
       a.max_uni / a.n_tokens AS top_unigram_frac,
       b.max_big / b.n_bigrams AS top_bigram_frac,
       (a.max_uni / a.n_tokens > 0.20) OR
         coalesce(b.max_big / b.n_bigrams > 0.18, FALSE) AS flag_repetitive
FROM unia a LEFT JOIN biga b ON a.doc_id = b.doc_id
""",
        "quality_filter": f"""
WITH {_QUALITY_CTE.lstrip()}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       flag_too_short, flag_token_len, flag_low_stopword,
       flag_symbol_heavy, flag_digit_heavy,
       NOT (flag_too_short OR flag_token_len OR flag_low_stopword OR
            flag_symbol_heavy OR flag_digit_heavy) AS keep
FROM qflags
""",
        "llm_corpus_survivors": f"""
WITH {_QUALITY_CTE.lstrip()},
kept AS (
  SELECT doc_id, text, n_tokens FROM qflags
  WHERE NOT (flag_too_short OR flag_token_len OR flag_low_stopword OR
             flag_symbol_heavy OR flag_digit_heavy)
),
reps AS (
  SELECT md5(text) AS digest, CAST(min(doc_id) AS BIGINT) AS doc_id,
         CAST(count(*) AS BIGINT) AS n_copies
  FROM kept GROUP BY 1
)
SELECT r.doc_id, r.digest, r.n_copies, CAST(k.n_tokens AS BIGINT) AS n_tokens
FROM reps r JOIN kept k ON k.doc_id = r.doc_id
""",
        "simhash_neardup": f"""
WITH t0 AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
sigs AS (
  SELECT doc_id, CAST({_SIMHASH64_SIG} AS BIGINT) AS sig FROM t0
),
bands AS (
  SELECT doc_id, sig, b.band, (sig >> (b.band * 16)) & 65535 AS band_val
  FROM sigs, LATERAL (SELECT unnest(range(0, 4)) AS band) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.sig AS sig_a, b.sig AS sig_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
              AND a.doc_id < b.doc_id
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 16
""",
        "hybrid_filtered_ann": f"""
WITH {_QUALITY_CTE.lstrip()},
keep_ids AS (
  SELECT doc_id FROM qflags
  WHERE NOT (flag_too_short OR flag_token_len OR flag_low_stopword OR
             flag_symbol_heavy OR flag_digit_heavy)
),
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings JOIN keep_ids ON vec_id = doc_id
),
q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         {_COSINE.format(a='q.v', b='e.v')} AS score
  FROM q JOIN e ON e.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 3
""",
        "kmeans_refine": f"""
WITH {_CENTROID_CTE.lstrip()},
centroids AS (
  SELECT block, list(sum_val / n ORDER BY dim) AS centroid
  FROM centroid_sums GROUP BY block
),
assigned AS (
  SELECT id, v, block AS a_block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (
             PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC, c.block
           ) AS rn
    FROM ev, centroids c
  ) WHERE rn = 1
),
adim AS (
  SELECT a_block AS block, CAST(u.i - 1 AS BIGINT) AS dim, v[u.i] AS val
  FROM assigned, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
)
SELECT CAST(block AS BIGINT) AS block, dim,
       CAST(sum(CAST(floor(val * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_e6,
       CAST(count(*) AS BIGINT) AS n
FROM adim GROUP BY 1, 2
""",
        "ivf_probe_topk": f"""
WITH {_CENTROID_CTE.lstrip()},
centroids AS (
  SELECT block, list(sum_val / n ORDER BY dim) AS centroid
  FROM centroid_sums GROUP BY block
),
assigned AS (
  SELECT id, v, block AS assigned_block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (
             PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC, c.block
           ) AS rn
    FROM ev, centroids c
  ) WHERE rn = 1
),
q AS (SELECT * FROM assigned WHERE id % 50 = 0),
scored AS (
  SELECT q.id AS q_id, a.id AS n_id,
         {_COSINE.format(a='q.v', b='a.v')} AS score
  FROM q JOIN assigned a
    ON a.assigned_block = q.assigned_block AND a.id <> q.id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 5
""",
        "ann_topk": f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         {_COSINE.format(a='q.v', b='e.v')} AS score
  FROM q JOIN e ON e.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 5
""",
        "pq_adc": """
WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ed AS (
  SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM ev, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
sv AS (
  SELECT vec_id, CAST(dim // 8 AS INTEGER) AS sub,
         CAST(dim % 8 AS INTEGER) AS d, iv
  FROM ed
),
cb AS (
  SELECT sub, CAST(vec_id % 16 AS INTEGER) AS code, d,
         CAST(floor(CAST(sum(iv) AS DOUBLE) / count(*)) AS BIGINT) AS c
  FROM sv GROUP BY 1, 2, 3
),
enc_dist AS (
  SELECT sv.vec_id, sv.sub, cb.code,
         sum((sv.iv - cb.c) * (sv.iv - cb.c)) AS dist
  FROM sv JOIN cb ON cb.sub = sv.sub AND cb.d = sv.d
  GROUP BY 1, 2, 3
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
    FROM enc_dist
  ) WHERE rn = 1
),
qsv AS (SELECT * FROM sv WHERE vec_id % 50 = 0),
lut AS (
  SELECT qsv.vec_id AS q_id, qsv.sub, cb.code,
         sum((qsv.iv - cb.c) * (qsv.iv - cb.c)) AS ldist
  FROM qsv JOIN cb ON cb.sub = qsv.sub AND cb.d = qsv.d
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT lut.q_id, enc.vec_id AS n_id, sum(lut.ldist) AS adist
  FROM enc JOIN lut ON lut.sub = enc.sub AND lut.code = enc.code
  WHERE enc.vec_id <> lut.q_id
  GROUP BY 1, 2
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, CAST(adist AS BIGINT) AS adist
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
        "ann_quantized": f"""
WITH {_SQ8_CODES_CTE.lstrip()},
q AS (SELECT * FROM codes WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS q_id, c2.vec_id AS n_id,
         {_SQ8_DOT.format(a='q.c', b='c2.c')} AS qdot
  FROM q JOIN codes c2 ON c2.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY qdot DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, qdot
FROM ranked WHERE rank <= 5
""",
        "rrf_fusion": f"""
WITH {_SQ8_CODES_CTE.lstrip()},
qv AS (SELECT * FROM e WHERE vec_id % 50 = 0),
exact_scored AS (
  SELECT qv.vec_id AS q_id, e.vec_id AS n_id,
         {_COSINE.format(a='qv.v', b='e.v')} AS score
  FROM qv JOIN e ON e.vec_id <> qv.vec_id
),
exact_top AS (
  SELECT q_id, n_id, rank_a FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank_a
    FROM exact_scored
  ) WHERE rank_a <= 10
),
qc AS (SELECT * FROM codes WHERE vec_id % 50 = 0),
quant_scored AS (
  SELECT qc.vec_id AS q_id, c2.vec_id AS n_id,
         {_SQ8_DOT.format(a='qc.c', b='c2.c')} AS qdot
  FROM qc JOIN codes c2 ON c2.vec_id <> qc.vec_id
),
quant_top AS (
  SELECT q_id, n_id, rank_b FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY qdot DESC, n_id) AS rank_b
    FROM quant_scored
  ) WHERE rank_b <= 10
),
fused AS (
  SELECT COALESCE(a.q_id, b.q_id) AS q_id, COALESCE(a.n_id, b.n_id) AS n_id,
         COALESCE(CAST(1 AS DOUBLE) / (60 + a.rank_a), CAST(0 AS DOUBLE))
         + COALESCE(CAST(1 AS DOUBLE) / (60 + b.rank_b), CAST(0 AS DOUBLE))
           AS rrf_score
  FROM exact_top a FULL OUTER JOIN quant_top b
    ON a.q_id = b.q_id AND a.n_id = b.n_id
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rrf_rank AS BIGINT) AS rrf_rank, rrf_score
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rrf_score DESC, n_id)
           AS rrf_rank
  FROM fused
) WHERE rrf_rank <= 5
""",
        "embedding_neardup": f"""
WITH e AS (
  SELECT label AS block, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
scored AS (
  SELECT a.block, a.vec_id AS id_a, b.vec_id AS id_b,
         {_COSINE.format(a='a.v', b='b.v')} AS score
  FROM e a JOIN e b ON a.block = b.block AND a.vec_id < b.vec_id
)
SELECT CAST(block AS BIGINT) AS block, CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b, score
FROM scored WHERE score >= 0.3
""",
        "ivf_centroids": f"""
WITH {_CENTROID_CTE.lstrip()}
SELECT CAST(block AS BIGINT) AS block, dim, sum_e6, n FROM centroid_sums
""",
        "ivf_assign": f"""
WITH {_CENTROID_CTE.lstrip()},
centroids AS (
  SELECT block, list(sum_val / n ORDER BY dim) AS centroid
  FROM centroid_sums GROUP BY block
),
scored AS (
  SELECT ev.vec_id AS id, c.block,
         {_COSINE.format(a='ev.v', b='c.centroid')} AS score
  FROM ev, centroids c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY score DESC, block) AS rn
  FROM scored
)
SELECT CAST(id AS BIGINT) AS id, CAST(block AS BIGINT) AS assigned_block, score
FROM ranked WHERE rn = 1
""",
        "events_hourly": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""",
        "events_sessionize": """
WITH w AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800 * 1000 * 1000
              THEN 1 ELSE 0 END AS new_s
  FROM w
)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM flagged GROUP BY user_id
""",
        "events_props": """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
        "renest_legacy_window": f"""
{_FLAGSHIP}
SELECT * FROM decorated
""",
        "delta_anti_hash": f"""
{_FLAGSHIP}
SELECT * FROM decorated
EXCEPT
SELECT * FROM decorated WHERE CAST(user_id AS BIGINT) % 2 = 0
""",
        "asof_join": """
WITH od AS (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_orderkey) AS o_orderkey,
         max_by(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       o.o_orderkey, o.o_totalprice,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
FROM events e ASOF LEFT JOIN od o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
""",
        "band_join_features": """
SELECT o.o_orderkey,
       count(l.l_shipdate) AS n_shipped_60d,
       CAST(coalesce(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
         AS value_shipped_60d
FROM orders o
LEFT JOIN lineitem l
  ON o.o_orderkey = l.l_orderkey
 AND epoch(l.l_shipdate) >= epoch(o.o_orderdate)
 AND epoch(l.l_shipdate) <= epoch(o.o_orderdate) + 60*86400
GROUP BY o.o_orderkey
""",
        "band_join_bucketed": """
SELECT a.event_id,
       count(*) AS n_events_band,
       min(b.event_id) AS first_event_id
FROM events a
JOIN events b
  ON epoch(date_trunc('second', b.ts)) >= epoch(date_trunc('second', a.ts)) - 600
 AND epoch(date_trunc('second', b.ts)) <= epoch(date_trunc('second', a.ts)) + 600
GROUP BY a.event_id
""",
        "window_analytics": """
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER w AS INT) AS order_seq,
       CAST(lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS prev_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS run_spend,
       CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                 / sum(CAST(o_totalprice AS DECIMAL(18,2)))
                     OVER (PARTITION BY o_custkey)
                 AS DECIMAL(18,6)) AS DOUBLE) AS spend_share
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
        "sliding_windows": """
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM (
  SELECT unnest([
           to_timestamp(floor(epoch(ts) / 1800) * 1800),
           to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800)
         ]) AS ws,
         event_type, value
  FROM events
)
GROUP BY 1, 2
""",
        "cube_revenue": """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS TINYINT) AS g_priority,
       CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
        "semi_anti_join": """
SELECT c_custkey, 'has_open' AS bucket FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
UNION ALL
SELECT c_custkey, 'no_open' AS bucket FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
        "pivot_events": """
SELECT user_id,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'add_to_cart') AS n_add_to_cart,
       count(*) FILTER (event_type = 'search') AS n_search
FROM events GROUP BY user_id
""",
        "contiguous_ids": """
SELECT o_orderkey,
       row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1 AS row_id
FROM orders
""",
        "running_revenue": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (ORDER BY o_orderkey) AS DOUBLE) AS running_price
FROM orders
""",
        "cumulative_uniques": """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
),
d AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
""",
        "ann_recall": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         round(list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(e.v, e.v))), 6) AS score
  FROM q JOIN e ON e.vec_id <> q.vec_id
),
exact AS (
  SELECT q_id, n_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY score DESC, n_id) AS rank
    FROM scored
  ) WHERE rank <= 5
),
edim AS (
  SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
sq8_stats AS (SELECT dim, min(iv) AS lo, max(iv) AS hi FROM edim GROUP BY dim),
codes AS (
  SELECT vec_id,
         list(CASE WHEN hi = lo THEN 0
              ELSE greatest(0, least(255,
                   CAST(floor((iv - lo) * 255.0 / (hi - lo)) AS BIGINT)))
              END ORDER BY dim) AS c
  FROM edim JOIN sq8_stats USING (dim) GROUP BY vec_id
),
qc AS (SELECT * FROM codes WHERE vec_id % 50 = 0),
qscored AS (
  SELECT qc.vec_id AS q_id, c2.vec_id AS n_id,
         CAST(list_dot_product(CAST(qc.c AS DOUBLE[]), CAST(c2.c AS DOUBLE[]))
              AS BIGINT) AS qdot
  FROM qc JOIN codes c2 ON c2.vec_id <> qc.vec_id
),
quant AS (
  SELECT q_id, n_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY qdot DESC, n_id) AS rank
    FROM qscored
  ) WHERE rank <= 5
),
hits AS (
  SELECT e2.q_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM exact e2 JOIN quant ON quant.q_id = e2.q_id AND quant.n_id = e2.n_id
  GROUP BY e2.q_id
)
SELECT CAST(q.vec_id AS BIGINT) AS q_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) / 5.0 AS recall_at_5
FROM q LEFT JOIN hits h ON h.q_id = q.vec_id
""",
        "dedup_canonical": f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 5 = 0
),
sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(0, greatest(len(t) - 3, 0) + 1),
                          i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))
         ) AS shingles
  FROM toks
),
exploded_sh AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
),
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, d.n_chars,
         COALESCE(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
  WHERE d.doc_id % 5 = 0
)
SELECT CAST(component AS BIGINT) AS component,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(arg_max(doc_id, n_chars * 10000000000 - doc_id) AS BIGINT)
         AS canonical_id,
       CAST(max(n_chars) AS BIGINT) AS canonical_chars
FROM labeled GROUP BY component
""",
        "temporal_split": """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
cum AS (
  SELECT day, sum(n) OVER (ORDER BY day) AS cum FROM daily
),
tot AS (SELECT sum(n) AS total FROM daily),
k AS (SELECT CAST(floor((8 * total + 9) / 10) AS BIGINT) AS k, total FROM tot)
SELECT strftime(min(CASE WHEN cum >= k.k THEN day END), '%Y-%m-%d') AS split_day,
       CAST(min(CASE WHEN cum >= k.k THEN cum END) AS BIGINT) AS n_train,
       CAST(max(k.total) - min(CASE WHEN cum >= k.k THEN cum END) AS BIGINT)
         AS n_test
FROM cum, k
""",
        "rolling_distinct_users": """
WITH du AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM du),
fanned AS (
  SELECT DISTINCT du.user_id, du.day + v.j AS wday
  FROM du, LATERAL (SELECT unnest(range(0, 7)) AS j) v
)
SELECT CAST(f.wday AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_users_7d
FROM fanned f, bounds b
WHERE f.wday >= b.d0 AND f.wday <= b.d1
GROUP BY f.wday
""",
        "markov_transitions": """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
           FROM trans GROUP BY 1)
SELECT t.from_type, t.to_type, t.n,
       CAST(t.n AS DOUBLE) / CAST(tt.n_from AS DOUBLE) AS p
FROM trans t JOIN totals tt ON tt.from_type = t.from_type
""",
        "rfm_features": """
WITH per_user AS (
  SELECT user_id,
         CAST(max(floor(epoch(ts) / 86400)) AS BIGINT) AS last_day,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(CAST(value AS DECIMAL(18,6))) AS monetary_dec
  FROM events GROUP BY user_id
),
gmax AS (SELECT max(last_day) AS gday FROM per_user)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(g.gday - last_day AS BIGINT) AS recency_days,
       frequency,
       CAST(monetary_dec AS DOUBLE) AS monetary
FROM per_user, gmax g
""",
        "rolling_revenue_28d": """
WITH daily AS (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, day,
       CAST(spend AS DOUBLE) AS spend,
       CAST(sum(spend) OVER (PARTITION BY o_custkey ORDER BY day
                             RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS spend_28d
FROM daily
""",
        "gap_fill_daily": """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
cal AS (
  SELECT g.o_orderpriority, CAST(u.d AS DATE) AS day
  FROM (SELECT DISTINCT o_orderpriority FROM orders) g,
       bounds b,
       LATERAL (SELECT unnest(generate_series(b.d0, b.d1,
                                              INTERVAL 1 DAY)) AS d) u
)
SELECT c.o_orderpriority,
       strftime(c.day, '%Y-%m-%d') AS day,
       CAST(COALESCE(daily.n_orders, 0) AS BIGINT) AS n_orders
FROM cal c LEFT JOIN daily
  ON daily.o_orderpriority = c.o_orderpriority AND daily.day = c.day
""",
        "cohort_retention": """
WITH up AS (
  SELECT DISTINCT user_id AS u,
         CAST(floor(floor(epoch(ts) / 86400) / 7) AS BIGINT) AS p
  FROM events
),
cohorts AS (SELECT u, min(p) AS cohort FROM up GROUP BY u)
SELECT c.cohort, CAST(up.p - c.cohort AS BIGINT) AS offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM up JOIN cohorts c ON up.u = c.u
GROUP BY 1, 2
""",
        "orders_islands": """
WITH o AS (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         o_orderstatus
  FROM orders
),
flagged AS (
  SELECT *, CASE WHEN lag(o_orderstatus) OVER w IS NULL
                   OR lag(o_orderstatus) OVER w <> o_orderstatus
                 THEN 1 ELSE 0 END AS chg
  FROM o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)
),
islands AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
                                ORDER BY day, o_orderkey) AS BIGINT)
              AS island_id
  FROM flagged
)
SELECT o_custkey, island_id, min(o_orderstatus) AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(day) AS BIGINT) AS island_start,
       CAST(max(day) AS BIGINT) AS island_end
FROM islands GROUP BY 1, 2
""",
        "basket_lift": """
WITH bi AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
                  CAST(l_partkey AS BIGINT) AS i
  FROM lineitem
),
pairs AS (
  SELECT a.i AS item_a, c.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
  GROUP BY 1, 2 HAVING count(*) >= 3
),
freq AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY i),
total AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM bi)
SELECT p.item_a, p.item_b, p.n_ab, fa.n AS n_a, fb.n AS n_b,
       CAST(p.n_ab * t.n_baskets AS DOUBLE)
         / CAST(fa.n * fb.n AS DOUBLE) AS lift
FROM pairs p
JOIN freq fa ON fa.i = p.item_a
JOIN freq fb ON fb.i = p.item_b
CROSS JOIN total t
""",
        "priority_sample": """
WITH keyed AS (
  SELECT o_orderpriority,
         CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(concat('0x', substr(md5(CAST(CAST(o_orderkey AS BIGINT)
                                           AS VARCHAR)), 1, 8)) AS BIGINT)
           * 1000000 AS num
  FROM orders
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY num // cents, o_orderkey) AS rn
  FROM keyed
)
SELECT o_orderpriority, o_orderkey,
       CAST(CAST(cents AS DECIMAL(18,2)) / 100 AS DOUBLE) AS price
FROM ranked WHERE rn <= 5
""",
        "column_profile": """
WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
         o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders
)
SELECT 'o_orderkey' AS "column",
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       min(CAST(o_orderkey AS VARCHAR)) AS min_value,
       max(CAST(o_orderkey AS VARCHAR)) AS max_value
FROM o
UNION ALL
SELECT 'o_orderstatus',
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       min(o_orderstatus), max(o_orderstatus)
FROM o
UNION ALL
SELECT 'o_orderpriority',
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       min(o_orderpriority), max(o_orderpriority)
FROM o
UNION ALL
SELECT 'o_totalprice',
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       min(CAST(o_totalprice AS VARCHAR)), max(CAST(o_totalprice AS VARCHAR))
FROM o
""",
        "stratified_sample": f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       event_type,
       CAST(user_id AS BIGINT) AS user_id
FROM events
WHERE CAST(concat('0x', substr(md5(event_id || '|' || event_type), 1, 8))
           AS BIGINT) < {int(0.2 * 2**32)}
""",
        "event_funnel": """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(t_view, '%Y-%m-%d %H:%M:%S') AS first_view,
       strftime(t_purchase, '%Y-%m-%d %H:%M:%S') AS first_purchase
FROM per_user
WHERE t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
  AND t_view < t_click AND t_click < t_purchase
""",
        "tfidf_top_terms": f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE length(term) >= 3 GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         tf.tf * ln(n_docs / dfreq.df) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC
  ) AS rank FROM scored
) WHERE rank <= 5
""",
        "hash_split": """
SELECT count(*) AS n_total,
       count(DISTINCT doc_id) AS n_distinct_docs,
       CAST(3 AS BIGINT) AS n_splits
FROM documents
""",
        "salted_attribution": f"""
WITH {RECS_CTE.lstrip()}, {MAPPING_CTE.lstrip()}
SELECT r.query_item_id, m.user_id
FROM recs r JOIN mapping m ON r.query_item_id = m.item_id
WHERE r.error IS NULL
""",
        "intersect_items": f"""
WITH {RECS_CTE.lstrip()}, {META_CTE.lstrip()}
SELECT item_id FROM (
  SELECT unnest(rec_items) AS item_id FROM recs WHERE error IS NULL
)
INTERSECT
SELECT id AS item_id FROM meta
""",
        "stream_windowed_counts": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
        "stream_interval_join": """
WITH c AS (
  SELECT user_id, event_id AS click_id, ts AS l_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS r_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(c.user_id AS BIGINT) AS user_id,
       CAST(click_id AS BIGINT) AS click_id,
       CAST(purchase_id AS BIGINT) AS purchase_id,
       CAST((epoch_us(r_ts) - epoch_us(l_ts)) // 1000000 AS BIGINT) AS delay_s
FROM c JOIN p
  ON c.user_id = p.user_id
 AND p.r_ts >= c.l_ts
 AND p.r_ts <= c.l_ts + INTERVAL 10 MINUTE
""",
        "percentiles": """
SELECT o_orderpriority,
       quantile_cont(cents, 0.5) AS median_cents,
       quantile_cont(cents, 0.9) AS p90_cents,
       min(cents) AS min_cents,
       max(cents) AS max_cents
FROM (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
GROUP BY o_orderpriority
""",
        "rollup_revenue": """
SELECT o_orderpriority,
       order_year,
       CAST(grouping(o_orderpriority) AS TINYINT) AS g_priority,
       CAST(grouping(order_year) AS TINYINT) AS g_year,
       CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM (
  SELECT o_orderpriority,
         CAST(year(o_orderdate) AS INT) AS order_year,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
)
GROUP BY ROLLUP (o_orderpriority, order_year)
""",
        "approx_distinct": """
SELECT event_type,
       count(DISTINCT user_id) AS n_users_exact,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
""",
        "topk_per_group": """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(rank_in_group AS INT) AS rank_in_group
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rank_in_group
  FROM orders
)
WHERE rank_in_group <= 3
""",
        "lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "decontaminate": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(0, greatest(len(t) - 4, 0) + 1),
                          i -> concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4]))
         ) AS gs
  FROM toks
),
ex AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g FROM sh),
te AS (SELECT DISTINCT g FROM ex WHERE doc_id % 10 = 7)
SELECT CAST(e.doc_id AS BIGINT) AS train_id,
       CAST(e.n_grams AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_hit_grams,
       count(*) / e.n_grams AS hit_frac
FROM ex e JOIN te USING (g)
WHERE e.doc_id % 10 <> 7
GROUP BY e.doc_id, e.n_grams
""",
        "pack_sequences": f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS e
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
       CAST(e - n_tokens AS BIGINT) AS start_offset,
       CAST((e - n_tokens) // 512 AS BIGINT) AS bin_id,
       n_tokens > 0 AND (e - n_tokens) // 512 <> (e - 1) // 512
         AS spans_boundary
FROM c
""",
        "pii_scrub": """
WITH w AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 (555) 010-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t2
  FROM documents
),
s AS (
  SELECT doc_id,
         len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
         regexp_replace(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS ne
  FROM w
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(ne, '\\+[0-9]{1,2} \\(([0-9]{3})\\) [0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(ne, '\\+[0-9]{1,2} \\(([0-9]{3})\\) [0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrub_digest
FROM s
""",
        "rp_lsh_pairs": f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
edim AS (
  SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
dots AS (
  SELECT vec_id,
         sum(iv * (((dim + 1) * 12345) % 2001 - 1000)) AS d0,
         sum(iv * (((dim + 1) * 21521) % 2001 - 1000)) AS d1,
         sum(iv * (((dim + 1) * 30697) % 2001 - 1000)) AS d2,
         sum(iv * (((dim + 1) * 39873) % 2001 - 1000)) AS d3,
         sum(iv * (((dim + 1) * 49049) % 2001 - 1000)) AS d4,
         sum(iv * (((dim + 1) * 58225) % 2001 - 1000)) AS d5
  FROM edim GROUP BY vec_id
),
bk AS (SELECT vec_id, (CASE WHEN d0 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d1 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d2 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d3 >= 0 THEN 8 ELSE 0 END) + (CASE WHEN d4 >= 0 THEN 16 ELSE 0 END) + (CASE WHEN d5 >= 0 THEN 32 ELSE 0 END) AS bucket FROM dots),
withv AS (SELECT e.vec_id, bk.bucket, e.v FROM e JOIN bk USING (vec_id)),
scored AS (
  SELECT CAST(a.bucket AS BIGINT) AS bucket,
         CAST(a.vec_id AS BIGINT) AS id_a,
         CAST(b.vec_id AS BIGINT) AS id_b,
         {_COSINE.format(a='a.v', b='b.v')} AS score
  FROM withv a JOIN withv b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT * FROM scored WHERE score >= 0.3
""",
        "lang_mixture": """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
r AS (SELECT lang, sqrt((SELECT min(n) FROM c) / n) AS rate FROM c),
k AS (
  SELECT d.lang, r.rate FROM documents d JOIN r USING (lang)
  WHERE CAST(concat('0x',
          substr(md5(d.doc_id || '|' || 'mix-v1'), 1, 8)) AS BIGINT)
        < floor(rate * 4294967296.0)
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       round(min(rate), 6) AS keep_rate
FROM k GROUP BY lang
""",
        "stream_dedup": """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       event_type
FROM events
""",
        "ntile_quartiles": """
WITH c AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
t AS (
  SELECT o_orderpriority, cents,
         ntile(4) OVER (
           PARTITION BY o_orderpriority ORDER BY cents, o_orderkey
         ) AS q
  FROM c
)
SELECT o_orderpriority, CAST(q AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(cents) AS BIGINT) AS lo_cents,
       CAST(max(cents) AS BIGINT) AS hi_cents
FROM t GROUP BY 1, 2
""",
        "sample_k_per_group": """
WITH r AS (
  SELECT event_type, event_id,
         md5(event_id || '|' || 'sample-v1') AS k,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(event_id || '|' || 'sample-v1'), event_id
         ) AS rank
  FROM events
)
SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
""",
        "approx_median_check": """
SELECT o_orderpriority,
       quantile_cont(cents, 0.5) AS median_cents,
       TRUE AS approx_within_2pct
FROM (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
GROUP BY o_orderpriority
""",
        "corpus_prep_pipeline": f"""
WITH {_QUALITY_CTE.lstrip()},
kept AS (
  SELECT q.doc_id, d.lang, q.text, q.n_tokens
  FROM qflags q JOIN documents d USING (doc_id)
  WHERE NOT (flag_too_short OR flag_token_len OR flag_low_stopword OR
             flag_symbol_heavy OR flag_digit_heavy)
),
reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
train AS (
  SELECT k.* FROM kept k JOIN reps r USING (doc_id)
  WHERE k.doc_id % 10 <> 7
),
ttoks AS (SELECT doc_id, {_TOKS} AS t FROM train),
tg AS (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(len(t) - 4, 0) + 1),
                i -> concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4]))) AS g
  FROM ttoks
),
btoks AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 10 = 7),
bg AS (
  SELECT DISTINCT
         unnest(list_transform(range(0, greatest(len(t) - 4, 0) + 1),
                i -> concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4]))) AS g
  FROM btoks
),
contaminated AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (g)),
clean AS (
  SELECT * FROM train
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
cnt AS (SELECT lang, count(*) AS n FROM clean GROUP BY lang),
rt AS (SELECT lang, sqrt((SELECT min(n) FROM cnt) / n) AS rate FROM cnt),
bal AS (
  SELECT c.* FROM clean c JOIN rt USING (lang)
  WHERE CAST(concat('0x',
          substr(md5(c.doc_id || '|' || 'mix-v1'), 1, 8)) AS BIGINT)
        < floor(rate * 4294967296.0)
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS e
  FROM bal
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(e - n_tokens AS BIGINT) AS start_offset,
       CAST((e - n_tokens) // 512 AS BIGINT) AS bin_id
FROM packed
""",
        "session_window_native": """
WITH w AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800 * 1000 * 1000
              THEN 1 ELSE 0 END AS new_s
  FROM w
),
sess AS (
  SELECT user_id, ts_us,
         sum(new_s) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(min(ts_us) AS BIGINT) AS start_us,
       CAST(max(ts_us) + 1800 * 1000 * 1000 AS BIGINT) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
""",
        "variant_props": """
SELECT CAST(event_id AS BIGINT) AS event_id,
       event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0 AS k_even
FROM events
""",
        "line_dedup": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
segs AS (
  SELECT doc_id, CAST(ceil(len(t) / 3.0) AS BIGINT) AS n_segs, u.i,
         concat_ws(' ', t[i*3+1], t[i*3+2], t[i*3+3]) AS seg
  FROM toks, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(t) / 3.0) AS BIGINT))) AS i
  ) u
),
freq AS (SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) <= 2),
kept AS (SELECT s.* FROM segs s JOIN freq f USING (seg))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(min(n_segs) AS BIGINT) AS n_segs,
       CAST(count(*) AS BIGINT) AS n_kept,
       md5(string_agg(seg, ' ' ORDER BY i)) AS clean_digest
FROM kept GROUP BY doc_id
""",
        "neardup_pagerank": f"""
WITH {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (
  SELECT src AS node, deg, 1000000000000 // n AS rank FROM deg, nn
),
c1 AS (
  SELECT s.dst, sum(r.rank // r.deg) AS in_sum
  FROM sym s JOIN r0 r ON s.src = r.node GROUP BY s.dst
),
r1 AS (
  SELECT d.src AS node, d.deg,
         ((15 * 1000000000000) // 100) // nn.n
           + (85 * coalesce(c1.in_sum, 0)) // 100 AS rank
  FROM deg d CROSS JOIN nn LEFT JOIN c1 ON c1.dst = d.src
),
c2 AS (
  SELECT s.dst, sum(r.rank // r.deg) AS in_sum
  FROM sym s JOIN r1 r ON s.src = r.node GROUP BY s.dst
),
r2 AS (
  SELECT d.src AS node, d.deg,
         ((15 * 1000000000000) // 100) // nn.n
           + (85 * coalesce(c2.in_sum, 0)) // 100 AS rank
  FROM deg d CROSS JOIN nn LEFT JOIN c2 ON c2.dst = d.src
)
SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank FROM r2
""",
        "bigram_stats": f"""
WITH toks AS (
  SELECT {_TOKS} AS t FROM documents
),
big AS (
  SELECT t[i+1] AS w1, t[i+2] AS w2
  FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 1)) AS i) u
  WHERE len(t) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
       c12 / c1 AS p
FROM c12 JOIN c1 USING (w1)
WHERE c12 >= 5
""",
        "lm_coverage": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
big AS (
  SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
  FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 1)) AS i) u
  WHERE len(t) >= 2
),
lm AS (
  SELECT w1, w2, count(*) AS c12 FROM big WHERE doc_id % 10 <> 7 GROUP BY 1, 2
),
held AS (SELECT doc_id, w1, w2 FROM big WHERE doc_id % 10 = 7)
SELECT CAST(h.doc_id AS BIGINT) AS id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN lm.c12 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(sum(COALESCE(lm.c12, 0)) AS BIGINT) AS hit_mass,
       CAST(sum(CASE WHEN lm.c12 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         / CAST(count(*) AS BIGINT) AS coverage
FROM held h LEFT JOIN lm ON h.w1 = lm.w1 AND h.w2 = lm.w2
GROUP BY h.doc_id
""",
        "bpe_pair_stats": f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS tok FROM documents
),
pairs AS (
  SELECT substr(tok, CAST(u.i AS INTEGER), 2) AS pair
  FROM toks, LATERAL (SELECT unnest(range(1, length(tok))) AS i) u
)
SELECT pair, CAST(count(*) AS BIGINT) AS c
FROM pairs GROUP BY pair ORDER BY c DESC, pair LIMIT 20
""",
        "expectations_audit": """
WITH r AS (
  SELECT COALESCE(o_totalprice > 0, FALSE) AS r1,
         COALESCE(o_totalprice <= 300000, FALSE) AS r2,
         COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE) AS r3,
         COALESCE(CAST(o_orderdate AS DATE) < DATE '2001-01-01', FALSE) AS r4,
         COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE) AS r5
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN r1 THEN 0 ELSE 1 END) AS BIGINT) AS price_positive,
       CAST(sum(CASE WHEN r2 THEN 0 ELSE 1 END) AS BIGINT) AS price_under_cap,
       CAST(sum(CASE WHEN r3 THEN 0 ELSE 1 END) AS BIGINT) AS status_known,
       CAST(sum(CASE WHEN r4 THEN 0 ELSE 1 END) AS BIGINT) AS date_in_range,
       CAST(sum(CASE WHEN r5 THEN 0 ELSE 1 END) AS BIGINT) AS priority_format,
       CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 THEN 0 ELSE 1 END)
            AS BIGINT) AS n_quarantined
FROM r
""",
        "stream_static_join": """
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       c.c_mktsegment AS segment,
       CAST(c.c_nationkey AS BIGINT) AS nation
FROM events e JOIN customer c ON c.c_custkey - 1 = e.user_id
""",
        "substring_dedup": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
pos_tok AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, t[u.i] AS tok
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
),
g AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS start,
         concat_ws(' ', {", ".join(f"t[u.i+{j+1}]" for j in range(8))}) AS gram
  FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 7)) AS i) u
  WHERE len(t) >= 8
),
rep AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT g.doc_id, g.start + v.j AS pos
  FROM g JOIN rep USING (gram), LATERAL (SELECT unnest(range(0, 8)) AS j) v
),
surv AS (
  SELECT pt.doc_id, pt.pos, pt.tok
  FROM pos_tok pt LEFT JOIN cov ON cov.doc_id = pt.doc_id AND cov.pos = pt.pos
  WHERE cov.doc_id IS NULL
),
reb AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned
  FROM surv GROUP BY doc_id
)
SELECT CAST(t.doc_id AS BIGINT) AS id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_removed,
       md5(COALESCE(reb.cleaned, '')) AS clean_md5
FROM toks t LEFT JOIN reb ON reb.doc_id = t.doc_id
""",
        "zorder_layout": f"""
WITH base AS (
  SELECT o_orderkey, o_custkey % 1024 AS x,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 1024
           AS y
  FROM orders
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       CAST({" + ".join(
           f"(((x >> {b}) & 1) * {1 << (2 * b)})"
           f" + (((y >> {b}) & 1) * {1 << (2 * b + 1)})"
           for b in range(10)
       )} AS BIGINT) AS zkey
FROM base
""",
        "leakage_safe_split": f"""
WITH RECURSIVE {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
wc AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
  LEFT JOIN comp c USING (doc_id)
),
assigned AS (
  SELECT doc_id, component,
         CASE
           WHEN CAST(concat('0x', substr(md5(component || '|' || 'split-v1'), 1, 8))
                     AS BIGINT) < 3435973836 THEN 'train'
           WHEN CAST(concat('0x', substr(md5(component || '|' || 'split-v1'), 1, 8))
                     AS BIGINT) < 3865470566 THEN 'val'
           ELSE 'test'
         END AS split
  FROM wc
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT component) AS BIGINT) AS n_components
FROM assigned GROUP BY split
""",
        # hll_user_rollup: intentionally absent (rows-only) — the
        # Datasketches HLL estimate has no DuckDB equivalent; merge
        # equivalence + accuracy are pytest-pinned.
        "scd2_dimension": """
WITH log AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d,
         o_orderpriority AS prio
  FROM orders
),
w AS (
  SELECT cust, d, prio,
         CASE WHEN lag(prio) OVER (PARTITION BY cust ORDER BY d, prio)
                   IS DISTINCT FROM prio
              THEN 1 ELSE 0 END AS chg
  FROM log
),
pts AS (SELECT cust, d, prio FROM w WHERE chg = 1),
iv AS (
  SELECT cust, prio, d AS valid_from,
         lead(d) OVER (PARTITION BY cust ORDER BY d, prio) AS nxt
  FROM pts
)
SELECT cust, prio,
       strftime(valid_from, '%Y-%m-%d') AS valid_from,
       strftime(coalesce(nxt, DATE '9999-12-31'), '%Y-%m-%d') AS valid_to,
       nxt IS NULL AS is_current
FROM iv
""",
        "incremental_rollup_merge": """
SELECT o_orderpriority AS prio,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
""",
        "distinct_rollup_bitmap": """
SELECT o_orderpriority AS prio,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
FROM orders GROUP BY o_orderpriority
""",
        "bloom_prune_semi": """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 45)
GROUP BY l_returnflag
""",
        "snapshot_cdc": """
WITH o AS (
  SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  GROUP BY 1
),
n AS (
  SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY 1
),
d AS (
  SELECT coalesce(o.cust, n.cust) AS cust,
         CASE WHEN o.cust IS NULL THEN 'insert'
              WHEN n.cust IS NULL THEN 'delete'
              WHEN o.n <> n.n OR o.revenue <> n.revenue THEN 'update'
         END AS op,
         n.n AS n, n.revenue AS revenue
  FROM o FULL OUTER JOIN n ON o.cust = n.cust
)
SELECT cust, op, n, revenue FROM d WHERE op IS NOT NULL
""",
        "cdc_roundtrip": """
SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1
""",
        "editdist_join": """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
""",
        "interval_overlap": """
WITH l AS (
  SELECT o_orderkey AS oid,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS ls,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           + o_orderkey % 20 + 1 AS le
  FROM orders WHERE o_orderkey % 7 = 0
),
r AS (
  SELECT p_partkey AS pid,
         9131 + (p_partkey * 17) % 3000 AS rs,
         9131 + (p_partkey * 17) % 3000 + p_partkey % 30 + 1 AS re
  FROM part
)
SELECT pid, CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(sum(least(le, re) - greatest(ls, rs)) AS BIGINT) AS sum_overlap
FROM l JOIN r ON l.ls < r.re AND r.rs < l.le
GROUP BY pid
""",
        "histogram_quantiles": """
WITH b AS (
  SELECT o_orderpriority AS prio,
         CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bin,
         count(*) AS bin_n
  FROM orders GROUP BY 1, 2
),
c AS (
  SELECT prio, bin,
         sum(bin_n) OVER (PARTITION BY prio ORDER BY bin) AS cum_n,
         sum(bin_n) OVER (PARTITION BY prio) AS total
  FROM b
)
SELECT prio, CAST(0.5 AS DOUBLE) AS q, CAST(min(bin) * 10000.0 AS DOUBLE) AS value
FROM c WHERE cum_n >= ceil(0.5 * total) GROUP BY prio
UNION ALL
SELECT prio, CAST(0.9 AS DOUBLE) AS q, CAST(min(bin) * 10000.0 AS DOUBLE) AS value
FROM c WHERE cum_n >= ceil(0.9 * total) GROUP BY prio
UNION ALL
SELECT prio, CAST(0.99 AS DOUBLE) AS q, CAST(min(bin) * 10000.0 AS DOUBLE) AS value
FROM c WHERE cum_n >= ceil(0.99 * total) GROUP BY prio
""",
        "er_clusters": """
WITH RECURSIVE pairs AS (
  SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b
  FROM supplier a JOIN supplier b
    ON a.s_suppkey < b.s_suppkey AND a.s_nationkey = b.s_nationkey
  WHERE levenshtein(a.s_name, b.s_name) <= 1
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT coalesce(c.component, s.s_suppkey) AS cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       min(s.s_name) AS canonical_name
FROM supplier s LEFT JOIN comp c ON s.s_suppkey = c.node
GROUP BY 1
""",
        "tpch_q3": """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DOUBLE) AS revenue,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) DESC,
         l_orderkey
LIMIT 10
""",
        "tpch_q5": """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
""",
        "covisitation_topk": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item, n_common,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
)
SELECT item, rec_item, n_common, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        "rec_coverage": """
WITH npart AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
recs AS (
  SELECT
    CAST(p_partkey AS VARCHAR) AS query_item_id,
    CASE
      WHEN p_partkey % 10 = 0 THEN NULL
      WHEN p_partkey % 13 = 0 THEN CAST([] AS VARCHAR[])
      ELSE list_transform(range(1, 5 + 1),
                          i -> CAST((p_partkey + i) % n AS VARCHAR))
    END AS rec_items,
    CASE WHEN p_partkey % 10 = 0 THEN 'ITEM_NOT_IN_DATASET' END AS error
  FROM part, npart
),
exploded AS (
  SELECT query_item_id, unnest(rec_items) AS rec_item
  FROM recs WHERE error IS NULL
),
cat AS (SELECT CAST(p_partkey AS VARCHAR) AS cat_item FROM part
        WHERE p_partkey % 7 <> 0),
per_item AS (
  SELECT e.rec_item,
         count(*) AS n_recs,
         max(CASE WHEN c.cat_item IS NOT NULL THEN 1 ELSE 0 END) AS in_catalog
  FROM exploded e LEFT JOIN cat c ON e.rec_item = c.cat_item
  GROUP BY e.rec_item
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM cat) AS catalog_size,
       CAST(sum(in_catalog) AS BIGINT) AS items_covered,
       CAST(count(*) AS BIGINT) AS items_recommended,
       CAST(sum(CASE WHEN in_catalog = 0 THEN n_recs ELSE 0 END) AS BIGINT)
         AS dead_rec_rows,
       CAST(sum(n_recs) AS BIGINT) AS total_rec_rows
FROM per_item
""",
        "rec_hitrate": """
WITH npart AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
recs AS (
  SELECT
    CAST(p_partkey AS VARCHAR) AS query_item_id,
    CASE
      WHEN p_partkey % 10 = 0 THEN NULL
      WHEN p_partkey % 13 = 0 THEN CAST([] AS VARCHAR[])
      ELSE list_transform(range(1, 5 + 1),
                          i -> CAST((p_partkey + i) % n AS VARCHAR))
    END AS rec_items,
    CASE WHEN p_partkey % 10 = 0 THEN 'ITEM_NOT_IN_DATASET' END AS error
  FROM part, npart
),
exploded AS (
  SELECT query_item_id, unnest(rec_items) AS rec_item
  FROM recs WHERE error IS NULL
),
m AS (
  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS u, CAST(l_partkey AS VARCHAR) AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
truth AS (
  SELECT DISTINCT a.i AS qi, b.i AS ri
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
)
SELECT e.query_item_id,
       CAST(count(*) AS BIGINT) AS n_recs,
       CAST(sum(CASE WHEN t.qi IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
FROM exploded e
LEFT JOIN truth t ON e.query_item_id = t.qi AND e.rec_item = t.ri
GROUP BY e.query_item_id
""",
        "negative_sampling": """
WITH n AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
users AS (SELECT DISTINCT u FROM m),
cand AS (
  SELECT users.u, t.j,
         CAST(concat('0x', substr(md5(
           CAST(users.u AS VARCHAR) || '|' || CAST(t.j AS VARCHAR) || '|neg-v1'
         ), 1, 8)) AS BIGINT) % n.n AS neg_item
  FROM users, n, (SELECT unnest(range(1, 16)) AS j) t
),
nohist AS (
  SELECT c.u, c.j, c.neg_item
  FROM cand c LEFT JOIN m h ON c.u = h.u AND c.neg_item = h.i
  WHERE h.u IS NULL
),
dedup AS (SELECT u, neg_item, min(j) AS j FROM nohist GROUP BY 1, 2),
ranked AS (
  SELECT u, neg_item,
         row_number() OVER (PARTITION BY u ORDER BY j) AS rank
  FROM dedup
)
SELECT u AS user_id, neg_item, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        "user_profile_vectors": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nv AS (SELECT count(*) AS n FROM embeddings),
j AS (
  SELECT m.u, e.embedding
  FROM m, nv
  JOIN embeddings e ON e.vec_id = m.i % nv.n
),
dims AS (SELECT unnest(range(64)) AS dim),
x AS (
  SELECT j.u, d.dim,
         CAST(list_extract(j.embedding, d.dim + 1) AS DOUBLE) AS v
  FROM j CROSS JOIN dims d
)
SELECT u AS user_id, CAST(dim AS INT) AS dim,
       CAST(sum(CAST(round(v * 1000000.0) AS BIGINT)) AS BIGINT) AS vsum_micro,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM x GROUP BY 1, 2
""",
        "funnel_windows": """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
s1 AS (
  SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts_us) AS t2
  FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts_us > s1.t1
    AND e.ts_us <= s1.t1 + 7200000000
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts_us) AS t3
  FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
    AND e.ts_us <= s2.t2 + 86400000000
  GROUP BY 1
)
SELECT s1.user_id,
       CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
            AS INT) AS steps_completed,
       s1.t1, s2.t2, s3.t3
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
""",
        "gap_fill_locf": """
WITH daily AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1995-03-01'
  GROUP BY 1, 2
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
offsets AS (
  SELECT p.prio, bounds.d0,
         unnest(range(0, datediff('day', bounds.d0, bounds.d1) + 1)) AS o
  FROM (SELECT DISTINCT prio FROM daily) p, bounds
),
cal AS (
  SELECT prio, CAST(d0 + o * INTERVAL 1 DAY AS DATE) AS day FROM offsets
),
dense AS (
  SELECT cal.prio, cal.day, daily.revenue
  FROM cal LEFT JOIN daily USING (prio, day)
)
SELECT prio, strftime(day, '%Y-%m-%d') AS day,
       CAST(last_value(revenue IGNORE NULLS) OVER (
         PARTITION BY prio ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS revenue
FROM dense
""",
        "price_outliers": """
WITH b AS (
  SELECT o_orderpriority AS prio,
         CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bin,
         count(*) AS bin_n
  FROM orders GROUP BY 1, 2
),
c AS (
  SELECT prio, bin,
         sum(bin_n) OVER (PARTITION BY prio ORDER BY bin) AS cum_n,
         sum(bin_n) OVER (PARTITION BY prio) AS total
  FROM b
),
bands AS (
  SELECT prio, min(bin) * 10000.0 AS p90_band
  FROM c WHERE cum_n >= ceil(0.9 * total) GROUP BY prio
)
SELECT o.o_orderpriority AS prio,
       CAST(count(*) AS BIGINT) AS n_outliers,
       CAST(max(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders o JOIN bands ON o.o_orderpriority = bands.prio
WHERE o.o_totalprice >= bands.p90_band + 10000.0
GROUP BY 1
""",
        "revenue_trend": """
WITH daily AS (
  SELECT o_orderpriority AS prio,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY 1, 2
),
stats AS (
  SELECT prio,
         CAST(count(*) AS DECIMAL(38,6)) AS n,
         sum(CAST(day_idx AS DECIMAL(38,6))) AS sx,
         sum(CAST(revenue AS DECIMAL(38,6))) AS sy,
         sum(CAST(day_idx AS DECIMAL(38,6)) * CAST(revenue AS DECIMAL(38,6))) AS sxy,
         sum(CAST(day_idx AS DECIMAL(38,6)) * CAST(day_idx AS DECIMAL(38,6))) AS sxx
  FROM daily GROUP BY prio
)
SELECT prio,
       round(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE), 6) AS slope,
       round((CAST(CAST(sy AS VARCHAR) AS DOUBLE)
              - (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept,
       CAST(n AS BIGINT) AS n_points
FROM stats
""",
        "bm25_search": """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term FROM documents
),
tf AS (
  SELECT doc_id AS id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY id),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
qtf AS (SELECT * FROM tf WHERE term IN ('hash', 'join', 'window')),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT q.id,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (q.tf * 2.2) / (q.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
           AS s
  FROM qtf q JOIN dfreq d USING (term) JOIN dl ON q.id = dl.id, stats s
),
per_doc AS (
  SELECT id, round(sum(s), 6) AS score,
         CAST(count(*) AS INT) AS n_terms_hit
  FROM scored GROUP BY id
)
SELECT CAST(id AS BIGINT) AS doc_id, score, n_terms_hit,
       CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank
FROM per_doc
ORDER BY score DESC, id LIMIT 10
""",
        "scd2_durations": """
WITH log AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d,
         o_orderpriority AS prio
  FROM orders
),
w AS (
  SELECT cust, d, prio,
         CASE WHEN lag(prio) OVER (PARTITION BY cust ORDER BY d, prio)
                   IS DISTINCT FROM prio
              THEN 1 ELSE 0 END AS chg
  FROM log
),
pts AS (SELECT cust, d, prio FROM w WHERE chg = 1),
iv AS (
  SELECT cust, prio, d AS valid_from,
         lead(d) OVER (PARTITION BY cust ORDER BY d, prio) AS valid_to
  FROM pts
),
closed AS (
  SELECT prio, datediff('day', valid_from, valid_to) AS days
  FROM iv WHERE valid_to IS NOT NULL
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(days) AS BIGINT) AS total_days,
       round(avg(days), 6) AS avg_days
FROM closed GROUP BY prio
""",
        "hashed_features": """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term
  FROM documents WHERE doc_id % 5 = 0
),
tf AS (
  SELECT doc_id AS id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE length(term) >= 3 GROUP BY 1, 2
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs
       FROM documents WHERE doc_id % 5 = 0),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
mapped AS (
  SELECT tf.id,
         CAST(concat('0x', substr(md5(tf.term || '|feat-v1'), 1, 8)) AS BIGINT)
           % 64 AS dim,
         tf.tf * ln(nd.n_docs / dfreq.df) AS w
  FROM tf JOIN dfreq USING (term), nd
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(dim AS INT) AS dim,
       round(sum(w), 6) AS weight
FROM mapped GROUP BY 1, 2
""",
        "price_percentile_rank": """
WITH ranked AS (
  SELECT o_orderpriority AS prio, o_totalprice AS price,
         percent_rank() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice) AS pr
  FROM orders
)
SELECT prio,
       CAST(least(CAST(floor(pr * 10) AS INT), 9) AS INT) AS decile,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(min(pr), 6) AS min_pr
FROM ranked GROUP BY 1, 2
""",
        "skew_report": """
WITH per_key AS (
  SELECT CAST(l_partkey AS VARCHAR) AS key, count(*) AS n
  FROM lineitem GROUP BY 1
),
scalars AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM per_key
)
SELECT key, CAST(n AS BIGINT) AS n_rows,
       round(n / (total_rows * 1.0 / n_keys), 6) AS skew_factor,
       round(n * 1.0 / total_rows, 6) AS row_share,
       total_rows, n_keys
FROM per_key, scalars
ORDER BY n DESC, key LIMIT 10
""",
        "session_paths": """
WITH w AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL
                   OR ts_us - prev_us > 1800 * 1000 * 1000
                 THEN 1 ELSE 0 END AS new_s
  FROM w
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
paths AS (
  SELECT user_id, sid,
         list(event_type ORDER BY ts_us, event_id) AS path
  FROM sess GROUP BY user_id, sid
),
tri AS (
  SELECT path[o] || '>' || path[o + 1] || '>' || path[o + 2] AS trigram
  FROM paths, unnest(range(1, greatest(len(path) - 2, 0) + 1)) AS t(o)
)
SELECT trigram, CAST(count(*) AS BIGINT) AS n
FROM tri GROUP BY trigram
ORDER BY n DESC, trigram LIMIT 20
""",
        "revenue_contribution": """
WITH cell AS (
  SELECT o_orderpriority AS prio, o_orderstatus AS status,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT sum(revenue) AS grand FROM cell)
SELECT prio, status,
       CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
       round(CAST(CAST(revenue AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sum(revenue) OVER (PARTITION BY prio) AS VARCHAR)
                    AS DOUBLE), 6)
         AS share_of_prio,
       round(CAST(CAST(revenue AS VARCHAR) AS DOUBLE)
             / CAST(CAST(grand AS VARCHAR) AS DOUBLE), 6)
         AS share_of_total
FROM cell, tot
""",
        "skipgram_pairs": """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS t
  FROM documents WHERE doc_id % 5 = 0
),
fwd AS (
  SELECT t[CAST(i AS INT)] AS center, t[CAST(i + d AS INT)] AS context
  FROM toks,
       unnest(range(1, len(t) + 1)) AS a(i),
       (SELECT unnest([1, 2]) AS d) b
  WHERE i + d <= len(t)
),
sym_pairs AS (
  SELECT center, context FROM fwd
  UNION ALL
  SELECT context, center FROM fwd
)
SELECT center, context, CAST(count(*) AS BIGINT) AS n
FROM sym_pairs GROUP BY 1, 2
""",
        "vocab_coverage": """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
counts AS (SELECT term, sum(tf) AS n FROM tf GROUP BY term),
vocab AS (SELECT term FROM counts ORDER BY n DESC, term LIMIT 1000),
inv AS (
  SELECT sum(tf.tf) AS in_vocab_tokens
  FROM tf JOIN vocab USING (term)
),
tot AS (
  SELECT sum(tf) AS total_tokens, count(DISTINCT term) AS distinct_terms
  FROM tf
)
SELECT CAST(total_tokens AS BIGINT) AS total_tokens,
       CAST(distinct_terms AS BIGINT) AS distinct_terms,
       CAST(in_vocab_tokens AS BIGINT) AS in_vocab_tokens,
       CAST(total_tokens - in_vocab_tokens AS BIGINT) AS oov_tokens
FROM tot, inv
""",
        "trending_items": """
WITH counts AS (
  SELECT CAST(floor(datediff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS week,
         l_partkey AS part, count(*) AS n
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT week, part, n,
         row_number() OVER (PARTITION BY week ORDER BY n DESC, part) AS rank
  FROM counts
)
SELECT week, part, CAST(n AS BIGINT) AS n, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        "cohort_revenue": """
WITH o AS (
  SELECT o_custkey AS cust,
         year(CAST(o_orderdate AS DATE)) * 12
           + month(CAST(o_orderdate AS DATE)) AS m,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
firstm AS (SELECT cust, min(m) AS cohort FROM o GROUP BY cust),
cells AS (
  SELECT cohort, o.m - cohort AS "offset", sum(price) AS revenue
  FROM o JOIN firstm USING (cust)
  GROUP BY 1, 2
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST("offset" AS BIGINT) AS "offset",
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(sum(revenue) OVER (PARTITION BY cohort ORDER BY "offset"
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         AS cum_revenue
FROM cells
""",
        "covisitation_mrr": """
WITH mtrain AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate < TIMESTAMP '1997-01-01'
),
mtest AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, count(*) AS n_common
  FROM mtrain a JOIN mtrain b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
),
recs AS (SELECT * FROM ranked WHERE rank <= 5),
truth AS (
  SELECT DISTINCT a.i AS item, b.i AS rec_item
  FROM mtest a JOIN mtest b ON a.u = b.u AND a.i <> b.i
),
hits AS (
  SELECT r.item, r.rank
  FROM recs r JOIN truth t ON r.item = t.item AND r.rec_item = t.rec_item
),
first_hit AS (SELECT item, min(rank) AS first_rank FROM hits GROUP BY item)
SELECT CAST(first_rank AS INT) AS first_rank,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(1.0 / first_rank), 6) AS rr_sum
FROM first_hit GROUP BY first_rank
""",
        "decayed_popularity": """
WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS r FROM orders),
scored AS (
  SELECT l_partkey AS part,
         pow(0.98, CAST(datediff('day', CAST(o_orderdate AS DATE), ref.r)
                        AS DOUBLE)) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey, ref
),
pop AS (
  SELECT part, round(sum(w), 6) AS score,
         CAST(count(*) AS BIGINT) AS n_events
  FROM scored GROUP BY part
)
SELECT part, score, n_events FROM pop
ORDER BY score DESC, part LIMIT 20
""",
        "asof_nearest": """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch_us(ts) AS c_us, max(event_id) AS click_event_id
  FROM events WHERE event_type = 'click'
  GROUP BY 1, 2
),
cand AS (
  SELECT p.event_id, p.user_id, c.click_event_id,
         c.c_us - p.t_us AS sd, abs(c.c_us - p.t_us) AS ad
  FROM p JOIN c ON p.user_id = c.user_id
  WHERE abs(c.c_us - p.t_us) <= CAST(3600 AS BIGINT) * 1000000
),
pick AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_id
    ORDER BY ad, CASE WHEN sd <= 0 THEN 0 ELSE 1 END, click_event_id
  ) AS rn
  FROM cand
)
SELECT event_id, user_id, click_event_id, CAST(sd AS BIGINT) AS delta_us
FROM pick WHERE rn = 1
""",
        # LOO mean: exact bigint group sums, ONE bigint/bigint -> double
        # division at the end (deterministic in both engines); singleton
        # categories -> NULL in both (n-1 = 0 guarded to NULL).
        "target_encoding": """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_orderpriority,
       CASE WHEN count(*) OVER w > 1
            THEN (sum(cents) OVER w - cents) / (count(*) OVER w - 1)
       END AS te_loo_cents
FROM o
WINDOW w AS (PARTITION BY o_orderpriority)
""",
        # discrete (inverse-CDF) percentile bounds at integer ranks —
        # (n*p + 99) // 100 — over integer cents: every bound, clamp,
        # count, and sum is integer-exact; one final division.
        "winsorize_prices": """
WITH v AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
r AS (
  SELECT l_returnflag, cents,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM v
),
b AS (
  SELECT l_returnflag,
         min(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END) AS lo_bound,
         min(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END) AS hi_bound,
         CAST(max(n) AS BIGINT) AS n_rows
  FROM r GROUP BY 1
)
SELECT v.l_returnflag, n_rows, lo_bound, hi_bound,
       CAST(sum(greatest(lo_bound, least(hi_bound, cents))) AS DOUBLE)
         / count(*) AS winsorized_mean,
       CAST(sum(CASE WHEN cents < lo_bound THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_lo,
       CAST(sum(CASE WHEN cents > hi_bound THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_hi
FROM v JOIN b USING (l_returnflag)
GROUP BY 1, 2, 3, 4
""",
        # per-user ordered purchase stream -> (context, label) pairs;
        # the lateral position generator mirrors the row-local window
        # frame (up to 3 immediately preceding items, 1-based slices).
        "next_item_examples": """
WITH inter AS (
  SELECT o_custkey AS u, CAST(l_partkey AS BIGINT) AS i,
         o_orderdate AS d, o_orderkey AS ok, l_linenumber AS ln
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
seq AS (
  SELECT u, list(i ORDER BY d, ok, ln) AS items FROM inter GROUP BY u
)
SELECT u AS user_id, CAST(gs.pos AS BIGINT) AS pos,
       items[gs.pos] AS label,
       array_to_string(
         list_slice(items, greatest(1, gs.pos - 3), gs.pos - 1), ','
       ) AS context_csv
FROM seq, LATERAL (
  SELECT unnest(range(2, len(items) + 1)) AS pos
) gs
""",
        # plain exact GROUP BY/HAVING — the two-pass candidate/recount
        # plan must be result-identical to the naive exact aggregate
        "frequent_tokens": f"""
WITH tok AS (
  SELECT unnest({_TOKS}) AS token FROM documents
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok)
SELECT token, CAST(count(*) AS BIGINT) AS n,
       count(*) / (SELECT total FROM tot) AS share
FROM tok
GROUP BY token
HAVING count(*) > 0.002::DOUBLE * (SELECT total FROM tot)
""",
        # integer sup |cum_a*n_b - cum_b*n_a| over the per-value grid,
        # one bigint/bigint division at the end — engine-exact
        "ks_drift": """
WITH v AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS fa,
         CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END AS fb
  FROM lineitem
),
per AS (SELECT c, sum(fa) AS a, sum(fb) AS b FROM v GROUP BY c),
cum AS (
  SELECT c, sum(a) OVER (ORDER BY c) AS ca, sum(b) OVER (ORDER BY c) AS cb
  FROM per
),
tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b FROM per
)
SELECT n_a, n_b,
       CAST(max(abs(ca * n_b - cb * n_a)) AS BIGINT) AS ks_num,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         CAST(max(abs(ca * n_b - cb * n_a)) AS BIGINT) / (n_a * n_b)
       END AS ks_stat
FROM cum, tot
GROUP BY n_a, n_b
""",
        # same rare-shingle candidates as ngram_jaccard_pairs; both
        # containment directions are integer/integer divisions.
        # numerator and denominators share the RARE universe: common
        # can only count rare shingles, so n_a/n_b are per-doc RARE
        # counts (raw counts would understate containment for pairs
        # sharing frequent shingles)
        "containment_pairs": f"""
WITH {_SHINGLES_CTE.lstrip()},
rare AS (
  SELECT shingle FROM exploded_sh GROUP BY shingle HAVING count(*) <= 100
),
filtered AS (SELECT e.* FROM exploded_sh e JOIN rare USING (shingle)),
fn AS (SELECT doc_id, count(*) AS n_rare FROM filtered GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         na.n_rare AS n_a, nb.n_rare AS n_b,
         count(*) AS common
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN fn na ON na.doc_id = a.doc_id
  JOIN fn nb ON nb.doc_id = b.doc_id
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= 2
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(common AS BIGINT) AS common,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       common / n_a AS c_a_in_b,
       common / n_b AS c_b_in_a
FROM pairs
""",
        # FULL recompute over all interactions — the incremental merge
        # law is exactly that this equals state-pairs + increments
        "covisitation_incremental": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey % 4 = 0
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item, n_common,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
)
SELECT item, rec_item, n_common, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        # batch gap-island sessions MINUS each user's final session
        # (still open in stream state when the AvailableNow run ends)
        "stream_sessionize_stateful": """
WITH w AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
           AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800 * 1000 * 1000
              THEN 1 ELSE 0 END AS new_s
  FROM w
),
sess AS (
  SELECT user_id, ts_us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us) AS sid
  FROM flagged
),
agg AS (
  SELECT user_id, sid,
         min(ts_us) AS session_start_us,
         max(ts_us) AS session_end_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sess GROUP BY 1, 2
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       session_start_us, session_end_us, n_events
FROM agg
QUALIFY sid < max(sid) OVER (PARTITION BY user_id)
""",
        "tpch_q10": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DOUBLE) AS revenue,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal,
       n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)), n_name
ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) DESC,
         c_custkey
LIMIT 20
""",
        "tpch_q18": """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
        # EXISTS = semi join; "late" adapted to the fixture schema
        # (shipped > 60 days after order date)
        "tpch_q4": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1
""",
        "tpch_q6": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(18,6)) >= CAST('0.05' AS DECIMAL(18,6))
  AND CAST(l_discount AS DECIMAL(18,6)) <= CAST('0.07' AS DECIMAL(18,6))
  AND l_quantity < 24
""",
        "tpch_q14": """
WITH x AS (
  SELECT p_type,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
              AS DECIMAL(30,8)) AS rev
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate < TIMESTAMP '1996-10-01'
)
SELECT CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
                     ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
         AS promo_revenue,
       CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS total_revenue,
       CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
                     ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
         * 100.0
         / CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS promo_pct
FROM x
""",
        # threshold compare is division-free (qty*5*n < sum_qty) so the
        # "below 20% of the part's average" predicate is integer-exact
        "tpch_q17": """
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12'),
li AS (
  SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS qty,
         l_extendedprice
  FROM lineitem JOIN bp ON l_partkey = p_partkey
),
st AS (
  SELECT l_partkey AS pk, sum(qty) AS sum_qty, count(*) AS n
  FROM li GROUP BY 1
)
SELECT CAST(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small
FROM li JOIN st ON li.l_partkey = st.pk
WHERE qty * 5 * n < sum_qty
""",
        # arg-max by encoded ts*8+code bigint; RANGE to 1 PRECEDING =
        # strictly-before by timestamp value
        # linear multi-touch: integer micro-unit shares, remainder to
        # the latest touch — credit conserves exactly per conversion
        "linear_attribution": """
WITH convs AS (
  SELECT user_id AS u, epoch_us(ts) AS cts, event_id AS cid,
         CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS vmicro
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id AS tu, epoch_us(ts) AS tts, event_id AS tid, event_type
  FROM events WHERE event_type IN ('view', 'click')
),
pairs AS (
  SELECT event_type AS touch_type, cid, vmicro, tts, tid
  FROM convs JOIN touches
    ON u = tu AND tts < cts AND tts >= cts - 86400000000
),
ranked AS (
  SELECT touch_type, cid, vmicro,
         count(*) OVER (PARTITION BY cid) AS k,
         row_number() OVER (PARTITION BY cid
                            ORDER BY tts DESC, tid DESC) AS rn
  FROM pairs
),
credited AS (
  SELECT touch_type, cid,
         vmicro // k + CASE WHEN rn = 1 THEN vmicro % k ELSE 0 END AS credit
  FROM ranked
)
SELECT touch_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(count(DISTINCT cid) AS BIGINT) AS n_conversions,
       CAST(sum(credit) AS BIGINT) AS credit_micro,
       CAST(sum(credit) AS DOUBLE) / 1000000.0 AS credit_value
FROM credited GROUP BY 1
""",
        "last_touch_attribution": """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              ELSE NULL END AS code
  FROM events
),
enc AS (
  SELECT user_id, event_type, ts_us,
         max(CASE WHEN code IS NOT NULL THEN ts_us * 8 + code END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_enc
  FROM e
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       ts_us AS conv_ts_us,
       last_enc // 8 AS touch_ts_us,
       CAST(last_enc % 8 AS INT) AS touch_type_code,
       CAST(CASE WHEN last_enc IS NULL THEN 0
                 WHEN last_enc // 8 >= ts_us - 86400000000 THEN 1
                 ELSE 0 END AS INT) AS attributed
FROM enc WHERE event_type = 'purchase'
""",
        "audience_overlap": """
WITH m AS (
  SELECT user_id,
         bit_or(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                     WHEN 'purchase' THEN 4 ELSE 0 END) AS mask
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY 1
)
SELECT CAST(mask AS INT) AS mask, CAST(count(*) AS BIGINT) AS n_users
FROM m GROUP BY 1
""",
        # integer residual 7*v - trailing sum vs k*MAD of the residual
        # grid — division-free end to end
        "revenue_anomalies": """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, v, sum(v) OVER w AS s, count(*) OVER w AS n
  FROM d
  WINDOW w AS (ORDER BY datediff('day', DATE '1970-01-01', day)
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
),
r AS (SELECT day, v, CAST(7 * v - s AS BIGINT) AS residual FROM win WHERE n = 7),
grid AS (SELECT abs(residual) AS a, count(*) AS c FROM r GROUP BY 1),
g2 AS (
  SELECT a, sum(c) OVER (ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum
  FROM grid
),
tot AS (SELECT sum(c) AS n FROM grid),
mad AS (
  SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN a END) AS mad
  FROM g2, tot
)
SELECT strftime(day, '%Y-%m-%d') AS day, v AS cents, residual,
       CAST(mad.mad AS BIGINT) AS mad,
       CAST(CASE WHEN abs(residual) > 5 * mad.mad THEN 1 ELSE 0 END
            AS INT) AS is_anomaly
FROM r, mad
""",
        # DCG/IDCG as exact decimal sums of fixed 9-dp gain literals;
        # one double division at the end (see recsys._NDCG_GAINS)
        "rec_ndcg": """
WITH mtrain AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate < TIMESTAMP '1997-01-01'
),
mtest AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, count(*) AS n_common
  FROM mtrain a JOIN mtrain b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
),
recs AS (SELECT * FROM ranked WHERE rank <= 5),
truth AS (
  SELECT a.i AS item, b.i AS partner
  FROM mtest a JOIN mtest b ON a.u = b.u AND a.i <> b.i
),
hits AS (
  SELECT DISTINCT r.item, r.rank
  FROM recs r JOIN truth t ON r.item = t.item AND r.rec_item = t.partner
),
dcg AS (
  SELECT item,
         sum(CASE rank WHEN 1 THEN CAST('1.000000000' AS DECIMAL(12,9))
                       WHEN 2 THEN CAST('0.630929754' AS DECIMAL(12,9))
                       WHEN 3 THEN CAST('0.500000000' AS DECIMAL(12,9))
                       WHEN 4 THEN CAST('0.430676558' AS DECIMAL(12,9))
                       WHEN 5 THEN CAST('0.386852807' AS DECIMAL(12,9))
             END) AS dcg_dec,
         count(*) AS n_hits
  FROM hits GROUP BY 1
),
nrel AS (
  SELECT item, count(DISTINCT partner) AS n_rel FROM truth GROUP BY 1
),
base AS (SELECT DISTINCT item FROM recs)
SELECT CAST(base.item AS BIGINT) AS item,
       CAST(coalesce(n_rel, 0) AS BIGINT) AS n_rel,
       CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(dcg_dec, CAST('0' AS DECIMAL(12,9))) AS DOUBLE) AS dcg,
       CAST(CASE least(coalesce(n_rel, 0), 5)
                 WHEN 1 THEN CAST('1.000000000' AS DECIMAL(12,9))
                 WHEN 2 THEN CAST('1.630929754' AS DECIMAL(12,9))
                 WHEN 3 THEN CAST('2.130929754' AS DECIMAL(12,9))
                 WHEN 4 THEN CAST('2.561606312' AS DECIMAL(12,9))
                 WHEN 5 THEN CAST('2.948459119' AS DECIMAL(12,9))
            END AS DOUBLE) AS idcg,
       CAST(coalesce(dcg_dec, CAST('0' AS DECIMAL(12,9))) AS DOUBLE)
         / CAST(CASE least(coalesce(n_rel, 0), 5)
                     WHEN 1 THEN CAST('1.000000000' AS DECIMAL(12,9))
                     WHEN 2 THEN CAST('1.630929754' AS DECIMAL(12,9))
                     WHEN 3 THEN CAST('2.130929754' AS DECIMAL(12,9))
                     WHEN 4 THEN CAST('2.561606312' AS DECIMAL(12,9))
                     WHEN 5 THEN CAST('2.948459119' AS DECIMAL(12,9))
                END AS DOUBLE) AS ndcg
FROM base
LEFT JOIN dcg ON dcg.item = base.item
LEFT JOIN nrel ON nrel.item = base.item
""",
        "embedding_drift": """
WITH x AS (
  SELECT CAST(label AS BIGINT) AS label, vec_id % 2 AS half, d.dim,
         CAST(round(CAST(list_extract(embedding, d.dim + 1) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS sv
  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS dim) d
),
agg AS (
  SELECT label, half, dim,
         CAST(sum(sv) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM x GROUP BY 1, 2, 3
),
j AS (
  SELECT a.label, a.dim, a.s AS sa, a.n AS na, b.s AS sb, b.n AS nb
  FROM (SELECT * FROM agg WHERE half = 0) a
  JOIN (SELECT * FROM agg WHERE half = 1) b
    ON a.label = b.label AND a.dim = b.dim
)
SELECT label,
       CAST(min(na) AS BIGINT) AS n_a,
       CAST(min(nb) AS BIGINT) AS n_b,
       CAST(sum(abs(sa * nb - sb * na)) AS BIGINT) AS drift_num,
       CAST(sum(abs(sa * nb - sb * na)) AS DOUBLE)
         / CAST(min(na) * min(nb) * 1000000 AS DOUBLE) AS l1_drift
FROM j GROUP BY 1
""",
        "source_quality": f"""
WITH t AS (
  SELECT source, md5(text) AS dig, {_TOKS} AS toks,
         CAST(length(text) AS BIGINT) AS nc
  FROM documents
),
s AS (
  SELECT source, dig,
         CAST(len(toks) AS BIGINT) AS nt,
         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
              AS BIGINT) AS tc,
         CAST(len(list_filter(toks,
              x -> x IN ('a','the','of','and','to','in','is')))
              AS BIGINT) AS sh,
         nc
  FROM t
),
dc AS (SELECT dig, count(*) AS dn FROM s GROUP BY 1),
f AS (
  SELECT s.source, s.nt, s.tc, s.sh, s.nc,
         CASE WHEN dc.dn > 1 THEN 1 ELSE 0 END AS dup,
         CASE WHEN s.nt > 0 AND s.sh / s.nt > 0.05 THEN 1 ELSE 0 END AS eng
  FROM s JOIN dc ON s.dig = dc.dig
),
a AS (
  SELECT source, count(*) AS n_docs, sum(nt) AS n_tokens,
         sum(sh) AS n_sh, sum(nc) AS n_chars,
         sum(dup) AS n_dup_docs, sum(eng) AS n_english_docs
  FROM f GROUP BY 1
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_dup_docs AS BIGINT) AS n_dup_docs,
       CAST(n_english_docs AS BIGINT) AS n_english_docs,
       n_tokens / n_docs AS tokens_per_doc,
       n_sh / n_tokens AS stopword_rate,
       n_dup_docs / n_docs AS dup_rate,
       n_english_docs / n_docs AS english_share
FROM a
""",
        "scd2_pit_revenue": """
WITH log AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d,
         o_orderpriority AS prio
  FROM orders
),
w AS (
  SELECT cust, d, prio,
         CASE WHEN lag(prio) OVER (PARTITION BY cust ORDER BY d, prio)
                   IS DISTINCT FROM prio
              THEN 1 ELSE 0 END AS chg
  FROM log
),
pts AS (SELECT cust, d, prio FROM w WHERE chg = 1),
iv AS (
  SELECT cust, prio, d AS valid_from,
         coalesce(lead(d) OVER (PARTITION BY cust ORDER BY d, prio),
                  DATE '9999-12-31') AS valid_to
  FROM pts
),
facts AS (
  SELECT o_custkey AS cust, CAST(l_shipdate AS DATE) AS ship_d,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)
SELECT iv.prio, CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM facts
JOIN iv ON facts.cust = iv.cust
       AND facts.ship_d >= iv.valid_from
       AND facts.ship_d < iv.valid_to
GROUP BY 1
""",
        "tpch_q1": """
WITH x AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS DECIMAL(18,2)) AS qty,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         CAST(l_discount AS DECIMAL(8,6)) AS disc,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
              AS DECIMAL(18,6)) AS disc_price,
         CAST(l_tax AS DECIMAL(8,6)) AS tax
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2001-06-01'
)
SELECT l_returnflag, l_linestatus,
       -- decimal -> double via VARCHAR: DuckDB's direct cast divides
       -- the scaled int128 by 10^scale in doubles (two roundings, off
       -- by 1 ulp at half-ulp boundaries — caught at sf0.001 on
       -- sum_charge), while the string parse is correctly rounded,
       -- matching Spark's BigDecimal.doubleValue
       CAST(CAST(sum(qty) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(sum(disc_price) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(sum(disc_price * (CAST(1 AS DECIMAL(8,6)) + tax))
                 AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(sum(qty) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
       CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
       CAST(CAST(sum(disc) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM x GROUP BY 1, 2
""",
        "tpch_q19": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
        "rec_diversity_ils": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
prs AS (
  SELECT a.i AS item, b.i AS rec_item, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
recs AS (
  SELECT item, rec_item,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM prs QUALIFY rank <= 5
),
nv AS (SELECT count(*) AS n FROM embeddings),
rv AS (
  SELECT r.item, r.rank, d.dim,
         CAST(round(CAST(list_extract(e.embedding, d.dim + 1) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS sv
  FROM recs r, nv
  JOIN embeddings e ON e.vec_id = r.rec_item % nv.n
  CROSS JOIN (SELECT unnest(range(64)) AS dim) d
),
n2 AS (
  SELECT item, rank, CAST(sum(sv * sv) AS BIGINT) AS n2
  FROM rv GROUP BY 1, 2
),
dots AS (
  SELECT a.item, a.rank AS ri, b.rank AS rj,
         CAST(sum(a.sv * b.sv) AS BIGINT) AS dot
  FROM rv a JOIN rv b ON a.item = b.item AND a.dim = b.dim
                     AND a.rank < b.rank
  GROUP BY 1, 2, 3
),
cosines AS (
  SELECT d.item,
         CAST(round(CAST(d.dot AS DOUBLE)
                    / (sqrt(CAST(na.n2 AS DOUBLE))
                       * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
              AS DECIMAL(8,6)) AS c
  FROM dots d
  JOIN n2 na ON na.item = d.item AND na.rank = d.ri
  JOIN n2 nb ON nb.item = d.item AND nb.rank = d.rj
)
SELECT CAST(item AS BIGINT) AS item,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(c) AS DOUBLE) / count(*) AS ils
FROM cosines GROUP BY 1
""",
        "survival_repurchase": """
WITH dd AS (SELECT DISTINCT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d
            FROM orders),
rk AS (
  SELECT cust, d, row_number() OVER (PARTITION BY cust ORDER BY d) AS rn
  FROM dd
),
mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS m FROM orders),
obs AS (
  SELECT CASE WHEN t2.d IS NOT NULL
              THEN datediff('day', t1.d, t2.d)
              ELSE datediff('day', t1.d, mx.m) END AS dur,
         CASE WHEN t2.d IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM (SELECT cust, d FROM rk WHERE rn = 1) t1
  LEFT JOIN (SELECT cust, d FROM rk WHERE rn = 2) t2 ON t1.cust = t2.cust
  CROSS JOIN mx
),
grid AS (
  SELECT dur AS duration, CAST(sum(event) AS BIGINT) AS n_events,
         CAST(sum(1 - event) AS BIGINT) AS n_censored,
         count(*) AS cnt
  FROM obs GROUP BY 1
),
tot AS (SELECT sum(cnt) AS n FROM grid),
cum AS (
  SELECT duration, n_events, n_censored, cnt,
         sum(cnt) OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS c
  FROM grid
)
SELECT duration, CAST(n - c + cnt AS BIGINT) AS n_at_risk,
       n_events, n_censored
FROM cum, tot
""",
        "grouping_sets_revenue": """
WITH j AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT CAST(grouping(nation) AS INT) AS g_nation,
       CAST(grouping(segment) AS INT) AS g_segment,
       nation, segment,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM j
GROUP BY GROUPING SETS ((nation), (segment), ())
""",
        "except_all_returns": """
WITH r AS (SELECT CAST(l_partkey AS BIGINT) AS part FROM lineitem
           WHERE l_returnflag = 'R'),
a AS (SELECT CAST(l_partkey AS BIGINT) AS part FROM lineitem
      WHERE l_returnflag = 'A'),
x AS (SELECT part FROM r EXCEPT ALL SELECT part FROM a)
SELECT part, CAST(count(*) AS BIGINT) AS n_surplus FROM x GROUP BY 1
""",
        "unpivot_metrics": """
WITH w AS (
  SELECT l_returnflag AS flag,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS qty_cents,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS price_cents,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
)
SELECT flag, 'qty_cents' AS metric, qty_cents AS value FROM w
UNION ALL
SELECT flag, 'price_cents' AS metric, price_cents AS value FROM w
UNION ALL
SELECT flag, 'n_rows' AS metric, n_rows AS value FROM w
""",
        "tpch_q13": """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
    ON c_custkey = o_custkey
  GROUP BY 1
)
GROUP BY 1
""",
        "tpch_q15": """
WITH r AS (
  SELECT l_suppkey AS sk,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
             AS DECIMAL(30,8))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
),
m AS (SELECT max(total) AS mx FROM r)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(total AS DOUBLE) AS total_revenue
FROM r
JOIN supplier ON s_suppkey = r.sk
CROSS JOIN m
WHERE r.total = m.mx
""",
        # above-average compare is division-free (cents * n > sum);
        # the no-orders anti is LEFT JOIN ... IS NULL (no fan-out:
        # only matchless rows survive)
        "tpch_q22": """
WITH c AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
a AS (SELECT sum(cents) AS s, count(*) AS n FROM c WHERE cents > 0),
rich AS (SELECT c.* FROM c, a WHERE c.cents * a.n > a.s),
noord AS (
  SELECT rich.* FROM rich
  LEFT JOIN (SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '2000-09-01') o
    ON rich.c_custkey = o.o_custkey
  WHERE o.o_custkey IS NULL
)
SELECT nation, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(cents) AS BIGINT) AS totacctbal_cents
FROM noord GROUP BY 1
""",
        "tpch_q7": """
WITH rev AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
           AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
SELECT supp_nation, cust_nation, l_year,
       CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS revenue
FROM rev GROUP BY 1, 2, 3
""",
        "tpch_q8": """
WITH x AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
              AS DECIMAL(30,8)) AS volume,
         n2.n_name AS supp_nation
  FROM orders
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
    AND p_type = 'STANDARD' AND r_name = 'ASIA'
)
SELECT o_year,
       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                     ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
         AS nation_revenue,
       CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS total_revenue,
       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                     ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
FROM x GROUP BY 1
""",
        # fixture Q2: cost = cheapest shipment in exact cents (no
        # partsupp); per-part MIN joined back on exact-cents equality
        "tpch_q2": """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cost_cents
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, cost_cents, s_name, s_acctbal, n_name
  FROM ps
  JOIN part ON p_partkey = l_partkey AND p_size = 15
  JOIN eu ON s_suppkey = l_suppkey
),
mn AS (SELECT p_partkey AS pk, min(cost_cents) AS mn FROM cand GROUP BY 1)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
       CAST(p_partkey AS BIGINT) AS p_partkey, cost_cents
FROM cand JOIN mn ON p_partkey = pk AND cost_cents = mn
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
        # fixture Q9: unit cost = p_retailprice; decimal-exact
        # profit, sum -> double via VARCHAR (correctly-rounded parse)
        "tpch_q9": """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(CAST(sum(
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
              AS DECIMAL(30,8))
         - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,8))
       ) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY 1, 2
""",
        # fixture Q11: stock value = shipped cents for NATION_3
        # suppliers; scale-free above-2x-average threshold,
        # division-free (value*n_parts > 2*total)
        "tpch_q11": """
WITH val AS (
  SELECT l_partkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS value_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
),
t AS (SELECT sum(value_cents) AS tot, count(*) AS np FROM val)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       CAST(value_cents AS BIGINT) AS value_cents
FROM val, t
WHERE value_cents * np > 2 * tot
""",
        # fixture Q12: class = l_linestatus, late = shipped > 90 days
        # after order date; conditional bigint counts
        "tpch_q12": """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY 1
""",
        # fixture Q16: pair grid = DISTINCT lineitem pairs; complaint
        # suppliers = negative balance, excluded via anti pattern
        "tpch_q16": """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
good AS (
  SELECT p.* FROM pairs p
  LEFT JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) b
    ON p.l_suppkey = b.s_suppkey
  WHERE b.s_suppkey IS NULL
)
SELECT p_brand, p_type, CAST(p_size AS INT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM good
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY 1, 2, 3
""",
        # fixture Q20: excess = pair shipped > half its lifetime
        # quantity in 1996; integer centiqty, semi via IN
        "tpch_q20": """
WITH per AS (
  SELECT l_partkey, l_suppkey,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate < TIMESTAMP '1997-01-01'
             THEN CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS q96,
         sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS qtot
  FROM lineitem
  JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
  GROUP BY 1, 2
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM per WHERE q96 * 2 > qtot)
""",
        # fixture Q21: EXISTS/NOT-EXISTS pair collapsed to one
        # per-order aggregate (exactly-one-late => MAX is the culprit)
        "tpch_q21": """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN l_suppkey END) AS n_late,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             THEN l_suppkey END) AS late_supp
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
  GROUP BY 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order
JOIN supplier ON s_suppkey = late_supp
WHERE n_supp > 1 AND n_late = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
""",
        # calendar lags via day-index equi-joins; one double division
        # of two exact integer products
        "forecast_mase": """
WITH d AS (
  SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS di,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_seasonal,
         CAST(coalesce(sum(abs(a.v - b.v)), 0) AS BIGINT)
           AS sum_abs_err_seasonal
  FROM d a JOIN d b ON a.di = b.di + 7
),
n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_naive,
         CAST(coalesce(sum(abs(a.v - b.v)), 0) AS BIGINT)
           AS sum_abs_err_naive
  FROM d a JOIN d b ON a.di = b.di + 1
)
SELECT n_seasonal, sum_abs_err_seasonal, n_naive, sum_abs_err_naive,
       CASE WHEN sum_abs_err_naive > 0 AND n_seasonal > 0 THEN
         CAST(sum_abs_err_seasonal * n_naive AS DOUBLE)
           / CAST(n_seasonal * sum_abs_err_naive AS DOUBLE)
       END AS mase
FROM s, n
""",
        # FULL recompute over the new window — the merge law is
        # exactly that the maintained rollup equals this
        "retractable_rollup": """
SELECT CAST(o_custkey % 100 AS BIGINT) AS grp,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1
""",
        # pmod banding: cents - ((cents % w) + w) % w = floor band,
        # exact for negative balances too
        "k_anonymity": """
WITH c AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
b AS (
  SELECT nation, segment,
         cents - ((cents % 100000) + 100000) % 100000 AS band, cents
  FROM c
),
cls AS (
  SELECT nation, segment, band,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT cents) AS BIGINT) AS n_sensitive
  FROM b GROUP BY 1, 2, 3
)
SELECT nation, segment, CAST(band AS BIGINT) AS band, class_size,
       n_sensitive,
       CAST(CASE WHEN class_size < 5 THEN 1 ELSE 0 END AS INT)
         AS k_violation,
       CAST(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END AS INT)
         AS l_violation
FROM cls
""",
        "privacy_gate": """
WITH c AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
b AS (
  SELECT nation, segment,
         cents - ((cents % 100000) + 100000) % 100000 AS band, cents
  FROM c
),
cls AS (
  SELECT nation, segment, band,
         count(*) AS class_size,
         count(DISTINCT cents) AS n_sensitive
  FROM b GROUP BY 1, 2, 3
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_records,
       CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_classes,
       CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
            AS BIGINT) AS n_risky_records,
       CAST(min(class_size) AS BIGINT) AS min_class_size,
       CAST(sum(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_diversity_classes
FROM cls
""",
        # exact-integer EMD: |N·cumc - n·cumg| summed over the ordered
        # nation domain, then ONE integer quotient — HUGEINT on the
        # DuckDB side, decimal(38,0) `div` on the Spark side
        "t_closeness": """
WITH c AS (
  SELECT c_mktsegment AS segment,
         cents - ((cents % 200000) + 200000) % 200000 AS band,
         CAST(c_nationkey AS BIGINT) AS nation
  FROM (SELECT c_mktsegment,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents,
               c_nationkey
        FROM customer)
),
g AS (
  SELECT nation AS cat, CAST(count(*) AS HUGEINT) AS gcnt
  FROM c GROUP BY 1
),
gg AS (
  SELECT cat, SUM(gcnt) OVER (ORDER BY cat) AS cumg,
         (SELECT count(*) FROM g) AS m
  FROM g
),
tot AS (SELECT CAST(count(*) AS HUGEINT) AS n_tot FROM c),
cls AS (
  SELECT segment, band, CAST(count(*) AS BIGINT) AS class_size
  FROM c GROUP BY 1, 2
),
cc AS (
  SELECT segment, band, nation AS cat, CAST(count(*) AS HUGEINT) AS ccnt
  FROM c GROUP BY 1, 2, 3
),
fan AS (
  SELECT cls.segment, cls.band, cls.class_size, gg.cat, gg.cumg, gg.m,
         COALESCE(cc.ccnt, 0) AS ccnt
  FROM cls CROSS JOIN gg
  LEFT JOIN cc ON cc.segment = cls.segment AND cc.band = cls.band
              AND cc.cat = gg.cat
),
terms AS (
  SELECT segment, band, class_size, m,
         ABS((SELECT n_tot FROM tot)
               * SUM(ccnt) OVER (PARTITION BY segment, band ORDER BY cat)
             - CAST(class_size AS HUGEINT) * cumg) AS term
  FROM fan
),
per AS (
  SELECT segment, band, class_size, m, SUM(term) AS t_num
  FROM terms GROUP BY 1, 2, 3, 4
),
q AS (
  SELECT segment, band, class_size,
         CAST(CASE WHEN m > 1
              THEN (t_num * 1000000000)
                   // (CAST(m - 1 AS HUGEINT) * class_size
                       * (SELECT n_tot FROM tot))
              ELSE 0 END AS BIGINT) AS t_q
  FROM per
)
SELECT segment, CAST(band AS BIGINT) AS band, class_size, t_q,
       CAST(CASE WHEN t_q > 375000000 THEN 1 ELSE 0 END AS INT)
         AS t_violation
FROM q
""",
        # FULL recompute — the stream-maintained store must serve
        # identical top-k no matter how files split into micro-batches
        "stream_model_refresh": """
WITH m AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey % 4 = 0
),
pairs AS (
  SELECT a.i AS item, b.i AS rec_item, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ranked AS (
  SELECT item, rec_item, n_common,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_common DESC, rec_item) AS rank
  FROM pairs
)
SELECT item, rec_item, n_common, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
        # discrete lower-median + MAD, all-integer: rank (n+1)//2 over
        # values, then over absolute deviations; k*MAD band count
        "mad_outliers": """
WITH v AS (
  SELECT l_returnflag AS g,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM lineitem
),
r AS (
  SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM v
),
med AS (
  SELECT g, min(CASE WHEN rn = (n + 1) // 2 THEN c END) AS median,
         CAST(max(n) AS BIGINT) AS n_rows
  FROM r GROUP BY g
),
d AS (
  SELECT v.g, abs(c - median) AS ad, median, n_rows
  FROM v JOIN med USING (g)
),
dr AS (
  SELECT g, ad, median, n_rows,
         row_number() OVER (PARTITION BY g ORDER BY ad) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM d
),
mad AS (
  SELECT g, min(CASE WHEN rn = (n + 1) // 2 THEN ad END) AS mad
  FROM dr GROUP BY g
)
SELECT v.g AS l_returnflag,
       max(n_rows) AS n_rows,
       max(median) AS median,
       max(mad.mad) AS mad,
       CAST(sum(CASE WHEN abs(c - median) > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(max(abs(c - median)) AS BIGINT) AS max_abs_dev
FROM v JOIN med USING (g) JOIN mad USING (g)
GROUP BY v.g
""",
        # exact Mann–Whitney AUC on the (segment, score) grid — bigint
        # rank-sum, one final division; tie correction via neg-at-score
        "rec_auc_segments": """
WITH e AS (
  SELECT CAST(user_id % 4 AS BIGINT) AS segment,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events WHERE value IS NOT NULL
),
grid AS (
  SELECT segment, score,
         CAST(sum(label) AS BIGINT) AS pos,
         CAST(count(*) - sum(label) AS BIGINT) AS neg
  FROM e GROUP BY 1, 2
),
c AS (
  SELECT segment, pos, neg,
         COALESCE(sum(neg) OVER (PARTITION BY segment ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
  FROM grid
)
SELECT segment,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(neg) AS BIGINT) AS n_neg,
       CAST(sum(pos * (2 * cnb + neg)) AS BIGINT) AS auc_num2,
       CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
         CAST(sum(pos * (2 * cnb + neg)) AS DOUBLE)
         / CAST(2 * sum(pos) * sum(neg) AS DOUBLE) END AS auc
FROM c GROUP BY segment
""",
        # fixed-width 500-cent bins; every fraction one bigint division
        "score_calibration": """
WITH e AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events WHERE value IS NOT NULL
),
bins AS (
  SELECT score // 500 AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS n_pos
  FROM e GROUP BY 1
),
cum AS (
  SELECT bin, n, n_pos,
         sum(n) OVER (ORDER BY bin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         sum(n_pos) OVER (ORDER BY bin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
         sum(n_pos) OVER () AS total_pos
  FROM bins
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(bin * 500 AS BIGINT) AS bin_lo,
       n, n_pos,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
       CAST(cum_n AS BIGINT) AS cum_n,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       CASE WHEN total_pos > 0 THEN
         CAST(cum_pos AS DOUBLE) / CAST(total_pos AS DOUBLE) END AS capture,
       CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE) AS cum_precision
FROM cum
""",
        # two-sigma Wilson bounds: the SAME IEEE expression tree as
        # operators/evaluation.py:wilson_bounds (z^2 = 4 exactly; only
        # +,-,*,/,sqrt — all correctly rounded, so doubles match
        # bit-for-bit)
        "wilson_ctr": """
WITH e AS (
  SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS label
  FROM events WHERE event_type IN ('view', 'click')
),
a AS (
  SELECT hour,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS n_pos
  FROM e GROUP BY hour
)
SELECT hour, n, n_pos,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       greatest(0.0,
         (((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
            + 2.0 / CAST(n AS DOUBLE))
          - 2.0 * sqrt((((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))))
                         + 1.0 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
         / (1.0 + 4.0 / CAST(n AS DOUBLE))) AS wilson_lo,
       least(1.0,
         (((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
            + 2.0 / CAST(n AS DOUBLE))
          + 2.0 * sqrt((((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))))
                         + 1.0 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
         / (1.0 + 4.0 / CAST(n AS DOUBLE))) AS wilson_hi
FROM a
""",
        # exact Gini via the rank-sum identity — bigint rank-sums with
        # closed-form tie runs on the value grid, one final division
        "revenue_gini": """
WITH pc AS (
  SELECT o_custkey,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cust_cents
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c.c_mktsegment, pc.cust_cents
  FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey
),
grid AS (
  SELECT c_mktsegment, cust_cents AS v, CAST(count(*) AS BIGINT) AS c
  FROM j GROUP BY 1, 2
),
r AS (
  SELECT c_mktsegment, v, c,
         COALESCE(sum(c) OVER (PARTITION BY c_mktsegment ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
  FROM grid
)
SELECT c_mktsegment,
       CAST(sum(c) AS BIGINT) AS n,
       CAST(sum(v * c) AS BIGINT) AS total,
       CAST(sum(v * (2 * c * k + c * (c + 1)))
            - (sum(c) + 1) * sum(v * c) AS BIGINT) AS gini_num,
       CASE WHEN sum(v * c) > 0 THEN
         CAST(sum(v * (2 * c * k + c * (c + 1)))
              - (sum(c) + 1) * sum(v * c) AS DOUBLE)
         / CAST(sum(c) * sum(v * c) AS DOUBLE) END AS gini
FROM r GROUP BY c_mktsegment
""",
        # capless user-user Jaccard (the Spark cap is inert at driver
        # SFs); jaccard is one bigint/bigint division so rank ties
        # compare identical doubles in both engines
        "user_similarity": f"""
WITH {MAPPING_CTE.lstrip()},
m AS (
  SELECT CAST(user_id AS BIGINT) AS u, CAST(item_id AS BIGINT) AS i
  FROM mapping
),
half AS (
  SELECT a.u AS user_a, b.u AS user_b, CAST(count(*) AS BIGINT) AS n_common
  FROM m a JOIN m b ON a.i = b.i AND a.u < b.u
  GROUP BY 1, 2 HAVING count(*) >= 2
),
sizes AS (SELECT u, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY u),
sym AS (
  SELECT user_a, user_b, n_common FROM half
  UNION ALL
  SELECT user_b, user_a, n_common FROM half
),
jx AS (
  SELECT s.user_a, s.user_b, s.n_common, su.n AS n_user, sv.n AS n_neighbor,
         CAST(s.n_common AS DOUBLE)
         / CAST(su.n + sv.n - s.n_common AS DOUBLE) AS jaccard
  FROM sym s
  JOIN sizes su ON s.user_a = su.u
  JOIN sizes sv ON s.user_b = sv.u
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY user_a
             ORDER BY jaccard DESC, user_b) AS rank
  FROM jx
)
SELECT user_a AS user, user_b AS neighbor, n_common, n_user, n_neighbor,
       jaccard, CAST(rank AS INT) AS rank
FROM rk WHERE rank <= 5
""",
    }
    # the stream-maintained score grid must reproduce the batch AUC
    sqls["stream_auc_monitor"] = sqls["rec_auc_segments"]
    # ... and, collapsed over groups, the batch calibration table
    sqls["stream_calibration"] = sqls["score_calibration"]
    # exact Pearson: int128 moment sums, same final double conversions
    sqls["price_qty_corr"] = """
WITH v AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
),
a AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM v GROUP BY g
)
SELECT g AS l_returnflag,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS r_num,
       CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS r_dx,
       CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS r_dy,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) END AS r
FROM a
"""
    # exact Spearman: doubled average ranks off the value grid
    # (2k + c + 1 per tie run), then the same int128 Pearson core
    sqls["qty_price_spearman"] = """
WITH v AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
),
gx AS (
  SELECT g, x,
         CAST(2 * COALESCE(sum(c) OVER (PARTITION BY g ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS rx2
  FROM (SELECT g, x, count(*) AS c FROM v GROUP BY 1, 2)
),
gy AS (
  SELECT g, y,
         CAST(2 * COALESCE(sum(c) OVER (PARTITION BY g ORDER BY y
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS ry2
  FROM (SELECT g, y, count(*) AS c FROM v GROUP BY 1, 2)
),
rr AS (
  SELECT v.g, gx.rx2 AS x, gy.ry2 AS y
  FROM v JOIN gx ON v.g = gx.g AND v.x = gx.x
         JOIN gy ON v.g = gy.g AND v.y = gy.y
),
a AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM rr GROUP BY g
)
SELECT g AS l_returnflag,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS r_num,
       CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS r_dx,
       CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS r_dy,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) END AS rho
FROM a
"""
    # exact OLS: int128 moments, identical fixed IEEE expression tree
    sqls["price_qty_ols"] = """
WITH v AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
),
a AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM v GROUP BY g
)
SELECT g AS l_returnflag,
       CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) END AS slope,
       CASE WHEN n * sxx - sx * sx > 0 THEN
         (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
          - (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
         / CAST(n AS DOUBLE) END AS intercept,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
          * CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE))
         / (CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
            * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) END AS r2
FROM a
"""
    # chi-square independence: exact int128 cross-multiplied cell
    # deviations, per-cell IEEE tail quantized to nano-units, exact
    # bigint quanta sum, one final division (+ Cramér's V)
    sqls["chi2_flag_status"] = """
WITH cells AS (
  SELECT l_returnflag AS a, l_linestatus AS b, CAST(count(*) AS BIGINT) AS o
  FROM lineitem GROUP BY 1, 2
),
rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS rtot FROM cells GROUP BY 1),
ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS ctot FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS nn,
         CAST(count(DISTINCT a) AS BIGINT) AS ra,
         CAST(count(DISTINCT b) AS BIGINT) AS cb
  FROM cells
),
q AS (
  SELECT nn, ra, cb,
         CAST(floor(
           (CAST(CAST(CAST(o AS HUGEINT) * nn
                 - CAST(rtot AS HUGEINT) * ctot AS VARCHAR) AS DOUBLE)
            * CAST(CAST(CAST(o AS HUGEINT) * nn
                   - CAST(rtot AS HUGEINT) * ctot AS VARCHAR) AS DOUBLE)
            / CAST(CAST(CAST(rtot AS HUGEINT) * CAST(ctot AS HUGEINT) * nn
                   AS VARCHAR) AS DOUBLE))
           * 1000000000.0) AS BIGINT) AS qq
  FROM cells
  JOIN rt USING (a)
  JOIN ct USING (b)
  CROSS JOIN tot
)
SELECT nn AS n,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST((ra - 1) * (cb - 1) AS BIGINT) AS dof,
       CAST(sum(qq) AS DOUBLE) / 1000000000.0 AS chi2,
       CASE WHEN nn > 0 AND (ra - 1) * (cb - 1) > 0 THEN
         sqrt((CAST(sum(qq) AS DOUBLE) / 1000000000.0)
              / (CAST(nn AS DOUBLE)
                 * CAST(least(ra - 1, cb - 1) AS DOUBLE))) END AS cramers_v
FROM q GROUP BY nn, ra, cb
"""
    # mutual information: same cell grid + marginals as chi2 above;
    # every log argument is a HUGEINT cross-product routed through
    # VARCHAR before DOUBLE (correctly-rounded parse, matching
    # Spark's BigDecimal->double); per-cell/per-class terms quantized
    # floor(term*1e9) so sums are exact bigints; GREATEST(.,0) clamps
    # the floor bias exactly as the engine does
    sqls["mi_priority_status"] = """
WITH cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
),
rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS rtot FROM cells GROUP BY 1),
ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS ctot FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
q_mi AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(o AS DOUBLE) / CAST(nn AS DOUBLE))
           * ln(CAST(CAST(CAST(o AS HUGEINT) * nn AS VARCHAR) AS DOUBLE)
                / CAST(CAST(CAST(rtot AS HUGEINT) * ctot AS VARCHAR)
                       AS DOUBLE))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS qm,
         nn
  FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot
  GROUP BY nn
),
q_x AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(rtot AS DOUBLE) / CAST(nn AS DOUBLE))
           * ln(CAST(nn AS DOUBLE) / CAST(rtot AS DOUBLE))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS qx,
         CAST(count(*) AS BIGINT) AS classes_x
  FROM rt CROSS JOIN tot
),
q_y AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(ctot AS DOUBLE) / CAST(nn AS DOUBLE))
           * ln(CAST(nn AS DOUBLE) / CAST(ctot AS DOUBLE))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS qy,
         CAST(count(*) AS BIGINT) AS classes_y
  FROM ct CROSS JOIN tot
)
SELECT nn AS n, classes_x, classes_y,
       CAST(GREATEST(qm, 0) AS DOUBLE) / 1000000000.0 AS mi,
       CAST(qx AS DOUBLE) / 1000000000.0 AS h_x,
       CAST(qy AS DOUBLE) / 1000000000.0 AS h_y,
       CASE WHEN LEAST(qx, qy) > 0 THEN
         CAST(GREATEST(qm, 0) AS DOUBLE) / CAST(LEAST(qx, qy) AS DOUBLE)
       END AS nmi
FROM q_mi CROSS JOIN q_x CROSS JOIN q_y
"""
    # sorted-neighborhood: rank + range self-join + exact token
    # Jaccard (the Spark side never builds the range join — the
    # bucket trick keeps pairs linear)
    sqls["sorted_neighborhood"] = """
WITH d AS (
  SELECT doc_id, substr(lower(text), 1, 24) AS k,
         list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
           t -> t <> '')) AS t
  FROM documents
),
r AS (
  SELECT doc_id, t, row_number() OVER (ORDER BY k, doc_id) - 1 AS rid
  FROM d
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(b.rid - a.rid AS INT) AS rank_dist,
         CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS common,
         CAST(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))
              AS BIGINT) AS union_size
  FROM r a JOIN r b ON b.rid > a.rid AND b.rid - a.rid < 5
)
SELECT id_a, id_b, rank_dist, common, union_size,
       CAST(common AS DOUBLE) / CAST(union_size AS DOUBLE) AS jaccard
FROM p
"""
    # streaming join-IVM: same full-recompute oracle as the batch
    # form — the delta rule must hold across any batch interleaving
    sqls["stream_ivm_rollup"] = """
SELECT o_orderpriority,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS sum_v,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
"""
    # join-IVM: the oracle is the FULL recompute — equality is the
    # two-sided delta rule holding end-to-end
    sqls["ivm_join_rollup"] = """
SELECT o_orderpriority,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS sum_v,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
"""
    # Benford audit: first digit from the bigint's string form (exact
    # everywhere); reference probabilities as VARCHAR-parsed literals
    # (correctly-rounded, matching Spark's pinned doubles bit-for-bit)
    sqls["benford_audit"] = """
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM orders
),
counts AS (
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM c WHERE v > 0 GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM counts),
p AS (
  SELECT * FROM (VALUES
    (1, CAST('0.3010299956639812' AS DOUBLE)),
    (2, CAST('0.17609125905568124' AS DOUBLE)),
    (3, CAST('0.12493873660829992' AS DOUBLE)),
    (4, CAST('0.09691001300805642' AS DOUBLE)),
    (5, CAST('0.07918124604762482' AS DOUBLE)),
    (6, CAST('0.06694678963061322' AS DOUBLE)),
    (7, CAST('0.05799194697768673' AS DOUBLE)),
    (8, CAST('0.05115252244738129' AS DOUBLE)),
    (9, CAST('0.04575749056067514' AS DOUBLE))
  ) v(digit, benford_p)
)
SELECT counts.digit, n,
       CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) AS share,
       benford_p,
       abs(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) - benford_p) AS abs_dev
FROM counts JOIN p USING (digit) CROSS JOIN t
"""
    # lag-k ACF: day-index equi-join pairs, int128 Pearson core
    sqls["revenue_acf"] = """
WITH d AS (
  SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS di,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT l.lag, a.v AS x, b.v AS y
  FROM (VALUES (1), (7), (28)) l(lag)
  JOIN d a ON TRUE
  JOIN d b ON b.di = a.di + l.lag
),
a AS (
  SELECT lag, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS r_num,
       CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS r_dx,
       CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS r_dy,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) END AS r
FROM a
"""
    # total-variation drift: pointwise integer mass differences
    sqls["tv_drift"] = """
WITH v AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS fa,
         CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END AS fb
  FROM lineitem
),
per AS (SELECT c, sum(fa) AS a, sum(fb) AS b FROM v GROUP BY c),
tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b FROM per
)
SELECT n_a, n_b,
       CAST(sum(abs(a * n_b - b * n_a)) AS BIGINT) AS tv_num,
       CAST(sum(abs(a * n_b - b * n_a)) AS DOUBLE)
         / CASE WHEN n_a > 0 AND n_b > 0
             THEN CAST(2 * n_a * n_b AS DOUBLE) END AS tv_stat
FROM per, tot
GROUP BY n_a, n_b
"""
    # inclusion-dependency profile: distinct-key containment per
    # candidate relation + one negative control
    sqls["fk_discovery"] = """
WITH rel AS (
  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
         (SELECT count(DISTINCT l_orderkey) FROM lineitem
          WHERE l_orderkey IS NOT NULL) AS n_child_keys,
         (SELECT count(DISTINCT o_orderkey) FROM orders
          WHERE o_orderkey IS NOT NULL) AS n_parent_keys,
         (SELECT count(*) FROM
            (SELECT DISTINCT l_orderkey AS k FROM lineitem
             WHERE l_orderkey IS NOT NULL) c
          WHERE k IN (SELECT o_orderkey FROM orders)) AS n_matched
  UNION ALL
  SELECT 'lineitem.l_partkey->part.p_partkey',
         (SELECT count(DISTINCT l_partkey) FROM lineitem
          WHERE l_partkey IS NOT NULL),
         (SELECT count(DISTINCT p_partkey) FROM part
          WHERE p_partkey IS NOT NULL),
         (SELECT count(*) FROM
            (SELECT DISTINCT l_partkey AS k FROM lineitem
             WHERE l_partkey IS NOT NULL) c
          WHERE k IN (SELECT p_partkey FROM part))
  UNION ALL
  SELECT 'orders.o_custkey->customer.c_custkey',
         (SELECT count(DISTINCT o_custkey) FROM orders
          WHERE o_custkey IS NOT NULL),
         (SELECT count(DISTINCT c_custkey) FROM customer
          WHERE c_custkey IS NOT NULL),
         (SELECT count(*) FROM
            (SELECT DISTINCT o_custkey AS k FROM orders
             WHERE o_custkey IS NOT NULL) c
          WHERE k IN (SELECT c_custkey FROM customer))
  UNION ALL
  SELECT 'part.p_partkey->customer.c_custkey',
         (SELECT count(DISTINCT p_partkey) FROM part
          WHERE p_partkey IS NOT NULL),
         (SELECT count(DISTINCT c_custkey) FROM customer
          WHERE c_custkey IS NOT NULL),
         (SELECT count(*) FROM
            (SELECT DISTINCT p_partkey AS k FROM part
             WHERE p_partkey IS NOT NULL) c
          WHERE k IN (SELECT c_custkey FROM customer))
)
SELECT relation,
       CAST(n_child_keys AS BIGINT) AS n_child_keys,
       CAST(n_parent_keys AS BIGINT) AS n_parent_keys,
       CAST(n_matched AS BIGINT) AS n_matched,
       CASE WHEN n_child_keys > 0 THEN
         CAST(n_matched AS DOUBLE) / CAST(n_child_keys AS DOUBLE)
       END AS containment
FROM rel
"""
    # functional-dependency discovery: NULL-aware distinct dependents
    sqls["fd_discovery"] = """
WITH f1 AS (
  SELECT count(DISTINCT l_partkey)
           + max(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS nd
  FROM lineitem GROUP BY l_orderkey, l_linenumber
),
f2 AS (
  SELECT count(DISTINCT l_linestatus)
           + max(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS nd
  FROM lineitem GROUP BY l_orderkey
),
f3 AS (
  SELECT count(DISTINCT o_orderpriority)
           + max(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nd
  FROM orders GROUP BY o_custkey
),
rolled AS (
  SELECT 'lineitem(l_orderkey,l_linenumber)->l_partkey' AS relation,
         count(*) AS n_groups,
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating,
         max(nd) AS max_fanout
  FROM f1
  UNION ALL
  SELECT 'lineitem.l_orderkey->l_linestatus', count(*),
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), max(nd) FROM f2
  UNION ALL
  SELECT 'orders.o_custkey->o_orderpriority', count(*),
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), max(nd) FROM f3
)
SELECT relation,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(n_violating AS BIGINT) AS n_violating,
       CAST(max_fanout AS BIGINT) AS max_fanout,
       CASE WHEN n_groups > 0 THEN
         CAST(n_violating AS DOUBLE) / CAST(n_groups AS DOUBLE)
       END AS violation_rate,
       CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS INT) AS holds
FROM rolled
"""
    # the drift grid's second statistic: exact inverse-CDF quantiles
    # of everything drained (population = A union B)
    sqls["stream_quantiles"] = """
WITH v AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM lineitem
),
per AS (SELECT c, count(*) AS cnt FROM v GROUP BY c),
cum AS (SELECT c, sum(cnt) OVER (ORDER BY c) AS cm FROM per),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
p AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
SELECT CAST(pct AS INT) AS pct,
       n,
       (SELECT CAST(min(c) AS BIGINT) FROM cum
        WHERE cm >= (n * pct + 99) // 100) AS value
FROM p, tot
"""
    # pooled two-proportion z: the SAME IEEE tree as
    # operators/evaluation.py:two_proportion_ztest
    sqls["ab_test_purchase"] = """
WITH e AS (
  SELECT user_id % 2 AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
),
a AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 0 THEN label ELSE 0 END) AS BIGINT) AS pos_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN arm = 1 THEN label ELSE 0 END) AS BIGINT) AS pos_b
  FROM e
)
SELECT n_a, pos_a, n_b, pos_b,
       CAST(pos_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
       CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
       (CAST(pos_a AS DOUBLE) / CAST(n_a AS DOUBLE))
         - (CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS diff,
       CASE WHEN n_a > 0 AND n_b > 0 AND pos_a + pos_b > 0
                 AND pos_a + pos_b < n_a + n_b THEN
         ((CAST(pos_a AS DOUBLE) / CAST(n_a AS DOUBLE))
           - (CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
         / sqrt((CAST(pos_a + pos_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                * (1.0 - (CAST(pos_a + pos_b AS DOUBLE)
                          / CAST(n_a + n_b AS DOUBLE)))
                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
       END AS z
FROM a
"""
    # first-order Markov backtest: argmax transitions on pre-cutoff
    # pairs, top-1 accuracy on post-cutoff pairs
    sqls["markov_backtest"] = """
WITH p0 AS (
  SELECT event_type AS from_type, epoch_us(ts) AS ts_us,
         lead(event_type) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) AS to_type
  FROM events
),
pairs AS (SELECT * FROM p0 WHERE to_type IS NOT NULL),
grid AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE ts_us < 1705881600000000 GROUP BY 1, 2
),
model AS (
  SELECT from_type, to_type AS predicted
  FROM (SELECT *, row_number() OVER (PARTITION BY from_type
          ORDER BY n DESC, to_type) AS r FROM grid)
  WHERE r = 1
),
test AS (SELECT * FROM pairs WHERE ts_us >= 1705881600000000)
SELECT t.from_type, m.predicted,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(COALESCE(sum(CASE WHEN t.to_type = m.predicted THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_hits,
       CAST(COALESCE(sum(CASE WHEN t.to_type = m.predicted THEN 1 ELSE 0 END), 0)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
FROM test t LEFT JOIN model m ON t.from_type = m.from_type
GROUP BY t.from_type, m.predicted
"""
    # quantized-IPW debiased hit rate over the rec_hitrate fold
    sqls["ipw_hitrate"] = """
WITH npart AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
recs AS (
  SELECT
    CAST(p_partkey AS VARCHAR) AS query_item_id,
    CASE
      WHEN p_partkey % 10 = 0 THEN NULL
      WHEN p_partkey % 13 = 0 THEN CAST([] AS VARCHAR[])
      ELSE list_transform(range(1, 5 + 1),
                          i -> CAST((p_partkey + i) % n AS VARCHAR))
    END AS rec_items,
    CASE WHEN p_partkey % 10 = 0 THEN 'ITEM_NOT_IN_DATASET' END AS error
  FROM part, npart
),
exploded AS (
  SELECT query_item_id, unnest(rec_items) AS rec_item
  FROM recs WHERE error IS NULL
),
m AS (
  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS u, CAST(l_partkey AS VARCHAR) AS i
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
truth AS (
  SELECT DISTINCT a.i AS qi, b.i AS ri
  FROM m a JOIN m b ON a.u = b.u AND a.i <> b.i
),
hits AS (
  SELECT e.query_item_id,
         CAST(count(*) AS BIGINT) AS n_recs,
         CAST(sum(CASE WHEN t.qi IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM exploded e
  LEFT JOIN truth t ON e.query_item_id = t.qi AND e.rec_item = t.ri
  GROUP BY e.query_item_id
),
pop AS (SELECT i AS item_id, CAST(count(DISTINCT u) AS BIGINT) AS pop FROM m GROUP BY i),
j AS (
  SELECT COALESCE(p.pop, 1) AS pop, h.n_hits, h.n_recs
  FROM hits h LEFT JOIN pop p ON h.query_item_id = p.item_id
),
w AS (
  SELECT pop, n_hits, n_recs,
         CAST(1000000 AS BIGINT) // greatest(pop, 1) AS wt
  FROM j
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(wt * n_hits) AS BIGINT) AS sum_w_num,
       CAST(sum(wt * n_recs) AS BIGINT) AS sum_w_den,
       CASE WHEN sum(wt * n_recs) > 0 THEN
         CAST(sum(wt * n_hits) AS DOUBLE) / CAST(sum(wt * n_recs) AS DOUBLE)
       END AS weighted_ratio,
       CASE WHEN sum(n_recs) > 0 THEN
         CAST(sum(n_hits) AS DOUBLE) / CAST(sum(n_recs) AS DOUBLE)
       END AS raw_ratio
FROM w
"""
    # skyline: independent NOT-EXISTS dominance formulation — must
    # agree exactly with the running-min-window implementation
    sqls["pareto_skyline"] = """
WITH pts AS (
  SELECT CAST(p_size AS BIGINT) AS size,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM part
),
cells AS (
  SELECT size, cents, CAST(count(*) AS BIGINT) AS n_at_point
  FROM pts GROUP BY size, cents
),
cand AS (
  SELECT p.size, p.min_cents, c.n_at_point, p.n_at_x
  FROM (
    SELECT size, min(cents) AS min_cents,
           CAST(sum(n_at_point) AS BIGINT) AS n_at_x
    FROM cells GROUP BY size
  ) p JOIN cells c ON p.size = c.size AND p.min_cents = c.cents
)
SELECT size, min_cents, n_at_point, n_at_x
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM cand d
  WHERE d.size > c.size AND d.min_cents <= c.min_cents
)
"""
    # PSI: identical fixed IEEE tree ((diff/(na*nb)) * ln * scale,
    # floored) over exact HUGEINT cross-products — quanta sum exactly
    sqls["psi_drift"] = """
WITH li AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           // 100000 AS bin,
         l_returnflag = 'R' AS ia
  FROM lineitem
),
cells AS (
  SELECT bin,
         sum(CASE WHEN ia THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN NOT ia THEN 1 ELSE 0 END) AS b
  FROM li GROUP BY bin
),
tot AS (SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b
        FROM cells),
g AS (
  SELECT a, b, n_a, n_b,
         CASE WHEN a > 0 AND b > 0 THEN
           CAST(floor(
             (CAST(CAST(a AS HUGEINT) * n_b - CAST(b AS HUGEINT) * n_a
                   AS DOUBLE)
              / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
             * ln((CAST(a AS DOUBLE) * CAST(n_b AS DOUBLE))
                  / (CAST(b AS DOUBLE) * CAST(n_a AS DOUBLE)))
             * 1000000000.0) AS BIGINT)
         ELSE 0 END AS q,
         CASE WHEN a > 0 AND b > 0 THEN 1 ELSE 0 END AS sh,
         CASE WHEN b = 0 THEN a ELSE 0 END AS oa,
         CASE WHEN a = 0 THEN b ELSE 0 END AS ob
  FROM cells, tot
)
SELECT n_a, n_b,
       CAST(sum(sh) AS BIGINT) AS n_bins_shared,
       CAST(sum(q) AS DOUBLE) / 1000000000.0 AS psi,
       CAST(sum(oa) AS BIGINT) AS only_a_num,
       CAST(sum(ob) AS BIGINT) AS only_b_num
FROM g GROUP BY n_a, n_b
"""
    # bitemporal as-of: HUGEINT mirrors the decimal(38,0) (valid, tx)
    # packing — both engines argmax the identical encoded key
    sqls["bitemporal_report"] = """
WITH log AS (
  SELECT o_custkey AS cust,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lv,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           + (o_orderkey % 7) AS ltx,
         o_orderpriority AS prio
  FROM orders
),
facts AS (
  SELECT o_custkey AS cust, o_orderkey AS fid,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS fv,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 10 AS ft
  FROM orders WHERE o_orderstatus = 'F'
),
cands AS (
  SELECT f.fid, l.prio, l.lv, l.ltx,
         CAST(l.lv AS HUGEINT) * CAST('10000000000000000000' AS HUGEINT)
           + CAST(l.ltx AS HUGEINT) AS enc
  FROM facts f JOIN log l
    ON f.cust = l.cust AND l.ltx <= f.ft AND l.lv <= f.fv
),
best AS (SELECT fid, max(enc) AS b FROM cands GROUP BY fid),
picked AS (
  SELECT c.prio, c.lv, c.ltx
  FROM cands c JOIN best ON c.fid = best.fid AND c.enc = best.b
)
SELECT prio, CAST(count(*) AS BIGINT) AS n_facts,
       CAST(sum(ltx - lv) AS BIGINT) AS sum_lag_days
FROM picked GROUP BY 1
"""
    # the materialized-shingle Jaccard is result-identical to the
    # recompute form — same oracle pins both physical strategies
    sqls["ngram_jaccard_materialized"] = sqls["ngram_jaccard_pairs"]
    # the stream-maintained KS grid must reproduce the batch statistic
    sqls["stream_ks_drift"] = sqls["ks_drift"]
    # materialized line dedup is result-identical to the recompute form
    sqls["line_dedup_materialized"] = sqls["line_dedup"]
    # the persisted-index IVF probe serves the same results as in-plan
    sqls["embedding_decontaminate"] = f"""
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
ho AS (SELECT v AS hv FROM e WHERE id % 50 = 0),
scored AS (
  SELECT e.id, {_COSINE.format(a='e.v', b='ho.hv')} AS s
  FROM e, ho
),
hits AS (
  SELECT id,
         CAST(sum(CASE WHEN s >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
         max(s) AS max_cosine
  FROM scored GROUP BY id
)
SELECT e.id, COALESCE(h.n_hits, 0) AS n_hits, h.max_cosine,
       COALESCE(h.n_hits, 0) = 0 AS keep
FROM e LEFT JOIN hits h USING (id)
"""
    sqls["sq8_cosine_topk"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
nr AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
cd AS (
  SELECT id,
         CASE WHEN nrm > 0
              THEN list_transform(v, x -> CAST(floor(127.0 * x / nrm) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS codes
  FROM nr
),
q AS (SELECT id AS q_id, codes AS qc FROM cd WHERE id % 50 = 0),
s AS (
  SELECT q.q_id, c.id AS n_id,
         CAST(list_dot_product(c.codes, q.qc) AS BIGINT) AS qdot
  FROM cd c, q WHERE c.id <> q.q_id
)
SELECT q_id, n_id, rank, qdot FROM (
  SELECT q_id, n_id,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY qdot DESC, n_id) AS BIGINT) AS rank,
         qdot
  FROM s
) WHERE rank <= 5
"""
    # MaxSim late interaction: exact int dots on the floor(v*1e6) grid
    # are <= 64 * (6e5)^2 ~ 2.3e13 and 8-token sums <= 1.9e14 — both
    # exactly representable integers in DuckDB's DOUBLE accumulation
    # (< 2^53), so list_dot_product replays Spark's int64 dot bit-for-bit
    sqls["maxsim_multivector"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
tok AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
  FROM e
),
q AS (SELECT doc_id AS q_id, tok AS q_tok, qv AS q_qv
      FROM tok WHERE doc_id % 10 = 0),
pairs AS (
  SELECT t.doc_id, q.q_id, q.q_tok,
         CAST(list_dot_product(t.qv, q.q_qv) AS BIGINT) AS dot
  FROM tok t, q
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
scores AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
)
SELECT q_id, doc_id, rank, score FROM (
  SELECT q_id, doc_id,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         score
  FROM scores WHERE doc_id <> q_id
) WHERE rank <= 5
"""
    # full serving stack: token-level SQ8-cosine probe (unit codes,
    # k=10 per query token) -> parent-doc candidates -> exact MaxSim
    sqls["maxsim_ann_pipeline"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
nr AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
cd AS (
  SELECT id,
         CASE WHEN nrm > 0
              THEN list_transform(v, x -> CAST(floor(127.0 * x / nrm) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS codes
  FROM nr
),
qc AS (SELECT id AS q_tok_id, codes AS qcodes FROM cd
       WHERE CAST(id // 8 AS BIGINT) % 10 = 0),
tokscore AS (
  SELECT q.q_tok_id, c.id AS n_tok_id,
         CAST(list_dot_product(c.codes, q.qcodes) AS BIGINT) AS qdot
  FROM cd c, qc q WHERE c.id <> q.q_tok_id
),
tokhits AS (
  SELECT q_tok_id, n_tok_id FROM (
    SELECT q_tok_id, n_tok_id,
           row_number() OVER (PARTITION BY q_tok_id
             ORDER BY qdot DESC, n_tok_id) AS rn
    FROM tokscore
  ) WHERE rn <= 10
),
cand AS (
  SELECT DISTINCT CAST(q_tok_id // 8 AS BIGINT) AS q_id,
                  CAST(n_tok_id // 8 AS BIGINT) AS doc_id
  FROM tokhits
  WHERE CAST(q_tok_id // 8 AS BIGINT) <> CAST(n_tok_id // 8 AS BIGINT)
),
tokq AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
  FROM e
),
qt AS (SELECT doc_id AS q_id, tok AS q_tok, qv AS q_qv
       FROM tokq WHERE doc_id % 10 = 0),
pairs AS (
  SELECT c.doc_id, c.q_id, qt.q_tok,
         CAST(list_dot_product(t.qv, qt.q_qv) AS BIGINT) AS dot
  FROM cand c
  JOIN tokq t ON t.doc_id = c.doc_id
  JOIN qt ON qt.q_id = c.q_id
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
scores AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
)
SELECT q_id, doc_id,
       CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       score
FROM scores
"""
    # multi-vector near-dup: 6-bit RP-LSH token blocking (symmetric by
    # construction), directed MaxSim over candidate (q, doc) pairs,
    # conservative min-symmetrization, global top-20
    sqls["maxsim_neardup"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
edim AS (
  SELECT id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
dots AS (
  SELECT id,
         sum(iv * (((dim + 1) * 12345) % 2001 - 1000)) AS d0,
         sum(iv * (((dim + 1) * 21521) % 2001 - 1000)) AS d1,
         sum(iv * (((dim + 1) * 30697) % 2001 - 1000)) AS d2,
         sum(iv * (((dim + 1) * 39873) % 2001 - 1000)) AS d3,
         sum(iv * (((dim + 1) * 49049) % 2001 - 1000)) AS d4,
         sum(iv * (((dim + 1) * 58225) % 2001 - 1000)) AS d5
  FROM edim GROUP BY id
),
bk AS (SELECT id,
         (CASE WHEN d0 >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN d1 >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN d2 >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN d3 >= 0 THEN 8 ELSE 0 END)
       + (CASE WHEN d4 >= 0 THEN 16 ELSE 0 END)
       + (CASE WHEN d5 >= 0 THEN 32 ELSE 0 END) AS bucket
       FROM dots),
cand AS (
  SELECT DISTINCT CAST(a.id // 8 AS BIGINT) AS q_id,
                  CAST(b.id // 8 AS BIGINT) AS doc_id
  FROM bk a JOIN bk b ON a.bucket = b.bucket
  WHERE CAST(a.id // 8 AS BIGINT) <> CAST(b.id // 8 AS BIGINT)
),
tokq AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
  FROM e
),
pairs AS (
  SELECT c.doc_id, c.q_id, qt.tok AS q_tok,
         CAST(list_dot_product(t.qv, qt.qv) AS BIGINT) AS dot
  FROM cand c
  JOIN tokq t ON t.doc_id = c.doc_id
  JOIN tokq qt ON qt.doc_id = c.q_id
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
directed AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
),
ab AS (SELECT q_id AS id_a, doc_id AS id_b, score AS score_ab
       FROM directed WHERE q_id < doc_id),
ba AS (SELECT doc_id AS id_a, q_id AS id_b, score AS score_ba
       FROM directed WHERE q_id > doc_id),
sym AS (
  SELECT ab.id_a, ab.id_b, ab.score_ab, ba.score_ba,
         CAST(row_number() OVER (
           ORDER BY least(ab.score_ab, ba.score_ba) DESC,
                    ab.id_a, ab.id_b) AS BIGINT) AS sym_rank
  FROM ab JOIN ba ON ab.id_a = ba.id_a AND ab.id_b = ba.id_b
)
SELECT id_a, id_b, score_ab, score_ba, sym_rank
FROM sym WHERE sym_rank <= 20
"""
    # anisotropic-fixture variant: the clustered transform is exact
    # int64 centroid arithmetic + two IEEE double mul-adds, replayed
    # per-dim; auto_n_bits(500, 8) = 6 at both gate SFs, so the
    # static SQL unrolls 6 signature bits (sf0.1 is a scale
    # measurement, not an oracle gate — the Spark side auto-sizes)
    sqls["maxsim_neardup_clustered"] = """
WITH e0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
ed AS (
  SELECT id, CAST(u.i - 1 AS BIGINT) AS dim,
         (CAST((((id // 32) + 1) * ((u.i - 1) + 7) * 1103515245) % 2001
               - 1000 AS DOUBLE) / 1000.0) * 0.75
         + v[u.i] * 0.25 AS cv
  FROM e0, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
edim AS (
  SELECT id, dim, CAST(floor(cv * 1000000.0) AS BIGINT) AS iv FROM ed
),
dots AS (
  SELECT id,
         sum(iv * (((dim + 1) * 12345) % 2001 - 1000)) AS d0,
         sum(iv * (((dim + 1) * 21521) % 2001 - 1000)) AS d1,
         sum(iv * (((dim + 1) * 30697) % 2001 - 1000)) AS d2,
         sum(iv * (((dim + 1) * 39873) % 2001 - 1000)) AS d3,
         sum(iv * (((dim + 1) * 49049) % 2001 - 1000)) AS d4,
         sum(iv * (((dim + 1) * 58225) % 2001 - 1000)) AS d5
  FROM edim GROUP BY id
),
bk AS (SELECT id,
         (CASE WHEN d0 >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN d1 >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN d2 >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN d3 >= 0 THEN 8 ELSE 0 END)
       + (CASE WHEN d4 >= 0 THEN 16 ELSE 0 END)
       + (CASE WHEN d5 >= 0 THEN 32 ELSE 0 END) AS bucket
       FROM dots),
cand AS (
  SELECT DISTINCT CAST(a.id // 8 AS BIGINT) AS q_id,
                  CAST(b.id // 8 AS BIGINT) AS doc_id
  FROM bk a JOIN bk b ON a.bucket = b.bucket
  WHERE CAST(a.id // 8 AS BIGINT) <> CAST(b.id // 8 AS BIGINT)
),
tokq AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list(CAST(floor(cv * 1000000.0) AS BIGINT) ORDER BY dim) AS qv
  FROM ed GROUP BY 1, 2
),
pairs AS (
  SELECT c.doc_id, c.q_id, qt.tok AS q_tok,
         CAST(list_dot_product(t.qv, qt.qv) AS BIGINT) AS dot
  FROM cand c
  JOIN tokq t ON t.doc_id = c.doc_id
  JOIN tokq qt ON qt.doc_id = c.q_id
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
directed AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
),
ab AS (SELECT q_id AS id_a, doc_id AS id_b, score AS score_ab
       FROM directed WHERE q_id < doc_id),
ba AS (SELECT doc_id AS id_a, q_id AS id_b, score AS score_ba
       FROM directed WHERE q_id > doc_id),
sym AS (
  SELECT ab.id_a, ab.id_b, ab.score_ab, ba.score_ba,
         CAST(row_number() OVER (
           ORDER BY least(ab.score_ab, ba.score_ba) DESC,
                    ab.id_a, ab.id_b) AS BIGINT) AS sym_rank
  FROM ab JOIN ba ON ab.id_a = ba.id_a AND ab.id_b = ba.id_b
)
SELECT id_a, id_b, score_ab, score_ba, sym_rank
FROM sym WHERE sym_rank <= 20
"""
    # two-stage retrieve-then-rerank: pooled per-dim int sums (<= 8·6e5
    # per dim; pooled dots <= 1.5e15 — still exact-integer DOUBLEs),
    # top-20 by pooled dot, exact MaxSim over exactly those pairs
    sqls["maxsim_rerank"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
tokq AS (
  SELECT CAST(id // 8 AS BIGINT) AS doc_id, CAST(id % 8 AS BIGINT) AS tok,
         list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
  FROM e
),
dimsum AS (
  SELECT doc_id, u.i AS dim, CAST(sum(qv[u.i]) AS BIGINT) AS s
  FROM tokq, LATERAL (SELECT unnest(range(1, len(qv) + 1)) AS i) u
  GROUP BY doc_id, u.i
),
pooled AS (
  SELECT doc_id, list(s ORDER BY dim) AS pv FROM dimsum GROUP BY doc_id
),
qp AS (SELECT doc_id AS q_id, pv AS q_pv FROM pooled WHERE doc_id % 10 = 0),
cand AS (
  SELECT q_id, doc_id FROM (
    SELECT p.doc_id, qp.q_id,
           row_number() OVER (PARTITION BY qp.q_id
             ORDER BY CAST(list_dot_product(p.pv, qp.q_pv) AS BIGINT) DESC,
                      p.doc_id) AS rn
    FROM pooled p, qp WHERE p.doc_id <> qp.q_id
  ) WHERE rn <= 20
),
qt AS (SELECT doc_id AS q_id, tok AS q_tok, qv AS q_qv
       FROM tokq WHERE doc_id % 10 = 0),
pairs AS (
  SELECT c.doc_id, c.q_id, qt.q_tok,
         CAST(list_dot_product(t.qv, qt.q_qv) AS BIGINT) AS dot
  FROM cand c
  JOIN tokq t ON t.doc_id = c.doc_id
  JOIN qt ON qt.q_id = c.q_id
),
per_tok AS (
  SELECT doc_id, q_id, q_tok, max(dot) AS best
  FROM pairs GROUP BY doc_id, q_id, q_tok
),
scores AS (
  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
  FROM per_tok GROUP BY q_id, doc_id
)
SELECT q_id, doc_id,
       CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       score
FROM scores
"""
    # refined IVF: every centroid coordinate (seed and both Lloyd
    # rounds) is CAST(sum_e6 AS DOUBLE)/n — one IEEE division of two
    # exact integers, identical cross-engine; assignments replay the
    # canonical (score desc, block asc) tie-break
    sqls["ivf_refined_probe"] = f"""
WITH {_CENTROID_CTE.lstrip()},
c0 AS (
  SELECT block, list(CAST(sum_e6 AS DOUBLE) / n ORDER BY dim) AS centroid
  FROM centroid_sums GROUP BY block
),
a1 AS (
  SELECT id, v, block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC,
                      c.block) AS rn
    FROM ev, c0 c
  ) WHERE rn = 1
),
s1 AS (
  SELECT block, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(sum(CAST(floor(v[u.i] * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sum_e6,
         count(*) AS n
  FROM a1, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
  GROUP BY block, u.i
),
c1 AS (
  SELECT block, list(CAST(sum_e6 AS DOUBLE) / n ORDER BY dim) AS centroid
  FROM s1 GROUP BY block
),
a2 AS (
  SELECT id, v, block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC,
                      c.block) AS rn
    FROM ev, c1 c
  ) WHERE rn = 1
),
s2 AS (
  SELECT block, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(sum(CAST(floor(v[u.i] * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sum_e6,
         count(*) AS n
  FROM a2, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
  GROUP BY block, u.i
),
c2 AS (
  SELECT block, list(CAST(sum_e6 AS DOUBLE) / n ORDER BY dim) AS centroid
  FROM s2 GROUP BY block
),
corpus AS (
  SELECT id, v, block AS cell FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC,
                      c.block) AS rn
    FROM ev, c2 c
  ) WHERE rn = 1
),
qp AS (
  SELECT id, v, block AS cell FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (PARTITION BY ev.vec_id
             ORDER BY {_COSINE.format(a='ev.v', b='c.centroid')} DESC,
                      c.block) AS rn
    FROM ev, c2 c
  ) WHERE rn <= 2
),
q AS (SELECT * FROM qp WHERE id % 50 = 0),
scored AS (
  SELECT q.id AS q_id, a.id AS n_id,
         {_COSINE.format(a='q.v', b='a.v')} AS score
  FROM q JOIN corpus a ON a.cell = q.cell AND a.id <> q.id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, n_id) AS rank
  FROM scored
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 5
"""
    sqls["ivf_index_probe"] = sqls["ivf_probe_topk"]
    # multi-probe: identical derivation, but each QUERY keeps its top-2
    # cells (corpus assignment stays rn = 1 — a vector lives in one list)
    sqls["ivf_multiprobe"] = sqls["ivf_probe_topk"].replace(
        """q AS (SELECT * FROM assigned WHERE id % 50 = 0),""",
        """qp AS (
  SELECT id, v, block AS assigned_block FROM (
    SELECT ev.vec_id AS id, ev.v, c.block,
           row_number() OVER (
             PARTITION BY ev.vec_id
             ORDER BY """ + _COSINE.format(a='ev.v', b='c.centroid')
        + """ DESC, c.block
           ) AS rn
    FROM ev, centroids c
  ) WHERE rn <= 2
),
q AS (SELECT * FROM qp WHERE id % 50 = 0),""",
    )
    # HNSW-style graph ANN: the oracle replays BOTH the deterministic
    # two-layer build (per-block top-4 exact-int kNN edges + 2
    # cross-block hub links) and the 2-round ef=6 beam search, each
    # sum CAST to BIGINT immediately (DuckDB widens sums to HUGEINT)
    sqls["hnsw_topk"] = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
qd AS (
  SELECT id, CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS iv
  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
),
dots AS (
  SELECT id,
         sum(iv * (((dim + 1) * 12345) % 2001 - 1000)) AS d0,
         sum(iv * (((dim + 1) * 21521) % 2001 - 1000)) AS d1,
         sum(iv * (((dim + 1) * 30697) % 2001 - 1000)) AS d2,
         sum(iv * (((dim + 1) * 39873) % 2001 - 1000)) AS d3,
         sum(iv * (((dim + 1) * 49049) % 2001 - 1000)) AS d4,
         sum(iv * (((dim + 1) * 58225) % 2001 - 1000)) AS d5,
         sum(iv * (((dim + 1) * 67401) % 2001 - 1000)) AS d6,
         sum(iv * (((dim + 1) * 76577) % 2001 - 1000)) AS d7,
         sum(iv * (((dim + 1) * 85753) % 2001 - 1000)) AS d8,
         sum(iv * (((dim + 1) * 94929) % 2001 - 1000)) AS d9,
         sum(iv * (((dim + 1) * 104105) % 2001 - 1000)) AS d10,
         sum(iv * (((dim + 1) * 113281) % 2001 - 1000)) AS d11,
         sum(iv * (((dim + 1) * 122457) % 2001 - 1000)) AS d12,
         sum(iv * (((dim + 1) * 131633) % 2001 - 1000)) AS d13,
         sum(iv * (((dim + 1) * 140809) % 2001 - 1000)) AS d14,
         sum(iv * (((dim + 1) * 149985) % 2001 - 1000)) AS d15
  FROM qd GROUP BY id
),
bk AS (
  SELECT id,
       CAST((CASE WHEN d0 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d1 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d2 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d3 >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS t0,
       CAST((CASE WHEN d4 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d5 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d6 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d7 >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS t1,
       CAST((CASE WHEN d8 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d9 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d10 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d11 >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS t2,
       CAST((CASE WHEN d12 >= 0 THEN 1 ELSE 0 END) + (CASE WHEN d13 >= 0 THEN 2 ELSE 0 END) + (CASE WHEN d14 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d15 >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS t3
  FROM dots
),
cand AS (
  SELECT a.id AS src, b.id AS dst
  FROM bk a JOIN bk b ON b.t0 = a.t0 AND b.id <> a.id
  UNION
  SELECT a.id AS src, b.id AS dst
  FROM bk a JOIN bk b ON b.t1 = a.t1 AND b.id <> a.id
  UNION
  SELECT a.id AS src, b.id AS dst
  FROM bk a JOIN bk b ON b.t2 = a.t2 AND b.id <> a.id
  UNION
  SELECT a.id AS src, b.id AS dst
  FROM bk a JOIN bk b ON b.t3 = a.t3 AND b.id <> a.id
),
cd AS (
  SELECT c.src, c.dst, CAST(sum(qa.iv * qb.iv) AS BIGINT) AS qdot
  FROM cand c JOIN qd qa ON qa.id = c.src
  JOIN qd qb ON qb.id = c.dst AND qb.dim = qa.dim
  GROUP BY 1, 2
),
out_m AS (
  SELECT src, dst, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY src ORDER BY qdot DESC, dst) AS rn
    FROM cd) WHERE rn <= 12
),
sym AS (SELECT src, dst, qdot FROM out_m
        UNION SELECT dst, src, qdot FROM out_m),
loc_e AS (
  SELECT src, dst FROM (
    SELECT *, row_number() OVER (PARTITION BY src ORDER BY qdot DESC, dst) AS rn
    FROM sym) WHERE rn <= 24
),
hubs AS (
  SELECT 0 AS htab, t0 AS hblk, min(id) AS hub FROM bk GROUP BY 2
  UNION ALL SELECT 1, t1, min(id) FROM bk GROUP BY 2
  UNION ALL SELECT 2, t2, min(id) FROM bk GROUP BY 2
  UNION ALL SELECT 3, t3, min(id) FROM bk GROUP BY 2
),
uhubs AS (SELECT DISTINCT hub FROM hubs),
crossp AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a.id AS src, h.hub AS dst
    FROM bk a JOIN hubs h ON h.htab = 0 AND h.hblk <> a.t0
    UNION ALL SELECT a.id, h.hub
    FROM bk a JOIN hubs h ON h.htab = 1 AND h.hblk <> a.t1
    UNION ALL SELECT a.id, h.hub
    FROM bk a JOIN hubs h ON h.htab = 2 AND h.hblk <> a.t2
    UNION ALL SELECT a.id, h.hub
    FROM bk a JOIN hubs h ON h.htab = 3 AND h.hblk <> a.t3
  )
),
crossd AS (
  SELECT c.src, c.dst, CAST(sum(qa.iv * qb.iv) AS BIGINT) AS qdot
  FROM crossp c JOIN qd qa ON qa.id = c.src
  JOIN qd qb ON qb.id = c.dst AND qb.dim = qa.dim
  GROUP BY 1, 2
),
cross_e AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY qdot DESC, dst) AS rn
    FROM crossd) WHERE rn <= 2
),
edges AS (SELECT src, dst FROM loc_e UNION SELECT src, dst FROM cross_e),
qs AS (SELECT id, dim, iv FROM qd WHERE id % 50 = 0),
b0s AS (
  SELECT q.id AS q_id, h.hub AS n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM qs q JOIN uhubs h ON TRUE
  JOIN qd n ON n.id = h.hub AND n.dim = q.dim
  GROUP BY 1, 2
),
beam0 AS (
  SELECT q_id, n_id, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn FROM b0s) WHERE rn <= 16
),
exp1 AS (SELECT DISTINCT b.q_id, ed.dst AS n_id
         FROM beam0 b JOIN edges ed ON ed.src = b.n_id),
sc1 AS (
  SELECT x.q_id, x.n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM exp1 x JOIN qs q ON q.id = x.q_id
  JOIN qd n ON n.id = x.n_id AND n.dim = q.dim
  GROUP BY 1, 2
),
m1 AS (SELECT q_id, n_id, CAST(max(qdot) AS BIGINT) AS qdot
       FROM (SELECT * FROM beam0 UNION ALL SELECT * FROM sc1)
       GROUP BY 1, 2),
beam1 AS (
  SELECT q_id, n_id, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn FROM m1) WHERE rn <= 16
),
exp2 AS (SELECT DISTINCT b.q_id, ed.dst AS n_id
         FROM beam1 b JOIN edges ed ON ed.src = b.n_id),
sc2 AS (
  SELECT x.q_id, x.n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM exp2 x JOIN qs q ON q.id = x.q_id
  JOIN qd n ON n.id = x.n_id AND n.dim = q.dim
  GROUP BY 1, 2
),
m2 AS (SELECT q_id, n_id, CAST(max(qdot) AS BIGINT) AS qdot
       FROM (SELECT * FROM beam1 UNION ALL SELECT * FROM sc2)
       GROUP BY 1, 2),
beam2 AS (
  SELECT q_id, n_id, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn FROM m2) WHERE rn <= 16
),
exp3 AS (SELECT DISTINCT b.q_id, ed.dst AS n_id
         FROM beam2 b JOIN edges ed ON ed.src = b.n_id),
sc3 AS (
  SELECT x.q_id, x.n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM exp3 x JOIN qs q ON q.id = x.q_id
  JOIN qd n ON n.id = x.n_id AND n.dim = q.dim
  GROUP BY 1, 2
),
m3 AS (SELECT q_id, n_id, CAST(max(qdot) AS BIGINT) AS qdot
       FROM (SELECT * FROM beam2 UNION ALL SELECT * FROM sc3)
       GROUP BY 1, 2),
beam3 AS (
  SELECT q_id, n_id, qdot FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn FROM m3) WHERE rn <= 16
)
SELECT q_id, n_id, rank, qdot FROM (
  SELECT q_id, n_id,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY qdot DESC, n_id) AS BIGINT) AS rank,
         qdot
  FROM beam3 WHERE n_id <> q_id
) WHERE rank <= 5
"""
    # streaming law: maintained edges == the batch out_m stage of the
    # hnsw pyramid above (prefix reuse, new final select)
    _hnsw_outm_prefix = sqls["hnsw_topk"].split(
        "\nsym AS (SELECT src, dst, qdot FROM out_m"
    )[0].rstrip().rstrip(",")
    sqls["stream_hnsw_edges"] = (
        _hnsw_outm_prefix + "\nSELECT src, dst, qdot FROM out_m\n"
    )
    # compaction must be invisible to the assembled edge set: same law,
    # same oracle (build via two folds + compact instead of a stream)
    sqls["hnsw_compact"] = sqls["stream_hnsw_edges"]
    # recall@5 of the beam search vs the EXACT quantized-int top-5 —
    # shares the whole build+search pyramid above, adds the exact
    # ground truth and the per-query intersection count
    _hnsw_prefix = sqls["hnsw_topk"].split(
        "SELECT q_id, n_id, rank, qdot FROM ("
    )[0]
    sqls["hnsw_recall"] = _hnsw_prefix + """, hn AS (
  SELECT q_id, n_id FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn
    FROM beam3 WHERE n_id <> q_id) WHERE rn <= 5
),
exact_s AS (
  SELECT q.id AS q_id, n.id AS n_id, CAST(sum(q.iv * n.iv) AS BIGINT) AS qdot
  FROM qs q JOIN qd n ON n.dim = q.dim AND n.id <> q.id
  GROUP BY 1, 2
),
exact5 AS (
  SELECT q_id, n_id FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id
             ORDER BY qdot DESC, n_id) AS rn
    FROM exact_s) WHERE rn <= 5
)
SELECT e.q_id,
       CAST(count(h.n_id) AS BIGINT) AS n_hits,
       CAST(count(h.n_id) AS BIGINT) / 5.0 AS recall_at_5
FROM exact5 e LEFT JOIN hn h ON h.q_id = e.q_id AND h.n_id = e.n_id
GROUP BY 1
"""
    # likewise the two-stage partial top-k vs the window form
    sqls["ann_topk_partial"] = sqls["ann_topk"]
    # LSH-prefiltered variant (VERDICT r7 item 3): same verdict, but
    # only corpus rows sharing >=1 of the 4 RP-LSH table buckets with
    # a held-out row are scored. The oracle REPLAYS the prefilter
    # (the hnsw signature CTEs, identical hyperplane constants) so
    # Spark and DuckDB agree bit-for-bit even where the prefilter
    # trades away a non-candidate's sub-threshold max_cosine.
    _bk_prefix = (
        sqls["hnsw_topk"].split("\ncand AS (")[0].rstrip().rstrip(",")
    )
    sqls["embedding_decontaminate_lsh"] = _bk_prefix + f""",
ho AS (SELECT v AS hv FROM e WHERE id % 50 = 0),
cands AS (
  SELECT a.id FROM bk a
  WHERE EXISTS (SELECT 1 FROM bk h WHERE h.id % 50 = 0 AND
        (h.t0 = a.t0 OR h.t1 = a.t1 OR h.t2 = a.t2 OR h.t3 = a.t3))
),
scored AS (
  SELECT c.id, {_COSINE.format(a='ev.v', b='ho.hv')} AS s
  FROM cands c JOIN e ev ON ev.id = c.id, ho
),
hits AS (
  SELECT id,
         CAST(sum(CASE WHEN s >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
         max(s) AS max_cosine
  FROM scored GROUP BY id
)
SELECT e.id, COALESCE(h.n_hits, 0) AS n_hits, h.max_cosine,
       COALESCE(h.n_hits, 0) = 0 AS keep
FROM e LEFT JOIN hits h USING (id)
"""
    # merge_upsert == FULL OUTER JOIN + clause CASEs (update when
    # matched, insert when source-only, keep when target-only)
    sqls["merge_upsert"] = """
WITH t AS (
  SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS nk,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
  FROM customer
),
rev AS (
  SELECT o_custkey AS k, CAST(o_custkey % 25 AS BIGINT) AS nk,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS bal_cents
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998 GROUP BY 1
),
s AS (
  SELECT * FROM rev
  UNION ALL
  SELECT k + 10000000, nk, bal_cents FROM rev
)
SELECT COALESCE(t.k, s.k) AS k,
       CASE WHEN s.k IS NOT NULL THEN s.nk ELSE t.nk END AS nk,
       CASE WHEN s.k IS NOT NULL THEN s.bal_cents ELSE t.bal_cents
            END AS bal_cents
FROM t FULL OUTER JOIN s ON t.k = s.k
"""
    # variant drift scan == relational reconstruction of the fixture
    sqls["variant_drift_scan"] = """
WITH n AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
k AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part)
SELECT
  CASE WHEN k % 10 = 0 OR k % 3 = 0
            OR NOT (k % 17 = 0) THEN CAST(k AS VARCHAR) END AS item_id,
  CASE WHEN k % 10 <> 0 AND (k % 3 = 0 OR k % 17 <> 0)
       THEN CAST(2 AS BIGINT) END AS n_recs,
  CASE WHEN k % 10 <> 0 AND (k % 3 = 0 OR k % 17 <> 0)
       THEN CAST((k + 1) % n.n AS VARCHAR) END AS first_rec,
  CASE WHEN k % 10 = 0 THEN 'ITEM_NOT_IN_DATASET' END AS error,
  CASE WHEN k % 10 = 0 THEN FALSE
       WHEN k % 3 = 0 THEN TRUE
       WHEN k % 17 = 0 THEN NULL
       ELSE FALSE END AS drift,
  (k % 10 <> 0 AND k % 3 <> 0 AND k % 17 = 0) AS is_corrupt
FROM k, n
"""
    # stream running stats == batch aggregate (drain-and-keep-last law)
    sqls["stream_running_stats"] = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(epoch_us(ts)) AS BIGINT) AS first_ts_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us
FROM events
GROUP BY 1
"""
    # FS linkage + kfold: identical bigint arithmetic in SQL
    sqls["linkage_fs"] = """
WITH c AS (
  SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS nk,
         c_mktsegment AS seg,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal,
         CAST(length(c_name) AS BIGINT) AS nlen
  FROM customer
),
pairs AS (
  SELECT (abs(a.bal - b.bal) <= 10000) AS agree_balband,
         (a.k % 97 = b.k % 97) AS agree_keymod,
         (a.nlen = b.nlen) AS agree_namelen
  FROM c a JOIN c b
    ON a.nk = b.nk AND a.seg = b.seg
   AND a.k // 5000 = b.k // 5000 AND a.k < b.k
),
scored AS (
  SELECT CAST(
           CASE WHEN agree_balband THEN 4169925 ELSE -3247928 END
         + CASE WHEN agree_keymod THEN 3087462 ELSE -2584963 END
         + CASE WHEN agree_namelen THEN 1222392 ELSE -1222393 END
         AS BIGINT) AS score_micro
  FROM pairs
)
SELECT CASE WHEN score_micro >= 4000000 THEN 'match'
            WHEN score_micro < 0 THEN 'non_match'
            ELSE 'possible' END AS decision,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(score_micro) AS BIGINT) AS score_sum
FROM scored GROUP BY 1
"""
    sqls["kfold_report"] = """
SELECT o_orderpriority AS priority,
       CAST(((o_custkey % 2147483647) * 48271 % 2147483647) % 5 AS INT) AS fold,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_keys
FROM orders
GROUP BY 1, 2
"""
    sqls["annotator_kappa"] = """
WITH l AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 'hot' ELSE 'cold' END AS a,
         CASE WHEN o_custkey % 3 = 0 THEN 'hot' ELSE 'cold' END AS b
  FROM orders
),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM l GROUP BY 1, 2),
na AS (SELECT a, sum(c) AS na FROM cells GROUP BY 1),
nb AS (SELECT b, sum(c) AS nb FROM cells GROUP BY 1),
pe AS (
  SELECT CAST(COALESCE(sum(na.na * nb.nb), 0) AS BIGINT) AS pe_num
  FROM na JOIN nb ON na.a = nb.b
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree
  FROM cells
)
SELECT n, n_agree,
       CAST(n * n_agree - pe_num AS BIGINT) AS kappa_num,
       CAST(n * n - pe_num AS BIGINT) AS kappa_den,
       CASE WHEN n * n - pe_num <> 0
            THEN CAST(n * n_agree - pe_num AS DOUBLE)
                 / CAST(n * n - pe_num AS DOUBLE) END AS kappa
FROM tot, pe
"""
    sqls["score_ece"] = """
WITH s AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
),
bins AS (
  SELECT score // 500 AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(y) AS BIGINT) AS pos_b
  FROM s GROUP BY 1
),
agg AS (
  SELECT CAST(sum(n_b) AS BIGINT) AS n,
         CAST(sum(abs(2 * 10000 * pos_b - n_b * (2 * 500 * bin + 500)))
              AS BIGINT) AS ece_num
  FROM bins
)
SELECT n, ece_num,
       CAST(2 * 10000 * n AS BIGINT) AS ece_den,
       CASE WHEN n > 0
            THEN CAST(ece_num AS DOUBLE) / CAST(2 * 10000 * n AS DOUBLE)
       END AS ece
FROM agg
"""
    sqls["revenue_changepoint"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
pre AS (
  SELECT day, v,
         CAST(row_number() OVER w AS BIGINT) AS i,
         CAST(sum(v) OVER w AS BIGINT) AS s,
         CAST(sum(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)))
              OVER w AS DECIMAL(38,0)) AS q
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sn,
         CAST(sum(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS qn
  FROM daily
),
cand AS (
  SELECT day, i, s, q, n, sn, qn,
         (CAST(q AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(i AS DOUBLE))
         + (CAST(qn - q AS DOUBLE)
            - CAST(sn - s AS DOUBLE) * CAST(sn - s AS DOUBLE)
              / CAST(n - i AS DOUBLE)) AS cost,
         CAST(qn AS DOUBLE)
         - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)
           AS c0
  FROM pre, tot
  WHERE i < n
),
best AS (SELECT * FROM cand ORDER BY cost, day LIMIT 1)
SELECT strftime(day, '%Y-%m-%d') AS split_day,
       i AS n_left,
       CAST(n - i AS BIGINT) AS n_right,
       s AS sum_left,
       CAST(sn - s AS BIGINT) AS sum_right,
       cost,
       c0 - cost AS gain
FROM best
"""
    # incremental LSH maintenance == batch recompute (delta law)
    sqls["stream_minhash_lsh"] = sqls["minhash_lsh"]
    sqls["seasonal_decompose"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, v,
         CAST(SUM(v) OVER w AS BIGINT) AS trend_num,
         COUNT(*) OVER w AS wn,
         CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT day, v, trend_num, dow,
         CAST(7 * v - trend_num AS BIGINT) AS d
  FROM win WHERE wn = 7
),
slots AS (
  SELECT dow, CAST(SUM(d) AS BIGINT) AS seasonal_num,
         CAST(COUNT(*) AS BIGINT) AS slot_cnt
  FROM detr GROUP BY dow
)
SELECT CAST(t.day AS VARCHAR) AS day, t.v, t.trend_num, t.dow,
       s.seasonal_num, s.slot_cnt,
       -- decimal internal, BIGINT emitted: a DECIMAL in a final SELECT
       -- converts engine-dependently across DuckDB/pandas versions
       CAST(CAST(CAST(t.d AS DECIMAL(38,0)) * CAST(s.slot_cnt AS DECIMAL(38,0))
            - CAST(s.seasonal_num AS DECIMAL(38,0)) AS DECIMAL(38,0))
         AS BIGINT) AS residual_num
FROM detr t JOIN slots s USING (dow)
"""
    sqls["als_user_step"] = """
WITH ratings AS (
  SELECT CAST(o.o_custkey AS BIGINT) AS u,
         CAST(l.l_partkey AS BIGINT) AS i,
         CAST(l.l_quantity AS HUGEINT) AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
factors AS (
  SELECT i, CAST(i % 1000 AS HUGEINT) AS f1,
         CAST((i * 7 + 3) % 1000 AS HUGEINT) AS f2
  FROM (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS i FROM lineitem)
),
agg AS (
  SELECT r.u, CAST(COUNT(*) AS BIGINT) AS n_items,
         SUM(f.f1 * f.f1) AS s11, SUM(f.f1 * f.f2) AS s12,
         SUM(f.f2 * f.f2) AS s22,
         SUM(f.f1 * r.r) AS b1, SUM(f.f2 * r.r) AS b2
  FROM ratings r JOIN factors f ON r.i = f.i
  GROUP BY r.u
)
SELECT u AS user_id, n_items,
  1000.0 * (CAST((s22 + 100000) * b1 - s12 * b2 AS DOUBLE)
            / CAST((s11 + 100000) * (s22 + 100000)
                   - s12 * s12 AS DOUBLE)) AS u1,
  1000.0 * (CAST((s11 + 100000) * b2 - s12 * b1 AS DOUBLE)
            / CAST((s11 + 100000) * (s22 + 100000)
                   - s12 * s12 AS DOUBLE)) AS u2
FROM agg
"""
    sqls["shapley_attribution"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
              WHEN 'signup' THEN 4 WHEN 'error' THEN 8
              ELSE 0 END) AS BIGINT) AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
grid AS (
  SELECT mask, CAST(SUM(conv) AS BIGINT) AS n_conv
  FROM per_user GROUP BY mask
),
s_grid AS (SELECT CAST(range AS BIGINT) AS s FROM range(16)),
v AS (
  SELECT s, CAST(COALESCE(SUM(g.n_conv), 0) AS BIGINT) AS v
  FROM s_grid LEFT JOIN grid g ON (g.mask & s_grid.s) = g.mask
  GROUP BY s
),
chan AS (SELECT * FROM (VALUES (0, 'click'), (1, 'view'),
                               (2, 'signup'), (3, 'error')) t(i, channel)),
pairs AS (
  SELECT c.i, c.channel, v0.s AS s0, v0.v AS v0
  FROM chan c JOIN v v0 ON (v0.s & (1 << c.i)) = 0
),
wu AS (
  SELECT p.*, v1.v AS v1
  FROM pairs p JOIN v v1 ON v1.s = p.s0 + (1 << p.i)
)
SELECT channel,
  CAST(SUM((CASE bit_count(CAST(s0 AS BIGINT))
            WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
            WHEN 3 THEN 6 END) * (v1 - v0)) AS BIGINT) AS phi_num,
  CAST(24 AS BIGINT) AS phi_den,
  CAST(CAST(SUM((CASE bit_count(CAST(s0 AS BIGINT))
            WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
            WHEN 3 THEN 6 END) * (v1 - v0)) AS BIGINT) AS DOUBLE)
    / 24.0 AS phi
FROM wu GROUP BY channel
"""
    sqls["stream_conformal"] = """
WITH scored AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s
  FROM events WHERE event_type = 'purchase'
),
cells AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c FROM scored GROUP BY s),
ranked AS (
  SELECT s,
         CAST(SUM(c) OVER (ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM cells
),
wk AS (SELECT *, CAST((9 * (n + 1) + 9) // 10 AS BIGINT) AS k FROM ranked)
SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
       CAST(MIN(CASE WHEN cum >= k THEN s END) AS BIGINT) AS threshold
FROM wk
"""
    sqls["bpe_train"] = _bpe_oracle_sql(8)
    sqls["bpe_vocab"] = _bpe_vocab_oracle_sql(8)
    sqls["conformal_threshold"] = """
WITH scored AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s
  FROM events WHERE value IS NOT NULL
),
cells AS (
  SELECT event_type, s, CAST(COUNT(*) AS BIGINT) AS c
  FROM scored GROUP BY event_type, s
),
ranked AS (
  SELECT event_type, s,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM cells
),
with_k AS (
  SELECT *, CAST((9 * (n + 1) + 9) // 10 AS BIGINT) AS k FROM ranked
),
picked AS (
  SELECT event_type, n, k, CAST(MIN(s) AS BIGINT) AS threshold
  FROM with_k WHERE cum >= k GROUP BY event_type, n, k
),
base AS (SELECT DISTINCT event_type, n, k FROM with_k)
SELECT b.event_type, b.n, b.k, p.threshold
FROM base b LEFT JOIN picked p
  ON b.event_type = p.event_type AND b.n = p.n AND b.k = p.k
"""
    sqls["js_drift"] = """
WITH li AS (
  SELECT CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              // 100000 AS BIGINT) AS bin,
         l_returnflag
  FROM lineitem
),
cells AS (
  SELECT bin,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM li GROUP BY bin
),
tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
  FROM cells
),
terms AS (
  SELECT t.n_a, t.n_b,
    CASE WHEN c.a > 0 THEN CAST(FLOOR(
      (CAST(c.a AS DOUBLE) / CAST(t.n_a AS DOUBLE))
      * ln(CAST(CAST(CAST(2 AS DECIMAL(38,0))
                * (CAST(c.a AS DECIMAL(38,0)) * CAST(t.n_b AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS DOUBLE)
           / CAST(CAST(CAST(c.a AS DECIMAL(38,0)) * CAST(t.n_b AS DECIMAL(38,0))
                  + CAST(c.b AS DECIMAL(38,0)) * CAST(t.n_a AS DECIMAL(38,0))
                  AS DECIMAL(38,0)) AS DOUBLE))
      * 1000000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS qa,
    CASE WHEN c.b > 0 THEN CAST(FLOOR(
      (CAST(c.b AS DOUBLE) / CAST(t.n_b AS DOUBLE))
      * ln(CAST(CAST(CAST(2 AS DECIMAL(38,0))
                * (CAST(c.b AS DECIMAL(38,0)) * CAST(t.n_a AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS DOUBLE)
           / CAST(CAST(CAST(c.a AS DECIMAL(38,0)) * CAST(t.n_b AS DECIMAL(38,0))
                  + CAST(c.b AS DECIMAL(38,0)) * CAST(t.n_a AS DECIMAL(38,0))
                  AS DECIMAL(38,0)) AS DOUBLE))
      * 1000000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS qb
  FROM cells c, tot t
)
SELECT n_a, n_b, CAST(COUNT(*) AS BIGINT) AS n_bins,
       CASE WHEN n_a > 0 AND n_b > 0
         THEN CAST(SUM(qa + qb) AS DOUBLE) / 2000000000.0 END AS jsd
FROM terms GROUP BY n_a, n_b
"""
    sqls["isotonic_calibration"] = """
WITH binned AS (
  SELECT CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 500
              AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
pre AS (
  SELECT bin, n, pos,
         ROW_NUMBER() OVER w AS i,
         CAST(SUM(n) OVER w AS BIGINT) AS cn,
         CAST(SUM(pos) OVER w AS BIGINT) AS cp
  FROM binned
  WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
mins AS (
  SELECT j.i AS j,
         MIN(CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
             / CAST(k.cn - (j.cn - j.n) AS DOUBLE)) AS mj
  FROM pre j JOIN pre k ON k.i >= j.i
  GROUP BY j.i
)
SELECT p.bin, p.n, p.pos,
       CAST(p.pos AS DOUBLE) / CAST(p.n AS DOUBLE) AS rate,
       MAX(m.mj) OVER (ORDER BY p.i
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fitted
FROM pre p JOIN mins m ON p.i = m.j
"""
    sqls["graph_walks"] = _walks_oracle_sql(4)
    sqls["did_purchase_value"] = """
WITH rows_ AS (
  SELECT (user_id % 2 = 0) AS tr,
         (ts >= TIMESTAMP '2024-01-16 00:00:00') AS po,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN tr AND NOT po THEN v ELSE 0 END) AS BIGINT) AS s_t_pre,
    CAST(COUNT(*) FILTER (WHERE tr AND NOT po) AS BIGINT) AS n_t_pre,
    CAST(SUM(CASE WHEN tr AND po THEN v ELSE 0 END) AS BIGINT) AS s_t_post,
    CAST(COUNT(*) FILTER (WHERE tr AND po) AS BIGINT) AS n_t_post,
    CAST(SUM(CASE WHEN NOT tr AND NOT po THEN v ELSE 0 END) AS BIGINT) AS s_c_pre,
    CAST(COUNT(*) FILTER (WHERE NOT tr AND NOT po) AS BIGINT) AS n_c_pre,
    CAST(SUM(CASE WHEN NOT tr AND po THEN v ELSE 0 END) AS BIGINT) AS s_c_post,
    CAST(COUNT(*) FILTER (WHERE NOT tr AND po) AS BIGINT) AS n_c_post
  FROM rows_
)
SELECT s_t_pre, n_t_pre, s_t_post, n_t_post,
       s_c_pre, n_c_pre, s_c_post, n_c_post,
  CASE WHEN n_t_pre > 0 THEN CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE) END AS mean_t_pre,
  CASE WHEN n_t_post > 0 THEN CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE) END AS mean_t_post,
  CASE WHEN n_c_pre > 0 THEN CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE) END AS mean_c_pre,
  CASE WHEN n_c_post > 0 THEN CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE) END AS mean_c_post,
  CASE WHEN n_t_pre > 0 AND n_t_post > 0 AND n_c_pre > 0 AND n_c_post > 0 THEN
    (CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
     - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
    - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
       - CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE))
  END AS did
FROM agg
"""
    sqls["mmr_rerank"] = _mmr_oracle_sql(5)
    sqls["dbscan_embeddings"] = f"""
WITH RECURSIVE ev AS (
  SELECT label AS block, vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
e AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM ev a JOIN ev b ON a.block = b.block AND a.vec_id < b.vec_id
  WHERE {_COSINE.format(a='a.v', b='b.v')} >= 0.3
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM e
  UNION SELECT id_b, id_a FROM e
),
deg AS (SELECT src, COUNT(*) AS d FROM sym GROUP BY src),
ids AS (SELECT vec_id AS id FROM ev),
cores AS (
  SELECT i.id FROM ids i LEFT JOIN deg ON i.id = deg.src
  WHERE COALESCE(deg.d, 0) + 1 >= 3
),
ce AS (
  SELECT s.src, s.dst FROM sym s
  JOIN cores c1 ON s.src = c1.id JOIN cores c2 ON s.dst = c2.id
),
reach(node, lbl) AS (
  SELECT src, src FROM ce
  UNION
  SELECT s.src, r.lbl FROM ce s JOIN reach r ON s.dst = r.node
),
comp AS (SELECT node AS id, MIN(lbl) AS component FROM reach GROUP BY node),
core_lbl AS (
  SELECT c.id, COALESCE(p.component, c.id) AS cluster
  FROM cores c LEFT JOIN comp p ON c.id = p.id
),
border AS (
  SELECT s.src AS id, MIN(cl.cluster) AS cluster
  FROM sym s JOIN core_lbl cl ON s.dst = cl.id
  WHERE s.src NOT IN (SELECT id FROM cores)
  GROUP BY s.src
),
lab AS (
  SELECT id, 'core' AS role, cluster FROM core_lbl
  UNION ALL SELECT id, 'border', cluster FROM border
)
SELECT CAST(i.id AS BIGINT) AS id, COALESCE(l.role, 'noise') AS role,
       CAST(l.cluster AS BIGINT) AS cluster
FROM ids i LEFT JOIN lab l ON i.id = l.id
"""
    sqls["winnowing_dedup"] = """
WITH hs AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(length(text) - 7, 1) + 1),
           i -> md5(substring(text, CAST(i AS INTEGER), 8))) AS h
  FROM documents
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, greatest(len(h) - 3, 1) + 1),
             j -> list_aggregate(
               list_slice(h, CAST(j AS INTEGER),
                          CAST(j AS INTEGER) + 3), 'min')))) AS fp
    FROM hs)
),
rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 5
),
filtered AS (SELECT f.* FROM fps f JOIN rare USING (fp))
SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM filtered a JOIN filtered b
  ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
"""
    sqls["eb_shrunk_ctr"] = """
WITH keys AS (
  SELECT CAST(user_id AS BIGINT) AS key,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM events GROUP BY 1
),
wq AS (SELECT *, CAST((pos * 1000000000) // n AS BIGINT) AS pq FROM keys),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(pq) AS BIGINT) AS s1,
         CAST(SUM(CAST(pq AS DECIMAL(38,0)) * CAST(pq AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS s2
  FROM wq
),
m AS (
  SELECT CAST(s1 AS DOUBLE) / (CAST(k AS DOUBLE) * 1000000000.0) AS m1,
         CAST(s2 AS DOUBLE)
           / (CAST(k AS DOUBLE) * 1000000000.0 * 1000000000.0) AS m2
  FROM mom
),
f AS (
  SELECT m1, m2 - m1 * m1 AS var,
         (m1 * (1.0 - m1) - (m2 - m1 * m1)) / (m2 - m1 * m1) AS ab
  FROM m
),
prior AS (
  SELECT CASE WHEN var > 0.0 AND m1 * ab > 0.0
                   AND (1.0 - m1) * ab > 0.0
              THEN m1 * ab END AS alpha,
         CASE WHEN var > 0.0 AND m1 * ab > 0.0
                   AND (1.0 - m1) * ab > 0.0
              THEN (1.0 - m1) * ab END AS beta
  FROM f
)
SELECT k.key, k.n, k.pos,
       CAST(k.pos AS DOUBLE) / CAST(k.n AS DOUBLE) AS rate,
       p.alpha, p.beta,
       CASE WHEN p.alpha IS NOT NULL THEN
         (CAST(k.pos AS DOUBLE) + p.alpha)
         / (CAST(k.n AS DOUBLE) + p.alpha + p.beta)
       ELSE CAST(k.pos AS DOUBLE) / CAST(k.n AS DOUBLE) END AS shrunk
FROM keys k, prior p
"""
    sqls["bootstrap_ci"] = """
WITH xs AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase'
),
reps AS (
  SELECT x, CAST(r.range AS BIGINT) AS r FROM xs, range(32) r
),
weighted AS (
  SELECT r, x,
    CASE
      WHEN hx < '5e2d58d8b3bce' THEN 0
      WHEN hx < 'bc5ab1b16779c' THEN 1
      WHEN hx < 'eb715e1dc1583' THEN 2
      WHEN hx < 'fb23979734a25' THEN 3
      ELSE 4 END AS w
  FROM (
    SELECT r, x,
           substring(md5(concat('b|', CAST(r AS VARCHAR), '|',
                                CAST(x AS VARCHAR))), 1, 13) AS hx
    FROM reps)
),
means AS (
  SELECT r,
         CASE WHEN SUM(w) > 0
              THEN CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
         END AS m
  FROM weighted GROUP BY r
),
idx AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rk FROM means),
lo AS (SELECT MIN(m) AS ci_lo FROM idx WHERE rk = 2),
hi AS (SELECT MIN(m) AS ci_hi FROM idx WHERE rk = 31),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(x) AS BIGINT) AS sx
  FROM xs
)
SELECT b.n_rows, CAST(32 AS BIGINT) AS n_replicates,
       CAST(b.sx AS DOUBLE) / CAST(b.n_rows AS DOUBLE) AS mean,
       l.ci_lo, h.ci_hi
FROM base b, lo l, hi h
"""
    sqls["woe_iv_priority"] = """
WITH cells AS (
  SELECT o_orderpriority AS bin,
         CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 0 ELSE 1 END)
              AS BIGINT) AS n_neg
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS tp, CAST(SUM(n_neg) AS BIGINT) AS tn
  FROM cells
),
g AS (
  SELECT c.bin, c.n_pos, c.n_neg, t.tp, t.tn,
         CAST(c.n_pos AS DECIMAL(38,0)) * CAST(t.tn AS DECIMAL(38,0)) AS pn,
         CAST(c.n_neg AS DECIMAL(38,0)) * CAST(t.tp AS DECIMAL(38,0)) AS np_
  FROM cells c, tot t
),
terms AS (
  SELECT bin, n_pos, n_neg,
         CASE WHEN n_pos > 0 AND n_neg > 0
              THEN ln(CAST(pn AS DOUBLE) / CAST(np_ AS DOUBLE)) END AS woe,
         CASE WHEN n_pos > 0 AND n_neg > 0 THEN CAST(FLOOR(
           (CAST(pn - np_ AS DOUBLE)
            / (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)))
           * ln(CAST(pn AS DOUBLE) / CAST(np_ AS DOUBLE))
           * 1000000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS q
  FROM g
),
iv AS (SELECT CAST(SUM(q) AS BIGINT) AS iv_q FROM terms)
SELECT t.bin, t.n_pos, t.n_neg, t.woe,
       CAST(i.iv_q AS DOUBLE) / 1000000000.0 AS iv
FROM terms t, iv i
"""
    sqls["rolling_ols_slope"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
base AS (
  SELECT day, v, CAST(day - DATE '1970-01-01' AS BIGINT) AS t FROM daily
),
m AS (
  SELECT day, v,
         CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
         CAST(SUM(t) OVER w AS BIGINT) AS st,
         CAST(SUM(v) OVER w AS BIGINT) AS sv,
         CAST(SUM(t * v) OVER w AS BIGINT) AS stv,
         CAST(SUM(t * t) OVER w AS BIGINT) AS stt
  FROM base
  WINDOW w AS (ORDER BY t RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
)
SELECT CAST(day AS VARCHAR) AS day, v, n_window,
  CASE WHEN n_window >= 2 AND
       CAST(n_window AS DOUBLE) * CAST(stt AS DOUBLE)
       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) <> 0.0 THEN
    (CAST(n_window AS DOUBLE) * CAST(stv AS DOUBLE)
     - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
    / (CAST(n_window AS DOUBLE) * CAST(stt AS DOUBLE)
       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
  END AS slope
FROM m
"""
    sqls["growth_accounting"] = """
WITH up AS (
  SELECT DISTINCT user_id AS u,
         CAST(CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS BIGINT) AS p
  FROM events
),
lab AS (
  SELECT p,
         CASE WHEN prev IS NULL THEN 'new'
              WHEN prev = p - 1 THEN 'retained'
              ELSE 'resurrected' END AS cls
  FROM (SELECT u, p, LAG(p) OVER (PARTITION BY u ORDER BY p) AS prev FROM up)
),
active AS (
  SELECT p,
         CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resurrected
  FROM lab GROUP BY p
),
churned AS (
  SELECT s.p, CAST(COUNT(*) AS BIGINT) AS n_churned
  FROM (SELECT p + 1 AS p, u FROM up) s
  LEFT JOIN up ON up.p = s.p AND up.u = s.u
  WHERE up.u IS NULL GROUP BY s.p
),
maxp AS (SELECT MAX(p) AS m FROM up)
SELECT COALESCE(a.p, c.p) AS period,
       CAST(COALESCE(a.n_new, 0) + COALESCE(a.n_retained, 0)
            + COALESCE(a.n_resurrected, 0) AS BIGINT) AS n_active,
       CAST(COALESCE(a.n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(a.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(a.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
FROM active a FULL JOIN churned c ON a.p = c.p, maxp
WHERE COALESCE(a.p, c.p) <= maxp.m
"""
    sqls["oof_target_encoding"] = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_custkey AS BIGINT) AS cust,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(((CAST(o_custkey AS BIGINT) % 2147483647) * 48271
               % 2147483647) % 5 AS BIGINT) AS fold
  FROM orders
),
grid AS (
  SELECT o_orderpriority AS c, fold AS f,
         CAST(SUM(cents) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY 1, 2
),
tots AS (
  SELECT c, CAST(SUM(s) AS BIGINT) AS ts, CAST(SUM(n) AS BIGINT) AS tn
  FROM grid GROUP BY c
),
oof AS (
  SELECT g.c, g.f, t.ts - g.s AS os, t.tn - g.n AS onn
  FROM grid g JOIN tots t ON g.c = t.c
)
SELECT b.o_orderkey, b.o_orderpriority, b.fold,
       CASE WHEN o.onn > 0
            THEN CAST(o.os AS DOUBLE) / CAST(o.onn AS DOUBLE) END AS te_oof
FROM base b LEFT JOIN oof o ON b.o_orderpriority = o.c AND b.fold = o.f
"""
    sqls["cuped_purchase"] = """
WITH per_user AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS BIGINT) AS pre,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS BIGINT) AS post
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre) AS BIGINT) AS sx,
         CAST(SUM(post) AS BIGINT) AS sy,
         CAST(SUM(pre * post) AS BIGINT) AS sxy,
         CAST(SUM(pre * pre) AS BIGINT) AS sxx,
         CAST(COUNT(*) FILTER (WHERE u % 2 = 0) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN u % 2 = 0 THEN pre ELSE 0 END) AS BIGINT) AS sx_a,
         CAST(SUM(CASE WHEN u % 2 = 0 THEN post ELSE 0 END) AS BIGINT) AS sy_a,
         CAST(COUNT(*) FILTER (WHERE u % 2 = 1) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN u % 2 = 1 THEN pre ELSE 0 END) AS BIGINT) AS sx_b,
         CAST(SUM(CASE WHEN u % 2 = 1 THEN post ELSE 0 END) AS BIGINT) AS sy_b
  FROM per_user
)
SELECT n_a, n_b,
  CASE WHEN n_a > 0 AND n_b > 0 AND
       CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
  END AS theta,
  CASE WHEN n_a > 0 AND n_b > 0 THEN
    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
    - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
  END AS diff_raw,
  CASE WHEN n_a > 0 AND n_b > 0 AND
       CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
    (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
     - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
  END AS diff_cuped
FROM agg
"""
    # caliper matching: bucket band join, argmin per treated,
    # exact diff sum, one fixed-order float division
    sqls["caliper_match_att"] = """
WITH units AS (
  SELECT CAST(c_custkey AS BIGINT) AS key,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treat,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS score,
         COALESCE(sp.spend, 0) AS y
  FROM customer
  LEFT JOIN (
    SELECT o_custkey AS ck,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS spend
    FROM orders GROUP BY 1
  ) sp ON c_custkey = sp.ck
),
t AS (SELECT key AS tk, score AS ts, y AS ty FROM units WHERE treat = 1),
c AS (
  SELECT key AS ck, score AS cs, y AS cy,
         (score - ((score % 1000 + 1000) % 1000)) // 1000 AS b
  FROM units WHERE treat = 0
),
probes AS (
  SELECT tk, ts, ty,
         (ts - ((ts % 1000 + 1000) % 1000)) // 1000 + d.o AS b
  FROM t, (SELECT unnest([-1, 0, 1]) AS o) d
),
cands AS (
  SELECT tk, ts, ty, ck, cs, cy
  FROM probes JOIN c USING (b)
  WHERE ABS(ts - cs) <= 1000
),
best AS (
  SELECT tk, ty, cy,
         row_number() OVER (PARTITION BY tk
                            ORDER BY ABS(ts - cs), ck) AS rn
  FROM cands
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_matched,
         SUM(CAST(ty AS HUGEINT) - cy) AS diff_sum
  FROM best WHERE rn = 1
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_treated,
       n_matched,
       CASE WHEN n_matched > 0
            THEN CAST(diff_sum AS DOUBLE) / CAST(n_matched AS DOUBLE)
       END AS att
FROM m
"""
    # ANOVA: exact quantized per-group quadratic terms, fixed IEEE tail
    sqls["anova_price_flag"] = """
WITH v AS (
  SELECT l_returnflag AS g,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
           AS cents
  FROM lineitem
),
pg AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS ng, SUM(cents) AS sg
  FROM v GROUP BY 1
),
col AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         SUM((sg * sg * 1000000) // ng) AS aq
  FROM pg
),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, SUM(cents) AS s,
         SUM(cents * cents) AS t2
  FROM v
)
SELECT k, CAST(n AS BIGINT) AS n,
       (CAST(aq AS DOUBLE) - CAST((s * s * 1000000) // n AS DOUBLE))
         / 1000000.0 AS ssb,
       CAST(t2 AS DOUBLE) - CAST(aq AS DOUBLE) / 1000000.0 AS ssw,
       CASE WHEN k > 1 AND n > k THEN
         (((CAST(aq AS DOUBLE) - CAST((s * s * 1000000) // n AS DOUBLE))
           / 1000000.0) / CAST(k - 1 AS DOUBLE))
         / ((CAST(t2 AS DOUBLE) - CAST(aq AS DOUBLE) / 1000000.0)
            / CAST(n - k AS DOUBLE))
       END AS f_stat
FROM tot, col
"""
    # dyadic EWMA: power-of-two weights, exact integer quotient
    sqls["priority_revenue_ewma"] = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
sm AS (
  SELECT priority, day, cents AS value,
         (COALESCE(CAST(lag(cents, 0) OVER w AS HUGEINT), 0) * 128 + COALESCE(CAST(lag(cents, 1) OVER w AS HUGEINT), 0) * 64 + COALESCE(CAST(lag(cents, 2) OVER w AS HUGEINT), 0) * 32 + COALESCE(CAST(lag(cents, 3) OVER w AS HUGEINT), 0) * 16 + COALESCE(CAST(lag(cents, 4) OVER w AS HUGEINT), 0) * 8 + COALESCE(CAST(lag(cents, 5) OVER w AS HUGEINT), 0) * 4 + COALESCE(CAST(lag(cents, 6) OVER w AS HUGEINT), 0) * 2 + COALESCE(CAST(lag(cents, 7) OVER w AS HUGEINT), 0) * 1) AS _num,
         CAST((CASE WHEN lag(cents, 0) OVER w IS NOT NULL THEN 128 ELSE 0 END + CASE WHEN lag(cents, 1) OVER w IS NOT NULL THEN 64 ELSE 0 END + CASE WHEN lag(cents, 2) OVER w IS NOT NULL THEN 32 ELSE 0 END + CASE WHEN lag(cents, 3) OVER w IS NOT NULL THEN 16 ELSE 0 END + CASE WHEN lag(cents, 4) OVER w IS NOT NULL THEN 8 ELSE 0 END + CASE WHEN lag(cents, 5) OVER w IS NOT NULL THEN 4 ELSE 0 END + CASE WHEN lag(cents, 6) OVER w IS NOT NULL THEN 2 ELSE 0 END + CASE WHEN lag(cents, 7) OVER w IS NOT NULL THEN 1 ELSE 0 END) AS HUGEINT) AS _den
  FROM daily WINDOW w AS (PARTITION BY priority ORDER BY day)
)
SELECT priority, strftime(day, '%Y-%m-%d') AS day, value,
       CAST((_num * 1000000) // _den AS BIGINT) AS ewma_q
FROM sm
"""
    # all-pairs over the calendar-bounded window grid; exact bigint
    # cents SSD; argmin rank per subsequence with idx ties
    sqls["revenue_matrix_profile"] = """
WITH s AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
g AS (SELECT day, v, row_number() OVER (ORDER BY day) AS idx FROM s),
wins AS (
  SELECT idx, day, v AS v0,
         lead(v, 1) OVER w AS v1,
         lead(v, 2) OVER w AS v2,
         lead(v, 3) OVER w AS v3,
         lead(v, 4) OVER w AS v4,
         lead(v, 5) OVER w AS v5,
         lead(v, 6) OVER w AS v6
  FROM g WINDOW w AS (ORDER BY idx)
),
ww AS (SELECT * FROM wins WHERE v6 IS NOT NULL),
pairs AS (
  SELECT a.idx AS ia, a.day AS day_a, b.idx AS ib,
         CAST(a.v0 - b.v0 AS HUGEINT) * CAST(a.v0 - b.v0 AS HUGEINT) + CAST(a.v1 - b.v1 AS HUGEINT) * CAST(a.v1 - b.v1 AS HUGEINT) + CAST(a.v2 - b.v2 AS HUGEINT) * CAST(a.v2 - b.v2 AS HUGEINT) + CAST(a.v3 - b.v3 AS HUGEINT) * CAST(a.v3 - b.v3 AS HUGEINT) + CAST(a.v4 - b.v4 AS HUGEINT) * CAST(a.v4 - b.v4 AS HUGEINT) + CAST(a.v5 - b.v5 AS HUGEINT) * CAST(a.v5 - b.v5 AS HUGEINT) + CAST(a.v6 - b.v6 AS HUGEINT) * CAST(a.v6 - b.v6 AS HUGEINT) AS ssd
  FROM ww a JOIN ww b ON ABS(a.idx - b.idx) > 3
),
best AS (
  SELECT ia, day_a, ib, ssd,
         row_number() OVER (PARTITION BY ia ORDER BY ssd, ib) AS rn
  FROM pairs
)
SELECT CAST(ia AS BIGINT) AS idx, strftime(day_a, '%Y-%m-%d') AS day,
       CAST(ssd AS BIGINT) AS ssd_min, CAST(ib AS BIGINT) AS match_idx
FROM best WHERE rn = 1
"""
    # sequential packing: bin = cum-before div target, per partition
    sqls["compaction_plan"] = """
WITH s AS (
  SELECT lang, source, doc_id AS _key,
         CAST(n_chars AS HUGEINT) AS _sz,
         SUM(CAST(n_chars AS HUGEINT))
           OVER (PARTITION BY lang, source ORDER BY doc_id)
           - CAST(n_chars AS HUGEINT) AS _cum_before
  FROM documents
),
b AS (
  SELECT lang, source, _key, _sz,
         CAST(_cum_before // 65536 AS BIGINT) AS bin_id
  FROM s
)
SELECT lang, source, bin_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(SUM(_sz) AS BIGINT) AS bin_bytes,
       CAST(min(_key) AS BIGINT) AS first_key,
       CAST(max(_key) AS BIGINT) AS last_key
FROM b GROUP BY 1, 2, 3
"""
    # sweep-line: intervals collapse to calendar change days, running
    # sum over the bounded day grid
    sqls["open_orders_sweep"] = """
WITH iv AS (
  SELECT CAST(o_orderdate AS DATE) AS s, CAST(l_shipdate AS DATE) AS e
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
d AS (
  SELECT day, CAST(SUM(d) AS BIGINT) AS net_delta FROM (
    SELECT s AS day, CAST(count(*) AS BIGINT) AS d FROM iv GROUP BY 1
    UNION ALL
    SELECT e + 1 AS day, -CAST(count(*) AS BIGINT) AS d FROM iv GROUP BY 1
  ) GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, net_delta,
       CAST(SUM(net_delta) OVER (ORDER BY day) AS BIGINT) AS open_cnt
FROM d
"""
    # AMS sketch: same md5 sign hash, same single-element median —
    # the estimator reproduces bit-for-bit in SQL
    sqls["ams_f2"] = """
WITH k AS (
  SELECT CAST(l_partkey AS BIGINT) AS key FROM lineitem
),
s AS (
  SELECT j,
         CAST(SUM(CASE WHEN substring(
                md5(CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)),
                1, 1) < '8' THEN 1 ELSE -1 END) AS BIGINT) AS s
  FROM k CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS j) js
  GROUP BY j
),
est AS (
  SELECT CAST(s * s AS BIGINT) AS f2_est,
         row_number() OVER (ORDER BY s * s, j) AS rn
  FROM s
),
ex AS (
  SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS f2_exact,
         CAST(SUM(c) AS BIGINT) AS n_rows
  FROM (SELECT count(*) AS c FROM k GROUP BY key)
)
SELECT n_rows, f2_exact, f2_est,
       CAST((ABS(CAST(f2_est AS HUGEINT) - f2_exact) * 1000000)
            // f2_exact AS BIGINT) AS abs_err_ppm
FROM ex, est WHERE rn = 9
"""
    # independent brute-force 3-way join oracle: the Apriori pruning
    # must be lossless
    sqls["basket_triples"] = """
WITH f AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
                  CAST(l_partkey AS BIGINT) AS i
  FROM lineitem
)
SELECT a.i AS item_a, x.i AS item_b, c.i AS item_c,
       CAST(count(*) AS BIGINT) AS n_abc
FROM f a
JOIN f x ON a.b = x.b AND a.i < x.i
JOIN f c ON x.b = c.b AND x.i < c.i
GROUP BY 1, 2, 3 HAVING count(*) >= 2
"""
    # exact hierarchy shares: pmod-floor quotients on HUGEINT
    sqls["revenue_share_hierarchy"] = """
WITH facts AS (
  SELECT r_name AS region, n_name AS nation,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
           AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
leaf AS (
  SELECT region, nation, SUM(cents) AS v
  FROM facts GROUP BY 1, 2
),
lv AS (
  SELECT region, nation, v,
         SUM(v) OVER (PARTITION BY region) AS pv,
         SUM(v) OVER () AS tot
  FROM leaf
)
SELECT region, nation, CAST(v AS BIGINT) AS value,
       CAST(CASE WHEN pv <> 0 THEN (v * 1000000) // pv END
            AS BIGINT) AS share_of_parent_q,
       CAST(CASE WHEN tot <> 0 THEN (pv * 1000000) // tot END
            AS BIGINT) AS parent_share_q
FROM lv
"""
    # weighted quantile: per-distinct-value collapse, rational crossing
    sqls["weighted_median_price"] = """
WITH v AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents,
         CAST(l_quantity AS HUGEINT) AS qty
  FROM lineitem
),
pv AS (
  SELECT l_returnflag, cents, SUM(qty) AS w
  FROM v GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, cents,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cumw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM pv
)
SELECT l_returnflag, CAST(min(cents) AS BIGINT) AS wq_value,
       CAST(max(tot) AS BIGINT) AS total_w
FROM cum WHERE cumw * 2 >= tot
GROUP BY 1
"""
    # all pairwise moments in one pass; same IEEE tail as pearson
    sqls["lineitem_corr_matrix"] = """
WITH v AS (
  SELECT CAST(l_quantity AS HUGEINT) AS qty,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
           AS price_c,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS HUGEINT) AS disc_c,
         CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS HUGEINT) AS tax_c
  FROM lineitem
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         SUM(qty) AS s0,
         SUM(qty * qty) AS p0_0,
         SUM(qty * price_c) AS p0_1,
         SUM(qty * disc_c) AS p0_2,
         SUM(qty * tax_c) AS p0_3,
         SUM(price_c) AS s1,
         SUM(price_c * price_c) AS p1_1,
         SUM(price_c * disc_c) AS p1_2,
         SUM(price_c * tax_c) AS p1_3,
         SUM(disc_c) AS s2,
         SUM(disc_c * disc_c) AS p2_2,
         SUM(disc_c * tax_c) AS p2_3,
         SUM(tax_c) AS s3,
         SUM(tax_c * tax_c) AS p3_3
  FROM v
)
SELECT 'qty' AS m_a, 'price_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p0_0 - s0 * s0) > 0 AND (n * p1_1 - s1 * s1) > 0 THEN
         CAST((n * p0_1 - s0 * s1) AS DOUBLE)
         / sqrt(CAST((n * p0_0 - s0 * s0) AS DOUBLE) * CAST((n * p1_1 - s1 * s1) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'qty' AS m_a, 'disc_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p0_0 - s0 * s0) > 0 AND (n * p2_2 - s2 * s2) > 0 THEN
         CAST((n * p0_2 - s0 * s2) AS DOUBLE)
         / sqrt(CAST((n * p0_0 - s0 * s0) AS DOUBLE) * CAST((n * p2_2 - s2 * s2) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'qty' AS m_a, 'tax_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p0_0 - s0 * s0) > 0 AND (n * p3_3 - s3 * s3) > 0 THEN
         CAST((n * p0_3 - s0 * s3) AS DOUBLE)
         / sqrt(CAST((n * p0_0 - s0 * s0) AS DOUBLE) * CAST((n * p3_3 - s3 * s3) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'price_c' AS m_a, 'disc_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p1_1 - s1 * s1) > 0 AND (n * p2_2 - s2 * s2) > 0 THEN
         CAST((n * p1_2 - s1 * s2) AS DOUBLE)
         / sqrt(CAST((n * p1_1 - s1 * s1) AS DOUBLE) * CAST((n * p2_2 - s2 * s2) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'price_c' AS m_a, 'tax_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p1_1 - s1 * s1) > 0 AND (n * p3_3 - s3 * s3) > 0 THEN
         CAST((n * p1_3 - s1 * s3) AS DOUBLE)
         / sqrt(CAST((n * p1_1 - s1 * s1) AS DOUBLE) * CAST((n * p3_3 - s3 * s3) AS DOUBLE))
       END AS r
FROM m
UNION ALL
SELECT 'disc_c' AS m_a, 'tax_c' AS m_b, CAST(n AS BIGINT) AS n,
       CASE WHEN (n * p2_2 - s2 * s2) > 0 AND (n * p3_3 - s3 * s3) > 0 THEN
         CAST((n * p2_3 - s2 * s3) AS DOUBLE)
         / sqrt(CAST((n * p2_2 - s2 * s2) AS DOUBLE) * CAST((n * p3_3 - s3 * s3) AS DOUBLE))
       END AS r
FROM m
"""
    # trimmed mean: rank-count trim, exact integer quotient
    sqls["trimmed_mean_price"] = """
WITH v AS (
  SELECT o_orderpriority AS priority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT priority, cents,
         row_number() OVER (PARTITION BY priority ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY priority) AS n
  FROM v
),
kept AS (
  SELECT priority, cents, n
  FROM r WHERE rn > (n * 10) // 100 AND rn <= n - (n * 10) // 100
)
SELECT priority, CAST(max(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST((SUM(CAST(cents AS HUGEINT)) * 1000000)
            // count(*) AS BIGINT) AS tmean_q
FROM kept GROUP BY 1
"""
    # stream-maintained bitmaps == batch COUNT(DISTINCT)
    sqls["stream_distinct_users"] = """
SELECT o_orderpriority AS prio,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
FROM orders GROUP BY 1
"""
    # six unrolled peeling rounds, mirroring the fixed-round contract
    sqls["kcore_parts"] = """
WITH li AS MATERIALIZED (
  SELECT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
  FROM lineitem WHERE l_orderkey % 4 = 0
),
edges AS MATERIALIZED (
  SELECT DISTINCT a.p AS id_a, b.p AS id_b
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
),
e0 AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION
  SELECT id_b AS src, id_a AS dst FROM edges
),
k0 AS MATERIALIZED (
  SELECT src FROM e0 GROUP BY src HAVING count(*) >= 3
),
e1 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e0 e
  JOIN k0 a ON e.src = a.src
  JOIN k0 b ON e.dst = b.src
),
k1 AS MATERIALIZED (
  SELECT src FROM e1 GROUP BY src HAVING count(*) >= 3
),
e2 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e1 e
  JOIN k1 a ON e.src = a.src
  JOIN k1 b ON e.dst = b.src
),
k2 AS MATERIALIZED (
  SELECT src FROM e2 GROUP BY src HAVING count(*) >= 3
),
e3 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e2 e
  JOIN k2 a ON e.src = a.src
  JOIN k2 b ON e.dst = b.src
),
k3 AS MATERIALIZED (
  SELECT src FROM e3 GROUP BY src HAVING count(*) >= 3
),
e4 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e3 e
  JOIN k3 a ON e.src = a.src
  JOIN k3 b ON e.dst = b.src
),
k4 AS MATERIALIZED (
  SELECT src FROM e4 GROUP BY src HAVING count(*) >= 3
),
e5 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e4 e
  JOIN k4 a ON e.src = a.src
  JOIN k4 b ON e.dst = b.src
),
k5 AS MATERIALIZED (
  SELECT src FROM e5 GROUP BY src HAVING count(*) >= 3
),
e6 AS MATERIALIZED (
  SELECT e.src, e.dst FROM e5 e
  JOIN k5 a ON e.src = a.src
  JOIN k5 b ON e.dst = b.src
)
SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
FROM e6 GROUP BY 1
"""
    # the oracle reproduces the synthetic pixels and the exact integer
    # NN-resize index map; the Spark side runs the real PNG roundtrip
    sqls["image_ahash"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(p_partkey % 9 + 4 AS BIGINT) AS w,
         CAST(p_partkey % 7 + 4 AS BIGINT) AS h
  FROM part WHERE p_partkey % 20 = 0
),
cells AS (
  SELECT media_id, w, h, gx.x, gy.y,
         (media_id * 7 + 3 * ((gx.x * w) // 8)
          + 11 * ((gy.y * h) // 8)) % 256 AS p
  FROM ids,
       (SELECT unnest(generate_series(0, 7)) AS x) gx,
       (SELECT unnest(generate_series(0, 7)) AS y) gy
),
means AS (
  SELECT media_id, SUM(p) // 64 AS m FROM cells GROUP BY 1
)
SELECT c.media_id, MIN(c.w) AS width, MIN(c.h) AS height,
       CAST(SUM(CASE WHEN c.p >= ms.m AND c.y * 8 + c.x >= 32
                THEN 1::BIGINT << (c.y * 8 + c.x - 32) ELSE 0 END)
            AS BIGINT) AS ahash_hi,
       CAST(SUM(CASE WHEN c.p >= ms.m AND c.y * 8 + c.x < 32
                THEN 1::BIGINT << (c.y * 8 + c.x) ELSE 0 END)
            AS BIGINT) AS ahash_lo
FROM cells c JOIN means ms USING (media_id)
GROUP BY 1
"""
    # resize path: the oracle reproduces the resized pixels with the
    # same integer index map, no codec; the Spark side round-trips a
    # real PNG and aggregates the resized buffer JVM-side
    # fake-decoder byte histogram, replayed from md5 hex digits —
    # (strpos into '0123456789abcdef') - 1 is the nibble value; the
    # content is md5(id-as-string) repeated id%8+1 times (VERDICT r7
    # item 7: multimodal_decode leaves the rows-only tier)
    sqls["multimodal_decode"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(p_partkey % 8 + 1 AS BIGINT) AS reps
  FROM part WHERE p_partkey % 20 = 0
),
hx AS (
  SELECT media_id, reps, md5(CAST(media_id AS VARCHAR)) AS h FROM ids
),
bytes AS (
  SELECT media_id, reps,
         (strpos('0123456789abcdef',
                 substr(h, CAST((u.i % 16) * 2 + 1 AS BIGINT), 1)) - 1) * 16
       + (strpos('0123456789abcdef',
                 substr(h, CAST((u.i % 16) * 2 + 2 AS BIGINT), 1)) - 1) AS b
  FROM hx, LATERAL (SELECT unnest(range(0, reps * 16)) AS i) u
)
SELECT media_id,
       CAST(count(*) AS BIGINT) AS n_bytes,
       CAST(SUM(CASE WHEN b // 32 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS hist0,
       CAST(SUM(CASE WHEN b // 32 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hist1,
       CAST(SUM(CASE WHEN b // 32 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS hist2,
       CAST(SUM(CASE WHEN b // 32 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hist3,
       CAST(SUM(CASE WHEN b // 32 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS hist4,
       CAST(SUM(CASE WHEN b // 32 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS hist5,
       CAST(SUM(CASE WHEN b // 32 = 6 THEN 1 ELSE 0 END) AS BIGINT) AS hist6,
       CAST(SUM(CASE WHEN b // 32 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS hist7
FROM bytes GROUP BY 1
"""
    # HLL rollup accuracy contract: the oracle pins the exact distinct
    # count AND asserts the Spark-side estimate sat within its
    # documented +/-5% bound (within_5pct must come back TRUE)
    sqls["hll_user_rollup"] = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS within_5pct
FROM events GROUP BY 1
"""
    sqls["image_palette_resize"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(p_partkey % 9 + 4 AS BIGINT) AS w,
         CAST(p_partkey % 7 + 4 AS BIGINT) AS h
  FROM part WHERE p_partkey % 20 = 3
),
cells AS (
  SELECT media_id, gx.x, gy.y,
         (media_id + 3 * ((gx.x * w) // 4)
          + 5 * ((gy.y * h) // 3)) % 16 AS j
  FROM ids,
       (SELECT unnest(generate_series(0, 3)) AS x) gx,
       (SELECT unnest(generate_series(0, 2)) AS y) gy
),
chans AS (
  SELECT media_id, x, y, 0 AS ch, (media_id * 13 + 17 * j) % 256 AS v
  FROM cells
  UNION ALL
  SELECT media_id, x, y, 1, (media_id * 7 + 29 * j) % 256 FROM cells
  UNION ALL
  SELECT media_id, x, y, 2, (media_id * 11 + 43 * j) % 256 FROM cells
  UNION ALL
  SELECT media_id, x, y, 3,
         CASE WHEN j < 8 THEN (media_id * 5 + 31 * j) % 256 ELSE 255 END
  FROM cells
)
SELECT media_id,
       CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
       CAST(4 AS BIGINT) AS nch,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(SUM(v * ((y * 4 + x) * 4 + ch)) AS BIGINT) AS px_possum
FROM chans GROUP BY 1
"""
    sqls["image_resize_pixels"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(p_partkey % 9 + 4 AS BIGINT) AS w,
         CAST(p_partkey % 7 + 4 AS BIGINT) AS h
  FROM part WHERE p_partkey % 20 = 0
),
cells AS (
  SELECT media_id, gx.x, gy.y,
         (media_id * 7 + 3 * ((gx.x * w) // 4)
          + 11 * ((gy.y * h) // 3)) % 256 AS p
  FROM ids,
       (SELECT unnest(generate_series(0, 3)) AS x) gx,
       (SELECT unnest(generate_series(0, 2)) AS y) gy
)
SELECT media_id,
       CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS nch,
       CAST(SUM(p) AS BIGINT) AS px_sum,
       CAST(SUM(p * (y * 4 + x)) AS BIGINT) AS px_possum
FROM cells GROUP BY 1
"""
    # the oracle reproduces the synthetic PCM samples arithmetically;
    # the Spark side goes through a real WAV encode+decode roundtrip
    sqls["audio_frame_energy"] = """
WITH ids AS (
  SELECT CAST(p_partkey AS BIGINT) AS media_id
  FROM part WHERE p_partkey % 20 = 0
),
s AS (
  SELECT media_id, u.i,
         ((media_id * 31 + u.i * 7) % 256) - 128 AS v
  FROM ids,
       LATERAL (SELECT unnest(generate_series(
                0, CAST(media_id % 50 + 9 AS BIGINT))) AS i) u
)
SELECT media_id, CAST(i // 16 AS BIGINT) AS frame_idx,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(SUM(v * v) AS BIGINT) AS energy
FROM s GROUP BY 1, 2
"""
    # stream-maintained sketch == batch sketch (mergeable cells):
    # the oracle is the identical batch recompute
    sqls["stream_cms_topk"] = """
WITH keys AS (
  SELECT CAST(l_partkey AS BIGINT) AS part FROM lineitem
),
cells AS (
  SELECT d.d, substring(md5(concat(CAST(d.d AS VARCHAR), ':',
                                   CAST(k.part AS VARCHAR))), 1, 2) AS cell
  FROM keys k, (SELECT CAST(range AS BIGINT) AS d FROM range(4)) d
),
sketch AS (
  SELECT d, cell, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY d, cell
),
exact AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS exact
  FROM keys GROUP BY part
),
top AS (
  SELECT part, exact FROM exact
  ORDER BY exact DESC, part ASC LIMIT 20
),
probes AS (
  SELECT t.part, d.d,
         substring(md5(concat(CAST(d.d AS VARCHAR), ':',
                              CAST(t.part AS VARCHAR))), 1, 2) AS cell
  FROM top t, (SELECT CAST(range AS BIGINT) AS d FROM range(4)) d
),
est AS (
  SELECT p.part,
         CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est
  FROM probes p LEFT JOIN sketch s ON p.d = s.d AND p.cell = s.cell
  GROUP BY p.part
)
SELECT t.part, t.exact, e.est, CAST(e.est - t.exact AS BIGINT) AS over
FROM top t JOIN est e ON t.part = e.part
"""
    sqls["cms_heavy_hitters"] = """
WITH keys AS (
  SELECT CAST(l_partkey AS BIGINT) AS part FROM lineitem
),
cells AS (
  SELECT d.d, substring(md5(concat(CAST(d.d AS VARCHAR), ':',
                                   CAST(k.part AS VARCHAR))), 1, 2) AS cell
  FROM keys k, (SELECT CAST(range AS BIGINT) AS d FROM range(4)) d
),
sketch AS (
  SELECT d, cell, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY d, cell
),
exact AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS exact
  FROM keys GROUP BY part
),
top AS (
  SELECT part, exact FROM exact
  ORDER BY exact DESC, part ASC LIMIT 20
),
probes AS (
  SELECT t.part, d.d,
         substring(md5(concat(CAST(d.d AS VARCHAR), ':',
                              CAST(t.part AS VARCHAR))), 1, 2) AS cell
  FROM top t, (SELECT CAST(range AS BIGINT) AS d FROM range(4)) d
),
est AS (
  SELECT p.part,
         CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est
  FROM probes p LEFT JOIN sketch s ON p.d = s.d AND p.cell = s.cell
  GROUP BY p.part
)
SELECT t.part, t.exact, e.est, CAST(e.est - t.exact AS BIGINT) AS over
FROM top t JOIN est e ON t.part = e.part
"""
    sqls["quota_allocation"] = """
WITH groups AS (
  SELECT lang, source, CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS weight
  FROM documents GROUP BY lang, source
),
tot AS (SELECT CAST(SUM(weight) AS HUGEINT) AS w_tot FROM groups),
shared AS (
  SELECT lang, source, weight,
         CAST((CAST(10000 AS HUGEINT) * CAST(weight AS HUGEINT)) // t.w_tot
              AS BIGINT) AS flr,
         (CAST(10000 AS HUGEINT) * CAST(weight AS HUGEINT)) % t.w_tot AS rem
  FROM groups, tot t
),
floors AS (SELECT CAST(SUM(flr) AS BIGINT) AS f_sum FROM shared)
SELECT lang, source, weight,
       CAST(flr + CASE WHEN ROW_NUMBER() OVER (
              ORDER BY rem DESC, lang ASC, source ASC)
            <= 10000 - f.f_sum THEN 1 ELSE 0 END AS BIGINT) AS slots
FROM shared, floors f
"""
    sqls["theilsen_revenue"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
base AS (
  SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS t, v FROM daily
),
pairs AS (
  SELECT CAST((b.v - a.v) * 1000000 AS BIGINT) AS num,
         CAST(b.t - a.t AS BIGINT) AS dt
  FROM base a JOIN base b ON b.t > a.t
),
qs AS (
  SELECT CAST((num - ((num % dt) + dt) % dt) // dt AS BIGINT) AS slope_q
  FROM pairs
),
cells AS (
  SELECT slope_q, CAST(COUNT(*) AS BIGINT) AS c FROM qs GROUP BY slope_q
),
ranked AS (
  SELECT slope_q,
         CAST(SUM(c) OVER (ORDER BY slope_q
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS np
  FROM cells
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_days,
       np AS n_pairs,
       CAST(MIN(slope_q) AS BIGINT) AS slope_q,
       CAST(1000000 AS BIGINT) AS scale
FROM ranked WHERE 2 * cum >= np
GROUP BY np
"""
    sqls["mannwhitney_value"] = """
WITH vals AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS ga
  FROM events WHERE event_type IN ('purchase', 'view')
),
cells AS (
  SELECT v, CAST(SUM(ga) AS BIGINT) AS ca, CAST(COUNT(*) AS BIGINT) AS c
  FROM vals GROUP BY v
),
ranked AS (
  SELECT ca, c,
         CAST(2 * COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS two_r
  FROM cells
),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(c - ca) AS BIGINT) AS n_b,
         CAST(SUM(CAST(ca AS DECIMAL(38,0)) * CAST(two_r AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS _2ra,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))
                  * CAST(c AS DECIMAL(38,0)) - CAST(c AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS tie_cubes
  FROM ranked
),
fin AS (
  -- exact columns land as BIGINT: a DECIMAL in a final SELECT converts
  -- engine-dependently across DuckDB/pandas versions (r6 parity
  -- incident); every double below is one bigint->double conversion
  SELECT n_a, n_b,
         CAST(tie_cubes AS BIGINT) AS tie_cubes,
         CAST(n_a + n_b AS BIGINT) AS n,
         CAST(_2ra - CAST(CAST(n_a AS DECIMAL(38,0))
              * CAST(n_a + 1 AS DECIMAL(38,0)) AS DECIMAL(38,0))
              AS BIGINT) AS two_u_a
  FROM agg
)
SELECT n_a, n_b, two_u_a, tie_cubes,
  CASE WHEN n_a > 0 AND n_b > 0 AND n > 1
        AND CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
            * (CAST(n + 1 AS DOUBLE)
               - CAST(tie_cubes AS DOUBLE)
                 / CAST(CAST(n AS BIGINT) * CAST(n - 1 AS BIGINT) AS DOUBLE))
            / 12.0 > 0 THEN
    CAST(two_u_a - n_a * n_b AS DOUBLE)
    / (2.0 * sqrt(
        CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        * (CAST(n + 1 AS DOUBLE)
           - CAST(tie_cubes AS DOUBLE)
             / CAST(CAST(n AS BIGINT) * CAST(n - 1 AS BIGINT) AS DOUBLE))
        / 12.0))
  END AS z,
  CASE WHEN n_a > 0 AND n_b > 0 THEN
    CAST(two_u_a - n_a * n_b AS DOUBLE)
    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
  END AS r_rb
FROM fin
"""
    sqls["stream_js_drift"] = sqls["js_drift"]
    # Lindley recursion replayed literally (the engine uses the
    # closed-form reflection identity — independent derivations)
    sqls["stock_balance_floor"] = """
WITH RECURSIVE base AS (
  SELECT CAST(l_suppkey AS BIGINT) AS supp,
         CAST(l_orderkey AS BIGINT) AS okey,
         CAST(l_linenumber AS BIGINT) AS lno,
         CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
                   ELSE -l_quantity END AS BIGINT) AS delta,
         ROW_NUMBER() OVER (
           PARTITION BY l_suppkey
           ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber
         ) AS rn
  FROM lineitem
),
rec AS (
  SELECT supp, okey, lno, delta, rn,
         GREATEST(CAST(0 AS BIGINT), delta) AS bal
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.supp, b.okey, b.lno, b.delta, b.rn,
         GREATEST(CAST(0 AS BIGINT), r.bal + b.delta)
  FROM rec r
  JOIN base b ON b.supp = r.supp AND b.rn = r.rn + 1
)
SELECT supp, okey, lno, delta, CAST(bal AS BIGINT) AS balance FROM rec
"""
    # two-sided clamp: no closed form exists (the clamp erases
    # history), so the stream's per-key state fold is checked against
    # the literal recursion over the full ordered history
    sqls["stream_capped_balance"] = """
WITH RECURSIVE base AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(CASE WHEN event_type IN ('purchase', 'signup')
                   THEN 1 ELSE -1 END AS BIGINT)
           * CAST(CAST(COALESCE(value, 0.0) AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS delta,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS rn
  FROM events
),
rec AS (
  SELECT user_id, rn,
         LEAST(CAST(25000 AS BIGINT),
               GREATEST(CAST(0 AS BIGINT), delta)) AS bal
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.rn,
         LEAST(CAST(25000 AS BIGINT),
               GREATEST(CAST(0 AS BIGINT), r.bal + b.delta))
  FROM rec r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
)
SELECT r.user_id, CAST(r.rn AS BIGINT) AS n_events,
       CAST(r.bal AS BIGINT) AS balance
FROM rec r
JOIN (SELECT user_id, MAX(rn) AS m FROM rec GROUP BY 1) t
  ON t.user_id = r.user_id AND t.m = r.rn
"""
    # reachability: the engine's fixed-depth frontier loop vs the
    # recursive CTE SQL engines use for the same question
    sqls["part_reach_bfs"] = """
WITH RECURSIVE f AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
                  CAST(l_partkey AS BIGINT) AS i
  FROM lineitem
),
e AS (
  SELECT a.i AS u, x.i AS v
  FROM f a JOIN f x ON a.b = x.b AND a.i < x.i
  GROUP BY 1, 2 HAVING count(*) >= 2
),
sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
r AS (
  SELECT CAST(p_partkey AS BIGINT) AS node, 0 AS hop
  FROM part WHERE p_partkey % 97 = 0
  UNION
  SELECT s.v, r.hop + 1
  FROM r JOIN sym s ON s.u = r.node
  WHERE r.hop < 3
)
SELECT node, CAST(MIN(hop) AS INT) AS hops FROM r GROUP BY node
"""
    # exact floor-div interpolation: DuckDB's // and % TRUNCATE for
    # negative numerators, so the pmod-floor is spelled out
    sqls["price_interpolate_daily"] = """
WITH agg AS (
  SELECT o_orderpriority AS priority,
         CAST(DATE_DIFF('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day_i,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cents
  FROM orders GROUP BY 1, 2
),
bounds AS (SELECT MIN(day_i) AS d0, MAX(day_i) AS d1 FROM agg),
cal AS (
  SELECT p.priority, c.day_i
  FROM (SELECT DISTINCT priority FROM agg) p
  CROSS JOIN (
    SELECT UNNEST(generate_series(d0, d1)) AS day_i FROM bounds
  ) c
),
dense AS (
  SELECT cal.priority, cal.day_i, agg.cents
  FROM cal LEFT JOIN agg
    ON agg.priority = cal.priority AND agg.day_i = cal.day_i
),
win AS (
  SELECT priority, day_i, cents,
    LAST_VALUE(CASE WHEN cents IS NOT NULL THEN day_i END IGNORE NULLS)
      OVER wb AS p0,
    LAST_VALUE(CASE WHEN cents IS NOT NULL THEN cents END IGNORE NULLS)
      OVER wb AS v0,
    FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN day_i END IGNORE NULLS)
      OVER wf AS p1,
    FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN cents END IGNORE NULLS)
      OVER wf AS v1
  FROM dense
  WINDOW
    wb AS (PARTITION BY priority ORDER BY day_i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY priority ORDER BY day_i
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
calc AS (
  SELECT priority, day_i, cents, p0, p1, v0,
         CAST(v1 - v0 AS HUGEINT) * 100
           * CAST(day_i - p0 AS HUGEINT) AS num,
         CAST(p1 - p0 AS HUGEINT) AS den
  FROM win
)
SELECT priority, day_i,
  CAST(CASE
    WHEN cents IS NOT NULL THEN CAST(cents AS HUGEINT) * 100
    WHEN p0 IS NOT NULL AND p1 IS NOT NULL THEN
      CAST(v0 AS HUGEINT) * 100
      + (num - (((num % den) + den) % den)) / den
  END AS BIGINT) AS value_q,
  CAST((cents IS NULL AND p0 IS NOT NULL AND p1 IS NOT NULL) AS INT)
    AS is_interpolated
FROM calc
"""
    return sqls
