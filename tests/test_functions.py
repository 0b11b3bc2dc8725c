"""Unit tests for text/dedup/similarity functions on hand-built data
with known-by-construction answers."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.functions import text as Tx
from amazon_personalize_connectors_spark.functions.dedup import (
    exact_dedup_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash16,
)
from amazon_personalize_connectors_spark.functions.similarity import (
    blocked_near_duplicates,
    brute_force_topk,
    ivf_assign,
)
from amazon_personalize_connectors_spark.operators.payload import chunk_iterable


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, ""),  # empty doc
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_tokens_and_quality(spark, docs):
    out = docs.select(
        "doc_id",
        F.size(Tx.tokens(F.col("text"))).alias("n"),
        Tx.quality_features(F.col("text"))["stopword_ratio"].alias("ratio"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n == 9
    assert by_id[5].n == 0 and by_id[5].ratio is None
    assert by_id[1].ratio == pytest.approx(2 / 9)  # two 'the'


def test_exact_dedup(docs):
    groups = exact_dedup_groups(docs).collect()
    dup = [g for g in groups if g.n_docs > 1]
    assert len(dup) == 1 and dup[0].rep_id == 1 and dup[0].n_docs == 2


def test_ngram_jaccard_known_value(docs):
    pairs = ngram_jaccard_pairs(docs, min_common=1).collect()
    by_pair = {(p.id_a, p.id_b): p for p in pairs}
    # docs 1 and 2 share 6 of their 7 trigram shingles (all but the last)
    p = by_pair[(1, 2)]
    assert p.common == 6 and p.union_size == 8
    assert p.jaccard == pytest.approx(6 / 8)
    # exact dups share everything
    p = by_pair[(1, 4)]
    assert p.common == 7 and p.jaccard == 1.0
    assert (1, 3) not in by_pair  # nothing in common


def test_ngram_jaccard_materialized_agrees_with_recompute(spark, tmp_path, docs):
    """The 100 TB form (shingle table written once to parquet, self-
    joined) returns exactly the recompute form's pairs; the bucketed
    variant self-joins with no shuffle of the shingle table."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        ngram_jaccard_pairs_materialized,
    )

    expected = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, min_common=1).collect()
    )
    plain = ngram_jaccard_pairs_materialized(
        spark, docs, str(tmp_path / "sh"), min_common=1
    )
    assert sorted(tuple(r) for r in plain.collect()) == expected

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = ngram_jaccard_pairs_materialized(
            spark, docs, str(tmp_path / "shb"), min_common=1, buckets=4,
            table_name="apcs_shingles_test",
        )
        assert sorted(tuple(r) for r in bucketed.collect()) == expected
        # both scans of the bucketed table feed the sort-merge join
        # without an Exchange — the join is co-located by construction
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        join_region = plan[plan.index("SortMergeJoin"):]
        assert "Exchange" not in join_region.split("HashAggregate")[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS apcs_shingles_test")


def test_neardup_components_chain_and_clusters(spark):
    """Min-label propagation walks a chain (diameter > 1 round),
    keeps clusters separate, and labels every component by its min."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        neardup_components,
    )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    got = {r.id: r.component for r in neardup_components(edges).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_minhash_catches_exact_dups(docs):
    cands = minhash_lsh_candidates(docs).collect()
    pairs = {(c.id_a, c.id_b): c.n_shared_bands for c in cands}
    assert pairs.get((1, 4)) == 3  # identical docs agree on all bands


def test_simhash_similarity_structure(spark, docs):
    out = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", simhash16(F.col("text")).alias("sh")).collect()
    }
    ham_near = bin(out[1] ^ out[2]).count("1")
    ham_far = bin(out[1] ^ out[3]).count("1")
    assert out[1] == out[4]  # exact dups → identical signature
    assert ham_near < ham_far  # near-dup closer than unrelated


def test_simhash64_structure_and_long_doc_cost(spark, docs):
    """64-bit variant: exact dups identical, near-dups closer than
    unrelated docs, and cost is linear in doc length (the pre-fix
    expression was O(bits * distinct * n) — a 20k-token doc took
    minutes; the one-md5-per-token form handles a batch of them in
    seconds)."""
    import time

    from amazon_personalize_connectors_spark.functions.dedup import simhash64

    sigs = {
        r.doc_id: r.s
        for r in docs.select("doc_id", simhash64(F.col("text")).alias("s")).collect()
    }
    assert sigs[1] == sigs[4]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])
    # empty doc: zero bit-sums → all-ones signature (signed -1)
    assert sigs[5] == -1

    long_rows = [
        (i, " ".join(f"tok{(i * 7 + j) % 5000}" for j in range(20_000)))
        for i in range(8)
    ]
    ldf = spark.createDataFrame(long_rows, "doc_id int, text string")
    t0 = time.perf_counter()
    out = ldf.select("doc_id", simhash64(F.col("text")).alias("s")).collect()
    elapsed = time.perf_counter() - t0
    assert len(out) == 8 and elapsed < 60.0


def test_chunk_documents_window_math(spark):
    from amazon_personalize_connectors_spark.functions.text import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # one window
        (2, " ".join(f"t{i}" for i in range(70))),  # 3 windows of step 24
        (3, " ".join(f"t{i}" for i in range(32))),  # exactly one chunk
        (4, ""),  # nothing to pack
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append(r)
    assert {r.chunk_no for r in by_doc[1]} == {0} and by_doc[1][0].n_tokens == 10
    c2 = sorted(by_doc[2], key=lambda r: r.chunk_no)
    assert [r.n_tokens for r in c2] == [32, 32, 22]  # starts 0, 24, 48
    # overlap: each later chunk re-includes the prior 8 tokens
    assert c2[1].chunk_text.split()[:8] == c2[0].chunk_text.split()[-8:]
    assert [r.chunk_no for r in by_doc[3]] == [0]
    assert 4 not in by_doc
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_chunk_documents_grid_coverage(spark):
    """Every token appears in some chunk, chunk starts step uniformly,
    and every non-first chunk carries more than pure overlap — across
    the boundary grid around multiples of chunk and step sizes."""
    from amazon_personalize_connectors_spark.functions.text import chunk_documents

    ns = [1, 7, 23, 24, 25, 31, 32, 33, 47, 48, 49, 56, 57, 80, 100]
    rows = [(n, " ".join(f"w{i}" for i in range(n))) for n in ns]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append(r)
    for n in ns:
        chunks = sorted(by_doc[n], key=lambda r: r.chunk_no)
        covered = set()
        for k, c in enumerate(chunks):
            toks = c.chunk_text.split()
            assert toks[0] == f"w{k * 24}"  # starts step by chunk - overlap
            if k > 0:
                assert c.n_tokens > 8  # never a pure-overlap suffix
            covered.update(toks)
        assert covered == {f"w{i}" for i in range(n)}, f"gap for n={n}"


def test_repetition_signals_flags_stuffed_docs(spark):
    from amazon_personalize_connectors_spark.functions.text import (
        repetition_signals,
    )

    rows = [
        (1, "buy cheap pills " * 20),  # stuffed: top bigram dominates
        (2, "the quick brown fox jumps over a lazy dog near the river bank"),
        (3, "word"),  # single token: no bigrams, unigram frac 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.id: r for r in repetition_signals(df).collect()}
    assert out[1].flag_repetitive
    assert not out[2].flag_repetitive
    assert out[3].top_unigram_frac == 1.0 and out[3].top_bigram_frac is None
    assert out[3].flag_repetitive  # unigram rule fires, bigram rule null-safe
    # fraction sanity: doc 1 has 60 tokens, top unigram 20/60
    assert abs(out[1].top_unigram_frac - 20 / 60) < 1e-12


def test_simhash_neardup_pairs_band_and_filter(spark, docs):
    """Exact dups always pair at hamming 0; unrelated docs never pass
    a tight hamming filter."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        simhash_neardup_pairs,
    )

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardup_pairs(docs, max_hamming=12).collect()
    }
    assert pairs[(1, 4)] == 0  # exact dups always collide on every band
    assert (1, 3) not in pairs and (2, 3) not in pairs  # unrelated
    assert all(h <= 12 for h in pairs.values())
    # recall note: docs 1/2 differ by 11 bits — banding only guarantees
    # pairs within 3 bits (4 bands of 16), so their absence is correct
    # LSH behavior, not a bug


def test_ivf_probe_matches_assignment_blocks(spark, vectors):
    """Probe results stay within the query's assigned inverted list,
    and ranks are contiguous from 1."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        ivf_assign,
        ivf_probe_topk,
    )

    queries = vectors.where(F.col("vec_id") % 3 == 0)
    out = ivf_probe_topk(vectors, queries, k=3).collect()
    assert out
    assigned = {r.id: r.assigned_block for r in ivf_assign(vectors).collect()}
    by_q = {}
    for r in out:
        assert assigned[r.n_id] == assigned[r.q_id]
        by_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),  # close to 0
        (2, [0.0, 1.0, 0.0], 0),  # orthogonal to 0
        (3, [0.0, 0.0, 1.0], 1),
        (4, [0.0, 0.1, 0.9], 1),  # close to 3
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>, label int")


def test_brute_force_topk_ranks(vectors):
    topk = brute_force_topk(vectors, vectors.where(F.col("vec_id") == 0), k=2)
    rows = sorted(topk.collect(), key=lambda r: r.rank)
    assert [r.n_id for r in rows] == [1, 2]
    assert rows[0].score > 0.99


def test_partial_topk_agrees_with_window_form(spark, vectors):
    """The huge-corpus two-stage top-k must reproduce the window form
    exactly — same ids, ranks, and rounded scores."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        brute_force_topk_partial,
    )

    queries = vectors.where(F.col("vec_id") % 3 == 0)
    base = sorted(
        tuple(r) for r in brute_force_topk(vectors, queries, k=3).collect()
    )
    part = sorted(
        tuple(r)
        for r in brute_force_topk_partial(
            vectors.repartition(4), queries, k=3
        ).collect()
    )
    assert part == base


def test_blocked_neardup_stays_in_block(vectors):
    pairs = blocked_near_duplicates(vectors, min_cosine=0.5).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(0, 1), (3, 4)}


def test_kmeans_refine_multi_iteration(spark, vectors):
    """Two Lloyd rounds run end-to-end (tiny centroid state collected
    between rounds) and cluster sizes stay a partition of the corpus."""
    from amazon_personalize_connectors_spark.functions.similarity import (
        kmeans_refine_sums,
    )

    one = kmeans_refine_sums(vectors, iters=1)
    two = kmeans_refine_sums(vectors, iters=2)
    n_vecs = vectors.count()
    for out in (one, two):
        sizes = {
            r.block: r.n for r in out.where(F.col("dim") == 0).collect()
        }
        assert sum(sizes.values()) == n_vecs
    with pytest.raises(ValueError):
        kmeans_refine_sums(vectors, iters=0)


def test_ivf_assign_matches_label_clusters(vectors):
    out = {r.id: r.assigned_block for r in ivf_assign(vectors).collect()}
    # vectors sit in their own label's centroid direction
    assert out[0] == 0 and out[1] == 0 and out[3] == 1 and out[4] == 1


@given(st.lists(st.integers(), max_size=500), st.integers(min_value=1, max_value=80))
@settings(max_examples=50, deadline=None)
def test_chunk_iterable_partitions_exactly(items, size):
    chunks = list(chunk_iterable(items, size))
    assert [x for c in chunks for x in c] == items
    assert all(len(c) == size for c in chunks[:-1])
    if chunks:
        assert 0 < len(chunks[-1]) <= size


def test_chunk_rejects_nonpositive():
    with pytest.raises(ValueError):
        list(chunk_iterable([1], 0))


def test_hash_split_deterministic_disjoint_stable(spark):
    from amazon_personalize_connectors_spark.functions.text import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = hash_split(df, w, "doc_id")
    s2 = hash_split(df, w, "doc_id")
    counts = {k: v.count() for k, v in s1.items()}
    assert sum(counts.values()) == 2000                       # exhaustive
    assert counts["train"] > counts["val"] > 0                # roughly weighted
    ids = {k: {r.doc_id for r in v.collect()} for k, v in s1.items()}
    assert not (ids["train"] & ids["val"]) and not (ids["val"] & ids["test"])
    assert ids == {k: {r.doc_id for r in v.collect()} for k, v in s2.items()}
    # growth stability: the same doc keeps its split in a bigger dataset
    bigger = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    s3 = hash_split(bigger, w, "doc_id")
    val_ids_big = {r.doc_id for r in s3["val"].collect()}
    assert ids["val"] == {i for i in val_ids_big if i < 2000}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(df, {"a": 0.5, "b": 0.4}, "doc_id")


def test_tfidf_ranks_rare_terms_over_common(spark):
    from amazon_personalize_connectors_spark.functions.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common common common zebra zebra unique"),
            (2, "common common words words here"),
            (3, "common words other thing here"),
        ],
        "doc_id long, text string",
    )
    top = tfidf_top_terms(docs, k=2)
    d1 = [r.term for r in top.where("id = 1").orderBy("rank").collect()]
    # zebra (tf=2, df=1) outranks common (tf=3, df=3 -> idf=0)
    assert d1[0] == "zebra"
    assert "common" not in d1


def test_decontaminate_flags_shared_ngrams(spark, docs):
    from amazon_personalize_connectors_spark.functions.dedup import (
        decontaminate_ngrams,
    )

    train = docs.where(F.col("doc_id") != 4)
    test = docs.where(F.col("doc_id") == 4)  # exact dup of doc 1
    out = decontaminate_ngrams(train, test, n=3).collect()
    by_id = {r["train_id"]: r for r in out}
    # doc 1 is an exact copy of the benchmark doc: every gram hits
    assert by_id[1]["n_hit_grams"] == by_id[1]["n_grams"]
    assert by_id[1]["hit_frac"] == 1.0
    # doc 2 differs only in the last word: shares all but the tail grams
    assert 0 < by_id[2]["n_hit_grams"] < by_id[2]["n_grams"]
    # unrelated and empty docs are NOT in the output at all
    assert 3 not in by_id and 5 not in by_id


def test_decontaminate_broadcasts_benchmark_side(spark, docs):
    from amazon_personalize_connectors_spark.functions.dedup import (
        decontaminate_ngrams,
    )

    out = decontaminate_ngrams(
        docs.where(F.col("doc_id") != 4), docs.where(F.col("doc_id") == 4)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles


def test_pack_sequences_covers_token_stream(spark):
    from amazon_personalize_connectors_spark.functions.text import pack_sequences

    rows = [(i, (i * 37) % 90 + 1) for i in range(200)] + [(999, 0)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens long")
    out = pack_sequences(df, ["doc_id"], capacity=100).collect()
    by_id = {r["doc_id"]: r for r in out}
    # offsets are the exclusive prefix sum in doc_id order
    acc = 0
    for i in sorted(by_id):
        r = by_id[i]
        assert r["start_offset"] == acc
        assert r["bin_id"] == acc // 100
        end = acc + r["n_tokens"]
        expect_spans = r["n_tokens"] > 0 and (acc // 100) != ((end - 1) // 100)
        assert r["spans_boundary"] == expect_spans
        acc = end
    assert by_id[999]["spans_boundary"] is False  # zero-token doc never spans


def test_scrub_pii_masks_and_counts(spark):
    from amazon_personalize_connectors_spark.functions.text import scrub_pii

    rows = [
        (1, "write to alice.smith+x@mail.example.org today"),
        (2, "call +1 (555) 123-4567 or mail bob@ex.io and eve@ex.io"),
        (3, "no contact info here"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    cols = scrub_pii(F.col("text"))
    out = {
        r["id"]: r
        for r in df.select(
            "id", cols["scrubbed"].alias("s"), cols["n_emails"].alias("e"),
            cols["n_phones"].alias("p"),
        ).collect()
    }
    assert out[1]["e"] == 1 and out[1]["s"] == "write to <EMAIL> today"
    assert out[2]["e"] == 2 and out[2]["p"] == 1
    assert out[2]["s"] == "call <PHONE> or mail <EMAIL> and <EMAIL>"
    assert out[3]["e"] == 0 and out[3]["p"] == 0 and out[3]["s"] == rows[2][1]
    # idempotent: scrubbing scrubbed text changes nothing
    again = scrub_pii(F.col("text"))
    df2 = df.select(cols["scrubbed"].alias("text"))
    assert df2.select(scrub_pii(F.col("text"))["n_emails"].alias("e")).agg(
        F.sum("e")
    ).first()[0] == 0


def test_rp_lsh_same_bucket_for_identical_vectors(spark):
    from amazon_personalize_connectors_spark.functions.similarity import (
        rp_lsh_buckets,
        rp_lsh_pairs,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # identical to 0
        (2, [0.99, 0.01, 0.0, 0.0]),  # near 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # antipodal: all bits flip
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    b = {r["id"]: r["bucket"] for r in rp_lsh_buckets(df, n_bits=6).collect()}
    assert b[0] == b[1] == b[2]
    assert b[3] == (2 ** 6 - 1) ^ b[0]  # sign flip complements every bit
    pairs = rp_lsh_pairs(df, n_bits=6, min_cosine=0.9).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got and (0, 2) in got
    assert all(3 not in p for p in got)


def test_temperature_resample_rates_and_determinism(spark):
    from amazon_personalize_connectors_spark.functions.text import (
        temperature_resample,
    )

    rows = [(i, "big" if i < 400 else "small") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    kept = temperature_resample(df, group_col="lang", id_col="doc_id")
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # smallest group keeps everything; big group ~ sqrt(100/400)=50%
    assert counts["small"] == 100
    assert 150 <= counts["big"] <= 250
    # deterministic: same rows on recompute and under repartition
    kept2 = temperature_resample(
        df.repartition(13), group_col="lang", id_col="doc_id"
    )
    ids1 = {r["doc_id"] for r in kept.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in kept2.select("doc_id").collect()}
    assert ids1 == ids2


def test_strip_repeated_segments_removes_boilerplate(spark):
    from amazon_personalize_connectors_spark.functions.dedup import (
        strip_repeated_segments,
    )

    # bodies are exactly seg_tokens long so the shared footer lands on
    # a segment boundary in every doc (segments are aligned windows of
    # the token stream, not sentence-split)
    footer = "subscribe to our newsletter now"
    rows = [
        (1, f"unique alpha content here today {footer}"),
        (2, f"other beta words entirely different {footer}"),
        (3, f"third gamma body text block {footer}"),
        (4, footer),                      # pure boilerplate -> dropped
        (5, "completely original document standing alone"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["id"]: r
        for r in strip_repeated_segments(
            df, seg_tokens=5, max_doc_freq=2
        ).collect()
    }
    # the shared footer segment (df=4 > 2) is stripped everywhere
    assert out[1]["clean_text"] == "unique alpha content here today"
    assert out[2]["clean_text"] == "other beta words entirely different"
    assert out[3]["clean_text"] == "third gamma body text block"
    assert 4 not in out  # fully-boilerplate doc vanishes
    assert out[5]["clean_text"] == "completely original document standing alone"
    assert out[1]["n_segs"] == 2 and out[1]["n_kept"] == 1


def test_sorted_neighborhood_bruteforce(spark):
    import re

    from amazon_personalize_connectors_spark.functions.dedup import (
        sorted_neighborhood_pairs,
    )

    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma",
        "zebra yak xylophone",
        "alpha beta delta epsilon",
        "zebra yak walrus",
        "mango kiwi lime",
        "mango kiwi lemon lime",
        "aardvark badger",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    w = 3
    got = {
        (r["id_a"], r["id_b"]): r
        for r in sorted_neighborhood_pairs(docs, window=w).collect()
    }

    # brute force: rank by (prefix-24 key, id), neighbors within w
    order = sorted(range(len(texts)), key=lambda i: (texts[i][:24], i))
    rid = {doc: r for r, doc in enumerate(order)}
    want = {}
    for a in range(len(texts)):
        for b in range(len(texts)):
            d = rid[b] - rid[a]
            if 0 < d < w:
                ta = set(re.split(r"[^a-z0-9]+", texts[a].lower())) - {""}
                tb = set(re.split(r"[^a-z0-9]+", texts[b].lower())) - {""}
                inter, uni = len(ta & tb), len(ta | tb)
                want[(a, b)] = (d, inter, uni, float(inter) / float(uni))
    assert set(got) == set(want)
    for k, (d, inter, uni, j) in want.items():
        r = got[k]
        assert (r["rank_dist"], r["common"], r["union_size"]) == (d, inter, uni)
        assert r["jaccard"] == j
    # pair count is linear: sum over ranks of min(w-1, n-1-rank)
    n = len(texts)
    assert len(got) == sum(min(w - 1, n - 1 - i) for i in range(n))
    # the two adjacent-in-sort near-dup families actually pair up
    # (orientation follows sort order: shorter prefix sorts first)
    assert got[(1, 0)]["jaccard"] >= 0.5 and got[(6, 5)]["jaccard"] >= 0.5


def test_dbscan_from_edges_roles_and_clusters(spark):
    from amazon_personalize_connectors_spark.functions.similarity import (
        dbscan_from_edges,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    out = {r.id: (r.role, r.cluster) for r in
           dbscan_from_edges(nodes, edges, min_pts=3).collect()}
    # chain 1-2-3-4: 2 and 3 are core (deg 2 + self), 1 and 4 border;
    # the 5-6 pair and isolated 7 are noise
    assert out[2] == ("core", 2) and out[3] == ("core", 2)
    assert out[1] == ("border", 2) and out[4] == ("border", 2)
    assert out[5] == ("noise", None)
    assert out[6] == ("noise", None)
    assert out[7] == ("noise", None)


def test_dbscan_isolated_core_keeps_own_id(spark):
    from amazon_personalize_connectors_spark.functions.similarity import (
        dbscan_from_edges,
    )

    # star: center 10 with 3 leaves — center is core, no core-core
    # edges at min_pts=4, so it keeps its own id; leaves are border
    nodes = spark.createDataFrame([(i,) for i in (10, 11, 12, 13)], "id long")
    edges = spark.createDataFrame(
        [(10, 11), (10, 12), (10, 13)], "id_a long, id_b long"
    )
    out = {r.id: (r.role, r.cluster) for r in
           dbscan_from_edges(nodes, edges, min_pts=4).collect()}
    assert out[10] == ("core", 10)
    assert out[11] == ("border", 10)
    assert out[12] == ("border", 10)
    assert out[13] == ("border", 10)


def _ref_bpe(word_counts, n_merges):
    # reference BPE with the SAME left-to-right separator-consuming
    # replace semantics the operator documents
    sep = "\x01"
    words = {
        sep + sep.join(w) + sep: c for w, c in word_counts.items()
    }
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, c in words.items():
            syms = [s for s in w.split(sep) if s]
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + c
        if not counts:
            break
        cmax = max(counts.values())
        x, y = min(p for p, c in counts.items() if c == cmax)
        merges.append((step, x, y, x + y, cmax))
        pat, rep = f"{sep}{x}{sep}{y}{sep}", f"{sep}{x + y}{sep}"
        words = {w.replace(pat, rep): c for w, c in words.items()}
    return merges


def test_bpe_learn_merges_matches_reference(spark):
    from amazon_personalize_connectors_spark.functions.text import (
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [("the cat sat on the mat the cat",),
         ("a cat and a rat sat",),
         ("matter chatter",)],
        "text string",
    )
    got = sorted(
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_learn_merges(docs, "text", n_merges=6).collect()
    )
    wc = {}
    for line in ["the cat sat on the mat the cat",
                 "a cat and a rat sat", "matter chatter"]:
        for w in line.split():
            if len(w) >= 2:
                wc[w] = wc.get(w, 0) + 1
    assert got == _ref_bpe(wc, 6)
    # merged symbols grow multi-character as rounds proceed
    assert any(len(m[3]) >= 3 for m in got)


def test_winnowing_guarantee_shared_substring(spark):
    from amazon_personalize_connectors_spark.functions.text import (
        winnowing_fingerprints,
    )

    # gram=8, window=4: any shared substring of >= 8+4-1 = 11 chars
    # must contribute at least one identical fingerprint to both docs
    shared = "xqzjvkwpmby"  # 11 chars, unlikely elsewhere
    docs = spark.createDataFrame(
        [(1, f"aaa {shared} bbb ccc ddd"),
         (2, f"eee fff {shared} ggg hhh")],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, "doc_id", "text", 8, 4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]


def test_winnowing_density(spark):
    from amazon_personalize_connectors_spark.functions.text import (
        winnowing_fingerprints,
    )

    text = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_fp = winnowing_fingerprints(docs, "doc_id", "text", 8, 4).count()
    n_grams = len(text) - 7
    # winnowing keeps roughly 2/(w+1) of grams, far fewer than all
    assert n_fp < n_grams * 0.8
    assert n_fp > 0


def test_bpe_encode_matches_trained_trace(spark):
    from amazon_personalize_connectors_spark.functions.text import (
        bpe_encode_vocab_counts,
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [("the cat sat on the mat",), ("that cat is fat",)],
        "text string",
    )
    merges = [
        (r["left"], r["right"])
        for r in sorted(bpe_learn_merges(docs, "text", 4).collect(),
                        key=lambda r: r["step"])
    ]
    assert len(merges) == 4
    vocab = {r.symbol: (r.n_words_with, r.total_occurrences)
             for r in bpe_encode_vocab_counts(docs, merges).collect()}
    # the symbols produced by the merges exist in the encoded vocab
    final_syms = set(vocab)
    assert any(len(s) >= 2 for s in final_syms)  # merges took effect
    # total occurrences conserve the corpus' word mass per symbol
    # position: every multi-char symbol came from concatenating merges
    for left, right in merges:
        assert left + right in final_syms or any(
            (left + right) in s for s in final_syms)


def test_kcore_peel_keeps_clique_drops_tail(spark):
    from amazon_personalize_connectors_spark.functions.dedup import kcore_peel

    # K4 clique (1,2,3,4) + a pendant chain 4-5-6: 3-core = the clique
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 6)], "id_a long, id_b long"
    )
    got = {r["node"]: r["deg"] for r in kcore_peel(edges, k=3, n_rounds=4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_peel_cascade_needs_multiple_rounds(spark):
    from amazon_personalize_connectors_spark.functions.dedup import kcore_peel

    # path 1-2-3-4-5: 2-core empty, but only after cascading peels
    path = [(i, i + 1) for i in range(1, 5)]
    edges = spark.createDataFrame(path, "id_a long, id_b long")
    assert kcore_peel(edges, k=2, n_rounds=4).count() == 0
    # one round is NOT enough (ends only) — fixed-round upper bound
    assert kcore_peel(edges, k=2, n_rounds=1).count() > 0


def test_kcore_peel_cycle_is_its_own_2core(spark):
    from amazon_personalize_connectors_spark.functions.dedup import kcore_peel

    cyc = [(1, 2), (2, 3), (3, 4), (4, 1)]
    edges = spark.createDataFrame(cyc, "id_a long, id_b long")
    got = {r["node"]: r["deg"] for r in kcore_peel(edges, k=2, n_rounds=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_bfs_min_hops_layers_and_cap(spark):
    from amazon_personalize_connectors_spark.functions.dedup import bfs_min_hops

    # path 1-2-3-4-5-6 plus a branch 2-10; seed = 1, radius 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 10)],
        "id_a long, id_b long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_min_hops(edges, seeds, 3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 10: 2, 4: 3}  # 5,6 beyond radius


def test_bfs_min_hops_multi_source_min(spark):
    from amazon_personalize_connectors_spark.functions.dedup import bfs_min_hops

    # two seeds; node 3 is 1 hop from seed 4 even though 2 hops from 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_min_hops(edges, seeds, 2).collect()}
    assert got == {1: 0, 4: 0, 2: 1, 3: 1}


def test_bfs_min_hops_isolated_seed_kept(spark):
    from amazon_personalize_connectors_spark.functions.dedup import bfs_min_hops

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    seeds = spark.createDataFrame([(99,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_min_hops(edges, seeds, 2).collect()}
    assert got == {99: 0}


def _hnsw_fixture(spark):
    # two well-separated blocks in 4-d; ids chosen so each block's hub
    # (min id) is NOT the best answer for the cross-block query
    rows = [
        # block 0: near e1
        (10, [1.00, 0.00, 0.00, 0.00], 0),
        (11, [0.99, 0.10, 0.00, 0.00], 0),
        (12, [0.98, 0.15, 0.05, 0.00], 0),
        (13, [0.97, 0.20, 0.05, 0.05], 0),
        # block 1: near e2
        (20, [0.00, 1.00, 0.00, 0.00], 1),
        (21, [0.10, 0.99, 0.00, 0.00], 1),
        (22, [0.15, 0.98, 0.05, 0.00], 1),
        (23, [0.20, 0.97, 0.05, 0.05], 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_hnsw_probe_finds_same_block_neighbors(spark, tmp_path):
    from amazon_personalize_connectors_spark.functions.similarity import (
        hnsw_index_build,
        hnsw_probe_topk,
    )

    emb = _hnsw_fixture(spark)
    idx = str(tmp_path / "hnsw")
    hnsw_index_build(spark, emb, idx, m=2, long_links=1, block_col="label")
    out = hnsw_probe_topk(
        spark, idx, emb.where(F.col("vec_id") == 11), k=3, ef=4, rounds=2
    ).collect()
    got = [r["n_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # 11's true top-3 by inner product are its block mates
    assert set(got) == {10, 12, 13}
    assert all(r["q_id"] == 11 for r in out)


def test_hnsw_beam_escapes_wrong_block_via_hubs(spark, tmp_path):
    from amazon_personalize_connectors_spark.functions.similarity import (
        hnsw_index_build,
        hnsw_probe_topk,
    )

    emb = _hnsw_fixture(spark)
    # a query vector that LIVES in block 0 (by its label) but points
    # at block 1 — nprobe=1 IVF on its own block would miss; the hub
    # round scores BOTH hubs so the beam descends into block 1
    q = spark.createDataFrame(
        [(99, [0.05, 0.99, 0.02, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    idx = str(tmp_path / "hnsw")
    hnsw_index_build(spark, emb, idx, m=2, long_links=1, block_col="label")
    out = hnsw_probe_topk(spark, idx, q, k=3, ef=4, rounds=2).collect()
    got = {r["n_id"] for r in out}
    # all results from block 1, reached through hub 20's edges
    assert got <= {20, 21, 22, 23} and len(got) == 3


def test_hnsw_probe_is_deterministic(spark, tmp_path):
    from amazon_personalize_connectors_spark.functions.similarity import (
        hnsw_index_build,
        hnsw_probe_topk,
    )

    emb = _hnsw_fixture(spark)
    idx = str(tmp_path / "hnsw")
    hnsw_index_build(spark, emb, idx, m=2, long_links=1, block_col="label")
    qs = emb.where(F.col("vec_id").isin(11, 22))
    a = sorted(
        hnsw_probe_topk(spark, idx, qs, k=3, ef=4, rounds=2).collect(),
        key=lambda r: (r["q_id"], r["rank"]),
    )
    b = sorted(
        hnsw_probe_topk(spark, idx, qs, k=3, ef=4, rounds=2).collect(),
        key=lambda r: (r["q_id"], r["rank"]),
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # exact int scores, ranks contiguous from 1, qdot non-increasing
    for q_id in (11, 22):
        rows = [r for r in a if r["q_id"] == q_id]
        assert [r["rank"] for r in rows] == [1, 2, 3]
        assert all(isinstance(r["qdot"], int) for r in rows)
        assert all(
            rows[i]["qdot"] >= rows[i + 1]["qdot"] for i in range(len(rows) - 1)
        )


def test_hnsw_lsh_mode_finds_true_neighbors(spark, tmp_path):
    from amazon_personalize_connectors_spark.functions.similarity import (
        hnsw_index_build,
        hnsw_probe_topk,
        quantized_topk,
    )

    # default (no block_col) mode: geometry comes from the multi-table
    # RP-LSH candidates, no precomputed block key at all
    emb = _hnsw_fixture(spark).drop("label")
    idx = str(tmp_path / "hnsw_lsh")
    hnsw_index_build(spark, emb, idx, m=3, n_bits=2, n_tables=2)
    qs = emb.where(F.col("vec_id").isin(11, 22))
    approx = hnsw_probe_topk(spark, idx, qs, k=3, ef=6, rounds=2)
    exact = quantized_topk(emb, qs, k=3)
    a = {(r["q_id"], r["n_id"]) for r in approx.select("q_id", "n_id").collect()}
    e = {(r["q_id"], r["n_id"]) for r in exact.select("q_id", "n_id").collect()}
    # on this tiny well-separated fixture the graph search is exact
    assert a == e


def test_ivf_multiprobe_reaches_second_cell(spark, tmp_path):
    from amazon_personalize_connectors_spark.functions.similarity import (
        brute_force_topk,
        ivf_index_build,
        ivf_probe_topk_indexed,
    )

    emb = _hnsw_fixture(spark)  # 2 well-separated blocks of 4
    idx = str(tmp_path / "ivf_mp")
    ivf_index_build(spark, emb, idx)
    q = emb.where(F.col("vec_id") == 11)
    # k=6 > block size: single-probe is STRUCTURALLY capped at the 3
    # other members of its own list; nprobe=2 reaches the second cell
    one = ivf_probe_topk_indexed(spark, idx, q, k=6, nprobe=1).collect()
    two = ivf_probe_topk_indexed(spark, idx, q, k=6, nprobe=2).collect()
    assert len(one) == 3 and {r["n_id"] for r in one} == {10, 12, 13}
    assert len(two) == 6
    # and with both cells probed the result IS the exact top-6
    exact = brute_force_topk(emb, q, k=6).collect()
    assert [(r["n_id"], r["rank"]) for r in sorted(two, key=lambda r: r["rank"])] == [
        (r["n_id"], r["rank"]) for r in sorted(exact, key=lambda r: r["rank"])
    ]


def test_cosine_zero_vector_yields_null_not_zero_division(spark):
    # Spark 4 ANSI raises DIVIDE_BY_ZERO even on double division: a
    # zero vector has no direction — cosine NULL, ranked last, no crash
    from amazon_personalize_connectors_spark.functions.similarity import (
        brute_force_topk,
    )

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    rows = brute_force_topk(emb, emb.where("vec_id = 2"), k=2).collect()
    by_rank = {r["rank"]: (r["n_id"], r["score"]) for r in rows}
    assert by_rank[1][0] == 3 and by_rank[1][1] is not None
    assert by_rank[2] == (1, None)  # zero vector: NULL score, last


def test_minhash_signature_equals_band_table_mins(spark):
    """Law connecting the two public MinHash forms: the per-row
    array-fold signature (minhash_signature) must equal the exploded
    groupBy-min the band table uses (minhash_band_table's perf form) —
    same seeds, same md5 domain, same mins."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        minhash_band_table,
        minhash_signature,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "pack my box with five dozen liquor jugs right now please"),
        ],
        "doc_id long, text string",
    )
    per_row = docs.select(
        F.col("doc_id").alias("id"),
        *minhash_signature(word_shingles(F.col("text"), 3), num_hashes=6),
    )
    sig_rows = {
        r["id"]: tuple(r[f"mh{s}"] for s in range(6))
        for r in per_row.collect()
    }
    # reconstruct signatures from the band table's buckets (band_size=2
    # concatenates consecutive mins with '|')
    bands = minhash_band_table(docs, num_hashes=6, band_size=2).collect()
    rebuilt = {}
    for r in bands:
        rebuilt.setdefault(r["id"], {})[r["band"]] = tuple(
            r["bucket"].split("|")
        )
    for doc, sig in sig_rows.items():
        flat = tuple(v for b in range(3) for v in rebuilt[doc][b])
        assert flat == sig


def test_embedding_decontaminate_flags_and_keeps(spark):
    from amazon_personalize_connectors_spark.functions.similarity import (
        embedding_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),      # identical to held-out -> flagged
            (2, [0.97, 0.24]),    # cosine ~0.97 -> flagged
            (3, [0.0, 1.0]),      # orthogonal -> kept
            (4, [-1.0, 0.0]),     # opposite -> kept
        ],
        "vec_id long, embedding array<float>",
    )
    heldout = spark.createDataFrame(
        [(99, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {
        r["id"]: (r["n_hits"], r["keep"])
        for r in embedding_decontaminate(corpus, heldout, 0.8).collect()
    }
    assert got[1] == (1, False) and got[2] == (1, False)
    assert got[3] == (0, True) and got[4] == (0, True)
    # empty held-out set: everything keeps, max_cosine NULL
    empty = heldout.where("vec_id < 0")
    rows = embedding_decontaminate(corpus, empty, 0.8).collect()
    assert all(r["keep"] and r["max_cosine"] is None for r in rows)


# --- MaxSim late-interaction retrieval (r8) --------------------------------


def _maxsim_fixture(spark):
    # doc 1: two orthogonal "topic" tokens; doc 2: two identical
    # mid-point tokens. Their POOLED vectors are equal by construction
    # — only term-level matching can tell them apart.
    rows = [
        (1, 0, [1.0, 0.0]),
        (1, 1, [0.0, 1.0]),
        (2, 0, [0.5, 0.5]),
        (2, 1, [0.5, 0.5]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, tok long, embedding array<float>"
    )


def test_maxsim_term_matching_beats_pooling(spark):
    from amazon_personalize_connectors_spark.functions.similarity import (
        maxsim_topk,
    )

    docs = _maxsim_fixture(spark)
    q = spark.createDataFrame(
        [(100, 0, [1.0, 0.0])], "q_id long, tok long, embedding array<float>"
    )
    out = sorted(
        maxsim_topk(docs, q, k=2).collect(), key=lambda r: r["rank"]
    )
    # query token e1 matches doc 1's first token exactly (dot 1e12);
    # doc 2's best token only half-matches (dot 5e11). A pooled dot
    # could not order them: both docs pool to [1e6, 1e6].
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score"] == 10**12
    assert out[1]["score"] == 5 * 10**11


def test_maxsim_single_token_bags_degenerate_to_dot_ranking(spark):
    from amazon_personalize_connectors_spark.functions.similarity import (
        maxsim_topk,
    )

    # 1 token per bag -> MaxSim == plain quantized dot ranking,
    # checked against an exact Python reference
    import math

    vecs = {
        1: [0.9, 0.1, 0.0],
        2: [0.3, 0.8, 0.2],
        3: [0.0, 0.2, 0.9],
        4: [0.6, 0.6, 0.1],
    }
    qvec = {7: [0.8, 0.2, 0.1]}
    docs = spark.createDataFrame(
        [(d, 0, v) for d, v in vecs.items()],
        "doc_id long, tok long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(7, 0, qvec[7])], "q_id long, tok long, embedding array<float>"
    )

    def qz(v):
        # match the operator exactly: float32 -> double -> floor(v*1e6)
        import struct

        return [
            math.floor(struct.unpack("f", struct.pack("f", x))[0] * 1e6)
            for x in v
        ]

    ref = sorted(
        (
            (sum(a * b for a, b in zip(qz(v), qz(qvec[7]))), -d)
            for d, v in vecs.items()
        ),
        reverse=True,
    )
    want = [(-d, s) for s, d in ref]
    got = [
        (r["doc_id"], r["score"])
        for r in sorted(
            maxsim_topk(docs, q, k=4).collect(), key=lambda r: r["rank"]
        )
    ]
    assert got == want


def test_maxsim_rescore_on_full_candidates_equals_topk(spark):
    from amazon_personalize_connectors_spark.functions.similarity import (
        maxsim_rescore,
        maxsim_topk,
    )

    docs = _maxsim_fixture(spark)
    # queries drawn from the corpus: doc 1's own tokens
    q = docs.where(F.col("doc_id") == 1).select(
        F.col("doc_id").alias("q_id"), "tok", "embedding"
    )
    full = maxsim_topk(docs, q, k=10, exclude_self=True)
    cand = spark.createDataFrame([(1, 2)], "q_id long, doc_id long")
    rescored = maxsim_rescore(cand, docs, q)
    a = {(r["q_id"], r["doc_id"]): (r["rank"], r["score"]) for r in full.collect()}
    b = {
        (r["q_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in rescored.collect()
    }
    # the candidate list IS the full non-self pair set here, so the
    # two forms must agree exactly (rank and exact int score)
    assert a == b


def test_refined_ivf_recovers_clusters_from_garbage_seeds(spark):
    from amazon_personalize_connectors_spark.functions.similarity import (
        ivf_refined_probe_topk,
    )

    # two tight, well-separated clusters in 4-d — but the label column
    # (the IVF seed partition) is nearly geometry-blind: each label
    # mixes both clusters (3:1 / 1:3), so the label-mean centroids sit
    # most of the way toward the midpoint and plain label-blocked IVF
    # mixes the clusters; the residual 3:1 tilt is what lets Lloyd
    # break the symmetry and snap the cells onto the true clusters.
    # (An EXACTLY 2:2 mix is a k-means saddle point — symmetric seeds
    # stay symmetric forever; that degenerate init needs multi-start,
    # not more rounds.)
    rows = [
        (0, [1.00, 0.01, 0.0, 0.0], 0),
        (1, [0.99, 0.02, 0.0, 0.0], 0),
        (2, [0.98, 0.00, 0.02, 0.0], 0),
        (3, [0.97, 0.03, 0.01, 0.0], 1),
        (10, [0.01, 1.00, 0.0, 0.0], 0),
        (11, [0.02, 0.99, 0.0, 0.0], 1),
        (12, [0.00, 0.98, 0.02, 0.0], 1),
        (13, [0.03, 0.97, 0.01, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = emb.where(F.col("vec_id") == 0)
    # ground truth for vec 0: its cluster mates 1, 2, 3
    refined = ivf_refined_probe_topk(emb, q, rounds=2, nprobe=1, k=3)
    got = {r["n_id"] for r in refined.collect()}
    assert got == {1, 2, 3}, got
    # and the refined cells themselves are exactly the two clusters
    from amazon_personalize_connectors_spark.functions.similarity import (
        _as_double,
        _assign_to_centroids,
        refined_centroid_table,
    )

    cents = refined_centroid_table(emb, rounds=2)
    assigned = _assign_to_centroids(
        _as_double(emb, "embedding").select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        ),
        cents,
    )
    cells = {
        r["id"]: r["assigned_block"] for r in assigned.collect()
    }
    assert len({cells[i] for i in (0, 1, 2, 3)}) == 1
    assert len({cells[i] for i in (10, 11, 12, 13)}) == 1
    assert cells[0] != cells[10]


def test_maxsim_is_token_order_invariant_and_tops_planted_dup(spark):
    from amazon_personalize_connectors_spark.functions.similarity import (
        maxsim_topk,
    )

    # doc 20 is doc 10's bag with the token order REVERSED — MaxSim is
    # bag semantics, so the pair must score exactly the self-score and
    # outrank every other doc for query=doc 10's tokens
    base = [[1.0, 0.0, 0.1], [0.0, 1.0, 0.2]]
    rows = (
        [(10, t, v) for t, v in enumerate(base)]
        + [(20, t, v) for t, v in enumerate(reversed(base))]
        + [(30, 0, [0.4, 0.3, 0.9]), (30, 1, [0.2, 0.8, 0.5])]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, tok long, embedding array<float>"
    )
    q = docs.where(F.col("doc_id") == 10).select(
        F.col("doc_id").alias("q_id"), "tok", "embedding"
    )
    out = sorted(
        maxsim_topk(docs, q, k=3, exclude_self=True).collect(),
        key=lambda r: r["rank"],
    )
    assert out[0]["doc_id"] == 20
    # identical bag -> score equals the sum of per-token self dots
    self_score = sorted(
        maxsim_topk(docs, q, k=3, exclude_self=False).collect(),
        key=lambda r: r["rank"],
    )[0]
    assert self_score["doc_id"] == 10
    assert out[0]["score"] == self_score["score"]


def test_refined_ivf_indexed_serve_equals_in_plan(spark, tmp_path):
    """Build-once/probe-many law (VERDICT r8 item 4): probing the
    PERSISTED refined-IVF index (refined_ivf_index_build +
    ivf_probe_topk_indexed) is result-identical to the in-plan
    ivf_refined_probe_topk at equal (rounds, nprobe, k) — the bench's
    probe-only numbers measure the same search, minus the rebuild."""
    import random as _random

    from amazon_personalize_connectors_spark.functions.similarity import (
        ivf_probe_topk_indexed,
        ivf_refined_probe_topk,
        refined_ivf_index_build,
    )

    rng = _random.Random(20260816)
    rows = [
        (i, i % 5, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    qs = emb.where("vec_id % 10 = 0")
    in_plan = {
        (r["q_id"], r["n_id"], r["rank"], r["score"])
        for r in ivf_refined_probe_topk(
            emb, qs, rounds=2, nprobe=2, k=4
        ).collect()
    }
    idx = str(tmp_path / "rivf")
    refined_ivf_index_build(spark, emb, idx, rounds=2)
    served = {
        (r["q_id"], r["n_id"], r["rank"], r["score"])
        for r in ivf_probe_topk_indexed(
            spark, idx, qs, k=4, nprobe=2
        ).collect()
    }
    assert served == in_plan and len(served) > 0


def test_simhash16_table_equals_column_form(spark, docs):
    """The corpus-scale explode+aggregate form (q:simhash's benched
    shape since r10) is bit-identical to the per-row simhash16
    column, including the tokenless-doc all-ones convention."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        simhash16_table,
    )

    aug = docs.select("doc_id", "text").union(
        spark.createDataFrame(
            [(901, ""), (902, " .,;! ")], "doc_id long, text string"
        )
    )
    col_form = {
        r.doc_id: r.sig
        for r in aug.select(
            "doc_id", simhash16(F.col("text")).alias("sig")
        ).collect()
    }
    tab_form = {r.id: r.sig for r in simhash16_table(aug).collect()}
    assert tab_form == col_form
    assert tab_form[901] == 0xFFFF and tab_form[902] == 0xFFFF
