"""LSH-prefiltered embedding decontamination (VERDICT r7 item 3):
the prefiltered verdict must agree with the exhaustive form wherever
the flagged pair shares a bucket, and the candidate set must actually
shrink. On the driver fixture (held-out = vec_id % 50) the agreement
is TOTAL — every exhaustive flag is caught — which the first test
pins; the second pins the reduction ratio is real and reports it.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.functions.similarity import (
    embedding_decontaminate,
    embedding_decontaminate_lsh,
    lsh_signed_nodes,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    path = os.path.join(SF_DIR, "embeddings.parquet")
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    return spark.read.parquet(path)


def test_lsh_flags_match_exhaustive(spark, emb):
    ho = emb.where(F.col("vec_id") % 50 == 0)
    ex = {r["id"]: (r["keep"], r["n_hits"])
          for r in embedding_decontaminate(emb, ho, 0.8).collect()}
    ls = {r["id"]: (r["keep"], r["n_hits"])
          for r in embedding_decontaminate_lsh(emb, ho, 0.8).collect()}
    assert set(ex) == set(ls), "id universes diverge"
    # the verdict (keep) and hit count agree on every row of this
    # fixture: every cosine>=0.8 pair shares >=1 of the 4 buckets
    diffs = {i: (ex[i], ls[i]) for i in ex if ex[i] != ls[i]}
    assert not diffs, f"prefilter changed verdicts: {diffs}"
    # the exhaustive run actually flags something, else vacuous
    assert any(not k for k, _ in ex.values())


def test_lsh_prefilter_reduces_candidates(spark, emb):
    ho = emb.where(F.col("vec_id") % 50 == 0)
    csig = lsh_signed_nodes(emb, 4, 4)
    hsig = lsh_signed_nodes(ho, 4, 4)
    hb = hsig.agg(
        *[F.collect_set(f"t{t}").alias(f"_hb{t}") for t in range(4)]
    )
    cond = None
    for t in range(4):
        h = F.array_contains(F.col(f"_hb{t}"), F.col(f"t{t}"))
        cond = h if cond is None else cond | h
    n_cand = csig.crossJoin(F.broadcast(hb)).where(cond).count()
    n = emb.count()
    assert n_cand < n, "prefilter kept every corpus row"
    # reduction is modest here ONLY because 10 held-out vectors at 4
    # bits cover most buckets; auto_n_bits widens signatures with N,
    # shrinking per-bucket coverage at scale
    print(f"candidate-reduction ratio: {1 - n_cand / n:.2%} ({n_cand}/{n})")


def test_lsh_non_candidates_report_null_max(spark):
    """The documented information trade: a non-candidate reports
    n_hits=0 / keep=true / max_cosine NULL (the exhaustive form would
    report its true sub-threshold max)."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    ho = spark.createDataFrame(
        [(100, [1.0, 0.01])], "vec_id long, embedding array<float>"
    )
    out = {r["id"]: r for r in
           embedding_decontaminate_lsh(corpus, ho, 0.8, n_bits=4,
                                       n_tables=1).collect()}
    assert out[1]["keep"] is False and out[1]["n_hits"] == 1
    # opposite vector: different bucket in the single table -> never
    # scored -> NULL max_cosine, keep
    assert out[2]["keep"] is True and out[2]["n_hits"] == 0
    assert out[2]["max_cosine"] is None
