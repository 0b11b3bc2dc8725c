"""Round-12 corpus-analytics wave: distribution-wide repetition,
collocation PMI, document entropy, Zipf audit, cross-source overlap,
and self-trained bigram perplexity — the remaining first-pass
signals a pretraining-data pipeline computes over a raw corpus
before mixing/filtering (beyond the reference's scope;
engine additions per the LLM-pipeline brief, SURVEY.md §2 addendum).

All six are pure Catalyst compositions (exact bigint counts, the
``mutual_information`` floor-quantization pattern for every log
term) with DuckDB oracles in sql04.py mirroring the arithmetic
step for step."""

from __future__ import annotations

from amazon_personalize_connectors_spark.queries._shared import *  # noqa: F401,F403


def q_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc duplicated 5-gram instance fraction
    (functions/dedup.py dup_ngram_fraction — the RefinedWeb "rep"
    distribution signal; repetition_signals' top-gram twin)."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        dup_ngram_fraction,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 3 == 0
    )
    return dup_ngram_fraction(docs, n=5).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_grams",
        "dup_grams",
        "dup_frac",
        "flag_repetitive",
    )


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 adjacent-pair collocations by quantized PMI
    (functions/text.py token_pmi; exact bigint pmi_q, distributed
    take-ordered — never a global sort)."""
    from amazon_personalize_connectors_spark.functions.text import token_pmi

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    return token_pmi(docs, min_count=5, top_k=100).select(
        "w1", "w2", "c_ab", "pmi_q", "pmi"
    )


def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy in exact nano-nat quanta
    (functions/text.py doc_entropy)."""
    from amazon_personalize_connectors_spark.functions.text import doc_entropy

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 3 == 0
    )
    return doc_entropy(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "distinct_tokens",
        "h_q",
        "entropy",
    )


def q_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent per language over the top-500 ranks
    (functions/text.py zipf_alpha; decimal-exact OLS moments)."""
    from amazon_personalize_connectors_spark.functions.text import zipf_alpha

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return zipf_alpha(docs, group_col="lang", max_rank=500).select(
        "lang", "n_ranked", "alpha"
    )


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source distinct-8-gram overlap matrix
    (functions/dedup.py source_overlap; vocabulary equi-join on the
    gram, fan-out bounded by the source domain)."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        source_overlap,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return source_overlap(docs, n=8).select(
        "source_a", "source_b", "n_a", "n_b", "common", "jaccard", "containment_a"
    )


def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own add-one
    bigram LM (functions/text.py bigram_perplexity). The emitted
    columns stop at cross_entropy — exact-quanta-derived and
    engine-portable; ppl = exp(ce) is left out of the oracle compare
    because exp's last-ulp behavior is libm-specific (ln parity is
    pinned by the green mutual_information family; exp has no such
    precedent)."""
    from amazon_personalize_connectors_spark.functions.text import (
        bigram_perplexity,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    return bigram_perplexity(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_bigrams",
        "h_q",
        "cross_entropy",
    )


__all__ = [
    "q_dup_ngram_fraction",
    "q_token_pmi",
    "q_doc_entropy",
    "q_zipf_alpha",
    "q_source_overlap",
    "q_bigram_perplexity",
]
