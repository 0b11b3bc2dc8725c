"""Text-analysis functions for large-scale training-data pipelines.

Not present in the reference (its payloads are already-structured
recommendation records); these extend the engine to the document-
processing operators a 100 TB data pipeline needs: tokenization,
quality scoring, language heuristics, and content fingerprinting.

All are pure Catalyst column expressions (built-in string/array/
higher-order functions — JVM-side, whole-stage codegen, zero Python
UDFs), so they scale linearly with executors and never serialize rows
to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Function words for the stopword-ratio language heuristic. Deliberately
# tiny: the point is the operator shape (set-membership ratio over a
# token array), not linguistic accuracy.
ENGLISH_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is")

# BPE-ish lexer: alpha runs | digit runs | any single non-space symbol.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric tokens (split on non-alphanumeric runs,
    empties dropped)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def whitespace_token_count(text: Column) -> Column:
    """Naive whitespace token count."""
    return F.size(F.filter(F.split(text, "\\s+"), lambda t: t != F.lit("")))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs + single symbols."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), 0))


def total_token_chars(toks: Column) -> Column:
    """Sum of token lengths (integer fold — deterministic)."""
    return F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )


def stopword_hits(toks: Column, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    """Number of tokens that are function words."""
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: token count, mean token length, and
    stopword ratio. Ratios are exact integer-division doubles so they
    reproduce bit-identically on any engine."""
    toks = tokens(text)
    n = F.size(toks).cast("bigint")
    total_chars = total_token_chars(toks)
    hits = stopword_hits(toks).cast("bigint")
    return {
        "n_tokens": n,
        "avg_token_len": F.when(n > 0, total_chars / n),
        "stopword_ratio": F.when(n > 0, hits / n),
        "is_english": F.when(n > 0, (hits / n) > 0.05).otherwise(F.lit(False)),
    }


def fingerprint_min_8gram(text: Column) -> Column:
    """Content fingerprint: the minimum md5 over all character 8-grams
    (winnowing-style rolling fingerprint, window = whole document).
    Robust to edits outside the minimizing window; two documents
    sharing their minimizing 8-gram collide — the building block for
    shingle-based near-dup bucketing."""
    n_windows = F.greatest(F.length(text) - F.lit(7), F.lit(1))
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.md5(F.substring(text, i, 8)),
        )
    )
