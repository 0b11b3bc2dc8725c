"""Fuzzy string matching at join scale: edit-distance joins via
deletion-neighborhood blocking (FastSS; Bocek et al., "Fast Similarity
Search in Large Dictionaries", 2007 — public algorithm).

The naive edit-distance join is an all-pairs cross join — dead at any
scale. FastSS blocks on DELETION VARIANTS: for distance ≤ 1, if
lev(s, t) ≤ 1 then s and t share at least one string in each other's
{self} ∪ {one-char deletions} set. Variant generation is pure
Catalyst (transform over a char-index sequence — codegen, no Python),
variants are hashed to 64-bit keys so the candidate join is an
8-byte equi-join, and a final exact ``levenshtein`` filter removes
the false candidates (shared variant ⟹ lev ≤ 2, not ≤ 1).

Scale shape: a string of length L fans out to L+1 variant rows —
bounded, predictable — and everything downstream is equi-join +
dedup, the shapes Spark already scales. No cross join exists in the
plan (pinned by test_plan_quality-style assertion in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column) -> Column:
    """array<string>: the string itself plus every single-character
    deletion. Catalyst-only: transform over 1..length indices."""
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substring(col, F.lit(1), (i - 1).cast("int")),
            col.substr(i + 1, F.length(col)),
        ),
    )
    return F.array_union(F.array(col), deletions)


def deletion_variants_k2(col: Column) -> Column:
    """array<string>: the string, all 1-deletions, and all
    2-deletions (delete positions i < j). Fan-out is
    1 + L + L(L-1)/2 — quadratic in string LENGTH only, never in
    corpus size. Nested transforms flattened; still pure Catalyst."""
    two_del = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.transform(
                F.sequence(i + 1, F.length(col) + 1),
                # j ranges one past length so empty inner arrays never
                # appear; the j == length+1 slot re-emits the 1-deletion
                # at i (harmless: array_distinct collapses it)
                lambda j: F.concat(
                    F.substring(col, F.lit(1), (i - 1).cast("int")),
                    col.substr(i + 1, (j - i - 1).cast("int")),
                    col.substr(j + 1, F.length(col)),
                ),
            ),
        )
    )
    return F.array_distinct(F.concat(deletion_variants(col), two_del))


def _variant_table(
    df: DataFrame, id_col: str, str_col: str, block_col: str | None,
    max_dist: int = 1,
) -> DataFrame:
    """(id, string, block, variant-hash) — one row per deletion
    variant (up to ``max_dist`` deletions). ``block`` is a structured
    blocking key (constant when none given) that rides into the
    candidate equi-join."""
    block = F.col(block_col) if block_col else F.lit(0)
    variants = (
        deletion_variants(F.col(str_col))
        if max_dist == 1
        else deletion_variants_k2(F.col(str_col))
    )
    return df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        block.alias("_blk"),
        F.explode(variants).alias("_v"),
    ).select("_id", "_s", "_blk", F.xxhash64("_v").alias("_vh"))


def editdist_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    block_col: str | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) whose strings are within edit distance
    ``max_dist`` (1 or 2; if lev(s,t) <= k, the <= k-deletion
    neighborhoods of s and t intersect — the FastSS candidate
    guarantee — and the exact levenshtein pass removes the rest).
    Returns (id_a, id_b, dist).

    Candidates come from an equi-join on hashed deletion variants;
    the exact levenshtein filter runs only on candidates that share a
    variant — per string that is its near-neighborhood, never the
    corpus. ``block_col`` adds a structured blocking key to the join
    (the classic record-linkage move: only resolve entities within
    the same region/category), which both shrinks candidates and
    spreads the shuffle across (block, variant) instead of variant
    alone.
    """
    if max_dist not in (1, 2):
        raise NotImplementedError(
            "deletion-neighborhood blocking implemented for max_dist in "
            "{1, 2}; higher distances need k-deletion variant generators"
        )
    v = _variant_table(df, id_col, str_col, block_col, max_dist)
    a = v.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa"), "_blk", "_vh"
    )
    b = v.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("_sb"), "_blk", "_vh"
    )
    cand = (
        a.join(b, ["_vh", "_blk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.levenshtein("_sa", "_sb").alias("dist"),
    ).where(F.col("dist") <= max_dist)
