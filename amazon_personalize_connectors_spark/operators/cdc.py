"""Change-data-capture operators: snapshot diff and change application
(MERGE semantics) as set algebra, never row-at-a-time.

The reference's delta check (operators/delta.py, ri:240-258) answers
"what is NEW since last sync" one-way. Warehouse users also need the
full CDC triple — inserts, updates, deletes — between two snapshot
versions, and the inverse operation: applying a change batch onto a
snapshot to roll it forward. Together they satisfy the round-trip law

    apply_changes(old, snapshot_diff(old, new)) == new

which is exactly what the oracle checks (__spark_entry__:
snapshot_cdc / cdc_roundtrip).

Scale shapes:

* ``snapshot_diff`` is ONE full-outer shuffle join on the key columns
  — both sides partition by the same key, no second pass. Unchanged
  rows are dropped with a null-safe struct equality that codegens to
  a single comparison; at 100 TB with mostly-unchanged snapshots the
  output (the actual changes) is tiny compared to the inputs.
* ``apply_changes`` is one left-anti join (evict keys present in the
  change batch) + one union + one filter — cost ∝ |snapshot| +
  |changes| with a single shuffle each, the same algebra a MERGE
  INTO compiles to minus the transactional machinery.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Diff two snapshot versions into a CDC batch.

    Returns one row per changed key: the key columns, ``op`` in
    ('insert', 'update', 'delete'), and the NEW values of
    ``compare_cols`` (null for deletes). Unchanged keys are absent.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_cols]
    if op_col in (*key_cols, *compare_cols):
        raise ValueError(
            f"op_col {op_col!r} collides with a key/compare column; "
            "pass a different op_col"
        )
    o = old.select(
        *key_cols, F.struct(*[F.col(c) for c in compare_cols]).alias("_old")
    )
    n = new.select(
        *key_cols, F.struct(*[F.col(c) for c in compare_cols]).alias("_new")
    )
    joined = o.join(n, list(key_cols), "full_outer")
    op = (
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("update"))
    )
    return (
        joined.withColumn(op_col, op)
        .where(F.col(op_col).isNotNull())
        .select(
            *key_cols,
            op_col,
            *[F.col(f"_new.{c}").alias(c) for c in compare_cols],
        )
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Roll a snapshot forward by a CDC batch (MERGE semantics):
    rows keyed in ``changes`` are evicted from the snapshot (covers
    update + delete), then insert/update rows are appended with their
    new values. Column set of the result == column set of
    ``snapshot``.

    Only an EXPLICIT ``op == 'delete'`` deletes: the comparison is
    null-safe, so a malformed change row with NULL in ``op_col`` is
    treated as an upsert (its key was already evicted by the
    anti-join; a plain ``op != 'delete'`` evaluates NULL and would
    silently drop the row — i.e. delete the key)."""
    value_cols = [c for c in snapshot.columns if c not in key_cols]
    keys = changes.select(*key_cols)
    kept = snapshot.join(keys, list(key_cols), "left_anti")
    upserts = changes.where(~F.col(op_col).eqNullSafe("delete")).select(
        *key_cols, *value_cols
    )
    return kept.unionByName(upserts)


def retractable_rollup_merge(
    base_rollup: DataFrame,
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    group_col: str,
    value_col: str,
    sum_name: str = "sum_v",
    count_name: str = "n_rows",
) -> DataFrame:
    """Maintain a grouped (sum, count) rollup under a snapshot change
    INCLUDING updates and deletes — the retraction-aware sibling of
    the insert-only ``incremental_rollup_merge``: an update
    contributes ``new - old`` to its group's sum, a delete retracts
    ``-old`` and decrements the count, and a group whose count
    reaches zero drops out of the rollup entirely. Law (what the
    oracle checks end-to-end):

        merge(rollup(old), deltas(old -> new)) == rollup(new)

    ``group_col`` must be derivable from the key columns (a changed
    row stays in its group); ``value_col`` should be an exact type
    (bigint cents / decimal) so retraction is lossless — float sums
    cannot be retracted bit-exactly.

    Scale shape: the signed per-key deltas come from ONE full-outer
    join of the two fact snapshots on the key (at warehouse scale this
    is the CDC feed itself — no join needed); unchanged keys are
    dropped BEFORE the group aggregate, so the delta aggregate is
    ∝ changed keys; the merge touches rollup rows (∝ groups), never
    the fact tables again."""
    o = old.select(
        *key_cols,
        F.col(group_col).alias("_g"),
        F.col(value_col).alias("_vo"),
        F.lit(1).alias("_po"),
    )
    n = new.select(
        *key_cols,
        F.col(group_col).alias("_gn"),
        F.col(value_col).alias("_vn"),
        F.lit(1).alias("_pn"),
    )
    j = o.join(n, list(key_cols), "full_outer")
    deltas = j.select(
        F.coalesce(F.col("_gn"), F.col("_g")).alias(group_col),
        (
            F.coalesce(F.col("_vn"), F.lit(0))
            - F.coalesce(F.col("_vo"), F.lit(0))
        ).alias("_dv"),
        (
            F.coalesce(F.col("_pn"), F.lit(0))
            - F.coalesce(F.col("_po"), F.lit(0))
        ).cast("long").alias("_dn"),
    ).where((F.col("_dv") != 0) | (F.col("_dn") != 0))
    dagg = deltas.groupBy(group_col).agg(
        F.sum("_dv").alias(sum_name),
        F.sum("_dn").alias(count_name),
    )
    merged = (
        base_rollup.unionByName(dagg)
        .groupBy(group_col)
        .agg(
            F.sum(sum_name).alias(sum_name),
            F.sum(count_name).cast("bigint").alias(count_name),
        )
    )
    return merged.where(F.col(count_name) > 0)


def incremental_join_rollup(
    base_rollup: DataFrame,
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    a_key: str,
    b_key: str,
    group_col: str,
    value_col: str,
    sum_name: str = "sum_v",
    count_name: str = "n_rows",
) -> DataFrame:
    """Maintain a grouped (sum, count) rollup over a JOIN under
    inserts to BOTH sides — classic two-sided incremental view
    maintenance. The textbook delta rule

        (A ∪ ΔA) ⋈ (B ∪ ΔB)
            = A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB

    means the stored aggregate of A⋈B is never recomputed: the three
    delta terms are each delta-sized joins (a delta side probing a
    base side — broadcastable when the tick is small, and the base
    scans prune to the join/group/value columns), their partial
    rollups are merged into the stored rollup by ADDITION, and the
    merge itself touches ∝ groups rows. Law (what the oracle checks
    end-to-end):

        merge(rollup(A⋈B), delta_terms) == rollup((A∪ΔA)⋈(B∪ΔB))

    ``group_col`` lives on the A side, ``value_col`` on the B side;
    ``value_col`` must be an exact type (bigint cents / decimal) so
    partial sums merge associatively — float partials do not. Works
    for any 2-way partition of each input (the split needs no
    semantic meaning). Insert-only by design; pair with
    ``retractable_rollup_merge``'s signed deltas when updates and
    deletes must retract."""
    def term(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.select(F.col(a_key).alias("_k"), group_col)
            .join(
                b.select(F.col(b_key).alias("_k"), value_col),
                "_k",
            )
            .groupBy(group_col)
            .agg(
                F.sum(value_col).alias(sum_name),
                F.count(F.lit(1)).cast("bigint").alias(count_name),
            )
        )

    terms = (
        term(delta_a, base_b)
        .unionByName(term(base_a, delta_b))
        .unionByName(term(delta_a, delta_b))
        .unionByName(base_rollup.select(group_col, sum_name, count_name))
    )
    return terms.groupBy(group_col).agg(
        F.sum(sum_name).alias(sum_name),
        F.sum(count_name).cast("bigint").alias(count_name),
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
    when_not_matched_by_source: str = "keep",
    matched_condition=None,
) -> DataFrame:
    """MERGE INTO as a single batch operator — the classic warehouse
    upsert users were hand-rolling as diff + three-way union. Clause
    surface mirrors ANSI/Delta MERGE:

    * ``when_matched``: 'update' (take source values), 'delete', or
      'keep' (ignore the source row). ``matched_condition`` (a Column
      over the joined row) restricts the clause — non-qualifying
      matches keep the target row, exactly like an unmatched WHEN
      MATCHED AND <cond> in SQL MERGE.
    * ``when_not_matched``: 'insert' or 'ignore' (source-only keys).
    * ``when_not_matched_by_source``: 'keep' or 'delete' (target-only
      keys) — 'delete' turns the merge into full snapshot
      replacement, satisfying the law
      ``merge_upsert(old, new, delete-by-source) == new`` and hence
      ``== apply_changes(old, snapshot_diff(old, new))`` (the
      round-trip the oracle checks; see test_cdc law tests).

    Scale shape: ONE full-outer shuffle join on the key (both sides
    co-partition; AQE broadcasts a small source), then a row-local
    CASE per column — no second pass, no union of three scans of the
    target. Source must carry the target's column set."""
    for name, val, allowed in (
        ("when_matched", when_matched, ("update", "delete", "keep")),
        ("when_not_matched", when_not_matched, ("insert", "ignore")),
        (
            "when_not_matched_by_source",
            when_not_matched_by_source,
            ("keep", "delete"),
        ),
    ):
        if val not in allowed:
            raise ValueError(f"{name} must be one of {allowed}; got {val!r}")
    value_cols = [c for c in target.columns if c not in key_cols]
    if not value_cols:
        raise ValueError(
            "merge_upsert needs at least one non-key column on the "
            "target (a key-only merge is a set union/difference — use "
            "delta.except_/anti operators)"
        )
    t = target.select(
        *key_cols,
        F.struct(*[F.col(c) for c in value_cols]).alias("_tv"),
        F.lit(True).alias("_tp"),
    )
    s = source.select(
        *key_cols,
        F.struct(*[F.col(c) for c in value_cols]).alias("_sv"),
        F.lit(True).alias("_sp"),
    )
    j = t.join(s, list(key_cols), "full_outer")
    matched = F.col("_tp").isNotNull() & F.col("_sp").isNotNull()
    clause_hits = (
        matched
        if matched_condition is None
        else matched & F.coalesce(matched_condition, F.lit(False))
    )
    # which side's value struct survives (NULL struct == row dropped)
    take = F.when(
        clause_hits,
        F.col("_sv") if when_matched == "update" else (
            F.lit(None) if when_matched == "delete" else F.col("_tv")
        ),
    ).when(
        matched, F.col("_tv")  # matched but clause condition false
    ).when(
        F.col("_sp").isNotNull(),  # source-only
        F.col("_sv") if when_not_matched == "insert" else F.lit(None),
    ).otherwise(  # target-only
        F.col("_tv") if when_not_matched_by_source == "keep" else F.lit(None)
    )
    return (
        j.withColumn("_out", take)
        .where(F.col("_out").isNotNull())
        .select(
            *key_cols,
            *[F.col(f"_out.{c}").alias(c) for c in value_cols],
        )
    )
