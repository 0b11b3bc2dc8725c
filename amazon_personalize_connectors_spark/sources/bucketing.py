"""Bucketed tables — the co-located-join strategy for repeated big
joins (SURVEY.md §2.4 scale notes).

At 100 TB the attribution join (J1) and delta anti-join re-shuffle the
fact side on every run. Writing both sides bucketed on the join key
(`DataFrameWriter.bucketBy` + `sortBy`, hash-partitioned files tracked
in the catalog) makes the join a zero-exchange sort-merge: each task
reads matching buckets from both tables. The write cost is one shuffle,
paid once, amortized over every subsequent run — the Spark-native
equivalent of the reference re-reading its mapping CSVs per run
(related_items_etl.py:141-155) but without the per-run shuffle.

``assert_no_shuffle_join`` is used by tests to prove the property from
the physical plan rather than trusting the doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and bucket-sorted)
    on ``bucket_cols``. ``n_buckets`` should be sized so one bucket of
    the LARGER table fits an executor's memory at target scale."""
    writer = (
        df.write.format(format)
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    plans with zero Exchange when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange (reused
    ones included) — the bucketed-join invariant."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        stripped = line.strip(" :+-*")
        if stripped.startswith("Exchange"):
            raise AssertionError(f"unexpected shuffle in plan:\n{plan}")
