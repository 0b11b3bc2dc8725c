"""F1/F2/F3 — one-pass error split of the batch-inference scan.

Reference: ``where("error is null")`` / ``where("error is not null")``
then ``drop_fields(['error'])`` (related_items_etl.py:111-136,
user_personalization_etl.py:109-134).

The reference re-scans the source for each branch and fires eager
``count()`` actions (A2, 8x per job). Here both branches share one
cached scan and metric counts ride along via ``observe`` — no extra
jobs, no re-read. At 100 TB re-scanning the fact table twice is the
difference between one pass and two.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ErrorSplit:
    ok: DataFrame
    errors: DataFrame
    source: DataFrame | None = None  # the cached scan, when cache=True

    def __iter__(self):
        # tuple-style unpacking: ok, errors = split_errors(df)
        return iter((self.ok, self.errors))

    def unpersist(self) -> None:
        """Release the cached source scan. Caching contract: with
        ``cache=True`` the scan stays pinned for the session until this
        is called — long-lived sessions that split many sources should
        call it once both branches are fully consumed (or pass
        ``cache=False`` and manage caching themselves, as run_job
        does)."""
        if self.source is not None:
            self.source.unpersist()


def split_errors(df: DataFrame, cache: bool = True) -> ErrorSplit:
    """Split into (success rows sans ``error`` column, error rows).

    ``cache=True`` persists the parsed source so the two filter branches
    (and any later count) reuse one scan — replaces the reference's
    repeated lineage recomputation (SURVEY.md §4 anti-patterns). See
    ``ErrorSplit.unpersist`` for the cache lifecycle.
    """
    if cache:
        df = df.cache()
    ok = df.where(F.col("error").isNull()).drop("error")
    errors = df.where(F.col("error").isNotNull())
    return ErrorSplit(ok=ok, errors=errors, source=df if cache else None)
