"""Top-k knob over the ordered recommendations array.

Not present in the reference (Personalize already emits ranked top-N —
SURVEY.md §2.7), but a one-line engine extension: the array is already
rank-ordered, so top-k is ``slice``, no sort and no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def limit_recommendations(
    df: DataFrame, k: int, rec_col: str = "recommendations"
) -> DataFrame:
    """Keep the first ``k`` (highest-ranked) recommendations."""
    if k < 0:
        raise ValueError("k must be >= 0")
    return df.withColumn(rec_col, F.slice(F.col(rec_col), 1, k))
