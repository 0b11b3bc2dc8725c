"""P2/P3/P4 + E3/E4/E6/F10 — the connector "payload algebra".

The reference does this record-at-a-time in the dequeue Lambda
(braze_dequeue_function/main.py:54-83): validate, build ``external_id``,
pivot the list-of-structs into one array per metadata field with the
attribute prefix, merge ``otherAttributes``, strip the reserved
``external_id`` key, chunk 75 per POST.

Everything except the transport chunking is pure column algebra, so
here it runs inside Catalyst (higher-order ``transform`` — no explode,
no shuffle, no UDF) and the Lambda's per-record Python becomes a
distributed DataFrame op. F10's drop-and-log becomes a returned
``rejected`` frame instead of a log line.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from itertools import islice
from typing import NamedTuple, TypeVar

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from amazon_personalize_connectors_spark.config import (
    DEFAULT_ATTRIBUTE_PREFIX,
    ConnectorConfig,
)

RESERVED_ATTRIBUTE_KEYS = ("external_id",)  # bdeq:74-76 shadow rule

X = TypeVar("X")


class PayloadSplit(NamedTuple):
    payloads: DataFrame
    rejected: DataFrame


def _user_id_col() -> F.Column:
    """E4+E6: external_id = coalesce(queryUserId, userId) cast string
    (enqueue.py:53-55, bdeq:57,68-69)."""
    return F.coalesce(F.col("queryUserId"), F.col("userId")).cast("string")


def build_user_track_payloads(
    decorated: DataFrame,
    connector: ConnectorConfig | None = None,
    rec_col: str = "recommendations",
) -> PayloadSplit:
    """Shape decorated records into user-track payload rows.

    Output: ``external_id`` plus one ``<prefix><field>`` array column
    per recommendation-struct field (rank order preserved — P2,
    bdeq:78-81), plus merged ``otherAttributes`` literals with reserved
    keys shadowed out (P3, bdeq:74-76). Invalid records (no user id or
    empty recommendations — F10, bdeq:57-65) come back in ``rejected``.
    """
    prefix = connector.attribute_prefix if connector else DEFAULT_ATTRIBUTE_PREFIX
    other = dict(connector.other_attributes) if connector else {}

    cols = decorated.columns
    if rec_col not in cols:
        # a zero-row JSONL output read back has an empty schema — fail
        # with the cause rather than an unresolved-column error later
        raise ValueError(
            f"payload input has no {rec_col!r} column (columns: {cols}); "
            "reading back an empty JSONL output loses the schema — pass "
            "the decorated frame directly or supply a read schema"
        )
    if "queryUserId" not in cols:
        decorated = decorated.withColumn("queryUserId", F.lit(None).cast("string"))
    if "userId" not in cols:
        decorated = decorated.withColumn("userId", F.lit(None).cast("string"))

    valid = _user_id_col().isNotNull() & (F.size(F.col(rec_col)) > 0)
    rejected = decorated.where(~F.coalesce(valid, F.lit(False)))
    ok = decorated.where(valid)

    rec_type = ok.schema[rec_col].dataType
    assert isinstance(rec_type, T.ArrayType) and isinstance(
        rec_type.elementType, T.StructType
    ), f"{rec_col} must be array<struct>, got {rec_type.simpleString()}"
    rec_fields = [f.name for f in rec_type.elementType.fields]

    def field_getter(name: str):
        # NB: must stay arity-1 — transform() passes the array index to
        # arity-2 lambdas, which would shadow a default-arg capture.
        return lambda x: x[name]

    pivoted = [
        F.transform(F.col(rec_col), field_getter(f)).alias(f"{prefix}{f}")
        for f in rec_fields
    ]
    merged = [
        F.lit(v).alias(k) for k, v in sorted(other.items())
        if k not in RESERVED_ATTRIBUTE_KEYS
    ]
    payloads = ok.select(_user_id_col().alias("external_id"), *pivoted, *merged)
    return PayloadSplit(payloads=payloads, rejected=rejected)


def chunk_iterable(it: Iterable[X], size: int) -> Iterator[list[X]]:
    """P4 — fixed-size re-batching (10 for SQS enqueue.py:19,62-67; 75
    for Braze bdeq:18,85-90). Exact partition; last chunk <= size."""
    if size <= 0:
        raise ValueError("chunk size must be positive")
    iterator = iter(it)
    while chunk := list(islice(iterator, size)):
        yield chunk
