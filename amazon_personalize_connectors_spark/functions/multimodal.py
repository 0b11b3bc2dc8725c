"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched Pandas functions.

The container has no image/audio codecs, so the decode step is a
clearly-marked stub (``decode_media`` raises NotImplementedError unless
given a decoder); everything Spark-side is real and tested: the column
schema, the ``mapInPandas`` plumbing (Arrow batch in, Arrow batch out),
the deterministic fake decoder used by tests, and the partitioning
story (binary payloads are large — repartition by byte budget before
a decode pass, not by row count).

At 100 TB the pattern is: keep binaries in their own column family
(parquet column chunk), prune them out of every query that doesn't
decode, and size partitions by ``sum(n_bytes)`` so one Arrow batch of
binaries fits comfortably in executor memory.
"""

from __future__ import annotations

import zlib
from collections.abc import Callable, Iterator
from contextlib import contextmanager
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

Decoder = Callable[[bytes, str], dict[str, Any]]


def attach_fake_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministic synthetic binary column derived from an id — the
    test stand-in for real stored media. Content = repeated md5 bytes,
    length varies with the id."""
    content = F.unhex(
        F.repeat(F.md5(F.col(id_col).cast("string")), (F.col(id_col) % 8 + 1).cast("int"))
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.struct(
            F.lit(f"application/x-fake-{kind}").alias("mime"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def fake_decoder(content: bytes, kind: str) -> dict[str, Any]:
    """Deterministic stand-in for a real codec: checksum + a tiny
    byte-histogram "embedding". Replace with PIL/ffmpeg/soundfile
    decoding where those libraries exist."""
    hist = [0.0] * 8
    for b in content:
        hist[b >> 5] += 1.0
    return {
        "checksum": zlib.crc32(content),
        "features": [h / max(len(content), 1) for h in hist],
    }


def real_decoder(content: bytes, kind: str) -> dict[str, Any]:  # pragma: no cover
    """STUB — the container ships no media codecs. Wire PIL (image),
    soundfile (audio) or pyav/ffmpeg (video) here when available."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; pass decoder=fake_decoder or your own Decoder"
    )


@contextmanager
def arrow_batch_rows(spark, n: int):
    """Bound Arrow batch row count around an ACTION (it is read at
    execution time, not plan-build time): big binary payloads need
    small batches or executor Python workers balloon. Restores the
    previous session value on exit — use as::

        with arrow_batch_rows(spark, 64):
            decode_media(media).write.parquet(out)
    """
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def decode_media(df: DataFrame, decoder: Decoder | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    the decoder runs once per row *inside the batch loop* (vectorize
    further inside the decoder where the codec allows). Output schema
    is fixed (FEATURE_SCHEMA) so downstream plans are stable whether
    the decoder is real or fake.

    Deliberately does NOT touch session conf: Arrow batch sizing is the
    caller's choice at action time — wrap the action in
    ``arrow_batch_rows`` (a leaked session-wide override here would
    throttle every later Arrow/pandas operation).
    """
    if decoder is None:
        decoder = real_decoder

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len),
            }
            decoded = [decoder(c, k) for c, k in zip(pdf["content"], pdf["kind"])]
            out["checksum"] = pd.Series([d["checksum"] for d in decoded], dtype="int64")
            out["features"] = pd.Series([d["features"] for d in decoded])
            yield pd.DataFrame(out)

    return df.mapInPandas(decode_batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """Frame-sampling plumbing for video-like binaries: slice the
    payload into fixed-stride chunks Catalyst-side (no Python), one
    output row per sampled "frame". Real frame extraction replaces the
    byte slicing once a codec exists; the fan-out/partitioning shape
    is what matters here."""
    n_frames = F.greatest(
        (F.col("meta.n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return df.select(
        "media_id",
        "kind",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.substring(
                    F.col("content"), (i * every_n_bytes + 1).cast("int"), every_n_bytes
                ),
            )
        ).alias("frame_no", "frame_bytes"),
    )
