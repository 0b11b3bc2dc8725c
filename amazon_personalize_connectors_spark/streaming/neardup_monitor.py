"""Streaming incremental MinHash-LSH near-duplicate detection: keep
the corpus's LSH band table current while documents arrive as
micro-batches, emitting each near-dup candidate pair exactly once —
"is this incoming document a copy of anything we already hold"
without ever re-banding history.

Why the delta rule is exact here: the band table is a PER-DOCUMENT
map (functions/dedup.py:minhash_band_table), so for a batch ΔD
against accumulated docs D the candidate pairs over D ∪ ΔD are

    cand(D ∪ ΔD) = cand(D)  ∪  join(bands(ΔD), bands(D))
                           ∪  cand(ΔD)

— every pair is generated in the epoch its LATER member arrives, all
of its shared bands at once (the earlier doc's bands are fully in
state, the later doc's fully in the batch). Per-trigger cost is
∝ |batch| × bands plus the bucket-keyed join against state; history
is NEVER re-banded or re-joined against itself.

Storage follows the ivm epoch scheme (streaming/epoch_store.py
rationale): version dir ``v{e}`` holds this epoch's ``bands`` delta
(append cost ∝ batch — state is the union of immutable per-epoch
deltas, no rewrite) and its ``pairs`` output; a replayed epoch —
including after the pointer flip — re-reads only versions < e and
overwrites its own dir, and a stale epoch (fresh checkpoint against
an old store) is refused. Document ids must be unique across the
stream's lifetime (the dedup-scan contract); band-table compaction
(union the deltas into one dir) is an operational policy, the law is
unaffected.

Law (oracle-checked by q:stream_minhash_lsh): the union of all
epochs' pairs equals the batch ``minhash_lsh_candidates`` over
everything drained — same params, same counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.functions.dedup import (
    minhash_band_table,
)
from amazon_personalize_connectors_spark.streaming.epoch_store import (
    current_version as _current_version,
)
from amazon_personalize_connectors_spark.streaming.cdc_sink import (
    _version_file,
)

_BANDS_SCHEMA = "id long, band int, bucket string"
_PAIRS_SCHEMA = "id_a long, id_b long, n_shared_bands long"


def _read_many(spark: SparkSession, schema: str, paths: list[str]) -> DataFrame:
    existing = [p for p in paths if os.path.exists(p)]
    if not existing:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*existing)


def apply_neardup_batch(
    batch: DataFrame,
    epoch_id: int,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 6,
    band_size: int = 2,
) -> None:
    """foreachBatch body: band one document micro-batch, emit its new
    candidate pairs (batch-vs-state + batch-vs-batch), append its
    band delta. Same epoch discipline as streaming/ivm.py."""
    spark = batch.sparkSession
    e = int(epoch_id)
    cur = _current_version(store_path)
    if cur is not None and e < cur:
        raise ValueError(
            f"epoch {e} is behind the store's committed epoch {cur} "
            f"(store {store_path!r}): a fresh streaming checkpoint "
            f"cannot be pointed at an existing near-dup store — use a "
            f"new store path when restarting from scratch."
        )
    vdir = os.path.join(store_path, f"v{e}")
    new_bands = minhash_band_table(
        batch, text_col, id_col, n, num_hashes, band_size
    ).localCheckpoint(eager=True)  # read 3x: state join, self join, delta write
    state_bands = _read_many(
        spark,
        _BANDS_SCHEMA,
        [os.path.join(store_path, f"v{i}", "bands") for i in range(e)],
    )
    # batch-vs-state: the new doc is always the later member; order
    # the pair by id for a stable output key
    vs_state = new_bands.alias("nb").join(
        state_bands.alias("sb"), ["band", "bucket"]
    ).select(
        F.least(F.col("nb.id"), F.col("sb.id")).alias("id_a"),
        F.greatest(F.col("nb.id"), F.col("sb.id")).alias("id_b"),
    )
    a = new_bands.select(F.col("id").alias("id_a"), "band", "bucket")
    b = new_bands.select(F.col("id").alias("id_b"), "band", "bucket")
    vs_batch = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    pairs = (
        vs_state.unionByName(vs_batch)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_bands"))
    )
    pairs.write.mode("overwrite").parquet(os.path.join(vdir, "pairs"))
    new_bands.write.mode("overwrite").parquet(os.path.join(vdir, "bands"))
    if cur is None or e > cur:
        tmp = _version_file(store_path) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(e))
        os.replace(tmp, _version_file(store_path))


def maintain_from_stream(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    timeout_s: float = 300.0,
    **band_kwargs,
) -> None:
    """Drain a document stream (Trigger.AvailableNow), maintaining the
    near-dup store one micro-batch at a time."""
    os.makedirs(store_path, exist_ok=True)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: apply_neardup_batch(b, e, store_path, **band_kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"near-dup monitor still running after {timeout_s}s"
            )
    finally:
        if q.isActive:
            q.stop()


def candidates_from_store(
    spark: SparkSession, store_path: str
) -> DataFrame:
    """All candidate pairs drained so far — the per-epoch pair sets
    are disjoint (a pair lands in its later member's epoch), so the
    union IS the batch result over everything drained; the defensive
    re-aggregate costs one pairs-sized shuffle and guards against a
    reprocessed-epoch artifact ever double-counting."""
    ver = _current_version(store_path)
    if ver is None:
        return spark.createDataFrame([], _PAIRS_SCHEMA)
    pairs = _read_many(
        spark,
        _PAIRS_SCHEMA,
        [os.path.join(store_path, f"v{i}", "pairs") for i in range(ver + 1)],
    )
    return pairs.groupBy("id_a", "id_b").agg(
        F.sum("n_shared_bands").cast("bigint").alias("n_shared_bands")
    )
