"""T1/T3 — incremental & event-driven semantics via Structured Streaming.

The reference gets exactly-once-per-file incremental reads from Glue
job bookmarks (``--job-bookmark-option job-bookmark-enable`` +
``transformation_ctx`` lineage keys, template.yaml:201,223 /
related_items_etl.py:106,154) and event-driven delivery from S3
notifications → Lambda → SQS (template.yaml:310-375).

Both map onto one Spark-native mechanism: a Structured Streaming file
source with a checkpoint directory. ``Trigger.AvailableNow`` drains
everything new then stops — a batch-shaped run with streaming's
source-tracking state, which is exactly what a bookmark is. The
checkpoint replaces the bookmark store; ``foreachBatch`` replaces the
Lambda fan-out (delivery code receives each micro-batch as a normal
DataFrame). ``maxFilesPerTrigger``/``pathGlobFilter`` give the rate
limiting and key-prefix filtering the reference configures in infra
(F8 key regex, benq:19,30-32).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def incremental_file_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    format: str = "json",
    path_glob_filter: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S7/S8 — streaming file source over a landing prefix. New files
    are discovered per trigger; already-processed files are remembered
    in the checkpoint (the bookmark)."""
    reader = spark.readStream.schema(schema)
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(format).load(path)


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    query_name: str = "apc-incremental",
    timeout_s: float = 300.0,
) -> StreamingQuery:
    """Drain all currently-available input through ``batch_fn`` and
    stop — the bookmark-enabled batch-job shape (T1). ``batch_fn``
    receives each micro-batch as a plain DataFrame plus the batch id
    (use the id for idempotent sinks: same id ⇒ same data on retry).
    """
    query = (
        stream_df.writeStream.queryName(query_name)
        .foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_s)
    return query


def incremental_pipeline_run(
    spark: SparkSession,
    input_path: str,
    schema: T.StructType,
    checkpoint_dir: str,
    process: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    **source_opts,
) -> StreamingQuery:
    """End-to-end incremental run: stream-scan the landing prefix,
    apply a batch transformation (any composition of this library's
    operators — they are all plain DataFrame → DataFrame), deliver
    each micro-batch through ``sink``. Running it twice without new
    input is a no-op (the T1 idempotence the reference gets from
    bookmarks; tested in tests/test_streaming.py)."""
    source = incremental_file_source(spark, input_path, schema, **source_opts)

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        sink(process(batch_df), batch_id)

    return run_available_now(source, checkpoint_dir, batch_fn)


def incremental_content_ingest(
    stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    deliver: Callable[[DataFrame, int], None],
) -> StreamingQuery:
    """Streaming once-per-CONTENT ingestion: each micro-batch deltas
    against the digest-bucketed state store (left-anti join on the
    96-bit record digest), hands only never-seen records to
    ``deliver``, then appends their digests — the streaming face of
    ``delta_check_against_digests``/``append_state_digests``, so
    state growth and per-batch cost are ∝ new content, never corpus
    size.

    Replay safety: if a batch is reprocessed after a crash between
    deliver() and the digest append, records are re-delivered
    (at-least-once delivery, like the reference's queue path) but the
    digest append itself is idempotent — duplicates collapse at
    read/compaction time, so state never diverges.
    """
    from amazon_personalize_connectors_spark.operators.delta import (
        append_state_digests,
        delta_check_against_digests,
        read_state_digests,
    )

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        digests = read_state_digests(spark, state_path)
        fresh = delta_check_against_digests(batch_df, digests)
        fresh.persist()
        try:
            deliver(fresh, batch_id)
            append_state_digests(fresh, state_path)
        finally:
            fresh.unpersist()

    return run_available_now(stream, checkpoint_dir, batch_fn)
