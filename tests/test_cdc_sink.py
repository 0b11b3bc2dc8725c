"""Streaming CDC upsert sink: micro-batches MERGE into a versioned
parquet snapshot; final state equals the batch-computed truth."""

from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.streaming.cdc_sink import (
    read_snapshot,
    stream_apply_changes,
)


def test_stream_apply_changes_upserts_and_deletes(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, op string, v string"

    b1 = spark.createDataFrame(
        [(1, "upsert", "a"), (2, "upsert", "b"), (3, "upsert", "c")], schema
    )
    b1.write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(schema).parquet(landing)
    stream_apply_changes(stream, store, ["k"], ckpt, op_col="op")
    snap1 = {(r.k, r.v) for r in read_snapshot(spark, store).collect()}
    assert snap1 == {(1, "a"), (2, "b"), (3, "c")}

    # second drain: update 1, delete 2, insert 4 — same checkpoint so
    # only the new file is processed
    b2 = spark.createDataFrame(
        [(1, "upsert", "a2"), (2, "delete", None), (4, "upsert", "d")], schema
    )
    b2.write.mode("append").parquet(landing)
    stream2 = spark.readStream.schema(schema).parquet(landing)
    stream_apply_changes(stream2, store, ["k"], ckpt, op_col="op")
    snap2 = {(r.k, r.v) for r in read_snapshot(spark, store).collect()}
    assert snap2 == {(1, "a2"), (3, "c"), (4, "d")}
    # snapshot columns stay (k, v) — op never leaks into the store
    assert set(read_snapshot(spark, store).columns) == {"k", "v"}


def test_in_batch_duplicates_collapse_deterministically(spark, tmp_path):
    landing = str(tmp_path / "landing2")
    store = str(tmp_path / "store2")
    ckpt = str(tmp_path / "ckpt2")
    schema = "k long, op string, v string"
    spark.createDataFrame(
        [(1, "upsert", "x"), (1, "upsert", "z"), (1, "upsert", "y")], schema
    ).write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(schema).parquet(landing)
    stream_apply_changes(stream, store, ["k"], ckpt, op_col="op")
    rows = read_snapshot(spark, store).collect()
    assert len(rows) == 1 and rows[0].v == "z"  # max over the value struct


def test_crash_before_pointer_flip_recovers_exactly_once(
    spark, tmp_path, monkeypatch
):
    """Kill the job between the versioned parquet write and the
    _VERSION pointer flip (the double-buffer's vulnerable window):
    readers must keep seeing the previous snapshot, and a restart on
    the same checkpoint must replay the failed batch and converge to
    the exactly-once result — the merge recomputes from the OLD
    pointer, so the replay cannot double-apply."""
    import amazon_personalize_connectors_spark.streaming.cdc_sink as cs

    landing = str(tmp_path / "landing3")
    store = str(tmp_path / "store3")
    ckpt = str(tmp_path / "ckpt3")
    schema = "k long, op string, v string"

    spark.createDataFrame(
        [(1, "upsert", "a"), (2, "upsert", "b")], schema
    ).write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(schema).parquet(landing)
    stream_apply_changes(stream, store, ["k"], ckpt, op_col="op")
    assert {(r.k, r.v) for r in read_snapshot(spark, store).collect()} == {
        (1, "a"), (2, "b"),
    }

    # batch 2 arrives; the pointer flip dies mid-batch
    spark.createDataFrame(
        [(1, "upsert", "a2"), (2, "delete", None), (3, "upsert", "c")], schema
    ).write.mode("append").parquet(landing)

    real_replace = cs.os.replace

    def exploding_replace(src, dst):
        raise OSError("simulated crash before pointer flip")

    monkeypatch.setattr(cs.os, "replace", exploding_replace)
    stream2 = spark.readStream.schema(schema).parquet(landing)
    try:
        stream_apply_changes(stream2, store, ["k"], ckpt, op_col="op")
        raised = False
    except Exception:
        raised = True
    assert raised  # the query must FAIL, not commit the checkpoint
    # readers still see the complete old snapshot — never a torn state
    assert {(r.k, r.v) for r in read_snapshot(spark, store).collect()} == {
        (1, "a"), (2, "b"),
    }

    # restart on the same checkpoint: the uncommitted batch replays
    monkeypatch.setattr(cs.os, "replace", real_replace)
    stream3 = spark.readStream.schema(schema).parquet(landing)
    stream_apply_changes(stream3, store, ["k"], ckpt, op_col="op")
    assert {(r.k, r.v) for r in read_snapshot(spark, store).collect()} == {
        (1, "a2"), (3, "c"),
    }
    # and a further drain with nothing new is a no-op (exactly-once)
    stream4 = spark.readStream.schema(schema).parquet(landing)
    stream_apply_changes(stream4, store, ["k"], ckpt, op_col="op")
    assert {(r.k, r.v) for r in read_snapshot(spark, store).collect()} == {
        (1, "a2"), (3, "c"),
    }
