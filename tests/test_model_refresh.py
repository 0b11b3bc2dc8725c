"""Streaming co-visitation model refresh (streaming/model_refresh.py):
micro-batched increment maintenance must equal a full recompute, and
serve_topk must equal covisitation_topk over the union."""

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from amazon_personalize_connectors_spark.operators.recsys import (
    covisitation_topk,
)
from amazon_personalize_connectors_spark.streaming.model_refresh import (
    read_item_state,
    refresh_from_stream,
    serve_topk,
)


def _write_batch(dirpath, rows, name):
    (dirpath / name).write_text(
        "\n".join(json.dumps({"u": u, "i": i}) for u, i in rows)
    )


def test_stream_refresh_equals_full_recompute(spark, tmp_path):
    inp = tmp_path / "landing"
    inp.mkdir()
    day1 = [(1, 10), (1, 11), (2, 10), (2, 12), (3, 13)]
    day2 = [(1, 12), (2, 11), (4, 10), (4, 11), (1, 10)]  # (1,10) repeat
    _write_batch(inp, day1, "b1.json")
    schema = T.StructType(
        [T.StructField("u", T.LongType()), T.StructField("i", T.LongType())]
    )
    store = str(tmp_path / "model")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(inp))
    refresh_from_stream(stream, store, ckpt)
    # second drain picks up only the new file (checkpointed offsets)
    _write_batch(inp, day2, "b2.json")
    stream2 = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(inp))
    refresh_from_stream(stream2, store, ckpt)

    served = serve_topk(spark, store, k=10)
    all_rows = spark.createDataFrame(day1 + day2, schema)
    expected = covisitation_topk(
        all_rows, user_col="u", item_col="i", k=10, max_items_per_user=1000
    )
    got = {(r["item"], r["rec_item"]): (r["n_common"], r["rank"])
           for r in served.collect()}
    want = {(r["item"], r["rec_item"]): (r["n_common"], r["rank"])
            for r in expected.collect()}
    assert got == want
    # item state holds each (u, i) exactly once despite the repeat
    state = read_item_state(spark, store)
    assert state.count() == state.distinct().count() == len(set(day1 + day2))


def test_refresh_batch_retry_is_idempotent(spark, tmp_path):
    """A redelivered batch (same rows, pointer not yet flipped in the
    crashed run) must not double-count: the retried version directory
    overwrite + next-batch anti-join absorb it."""
    from amazon_personalize_connectors_spark.streaming.model_refresh import (
        apply_interactions_batch,
    )

    store = str(tmp_path / "model2")
    import os
    os.makedirs(store, exist_ok=True)
    b1 = spark.createDataFrame([(1, 10), (1, 11), (2, 10)], "u long, i long")
    apply_interactions_batch(b1, store)
    before = {(r["item"], r["rec_item"]): r["n_common"]
              for r in serve_topk(spark, store).collect()}
    # simulate foreachBatch redelivery of a LATER batch twice: apply
    # batch 2, then roll the pointer back one version (as if the crash
    # happened before the flip) and re-apply the same batch
    b2 = spark.createDataFrame([(1, 12), (3, 10)], "u long, i long")
    apply_interactions_batch(b2, store)
    after_once = {(r["item"], r["rec_item"]): r["n_common"]
                  for r in serve_topk(spark, store).collect()}
    vf = os.path.join(store, "_VERSION")
    v = int(open(vf).read())
    open(vf, "w").write(str(v - 1))
    apply_interactions_batch(b2, store)
    after_retry = {(r["item"], r["rec_item"]): r["n_common"]
                   for r in serve_topk(spark, store).collect()}
    assert after_retry == after_once
    assert before != after_once  # batch 2 did change the model
