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
    apply_interactions_batch(b1, 0, store)
    before = {(r["item"], r["rec_item"]): r["n_common"]
              for r in serve_topk(spark, store).collect()}
    b2 = spark.createDataFrame([(1, 12), (3, 10)], "u long, i long")
    apply_interactions_batch(b2, 1, store)
    after_once = {(r["item"], r["rec_item"]): r["n_common"]
                  for r in serve_topk(spark, store).collect()}
    # the HARD retry: foreachBatch completed AND the pointer flipped,
    # but the checkpoint commit was lost — Spark replays epoch 1.
    # epoch-keyed folds re-read v0 and overwrite v1 idempotently.
    apply_interactions_batch(b2, 1, store)
    after_retry = {(r["item"], r["rec_item"]): r["n_common"]
                   for r in serve_topk(spark, store).collect()}
    assert after_retry == after_once
    # the classic retry: crash BEFORE the flip (pointer still at v0)
    vf = os.path.join(store, "_VERSION")
    open(vf, "w").write("0")
    apply_interactions_batch(b2, 1, store)
    after_retry2 = {(r["item"], r["rec_item"]): r["n_common"]
                    for r in serve_topk(spark, store).collect()}
    assert after_retry2 == after_once
    assert before != after_once  # batch 2 did change the model
    # a fresh checkpoint (epochs restarting at 0) against this store
    # is refused instead of silently corrupting accumulated state
    with pytest.raises(ValueError, match="behind the store"):
        apply_interactions_batch(b1, 0, store)


def test_untouched_buckets_not_rewritten_across_trigger(spark, tmp_path):
    """The warehouse-scale property: a micro-batch rewrites ONLY the
    hash buckets it touches. After a second batch touching a different
    user bucket, (a) every file of the first version directory is
    byte-identical, (b) the new version directory contains ONLY the
    second batch's buckets, and (c) readers still assemble the full
    state across version directories via the manifest."""
    import hashlib
    import os

    from amazon_personalize_connectors_spark.streaming.model_refresh import (
        apply_interactions_batch,
    )

    store = str(tmp_path / "m3")
    os.makedirs(store, exist_ok=True)
    B = 4
    bucket_of = {
        r["u"]: r["b"]
        for r in spark.createDataFrame(
            [(u,) for u in range(1, 30)], "u long"
        ).select("u", F.pmod(F.xxhash64("u"), F.lit(B)).alias("b")).collect()
    }
    u1 = 1
    u2 = next(u for u, b in bucket_of.items() if b != bucket_of[u1])

    b1 = spark.createDataFrame([(u1, 10), (u1, 11)], "u long, i long")
    apply_interactions_batch(b1, 0, store, n_buckets=B)

    def _snapshot(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                out[p] = hashlib.sha256(open(p, "rb").read()).hexdigest()
        return out

    v0 = os.path.join(store, "v0")
    before = _snapshot(v0)
    assert before, "v0 should hold the first batch's buckets"

    b2 = spark.createDataFrame([(u2, 20), (u2, 21)], "u long, i long")
    apply_interactions_batch(b2, 1, store)

    after = _snapshot(v0)
    assert after == before, "untouched v0 files were rewritten"
    # v1 items hold ONLY u2's bucket (u1's bucket was not touched)
    v1_items = os.path.join(store, "v1", "items")
    item_buckets = sorted(
        d for d in os.listdir(v1_items) if d.startswith("bucket=")
    )
    assert item_buckets == [f"bucket={bucket_of[u2]}"]
    # manifest-assembled reads span both version directories
    state = read_item_state(spark, store)
    assert {(r["u"], r["i"]) for r in state.collect()} == {
        (u1, 10), (u1, 11), (u2, 20), (u2, 21)
    }
    served = {(r["item"], r["rec_item"]) for r in serve_topk(spark, store).collect()}
    assert served == {(10, 11), (11, 10), (20, 21), (21, 20)}


def test_compact_store_collapses_versions_and_preserves_serving(spark, tmp_path):
    import json as _json
    import os

    from amazon_personalize_connectors_spark.streaming.model_refresh import (
        apply_interactions_batch,
        compact_store,
    )

    store = str(tmp_path / "m4")
    os.makedirs(store, exist_ok=True)
    for e, batch in enumerate(
        [[(1, 10), (1, 11)], [(2, 10), (2, 12)], [(3, 11), (3, 12)]]
    ):
        apply_interactions_batch(
            spark.createDataFrame(batch, "u long, i long"), e, store, n_buckets=4
        )
    before = {(r["item"], r["rec_item"]): (r["n_common"], r["rank"])
              for r in serve_topk(spark, store).collect()}
    state_before = {(r["u"], r["i"]) for r in read_item_state(spark, store).collect()}
    assert len({d for d in os.listdir(store) if d.startswith("v")}) == 3

    compact_store(spark, store)

    # grace-window pruning (ADVICE r8): the pre-flip reader's whole
    # reachable set survives the compaction; explicit gc_store()
    # collapses to the single current version
    from amazon_personalize_connectors_spark.streaming.model_refresh import (
        _bucket_paths,
        _read_manifest,
        gc_store,
    )

    man_prev = _read_manifest(store, 2)
    for kind in ("items", "pairs"):
        for p in _bucket_paths(store, man_prev, kind):
            assert os.path.exists(p), f"pre-flip reader path yanked: {p}"
    gc_store(store)
    vdirs = sorted(d for d in os.listdir(store) if d.startswith("v"))
    assert vdirs == ["v3"], vdirs  # one surviving version
    man = _json.load(open(os.path.join(store, "v3", "_MANIFEST.json")))
    assert set(man["items"].values()) == {3}
    assert set(man["pairs"].values()) <= {3}
    after = {(r["item"], r["rec_item"]): (r["n_common"], r["rank"])
             for r in serve_topk(spark, store).collect()}
    assert after == before
    assert {(r["u"], r["i"]) for r in read_item_state(spark, store).collect()} == state_before
    # a batch after compaction keeps working (epoch continues past the
    # compaction's non-epoch version)
    apply_interactions_batch(
        spark.createDataFrame([(4, 10), (4, 11)], "u long, i long"), 3, store
    )
    assert serve_topk(spark, store).count() >= len(after)


def test_js_from_store_equals_batch_over_any_split(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from amazon_personalize_connectors_spark.operators.features import (
        js_divergence,
    )
    from amazon_personalize_connectors_spark.streaming.drift_monitor import (
        apply_grid_batch,
        js_from_store,
    )

    rows = [(i % 7, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "bin long, g string")
    store = str(tmp_path / "jsd-store")
    os.makedirs(store)
    # fold in three arbitrary micro-batches
    for epoch, frac in enumerate((df.where("bin < 2"),
                                  df.where("bin >= 2 AND bin < 5"),
                                  df.where("bin >= 5"))):
        apply_grid_batch(
            frac, epoch, store, "bin",
            F.col("g") == "a", F.col("g") == "b",
        )
    stream_row = js_from_store(spark, store).collect()[0]
    batch_row = js_divergence(
        df, "bin", F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    assert (stream_row.n_a, stream_row.n_b, stream_row.n_bins) == (
        batch_row.n_a, batch_row.n_b, batch_row.n_bins)
    assert stream_row.jsd == batch_row.jsd


def test_conformal_from_store_equals_batch(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from amazon_personalize_connectors_spark.operators.evaluation import (
        conformal_threshold,
    )
    from amazon_personalize_connectors_spark.streaming.drift_monitor import (
        apply_grid_batch,
        conformal_from_store,
    )

    vals = [(v % 37,) for v in range(200)]
    df = spark.createDataFrame(vals, "v long")
    store = str(tmp_path / "conf-store")
    os.makedirs(store)
    for epoch, frac in enumerate((df.where("v < 10"),
                                  df.where("v >= 10 AND v < 25"),
                                  df.where("v >= 25"))):
        apply_grid_batch(frac, epoch, store, "v", F.lit(True), F.lit(False))
    s = conformal_from_store(spark, store, 1, 4).collect()[0]
    b = conformal_threshold(
        df.withColumn("g", F.lit("all")), ["g"], "v", 1, 4
    ).collect()[0]
    assert (s.n, s.k, s.threshold) == (b.n, b.k, b.threshold)
